package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators for the training-data pipeline (builder
  * mandate): language ID, quality scoring, token counting, document
  * fingerprinting, and multimodal (binary-payload) metadata — each a
  * map-only pass over `documents`, fully codegen'd, oracle-checked.
  *
  * Scale: every query here is scan → per-row expressions → one small
  * aggregation or a direct projection. No shuffle except the final
  * tiny agg/sort; at 100 TB these are embarrassingly parallel and
  * bound by scan throughput — exactly what a corpus-filtering stage
  * should be.
  */
object TextOps {

  private def toks(c: Column): Column = split(c, " ")

  /** Shared with Dedup: first 15 hex digits of md5 → long in [0, p). */
  private val P = 2147483647L
  private def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long") % P

  // ---- q36: language ID (n-gram/stopword heuristic) ------------------

  private val EnStopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword-ratio language ID: share of English function words among
    * the tokens; >= 4% → 'en', else 'und'. (The real corpus would use
    * per-language stopword tables — same expression shape, one array
    * literal per language.) */
  /** Layered projections keep each expensive expression single-eval:
    * the split, the stopword filter and the rounded ratio are all
    * consumed more than once downstream, and Catalyst's CollapseProject
    * refuses to inline a non-trivial expression into multiple use sites
    * — so tokenization happens once per row, not once per reference
    * (the flat single-select form re-ran the lambda filter per use). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val t = col("t")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("lang"),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, tok =>
          array_contains(array(EnStopwords.map(lit): _*), tok))).cast("long")
          .as("n_stop"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("n_stop").cast("double") / col("n_tokens").cast("double"), 6)
          .as("stop_ratio"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("stop_ratio"),
        when(col("stop_ratio") >= 0.04, lit("en")).otherwise(lit("und"))
          .as("pred_lang"))
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    val stops = EnStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, lang,
       | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       | round(CAST(len(list_filter(string_split(text, ' '),
       |     t -> list_contains($stops, t))) AS DOUBLE)
       |   / len(string_split(text, ' ')), 6) AS stop_ratio,
       | CASE WHEN round(CAST(len(list_filter(string_split(text, ' '),
       |     t -> list_contains($stops, t))) AS DOUBLE)
       |   / len(string_split(text, ' ')), 6) >= 0.04
       |   THEN 'en' ELSE 'und' END AS pred_lang
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q37: quality scoring ------------------------------------------

  /** Length / vocabulary-richness / token-shape quality score — the
    * standard cheap pre-filter before expensive dedup or training:
    * type-token ratio, mean token length (single-space tokenization
    * makes it `(chars - (n-1)) / n`), and a length factor, folded into
    * one bounded [0,1] score. */
  /** Explicit half-up quantization to 6 digits: `round()` tie-breaking
    * differs between engines (Spark half-up, DuckDB half-even) and the
    * weighted score can land exactly on a tie; floor(x·1e6 + 0.5) is
    * the same arithmetic on both, so bit-identical inputs stay
    * bit-identical out. */
  private def quant6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  def qualityScore(s: SparkSession, dir: String): DataFrame =
    qualityScoreOf(Tables.documents(s, dir))

  /** [[qualityScore]] over an explicit docs frame — the score is a
    * pure per-doc function (no corpus statistics), so a slice scores
    * identically to its rows inside the full corpus; the warehouse
    * merge path relies on exactly that. */
  private[queries] def qualityScoreOf(docs: DataFrame): DataFrame = {
    // Same layering as langId: split once, distinct once, each derived
    // ratio once — every reuse below reads a materialized column.
    val n = col("n")
    docs
      .select(col("doc_id"), length(col("text")).cast("double").as("chars"),
        toks(col("text")).as("t"))
      .select(col("doc_id"), col("chars"),
        size(col("t")).cast("double").as("n"),
        size(array_distinct(col("t"))).cast("double").as("nd"))
      .select(col("doc_id"), n,
        (col("nd") / n).as("ttr_raw"),
        ((col("chars") - (n - 1)) / n).as("avg_len_raw"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        quant6(col("ttr_raw")).as("ttr"),
        quant6(col("avg_len_raw")).as("avg_token_len"),
        quant6(col("ttr_raw") * 0.5 +
          least(col("avg_len_raw") / lit(10.0), lit(1.0)) * 0.3 +
          least(col("n") / lit(100.0), lit(1.0)) * 0.2).as("quality_score"))
      .orderBy("doc_id")
  }

  // SQL fragments shared by the q37/q90/q92 oracles so the score
  // formula cannot drift between them (their Spark sides already
  // share qualityScore()).
  private[queries] val qualityCteSql: String =
    """q AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      |    CAST(length(text) AS DOUBLE) AS chars
      |  FROM documents)""".stripMargin

  private[queries] val qualityScoreExprSql: String =
    "floor(((nd / n) * 0.5 + least((chars - (n - 1)) / n / 10.0, 1.0) * 0.3" +
      " + least(n / 100.0, 1.0) * 0.2) * 1e6 + 0.5) / 1e6"

  val qualityScoreSql: String =
    s"""WITH $qualityCteSql
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       | floor((nd / n) * 1e6 + 0.5) / 1e6 AS ttr,
       | floor(((chars - (n - 1)) / n) * 1e6 + 0.5) / 1e6 AS avg_token_len,
       | $qualityScoreExprSql AS quality_score
       |FROM q
       |ORDER BY doc_id""".stripMargin

  /** q90 — importance (quality-weighted) sampling: each document is
    * kept with probability equal to its OWN q37 quality score — the
    * curation stage between hard filters (drop everything below a
    * cutoff) and uniform sampling (ignore quality entirely), i.e. the
    * soft mixture every data recipe actually wants: high-quality docs
    * mostly survive, low-quality docs mostly don't, nothing is
    * cliff-edged.
    *
    * Per-row Bernoulli with a per-row probability, made deterministic
    * and cross-engine exact: keep iff keyed-md5-60(doc_id) <
    * floor(p · 2⁶⁰). The hash is uniform on [0, 2⁶⁰); p is the
    * 6-decimal-rounded score both engines already compute
    * bit-identically (q37); 2⁶⁰ is exactly representable, so the
    * multiply-and-floor is the same IEEE operation in both engines
    * and the long comparison can never straddle a ulp. Map-only —
    * no shuffle at all — rerun-stable and backfill-safe, the same
    * properties as every other sampling stage in the engine. */
  def importanceSample(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash.keyedHash60(col("doc_id"), "iw")
    qualityScore(s, dir)
      .select(col("doc_id"), col("quality_score"))
      .filter(h < floor(col("quality_score") * lit(1.152921504606846976e18))
        .cast("long"))
      .orderBy("doc_id")
  }

  val importanceSampleSql: String =
    s"""WITH $qualityCteSql,
       |s AS (
       |  SELECT doc_id, $qualityScoreExprSql AS quality_score
       |  FROM q)
       |SELECT doc_id, quality_score FROM s
       |WHERE ('0x' || substr(md5('iw' || doc_id::VARCHAR), 1, 15))::BIGINT
       |      < CAST(floor(quality_score * 1152921504606846976.0) AS BIGINT)
       |ORDER BY doc_id""".stripMargin

  // ---- q95: split drift certification --------------------------------

  /** q95 — quality-drift audit of the train/valid/test split: the q37
    * quality score histogrammed (10 equal bins on [0,1]) per q93 split,
    * with a per-bin certification that the three splits draw the SAME
    * quality distribution. A content-hash split SHOULD be quality-blind
    * — this query is the audit that proves it, the check a training
    * run wants before trusting that its validation loss is measured on
    * the same data distribution it trains on.
    *
    * The drift test is exact integer arithmetic in the q91 style — no
    * float proportions, no epsilon tuning:
    * `|n_b/N_split − n'_b/N'_split| ≤ 1/10` cross-multiplied to
    * `|10·(n_b·N' − n'_b·N)| ≤ N·N'`, evaluated in DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB) so it cannot wrap at any corpus size
    * below ~10¹⁸ docs. Zero-denominator splits need no guard: N = 0
    * forces both products to 0 and the inequality holds trivially.
    *
    * Shape: the score pass is map-only (q37), the split is one
    * stratum-keyed window (q88), the histogram one 10-row aggregation,
    * and the split totals come from a GLOBAL WINDOW over those ≤10
    * rows (bounded by the bin count — joining the documented bounded
    * global windows) — a `totals = hist.agg(...)` + crossJoin branch
    * would re-evaluate the whole corpus pass, since Spark has no
    * common-subplan reuse across branches (the q64 lesson, confirmed
    * in this query's probe plan before the rewrite). Nothing here
    * scales with corpus size past the two passes the inputs already
    * cost. */
  def splitDrift(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val scored = qualityScore(s, dir).select(col("doc_id"), col("quality_score"))
    val splits = graft.log.Features
      .hashSplit3(Tables.documents(s, dir), "source", "doc_id", "budget")
      .select(col("doc_id"), col("split"))
    val hist = scored.join(splits, "doc_id")
      .withColumn("bin",
        least(floor(col("quality_score") * 10).cast("long"), lit(9L)))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "valid", 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val all = graft.core.Windows.all
    def driftOk(nb: Column, n2b: Column, nTot: Column, n2Tot: Column): Column =
      abs(lit(10L).cast(dec) *
        (nb.cast(dec) * n2Tot.cast(dec) - n2b.cast(dec) * nTot.cast(dec))) <=
        nTot.cast(dec) * n2Tot.cast(dec)
    hist
      .withColumn("nt", sum(col("n_train")).over(all))
      .withColumn("nv", sum(col("n_valid")).over(all))
      .withColumn("nx", sum(col("n_test")).over(all))
      .select(col("bin"), col("n_train"), col("n_valid"), col("n_test"),
        driftOk(col("n_train"), col("n_valid"), col("nt"), col("nv"))
          .as("train_valid_drift_ok"),
        driftOk(col("n_train"), col("n_test"), col("nt"), col("nx"))
          .as("train_test_drift_ok"))
      .orderBy("bin")
  }

  val splitDriftSql: String =
    s"""WITH ${PipelineOps.splitCteSql},
       |$qualityCteSql,
       |sc AS (SELECT doc_id, $qualityScoreExprSql AS score FROM q),
       |b AS (
       |  SELECT least(CAST(floor(sc.score * 10) AS BIGINT), 9) AS bin, sp.split
       |  FROM sp JOIN sc USING (doc_id)),
       |h AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |    CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |  FROM b GROUP BY bin),
       |t AS (
       |  SELECT CAST(sum(n_train) AS HUGEINT) AS nt,
       |    CAST(sum(n_valid) AS HUGEINT) AS nv,
       |    CAST(sum(n_test) AS HUGEINT) AS nx
       |  FROM h)
       |SELECT bin, n_train, n_valid, n_test,
       |  abs(10 * (CAST(n_train AS HUGEINT) * nv - CAST(n_valid AS HUGEINT) * nt))
       |    <= nt * nv AS train_valid_drift_ok,
       |  abs(10 * (CAST(n_train AS HUGEINT) * nx - CAST(n_test AS HUGEINT) * nt))
       |    <= nt * nx AS train_test_drift_ok
       |FROM h, t
       |ORDER BY bin""".stripMargin

  // ---- q38: token counting (whitespace + BPE-ish regex) --------------

  /** Whitespace tokens vs a BPE-ish regex segmentation (letter runs,
    * digit runs, single punctuation marks) — the usual first-order
    * token-budget estimate for training data. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    // ws is consumed by 4 expressions — materialize the split once
    // (CollapseProject keeps the layering; flat form split 4×/row).
    val ws = col("ws")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), toks(col("text")).as("ws"))
      .select(col("doc_id"),
        size(ws).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        size(filter(ws, t => length(t) >= 6)).cast("long").as("n_long_tokens"),
        array_max(transform(ws, t => length(t))).cast("long").as("max_token_len"))
      .orderBy("doc_id")
  }

  val tokenStatsSql: String =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
      | CAST(len(list_filter(string_split(text, ' '), t -> len(t) >= 6)) AS BIGINT) AS n_long_tokens,
      | CAST(list_max(list_transform(string_split(text, ' '), t -> len(t))) AS BIGINT) AS max_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q39: document fingerprint (rolling hash) ----------------------

  /** Order-sensitive rolling polynomial fingerprint over token hashes:
    * fp = fold(h1, (acc, h) => (31·acc + h) mod p). Unlike the minhash
    * family (set-based), this distinguishes permutations — the
    * complementary dedup key. Portable md5 token hash, so the oracle
    * reproduces every bit. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        call_function("graft_fingerprint", toks(col("text")), lit(P))
          .as("fingerprint"))
      .orderBy("doc_id")

  /** HOF reference form of the fingerprint column (executable spec —
    * HashExprsSpec asserts the native kernel matches it exactly). */
  private[graft] def fingerprintHof(text: Column): Column = {
    val hs = transform(split(text, " "), tokenHash(_))
    aggregate(
      slice(hs, lit(2), size(hs) - 1),
      element_at(hs, 1),
      (acc, h) => (acc * 31 + h) % P)
  }

  val fingerprintSql: String =
    s"""SELECT doc_id,
       | list_reduce(
       |   list_transform(string_split(text, ' '),
       |     tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT % $P),
       |   (acc, h) -> (acc * 31 + h) % $P) AS fingerprint
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---- q40: multimodal binary metadata -------------------------------

  /** Opaque-binary (multimodal) metadata extraction, expression form:
    * payload byte length, magic bytes (first 2, hex), content hash.
    * The payload here is the utf-8 encoding of `text` (this container
    * has no media files); the operators — binary column, byte length,
    * byte slicing, content digest — are the real multimodal ingest
    * surface. The decode/feature path lives in `graft.multimodal.Media`
    * (mapPartitions, bounded batches). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        length(payload).cast("long").as("n_bytes"),
        upper(hex(substring(payload, 1, 2))).as("magic"),
        sha2(col("text"), 256).as("content_hash"))
      .orderBy("doc_id")
  }

  val multimodalMetaSql: String =
    """SELECT doc_id, source,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | upper(hex(encode(substring(text, 1, 2)))) AS magic,
      | sha256(text) AS content_hash
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q58: multimodal frame-sampling plan ---------------------------

  /** Frame-sampling plan through the REAL multimodal plumbing
    * (`graft.multimodal.Media.frameSampleIndices`): every 4th frame
    * index per document, as a pure metadata op — no payload decoded,
    * which is the point: at 100 TB the sampling plan prunes decode
    * work BEFORE any byte of media is touched. `n_frames` here is a
    * portable stand-in derivation (1 + n_chars mod 32; the container
    * has no codecs — a real pipeline reads it from the container
    * header the same metadata-only way). */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    val withFrames = Tables.documents(s, dir)
      .withColumn("n_frames", (lit(1L) + col("n_chars") % 32L).cast("long"))
    graft.multimodal.Media.frameSampleIndices(withFrames, stride = 4)
      .select(col("doc_id"), col("n_frames"),
        size(col("sampled_frames")).cast("long").as("n_sampled"),
        element_at(col("sampled_frames"), 1).as("first_frame"),
        element_at(col("sampled_frames"), -1).as("last_frame"))
      .orderBy("doc_id")
  }

  val mediaFramesSql: String =
    """SELECT doc_id,
      | CAST(1 + n_chars % 32 AS BIGINT) AS n_frames,
      | CAST(len(list_filter(range(0, 1 + n_chars % 32), i -> i % 4 = 0)) AS BIGINT) AS n_sampled,
      | list_filter(range(0, 1 + n_chars % 32), i -> i % 4 = 0)[1] AS first_frame,
      | list_filter(range(0, 1 + n_chars % 32), i -> i % 4 = 0)[-1] AS last_frame
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q153: media perceptual-hash near-dup purge ---------------------

  /** Hamming radius for media near-duplicates: a content perturbation
    * confined to one byte block flips at most 2 of the 63 dHash bits
    * (its two adjacent comparisons — MediaPhashSpec pins it), so 8
    * bits ≈ four perturbed regions. */
  private[queries] val PhashMaxHamming = 8

  /** Per-band bits of the 63-bit phash: 4 bands × 16 bits (band 3
    * carries 15) — a pair within [[PhashMaxHamming]] with ≤ 3 bands
    * perturbed collides on ≥ 1 intact band (the q31 SimHash banding
    * argument at the media grain).
    *
    * RECALL BOUND (ADVICE r15, deliberate): the candidate guarantee
    * holds ONLY for pairs whose flips touch ≤ 3 of the 4 bands; a
    * Hamming-≤8 pair whose flips spread across all 4 bands has no
    * intact band and is missed — the standard banded-LSH recall/cost
    * trade, pinned from both sides by MediaPhashSpec. The alternative
    * that makes the radius airtight — 9 bands × 7 bits — is rejected
    * for scale: 7-bit band values give only 128 buckets per band, so
    * candidate pairs grow ~n²/128 per band (≈ 5·10^10 at the 1.2 M-
    * payload corpus) versus n²/65536 here; dHash perturbations are
    * block-local (adjacent-bit flips, see [[PhashMaxHamming]]), so
    * real near-dups concentrate their flips in few bands and the
    * missed corner is the adversarial, not the organic, case. Both
    * the Spark path and the oracle share this banding, so the
    * certificate certifies the banded semantics, not the ideal
    * radius.
    *
    * COST CONTRACT (r17 verdict #2, re-derived): 16-bit band values
    * give each band a random-collision FLOOR of |A|·|B|/2¹⁶ pairs
    * (self-join: n²/2·2¹⁶) regardless of true dup density — at 10⁶
    * standing payloads a 10⁵ batch grinds ~6·10⁹ collision probes.
    * Since r18 the Hamming gate runs BEFORE any exchange, so that
    * floor is pure map-side xor+popcount (codegen'd, no shuffle, no
    * memory) and the only shuffled rows are TRUE near-dup pairs;
    * MediaPhashSpec pins both sides of the bound and the gate-order
    * equivalence. The floor still grows linearly in the standing
    * index for a fixed batch — the honest limit of exact-match
    * banding at Hamming 8/63, where every airtight-recall
    * alternative (9×7-bit bands: 128 buckets, n²/128 floor;
    * multi-index Hamming: 137 probe values per band) costs more at
    * this radius. A deployment that outgrows the popcount budget
    * re-digests at a wider hash (more band bits), not more bands. */
  private[queries] val PhashBands = 4

  /** The warehouse `media_digests` table rows: one 8-byte perceptual
    * hash per payload, computed over REAL decoded bytes (r15 verdict
    * #4): each payload is a genuine binary P5 PGM container
    * (`Media.pgmPayload` — header + raw pixel plane; the synthetic
    * fixture derives the plane from the doc's content bytes, a
    * production bucket scan supplies camera output), every row goes
    * through the REAL parser (`Media.decodePgm`: magic, whitespace-
    * tokenized dimensions, maxval validation, exact-length plane
    * extraction — malformed containers refuse loudly), and
    * [[graft.functions.BlockHash]] digests the DECODED plane. The
    * decode runs partition-local in bounded batches (the Media
    * mapPartitions discipline — map-only, payloads never leave the
    * executor that built them); the digest stays the one-plan-node
    * kernel. The oracle models the decoded plane (= the content
    * bytes, because encode∘decode is identity on well-formed
    * containers — MediaPhashSpec pins the round trip AND the
    * refusals), so certificates certify the digest-of-decoded-bytes
    * semantics end to end. Per-doc deterministic, so the warehouse
    * maintains the table as a pure hard-link leaf append (the
    * token_hashes discipline). */
  private[graft] def mediaDigestsOf(docs: DataFrame): DataFrame = {
    import graft.multimodal.Media
    val s = docs.sparkSession
    import s.implicits._
    val decoded = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(Media.DefaultBatchSize).flatMap(_.map { case (id, b) =>
          val img = Media.decodePgm(Media.pgmPayload(b))
          (id, img.pixels)
        })
      }
      .toDF("media_id", "pixels")
    decoded.select(col("media_id"),
      call_function("graft_blockhash", col("pixels")).as("phash"))
  }

  /** q153 — MEDIA-GRAIN near-dup purge (r14 verdict #4, the mandate's
    * thinnest leg deepened): perceptual block-hash digests from the
    * STORED warehouse (zero payload re-reads — the q120 audit
    * discipline), Hamming-banded candidate pairs (bands of the hash
    * collide ⇒ candidate — never all-pairs), exact Hamming ≤
    * [[PhashMaxHamming]] edges, connected components, keep-first
    * purge — the q92 chain at the media grain, with min media_id as
    * the canonical survivor (payload bytes carry no quality score).
    *
    * Scale: digests are 8 bytes/payload; the band self-join shuffles
    * (band, 16-bit value, id) rows and meets candidates per bucket;
    * Hamming is one xor+popcount per candidate; CC runs on the
    * candidate graph (≪ corpus). Payload bytes are touched exactly
    * once, at digest build — the purge never re-reads media. */
  def mediaPhashDedup(s: SparkSession, dir: String): DataFrame =
    mediaPhashDedupOf(Warehouse.stored(s, dir, "media_digests"))

  /** [[mediaPhashDedup]] over an explicit digest frame — the planted-
    * payload spec's seam. */
  private[queries] def mediaPhashDedupOf(dig: DataFrame): DataFrame =
    graft.operators.ConnectedComponents.run(mediaPhashEdges(dig))
      .select(col("id").as("media_id"), col("component").as("cluster_id"))
      .filter(col("media_id") =!= col("cluster_id"))
      .select(col("media_id"), col("cluster_id"),
        col("cluster_id").as("kept_media"))
      .orderBy("media_id")

  /** The Hamming-banded candidate/edge stage of the media purge
    * (src, dst pairs within [[PhashMaxHamming]]) — factored so the
    * plan pin can certify it corpus-free (the CC operator downstream
    * checkpoints its input, truncating the registered query's visible
    * lineage). */
  /** The 4×16-bit band rows of a digest frame — shared by the full
    * purge's self-join and the increment's probe join. */
  private def phashBands(dig: DataFrame): DataFrame =
    (0 until PhashBands).map(b =>
      dig.select(col("media_id"), col("phash"),
        lit(b).as("band"),
        shiftright(col("phash"), 16 * b).bitwiseAND(lit(65535L)).as("band_val")))
      .reduce(_ unionByName _)

  /** The media increment's popcount FLOOR, MEASURED (r18 verdict
    * #4): the number of band-collision probes (pre-gate join rows —
    * every one costs exactly one map-side xor+popcount) a batch pays
    * against a standing index. This is the quantity documented as
    * linear-in-standing-index at [[PhashBands]] (expected
    * ≈ true-dup band hits + |batch|·|standing|·4/2¹⁶ random
    * collisions); the corpus bench commits it per tier so the
    * floor's growth is tracked round over round instead of hiding
    * inside `task_sec`. Map-only probe + a count partial — no pair
    * materialization, no exchange beyond the count. */
  private[graft] def mediaProbeCountOf(batch: DataFrame,
      standing: DataFrame): Long =
    phashBands(standing)
      .join(broadcast(phashBands(batch)
        .select(col("media_id").as("new_id"), col("band"), col("band_val"))),
        Seq("band", "band_val"))
      .count()

  private[queries] def mediaPhashEdges(dig: DataFrame): DataFrame = {
    // Hamming gate BEFORE the dedup exchange (r17 verdict #2): both
    // hashes are already in the collision row, so the xor+popcount
    // runs where the join output is produced and only TRUE candidate
    // pairs reach the distinct's shuffle. Written explicitly — the
    // gate must not depend on Catalyst pushing a filter through the
    // aggregate. The 4×16-bit banding has a collision FLOOR of
    // ~|pairs|/2¹⁶ per band regardless of true dup density, so a
    // distinct over ungated collisions is O(n²/2¹⁶) exchange bytes;
    // gated, the exchange is O(true near-dups) and the floor costs
    // only map-side popcounts (codegen'd, embarrassingly parallel —
    // the documented contract of this banding, see [[PhashBands]]).
    val bands = phashBands(dig)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .filter(bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
        <= PhashMaxHamming)
      .select(col("a.media_id").as("src"), col("b.media_id").as("dst"))
      .distinct()
  }

  /** Oracle CTE chain re-deriving the digests from raw text — byte
    * values via hex() (engine-portable blob access), block of byte p
    * = (p·64 + 63) // n (the exact integer inverse of the kernel's
    * ⌊b·n/64⌋ boundaries — brute-verified over all n ≤ 400), 63
    * adjacent comparisons summed as bit weights. Ends in
    * `mph(media_id, phash)`. */
  private[queries] val mediaPhashCteSql: String =
    """mpb AS (
      |  SELECT doc_id, i - 1 AS p, n,
      |    (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16 +
      |    (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1) AS val
      |  FROM (SELECT doc_id, hex(encode(text)) AS h,
      |          CAST(octet_length(encode(text)) AS BIGINT) AS n
      |        FROM documents) md,
      |  LATERAL (SELECT unnest(generate_series(1, CAST(n AS INT))) AS i) r),
      |mps AS (
      |  SELECT doc_id, CAST((p * 64 + 63) // n AS INT) AS b,
      |    CAST(sum(val) AS BIGINT) AS s
      |  FROM mpb GROUP BY 1, 2),
      |mph AS (
      |  SELECT d.doc_id AS media_id,
      |    CAST(coalesce(sum(CASE WHEN coalesce(si.s, 0) > coalesce(sj.s, 0)
      |      THEN (CAST(1 AS BIGINT) << g.i) ELSE 0 END), 0) AS BIGINT) AS phash
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS i) g
      |  LEFT JOIN mps si ON si.doc_id = d.doc_id AND si.b = g.i
      |  LEFT JOIN mps sj ON sj.doc_id = d.doc_id AND sj.b = g.i + 1
      |  GROUP BY d.doc_id)""".stripMargin

  val mediaPhashDedupSql: String =
    s"""WITH RECURSIVE $mediaPhashCteSql,
       |mbs AS (
       |  SELECT media_id, phash, g.b AS band,
       |    (phash >> (16 * g.b)) & 65535 AS band_val
       |  FROM mph, (SELECT unnest(generate_series(0, ${PhashBands - 1})) AS b) g),
       |medge0 AS (
       |  SELECT DISTINCT a.media_id AS src, b.media_id AS dst
       |  FROM mbs a JOIN mbs b
       |    ON a.band = b.band AND a.band_val = b.band_val
       |    AND a.media_id < b.media_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= $PhashMaxHamming),
       |medges AS (
       |  SELECT src, dst FROM medge0
       |  UNION SELECT dst AS src, src AS dst FROM medge0),
       |mnodes AS (SELECT DISTINCT src AS id FROM medges),
       |mreach(id, r) AS (
       |  SELECT id, id FROM mnodes
       |  UNION
       |  SELECT e.dst, mreach.r FROM mreach JOIN medges e ON e.src = mreach.id),
       |mcomp AS (SELECT id AS media_id, min(r) AS cluster_id
       |          FROM mreach GROUP BY id)
       |SELECT media_id, cluster_id, cluster_id AS kept_media
       |FROM mcomp
       |WHERE media_id <> cluster_id
       |ORDER BY media_id""".stripMargin

  // ---- q161: INCREMENTAL media dedup (r15 verdict #4) ----------------

  /** The pinned daily slice: media ids ≡ [[MediaIncrRem]] (mod
    * [[MediaIncrMod]]) are "today's uploads". */
  private[queries] val MediaIncrMod = 10L
  private[queries] val MediaIncrRem = 6L

  /** q161 — INCREMENTAL media near-dup detection (the q113 discipline
    * at the media grain): a batch of newly-arrived payloads — REAL
    * PGM containers, digested through the real decode path
    * ([[mediaDigestsOf]]) — probes the STANDING `media_digests` store
    * for Hamming-≤[[PhashMaxHamming]] near-dups. The batch's 4-band
    * rows BROADCAST into the standing side's map-only band
    * projection and the Hamming gate fires before any exchange, so
    * the stored digests never shuffle, collision-floor probes stay
    * map-side, and the only shuffled rows are true near-dup pairs —
    * the corpus-bench media-increment row pins the O(true
    * candidates) shuffle shape (see [[PhashBands]] for the CPU
    * floor contract). One row per
    * (new payload, standing near-dup) pair; within-batch pairs are
    * deliberately out of scope (they are the batch's OWN q153 pass).
    * The oracle re-derives every digest from raw content bytes and
    * mirrors the split/band/Hamming algebra. */
  def mediaIncrement(s: SparkSession, dir: String): DataFrame = {
    val isNew = pmod(col("media_id"), lit(MediaIncrMod)) === lit(MediaIncrRem)
    val standing = Warehouse.stored(s, dir, "media_digests").filter(!isNew)
    val batch = mediaDigestsOf(Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(MediaIncrMod)) === lit(MediaIncrRem)))
    mediaIncrementOf(batch, standing)
  }

  /** The probe stage over explicit batch/standing digest frames —
    * the corpus bench's seam. */
  private[graft] def mediaIncrementOf(batch: DataFrame,
      standing: DataFrame): DataFrame = {
    val nb = phashBands(batch)
      .select(col("media_id").as("new_id"), col("phash").as("pn"),
        col("band"), col("band_val"))
    val sb = phashBands(standing)
    // Hamming gate BEFORE the dedup exchange (r17 verdict #2, the
    // [[mediaPhashEdges]] fix at the increment grain): the broadcast
    // join is map-only over the standing scan, so gating its output
    // in place keeps the whole collision floor (|batch|·|standing|/2¹⁶
    // pairs per band — measured 875 MB of exchange at the 1.2M-doc
    // tier when the distinct ran first) OUT of the shuffle; only true
    // near-dup pairs (O(planted dups), flat in index size) reach the
    // distinct. The floor itself degrades to map-side xor+popcount —
    // linear in the standing index for a fixed batch, pure codegen'd
    // CPU with no exchange, which IS this banding's documented scale
    // contract (see [[PhashBands]]: wider bands buy a lower floor
    // only by giving up the ≤3-perturbed-bands recall guarantee).
    sb.join(broadcast(nb), Seq("band", "band_val"))
      .filter(bit_count(col("pn").bitwiseXOR(col("phash")))
        <= PhashMaxHamming)
      .select(col("new_id").as("media_id"), col("media_id").as("dup_of"),
        bit_count(col("pn").bitwiseXOR(col("phash"))).cast("long")
          .as("hamming"))
      .distinct()
      .orderBy("media_id", "dup_of")
  }

  /** The split/band CTE chain shared by q161 (pair list) and q188
    * (per-payload verdict) — one rule text, two finals. */
  private def mediaIncrementCteSql: String =
    s"""$mediaPhashCteSql,
       |mnew AS (SELECT media_id, phash FROM mph
       |         WHERE media_id % $MediaIncrMod = $MediaIncrRem),
       |mstd AS (SELECT media_id, phash FROM mph
       |         WHERE media_id % $MediaIncrMod <> $MediaIncrRem),
       |mnb AS (
       |  SELECT media_id, phash, g.b AS band,
       |    (phash >> (16 * g.b)) & 65535 AS band_val
       |  FROM mnew, (SELECT unnest(generate_series(0, ${PhashBands - 1})) AS b) g),
       |msb AS (
       |  SELECT media_id, phash, g.b AS band,
       |    (phash >> (16 * g.b)) & 65535 AS band_val
       |  FROM mstd, (SELECT unnest(generate_series(0, ${PhashBands - 1})) AS b) g)""".stripMargin

  val mediaIncrementSql: String =
    s"""WITH $mediaIncrementCteSql
       |SELECT DISTINCT n.media_id AS media_id, s.media_id AS dup_of,
       |  CAST(bit_count(xor(n.phash, s.phash)) AS BIGINT) AS hamming
       |FROM mnb n JOIN msb s
       |  ON n.band = s.band AND n.band_val = s.band_val
       |WHERE bit_count(xor(n.phash, s.phash)) <= $PhashMaxHamming
       |ORDER BY media_id, dup_of""".stripMargin

  // ---- q188: media increment VERDICT (the O(batch) daily shape) -----

  /** q188 — the media increment's PRODUCTION-SHAPED output (r18):
    * one row per NEW payload that near-dups the standing index, with
    * its BEST standing match (min Hamming, ties to the smaller
    * media_id). The q161 pair list is the complete evidence set and
    * its shuffle is necessarily O(true pairs) — on a dup-saturated
    * corpus (the 1.2M-doc bench fixture carries 37.5M true
    * cross-boundary pairs) that is hundreds of MB of OUTPUT, not
    * overhead. A daily admission gate doesn't need the pair list: it
    * needs per-payload verdicts, and THIS form's per-new-id min fold
    * runs map-side combine over the gated broadcast-join output, so
    * the only exchange is O(|batch|) verdict rows at ANY true-dup
    * density — the flat-in-index-AND-in-dup-density daily shape the
    * corpus bench pins beside the pair form. */
  def mediaIncrementVerdict(s: SparkSession, dir: String): DataFrame = {
    val isNew = pmod(col("media_id"), lit(MediaIncrMod)) === lit(MediaIncrRem)
    val standing = Warehouse.stored(s, dir, "media_digests").filter(!isNew)
    val batch = mediaDigestsOf(Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(MediaIncrMod)) === lit(MediaIncrRem)))
    mediaIncrementVerdictOf(batch, standing)
  }

  /** The verdict stage over explicit frames — the corpus bench's
    * seam (the [[mediaIncrementOf]] discipline). */
  private[graft] def mediaIncrementVerdictOf(batch: DataFrame,
      standing: DataFrame): DataFrame = {
    val nb = phashBands(batch)
      .select(col("media_id").as("new_id"), col("phash").as("pn"),
        col("band"), col("band_val"))
    val sb = phashBands(standing)
    sb.join(broadcast(nb), Seq("band", "band_val"))
      .filter(bit_count(col("pn").bitwiseXOR(col("phash")))
        <= PhashMaxHamming)
      .select(col("new_id").as("media_id"),
        struct(
          bit_count(col("pn").bitwiseXOR(col("phash"))).cast("long")
            .as("hamming"),
          col("media_id").as("dup_of")).as("cand"))
      .groupBy(col("media_id"))
      .agg(min(col("cand")).as("best"))
      .select(col("media_id"), col("best.dup_of").as("dup_of"),
        col("best.hamming").as("hamming"))
      .orderBy("media_id")
  }

  val mediaIncrementVerdictSql: String =
    s"""WITH $mediaIncrementCteSql,
       |mgated AS (
       |  SELECT n.media_id AS media_id, s.media_id AS dup_of,
       |    CAST(bit_count(xor(n.phash, s.phash)) AS BIGINT) AS hamming
       |  FROM mnb n JOIN msb s
       |    ON n.band = s.band AND n.band_val = s.band_val
       |  WHERE bit_count(xor(n.phash, s.phash)) <= $PhashMaxHamming)
       |SELECT media_id, dup_of, hamming FROM (
       |  SELECT media_id, dup_of, hamming,
       |    row_number() OVER (PARTITION BY media_id
       |      ORDER BY hamming ASC, dup_of ASC) AS rn
       |  FROM mgated)
       |WHERE rn = 1
       |ORDER BY media_id""".stripMargin

  // ---- q54: corpus vocabulary (token frequency top-k) ----------------

  /** Global token-frequency top-100 — vocabulary building, the
    * corpus-analysis primitive behind tokenizer training and stopword
    * derivation. explode → count is ONE shuffle with full map-side
    * combine (partials carry ≤ |local vocab| rows, not |tokens|), and
    * the top-k compiles to TakeOrderedAndProject — at 100 TB the
    * exchange moves the vocabulary, never the token stream. Ties at
    * the cutoff are pinned by (count desc, token asc) on both sides. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(100)

  val vocabTopKSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY n DESC, token ASC
      |LIMIT 100""".stripMargin

  // ---- q55: TF-IDF top terms per document ----------------------------

  /** Top-3 characteristic terms per doc (docs 0–49) by a rational
    * TF-IDF: score = tf · n_docs / df. Deliberately log-free — libm
    * `log` is not correctly-rounded and can differ across engines by
    * an ulp, while integer products and one double division are
    * bit-reproducible. Document frequency comes from the FULL corpus
    * (distinct (doc, token) → count per token: one shuffle of the
    * distinct pairs); term frequency only from the target docs, so
    * that branch's scan prunes on doc_id. The df side of the join is
    * vocabulary-sized — broadcastable here, a shuffle join at corpus
    * scale (AQE decides). */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksOf = (d: DataFrame) =>
      d.select(col("doc_id"), explode(toks(col("text"))).as("token"))
    val docs = Tables.documents(s, dir)
    val tf = toksOf(docs.filter(col("doc_id") < 50))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toksOf(docs).distinct()
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("token"),
        col("tf"), col("df"), round(col("score"), 6).as("score"))
      .orderBy("doc_id", "rank")
  }

  val tfidfTopTermsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM toks WHERE doc_id < 50 GROUP BY doc_id, token),
      |dfreq AS (
      |  SELECT token, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
      |    CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.df AS score
      |  FROM tf JOIN dfreq USING (token), n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, token ASC) AS rn
      |  FROM scored)
      |SELECT doc_id, CAST(rn AS BIGINT) AS rank, token,
      |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |  round(score, 6) AS score
      |FROM ranked
      |WHERE rn <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ---- q79: count-min heavy hitters via mergeable per-slice sketches --

  /** q79 — the frequency-sketch reaggregation path, count-min edition
    * of q63's HLL contract: token-frequency sketches are built
    * INDEPENDENTLY per source slice (Spark's own codegen'd
    * `count_min_sketch` aggregate, map-side combined), unioned by
    * counter addition (`CountMin.union` — exact, so slice
    * reaggregation == one-pass sketch), and then certified against
    * the exact heavy hitters: for each of the top-10 tokens, the
    * estimate must never undershoot the true count
    * (`no_underestimate`, a structural count-min guarantee) and must
    * overshoot by at most eps·N (`within_eps`, the sketch's accuracy
    * contract at its confidence). Raw estimates never appear in the
    * row — like q63, only cross-engine-stable facts do, so DuckDB
    * oracles the exact counts and literal `true` flags.
    *
    * Confidence choice (ADVICE r10): the oracle hard-codes
    * `within_eps = true`, so the per-probe failure probability delta
    * must make the UNION over all certified rows negligible — at
    * confidence 0.999999 (delta 1e-6, sketch depth 20) the aggregate
    * flip probability across the 10 q79 + 5·|sources| q97 rows is
    * ≤ 4e-5 per fixture regeneration, vs ~4% at the old 0.999. The
    * cost is 2× sketch depth (~320 KB per slice), still a mergeable
    * blob, not a histogram.
    *
    * Scale: the token stream shuffles once for the exact top-k (the
    * certification side); the sketch side moves only one ~160 KB
    * blob per slice. At 100 TB one keeps ONLY the sketch side —
    * per-partition sketches unioned into rollups with no rescans —
    * and this query is the proof it answers within eps of exact. */
  def cmHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("token"))
    val sketch = tokens
      .groupBy(col("source"))
      .agg(expr("count_min_sketch(token, 0.001d, 0.999999d, 42)").as("sk"))
      .agg(graft.functions.CountMin.union(col("sk")).as("sk"))
    val totals = tokens.agg(count(lit(1)).as("n_total"))
    val top = tokens
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(10)
    // Two 1-row broadcast denominators (the q63/q55 shape, pinned in
    // PlanShapeSpec) carrying the merged sketch and the eps bound.
    val est = expr("graft_cm_estimate(sk, token)")
    top.crossJoin(sketch).crossJoin(totals)
      .select(
        col("token"), col("n"),
        (est >= col("n")).as("no_underestimate"),
        (est <= col("n") + ceil(lit(0.001) * col("n_total")).cast("long"))
          .as("within_eps"))
      .orderBy(col("n").desc, col("token").asc)
  }

  val cmHeavyHittersSql: String =
    """SELECT token, CAST(count(*) AS BIGINT) AS n,
      | true AS no_underestimate,
      | true AS within_eps
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY n DESC, token ASC
      |LIMIT 10""".stripMargin

  /** q97 — q79's frequency contract taken PER GROUP, completing the
    * per-group sketch surface (q82 did it for quantiles): one
    * count-min sketch per source, that group's top-5 tokens each
    * certified against the group's OWN sketch — never-underestimate
    * (structural) and within eps·N_group. This is the per-tenant
    * "what's trending" dashboard shape: at 100 TB each source slice
    * keeps a ~KB mergeable sketch instead of its token histogram, and
    * rollups across slices are counter sums (`CountMin.union`), not
    * rescans.
    *
    * Plan: one grouped sketch build (map-side partials) into a
    * ≤|sources|-row dim, exact per-(source, token) counts + one
    * ranked window for the candidates, then a broadcast equi-join of
    * candidates to their group's sketch — the per-row
    * `graft_cm_estimate` deserialization runs on the ≤5·|sources|-row
    * reporting frame only (the documented CountMin lookup contract),
    * never on corpus rows. */
  def cmHeavyHittersByGroup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("token"))
    val sketches = tokens
      .groupBy(col("source"))
      .agg(expr("count_min_sketch(token, 0.001d, 0.999999d, 42)").as("sk"),
        count(lit(1)).as("n_group"))
    val top = tokens
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("token").asc)))
      .filter(col("rk") <= 5)
      .drop("rk")
    val est = expr("graft_cm_estimate(sk, token)")
    top.join(broadcast(sketches), Seq("source"))
      .select(
        col("source"), col("token"), col("n"),
        (est >= col("n")).as("no_underestimate"),
        (est <= col("n") + ceil(lit(0.001) * col("n_group")).cast("long"))
          .as("within_eps"))
      .orderBy(col("source"), col("n").desc, col("token").asc)
  }

  val cmHeavyHittersByGroupSql: String =
    """WITH t AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS n
      |  FROM t GROUP BY source, token),
      |r AS (
      |  SELECT source, token, n,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n DESC, token ASC) AS rk
      |  FROM c)
      |SELECT source, token, n,
      |  true AS no_underestimate,
      |  true AS within_eps
      |FROM r WHERE rk <= 5
      |ORDER BY source, n DESC, token ASC""".stripMargin

  // ---- q112: BM25 retrieval top-k ------------------------------------

  /** The pinned retrieval query — three fixture-vocabulary terms. */
  private[queries] val Bm25Terms = Seq("vector", "stream", "window")
  private[queries] val Bm25K = 20

  /** q112 — BM25 lexical retrieval: score every document against a
    * fixed term query and return the top-[[Bm25K]]. The sparse
    * counterpart of the q29 dense cosine search — together they are
    * the two retrieval legs every RAG/eval stack runs. Okapi form with
    * k1 = 1.2, b = 0.75, and the RATIONAL idf variant
    * idf(t) = (N − df + 0.5)/(df + 0.5) — the classic idf without the
    * final log. The log is monotone, so per-term weights rank
    * identically; dropping it keeps every arithmetic step (+,−,×,÷ on
    * integer-derived doubles, identical expression grammar both
    * engines) BIT-IDENTICAL cross-engine, where `ln` would hostage
    * the top-k order to libm rounding differences (the q34/q45
    * portability discipline: never let a transcendental near the
    * oracle boundary).
    *
    * Scale shape: ONE corpus pass computes per-doc tf/dl map-side
    * (array `filter` on the split — no explode, no gram shuffle); the
    * corpus statistics the weights need (N, Σdl, per-term df) reduce
    * in ONE single-row aggregate that broadcasts back (the q55
    * denominator idiom); scoring is then map-only and the top-k is a
    * TakeOrderedAndProject heap-merge — at 100 TB: two scans, zero
    * wide shuffles, exactly how you'd BM25-score a corpus without an
    * inverted index. (With one, the scan narrows to posting lists;
    * the scoring algebra — and this oracle — stay the same.) */
  /** The UNROUNDED scored frame behind q112 — factored so the q118
    * hybrid fusion ranks on the same doubles the top-k selection
    * orders by (ranking on the display-rounded `bm25` could flip two
    * in-list docs whose scores round equal). */
  private[queries] def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .select(col("doc_id") +: size(col("w")).cast("long").as("dl") +:
        Bm25Terms.map(t =>
          size(filter(col("w"), x => x === lit(t))).cast("long")
            .as(s"tf_$t")): _*)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        Bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = Bm25Terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val idf = (col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl)))
    }.reduceLeft(_ + _)
    docs.join(broadcast(stats))
      .withColumn("s", score)
  }

  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25Scored(s, dir)
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(Bm25K)
      .select(col("doc_id") +: col("dl") +:
        (Bm25Terms.map(t => col(s"tf_$t")) :+
          round(col("s"), 6).as("bm25")): _*)

  /** Oracle mirror of [[bm25Scored]] — the CTE chain ending in
    * `<prefix>sc(doc_id, dl, tf_*, s)`, shared by the q112/q118/q146
    * oracles (CTE names d/t/st/sc are disjoint from the cosine chain's
    * e/q/scored so the q118 fusion can splice both). `prefix` and
    * `where` parameterize the population (the [[Dedup.bandsCteSqlFor]]
    * discipline) — q147 scores the corpus MINUS the purge list with
    * the SAME rule text, prefixed clear of the purge chain's t/sc. */
  private[queries] def bm25CteSqlFor(prefix: String = "",
      where: String = ""): String = {
    val (k1, b) = (1.2, 0.75)
    val tfCols = Bm25Terms.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n|    ")
    val dfCols = Bm25Terms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n|    ")
    val score = Bm25Terms.map { t =>
      s"""((n_docs - df_$t + 0.5) / (df_$t + 0.5))
         | * (CAST(tf_$t AS DOUBLE) * ${k1 + 1})
         | / (CAST(tf_$t AS DOUBLE) + $k1 * (1.0 - $b + $b * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(" + ")
    s"""${prefix}d AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents$where),
       |${prefix}t AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM ${prefix}d),
       |${prefix}st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfCols
       |  FROM ${prefix}t),
       |${prefix}sc AS (
       |  SELECT doc_id, dl, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")},
       |    $score AS s
       |  FROM ${prefix}t, ${prefix}st)""".stripMargin
  }

  private[queries] val bm25CteSql: String = bm25CteSqlFor()

  val bm25TopKSql: String =
    s"""WITH $bm25CteSql
       |SELECT doc_id, dl, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")},
       |  round(s, 6) AS bm25
       |FROM sc
       |ORDER BY s DESC, doc_id ASC
       |LIMIT $Bm25K""".stripMargin

  // ---- q125: per-source vocab drift (chi-square contributions) -------

  /** How many top-frequency terms span the drift matrix. */
  private[queries] val DriftTopTerms = 20

  /** q125 — vocabulary drift monitoring: the full source × top-term
    * chi-square contribution matrix. For the [[DriftTopTerms]] globally
    * most frequent tokens (count desc, token asc — total order), each
    * (source, term) cell carries its observed count, the expected
    * count under source/term independence e = (row·col)/grand, and
    * the χ² contribution (o−e)²/e — the per-cell decomposition a
    * corpus dashboard tracks across snapshots: a cell whose
    * contribution jumps is a source whose language shifted. Summing
    * the cells gives the classic contingency χ² statistic; keeping
    * them per-cell keeps the oracle exact and the diagnosis local.
    *
    * Exactness: every count is an exact integer; row·col stays in
    * int64 (≤ (corpus tokens)² ≪ 2⁶³ at any sf, and the cast to
    * double happens AFTER the exact long product, which stays below
    * 2⁵³ up to ~10⁸ tokens per margin — loud overflow beyond);
    * e and (o−e)²/e are then fixed-order elementary double ops —
    * deterministic in both engines; rounding is display-only.
    *
    * Scale shape: ONE map-side-combined aggregation over the token
    * stream to (source, token) counts; term totals, the top-k rank
    * and the dense matrix all run on the (sources × vocab) count
    * frame, never the corpus; the dense completion (sources ×
    * top-terms cross join, missing cells = 0 — a χ² without zeros
    * under-counts drift) is |sources|·k rows. */
  def vocabDriftChi2(s: SparkSession, dir: String): DataFrame = {
    // Two corpus passes, not three (review r12: grouping to
    // (source, token) first and deriving totals/top/sources from that
    // frame re-ran the explode+agg subplan three times — Catalyst does
    // not dedupe common subplans): pass 1 picks the top terms from a
    // global token count; pass 2 re-tokenizes but BROADCAST-SEMI-JOINS
    // the 20-term list before its aggregation, so only top-term rows
    // ever reach the second shuffle. Sources come from a separate
    // column-pruned scan (reads the dictionary-coded `source` column
    // only), keeping the dense completion independent of which terms
    // a source happens to contain.
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val top = tok.groupBy("token").agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("token").asc)
      .limit(DriftTopTerms)
    val st = tok.join(broadcast(top.select("token")), Seq("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("o"))
    val sources = Tables.documents(s, dir).select("source").distinct()
    val cells = sources.crossJoin(broadcast(top))
      .join(st, Seq("source", "token"), "left")
      .select(col("source"), col("token"), col("ct"),
        coalesce(col("o"), lit(0L)).as("o"))
    val wSrc = Window.partitionBy(col("source"))
    val wAll = Window.partitionBy()
    val e = (col("rs") * col("ct")).cast("double") / col("g")
    cells
      .withColumn("rs", sum(col("o")).over(wSrc))
      .withColumn("g", sum(col("o")).over(wAll))
      .select(col("source"), col("token"), col("o"),
        round(e, 6).as("expected"),
        // e = 0 only when a source holds none of the top terms (rs = 0,
        // so o = 0 too): zero contribution, pinned to dodge 0/0 = NaN.
        round(when(e === 0.0, lit(0.0))
          .otherwise((col("o").cast("double") - e) *
            (col("o").cast("double") - e) / e), 6).as("chi2_contrib"))
      .orderBy("source", "token")
  }

  val vocabDriftChi2Sql: String =
    s"""WITH tk AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |st AS (
       |  SELECT source, token, CAST(count(*) AS BIGINT) AS o
       |  FROM tk GROUP BY source, token),
       |top AS (
       |  SELECT token, ct FROM (
       |    SELECT token, CAST(sum(o) AS BIGINT) AS ct,
       |      row_number() OVER (ORDER BY sum(o) DESC, token ASC) AS trk
       |    FROM st GROUP BY token) WHERE trk <= $DriftTopTerms),
       |cells AS (
       |  SELECT sl.source, top.token, top.ct, COALESCE(st.o, 0) AS o
       |  FROM (SELECT DISTINCT source FROM st) sl
       |  CROSS JOIN top
       |  LEFT JOIN st ON st.source = sl.source AND st.token = top.token),
       |m AS (
       |  SELECT source, token, o, ct,
       |    CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS rs,
       |    CAST(sum(o) OVER () AS BIGINT) AS g
       |  FROM cells)
       |SELECT source, token, o,
       |  round(CAST(rs * ct AS DOUBLE) / g, 6) AS expected,
       |  round(CASE WHEN CAST(rs * ct AS DOUBLE) / g = 0 THEN 0.0
       |    ELSE (CAST(o AS DOUBLE) - CAST(rs * ct AS DOUBLE) / g)
       |      * (CAST(o AS DOUBLE) - CAST(rs * ct AS DOUBLE) / g)
       |      / (CAST(rs * ct AS DOUBLE) / g) END, 6) AS chi2_contrib
       |FROM m
       |ORDER BY source, token""".stripMargin

  // ---- q131: per-source quality rank normalization -------------------

  /** q131 — QUALITY NORMALIZATION: the q37 score re-expressed as an
    * exact within-source percentile. Raw quality scores are not
    * comparable across sources (a mediocre doc from a clean feed can
    * outscore a good doc from a noisy crawl on absolute features), so
    * every mixture/filter decision that crosses sources — q67, q77,
    * q90, q127 — properly runs on the RANK, not the score. Per doc:
    * its rank within its source (quality desc, doc_id — total order)
    * and the exact-ppm percentile `((rk−1)·10⁶) div (n−1)` (0 = best,
    * 10⁶ = worst; single-doc sources pin to 0 rather than divide by
    * zero). Integer arithmetic end to end — no float percentile near
    * the oracle.
    *
    * Scale: ONE source-keyed window over map-only scored rows — the
    * partition key is the stratum, exactly how the corpus is already
    * laid out for every per-source stage; no global sort anywhere. */
  def qualityNormalize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(qualityScore(s, dir).select(col("doc_id"), col("quality_score")),
        Seq("doc_id"))
      .withColumn("src_rank", row_number().over(bySrc).cast("long"))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("src_rank"),
        when(col("n_src") === 1L, lit(0L))
          .otherwise(expr("((src_rank - 1) * 1000000) div (n_src - 1)"))
          .as("pct_ppm"))
      .orderBy("doc_id")
  }

  /** The q131 AT-SCALE form (r13 verdict #4): per-source decile
    * buckets from sketch edges instead of the exact per-source rank
    * percentile — one mergeable-sketch aggregation to |sources| edge
    * rows + a map-only bucket assignment, no per-source sort of the
    * corpus. Not registered (the exact form is the oracle contract);
    * `DecileSwapSpec` certifies bucket agreement with the exact
    * percentile's decile. */
  def qualityNormalizeAtScale(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(qualityScore(s, dir).select(col("doc_id"), col("quality_score")),
        Seq("doc_id"))
    Deciles.withApproxDescDecileBy(scored, "source", "quality_score")
      .select("doc_id", "source", "quality_score", "decile")
  }

  val qualityNormalizeSql: String =
    s"""WITH $qualityCteSql,
       |sc AS (SELECT doc_id, $qualityScoreExprSql AS quality_score FROM q),
       |r AS (
       |  SELECT d.doc_id, d.source, sc.quality_score,
       |    row_number() OVER (PARTITION BY d.source
       |                       ORDER BY sc.quality_score DESC, d.doc_id ASC)
       |      AS src_rank,
       |    count(*) OVER (PARTITION BY d.source) AS n_src
       |  FROM documents d JOIN sc USING (doc_id))
       |SELECT doc_id, source, quality_score,
       |  CAST(src_rank AS BIGINT) AS src_rank,
       |  CAST(CASE WHEN n_src = 1 THEN 0
       |    ELSE ((src_rank - 1) * 1000000) // (n_src - 1) END AS BIGINT) AS pct_ppm
       |FROM r
       |ORDER BY doc_id""".stripMargin
}
