package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication operators for the training-data pipeline (builder
  * mandate; SURVEY.md §7.4.9): exact, normalized, n-gram Jaccard and
  * MinHash — each expressed with codegen'd built-ins so the DuckDB
  * oracle can verify it exactly.
  *
  * Scale notes (100 TB):
  *  - Exact/normalized dedup is a hash aggregation on a digest — one
  *    shuffle of (16-byte hash, id), never the document bodies.
  *  - MinHash signatures are computed scan-side (map-only); the LSH
  *    band join shuffles only (band_hash, doc_id) pairs, turning the
  *    O(n²) similarity problem into per-bucket candidate groups.
  *  - The pairwise-Jaccard query is intentionally linear (consecutive
  *    ids) as the oracle-checkable kernel; all-pairs at scale goes
  *    through the band join (q28) instead, never a cross join.
  */
object Dedup {

  /** Portable token hash: first 15 hex digits of md5 → int in [0, p).
    * Identical bits in Spark (`conv`) and DuckDB (hex cast). HOF
    * reference form — production paths use the native
    * `graft_token_hashes` kernel (bit-identical, HashExprsSpec). */
  private val P = 2147483647L // 2^31 - 1, Mersenne prime
  private[graft] def tokenHash(t: Column): Column =
    (conv(substring(md5(t), 1, 15), 16, 10).cast("long") % P)

  /** (a_i, b_i) for the k=8 universal-hash family (a*h + b) mod p. */
  private[queries] val HashParams: Seq[(Long, Long)] = Seq(
    (1299721L, 104729L), (15485863L, 1299709L), (32452843L, 15485867L),
    (49979687L, 32452867L), (67867967L, 49979693L), (86028121L, 67867979L),
    (104395301L, 86028157L), (122949823L, 122949829L))

  /** Exact dedup: group identical bodies by md5, keep the smallest id as
    * canonical (SURVEY mandate "exact (hash-groupBy)"). */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .orderBy("canonical_id")

  val exactDedupSql: String =
    """SELECT md5(text) AS text_hash,
      | count(*) AS n_copies,
      | min(doc_id) AS canonical_id
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY canonical_id""".stripMargin

  /** Normalized dedup: case-fold + collapse non-alphanumerics before
    * hashing (near-dup via canonicalization). */
  private def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  def normalizedDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(normalized(col("text"))).as("norm_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .orderBy("canonical_id")

  val normalizedDedupSql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash,
      | count(*) AS n_copies,
      | min(doc_id) AS canonical_id
      |FROM documents
      |GROUP BY 1
      |ORDER BY canonical_id""".stripMargin

  /** 60-bit portable gram hash (md5 prefix), identical in DuckDB via
    * `('0x' || substr(md5(g),1,15))::BIGINT`. Hashing shingles to longs
    * before the join keeps document text out of the shuffle: at 100 TB
    * the join exchanges 8-byte longs, not string n-grams. */
  private def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** Distinct hashed word 3-grams of a pre-split word-array column —
    * the native single-pass kernel (`graft.functions.HashedTriGrams`;
    * HashExprsSpec asserts bit-identity with the HOF form below). The
    * HOF version needed `words` materialized (lambda-captured columns
    * re-evaluate per element) and a short-text guard (Spark's
    * `sequence(1, 0)` is DESCENDING, not empty); the kernel digests
    * each shingle straight to its 60-bit long with no hex/`conv`
    * round-trip and no intermediate gram array. */
  private def hashedTriGrams(words: Column): Column =
    call_function("graft_tri_grams", words)

  /** HOF reference form of `hashedTriGrams` (executable spec). */
  private[graft] def hashedTriGramsHof(words: Column): Column =
    when(size(words) >= 3,
      array_distinct(transform(
        sequence(lit(1), size(words) - 2),
        i => gramHash(concat_ws(" ",
          element_at(words, i), element_at(words, i + 1), element_at(words, i + 2))))))
      .otherwise(array().cast("array<long>"))

  /** n-gram Jaccard similarity over consecutive doc pairs — the
    * oracle-checkable kernel of shingle-based near-dup detection.
    *
    * A self-join of the gram subplan would make Catalyst scan + shingle
    * the documents table TWICE (it does not dedupe common subplans — the
    * round-2 plan showed two `documents` FileScans). Instead each doc
    * emits its grams to both pair keys it participates in
    * (posexplode of [key=id, key=id-1]) and ONE hash aggregation
    * reassembles the 2-element pair groups: one scan, one shuffle.
    * `first(..., ignoreNulls)` is deterministic here — each pair key
    * receives exactly one side-0 and at most one side-1 row. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), hashedTriGrams(col("w")).as("grams"))
    val sides = g
      .select(posexplode(array(
        struct(col("doc_id").as("k"), col("grams")),
        struct((col("doc_id") - 1).as("k"), col("grams")))).as(Seq("side", "e")))
      .select(col("side"), col("e.k").as("pair_id"), col("e.grams").as("grams"))
    sides.groupBy(col("pair_id"))
      .agg(
        first(when(col("side") === 0, col("grams")), ignoreNulls = true).as("ga"),
        first(when(col("side") === 1, col("grams")), ignoreNulls = true).as("gb"))
      .filter(col("ga").isNotNull && col("gb").isNotNull)
      .withColumn("n_inter",
        call_function("graft_inter_size", col("ga"), col("gb")))
      .select(
        col("pair_id").as("doc_a"),
        (col("pair_id") + 1).as("doc_b"),
        col("n_inter"),
        round(col("n_inter").cast("double") /
          (size(col("ga")) + size(col("gb")) - col("n_inter")), 6)
          .as("jaccard"))
      .orderBy("doc_a")
  }

  val ngramJaccardSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
      |      i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT)) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_inter,
      |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
      |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
      |ORDER BY doc_a""".stripMargin

  /** q89 — cross-document repeated shingles: the candidate generator
    * for EXACT-substring deduplication (the "same span appears in many
    * documents" detector — boilerplate headers, license blocks,
    * templated spam — the class of duplication MinHash whole-doc
    * similarity under-weights because the shared span is a small part
    * of each doc). Every doc emits its distinct hashed word 3-grams
    * (the portable md5 shingle kernel q26 certifies); grams held by
    * ≥ 2 docs surface with their document frequency, top-50 by
    * (doc_freq DESC, gram ASC — total tie-break).
    *
    * Scale shape: the only shuffle moves 8-byte gram hashes with
    * map-side combine (never text), and the top-k is
    * TakeOrderedAndProject — per-partition heaps, no global sort. At
    * 100 TB this is the first pass of suffix-style substring dedup:
    * flagged grams are the anchor spans a second, targeted pass
    * expands; the all-pairs alternative is quadratic and never runs. */
  def sharedShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(hashedTriGrams(split(col("text"), " "))).as("gram"))
      .groupBy(col("gram"))
      // Distinct-per-doc grams make count(*) the document frequency.
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("gram").asc)
      .limit(50)

  val sharedShinglesSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
      |      i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT))) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      |SELECT gram, count(*) AS n_docs
      |FROM g
      |GROUP BY gram
      |HAVING count(*) >= 2
      |ORDER BY n_docs DESC, gram ASC
      |LIMIT 50""".stripMargin

  /** (doc_id, hs) — the DISTINCT token-hash SET of each document.
    * `graft_token_hashes` maps distinct tokens mod P = 2³¹−1, so two
    * distinct tokens can collide and leave duplicate hashes in the
    * array; every Jaccard consumer (q113/q120/q122/q124) divides by
    * |A|+|B|−|A∩B| where the intersect is set-valued, so a duplicate
    * would inflate the union (ADVICE r12). `array_distinct` here makes
    * `hs` a true set once, for all consumers — and is a no-op for the
    * MinHash path (min over duplicates is unchanged). Oracle mirror:
    * the `list_distinct` in [[bandsCteSql]]'s `t` CTE. */
  private[graft] def tokenHashSetOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokenHashSetCol(col("text")).as("hs"))

  /** The token-hash-set COLUMN expression behind [[tokenHashSetOf]] —
    * factored (r17) so the speed layer's quality gate scores incoming
    * text with the exact feature definition the stored `token_hashes`
    * table was built from. */
  private[graft] def tokenHashSetCol(text: Column): Column =
    array_distinct(call_function("graft_token_hashes",
      array_distinct(split(text, " ")), lit(P)))

  private[queries] def tokenHashSet(s: SparkSession, dir: String): DataFrame =
    tokenHashSetOf(Tables.documents(s, dir))

  /** Per-doc k=8 MinHash signature over distinct word tokens, using the
    * portable md5-based token hash so the oracle reproduces every bit.
    * Frame-based so the index build (full corpus) and the incremental
    * path (new batch only) share one signature definition. */
  /** k=8 MinHash signatures from a (doc_id, hs) token-hash-set frame —
    * the step `Warehouse.build` applies to its STORED `token_hashes`
    * table (each warehouse stage reads the previous stage's table). */
  private[queries] def sigsFromHs(hs: DataFrame): DataFrame = {
    val sigs = HashParams.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % P))
        .as(s"sig_$i")
    }
    hs.select(col("doc_id") +: sigs: _*)
  }

  private[queries] def signaturesOf(docs: DataFrame): DataFrame =
    sigsFromHs(tokenHashSetOf(docs))

  private[queries] def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesOf(Tables.documents(s, dir))

  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    signatures(s, dir).orderBy("doc_id")

  val minhashSignaturesSql: String = {
    val sigCols = HashParams.zipWithIndex.map { case ((a, b), i) =>
      s" list_min(list_transform(hs, h -> ($a * h + $b) % 2147483647)) AS sig_$i"
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(list_distinct(string_split(text, ' ')),
       |      tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647)) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |$sigCols
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  /** (doc_id, band, band_hash) — both band hashes of the k=8 signature
    * (2 bands × 4 rows) in ONE array + posexplode: a single pass over
    * the signature subplan (a unionAll(sig, sig) would make Catalyst
    * compute — and scan — the signature subplan twice; it does not
    * dedupe common subplans). */
  private[queries] def bandFrameOfSigs(sigs: DataFrame): DataFrame = {
    def bandHash(cols: Seq[String]): Column =
      md5(concat_ws(",", cols.map(c => col(c).cast("string")): _*))
    sigs
      .select(col("doc_id"), posexplode(array(
        bandHash(Seq("sig_0", "sig_1", "sig_2", "sig_3")),
        bandHash(Seq("sig_4", "sig_5", "sig_6", "sig_7")))).as(Seq("band", "band_hash")))
      .select(col("doc_id"), col("band").cast("long").as("band"), col("band_hash"))
  }

  private[queries] def bandFrame(s: SparkSession, dir: String): DataFrame =
    bandFrameOfSigs(signatures(s, dir))

  /** LSH banding over the MinHash signature (2 bands × 4 rows): docs
    * sharing a band hash are near-dup candidates. Reports candidate
    * buckets with >1 member — the scale path for all-pairs dedup. */
  def minhashBands(s: SparkSession, dir: String): DataFrame =
    bandFrame(s, dir)
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("band", "band_hash")

  /** The t/s/bands CTE chain (DuckDB form of `bandFrame`), shared by
    * the q28 and q49 oracles. Parameterized (r14) over a CTE-name
    * `prefix` and a documents `where` clause so one statement can
    * instantiate the chain over TWO document populations (q143 diffs
    * the purge chain with and without the merged batch) — one rule
    * text, every instantiation spliced from it. */
  /** Oracle mirror of [[tokenHashSetOf]] alone — the `t` CTE text,
    * factored (r17) so the q181 model-quality scorer's oracle reads
    * the SAME token-hash-set rule the dedup chain does. */
  private[queries] def tokenSetCteSqlFor(prefix: String = "",
      where: String = ""): String =
    s"""${prefix}t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(list_distinct(string_split(text, ' ')),
       |      tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647)) AS hs
       |  FROM documents$where)""".stripMargin

  private[queries] def bandsCteSqlFor(prefix: String = "",
      where: String = ""): String = {
    def band(cols: Seq[Int]): String =
      "md5(" + cols.map(i => s"sig_$i::VARCHAR").mkString(" || ',' || ") + ")"
    s"""${tokenSetCteSqlFor(prefix, where)},
       |${prefix}sg AS (
       |  SELECT doc_id,
       |${HashParams.zipWithIndex.map { case ((a, b), i) =>
            s"    list_min(list_transform(hs, h -> ($a * h + $b) % 2147483647)) AS sig_$i"
          }.mkString(",\n")}
       |  FROM ${prefix}t),
       |${prefix}bands AS (
       |  SELECT doc_id, ${band(Seq(0, 1, 2, 3))} AS band_hash, CAST(0 AS BIGINT) AS band FROM ${prefix}sg
       |  UNION ALL
       |  SELECT doc_id, ${band(Seq(4, 5, 6, 7))} AS band_hash, CAST(1 AS BIGINT) AS band FROM ${prefix}sg)""".stripMargin
  }

  private[queries] val bandsCteSql: String = bandsCteSqlFor()

  val minhashBandsSql: String =
    s"""WITH $bandsCteSql
       |SELECT band, band_hash, count(*) AS n_docs, min(doc_id) AS min_doc
       |FROM bands
       |GROUP BY band, band_hash
       |HAVING count(*) > 1
       |ORDER BY band, band_hash""".stripMargin

  /** q49: duplicate CLUSTERS from the LSH candidate graph — the step
    * the pair-level queries stop short of. Each multi-member band
    * bucket contributes star edges (member → bucket-min via a window
    * min: one shuffle, no collect_list buffering), and
    * `graft.operators.ConnectedComponents` min-label-propagates them
    * into transitive duplicate groups (A~B, B~C ⇒ {A,B,C} even when
    * A and C never share a bucket). Output: every clustered doc with
    * its canonical id (cluster min) and cluster size — at 100 TB,
    * "keep doc_id == cluster_id" IS the dedup retention rule. */
  /** Shared q49/q92 clustering: LSH band roots → candidate edges →
    * min-label components, one (doc_id, cluster_id) row per doc
    * incident to a candidate edge. The Scala mirror of `ccCompCteSql`
    * — factored for the same reason: the clustering definition must
    * not be able to drift between the cluster query and the purge
    * query. */
  /** The LSH candidate EDGE set (member → bucket-min root, distinct)
    * — the exact edges the q49 clustering propagates, factored so the
    * q120 estimator audit certifies the same pairs the pipeline acts
    * on. Star edges bound fan-out at O(bucket size), never the
    * O(df²) all-pairs blowup. */
  private[queries] def candidateEdgesFrom(bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band"), col("band_hash"))
    bands
      .select(col("doc_id"), min(col("doc_id")).over(w).as("root"))
      .filter(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("src"), col("root").as("dst"))
      .distinct()
  }

  private[queries] def candidateEdges(s: SparkSession, dir: String): DataFrame =
    candidateEdgesFrom(bandFrame(s, dir))

  private[queries] def componentFrame(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.run(candidateEdges(s, dir))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))

  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    componentFrame(s, dir)
      .withColumn("n_cluster",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy("doc_id")
  }

  /** The q49 connected-components CTE chain (band roots → symmetric
    * edges → recursive reachability → min-label components), shared
    * by the q49 and q92 oracles so the clustering definition cannot
    * drift between them. Expects `bands` in scope. */
  /** Oracle mirror of [[candidateEdges]] (expects `bands` in scope;
    * yields `e0(src, dst)` with dst = bucket-min root < src), shared
    * by the q49/q92 component chain and the q120 estimator audit. */
  private[queries] def candidateEdgesCteSqlFor(prefix: String = ""): String =
    s"""${prefix}roots AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY band, band_hash) AS root
      |  FROM ${prefix}bands),
      |${prefix}e0 AS (
      |  SELECT DISTINCT doc_id AS src, root AS dst FROM ${prefix}roots WHERE doc_id <> root)""".stripMargin

  private[queries] val candidateEdgesCteSql: String = candidateEdgesCteSqlFor()

  /** The q49 component chain, prefix-parameterized like
    * [[bandsCteSqlFor]] so q143 can run the clustering over two
    * document populations in one statement. */
  private[queries] def ccCompCteSqlFor(prefix: String = ""): String =
    s"""${candidateEdgesCteSqlFor(prefix)},
      |${prefix}edges AS (
      |  SELECT src, dst FROM ${prefix}e0 UNION SELECT dst AS src, src AS dst FROM ${prefix}e0),
      |${prefix}nodes AS (SELECT DISTINCT src AS id FROM ${prefix}edges),
      |${prefix}reach(id, r) AS (
      |  SELECT id, id FROM ${prefix}nodes
      |  UNION
      |  SELECT e.dst, ${prefix}reach.r FROM ${prefix}reach JOIN ${prefix}edges e ON e.src = ${prefix}reach.id),
      |${prefix}comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM ${prefix}reach GROUP BY id)""".stripMargin

  private[queries] val ccCompCteSql: String = ccCompCteSqlFor()

  val dupClustersSql: String =
    s"""WITH RECURSIVE $bandsCteSql,
       |$ccCompCteSql
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS n_cluster
       |FROM comp
       |ORDER BY doc_id""".stripMargin

  /** q92 — the ACTIONABLE end of the dedup chain: candidates (q28
    * bands) → clusters (q49 components) → THIS, the purge list. Per
    * cluster the canonical survivor is the highest-quality member
    * (q37 score, 6-dp-rounded so cross-engine exact; ties broken by
    * min doc_id — a total order), and every other member is emitted
    * as (doc_id, cluster_id, kept_doc) — exactly the delete set a
    * curation pipeline applies, with the provenance a data audit
    * needs (which doc shadowed it). Singleton docs (no candidate
    * edge) never appear: they survive trivially.
    *
    * Plan: the component frame (already O(candidate docs), not
    * O(corpus)) joins quality scores on doc_id, then ONE window pass
    * per cluster computes rank and keeper together (`first_value`
    * over the same ordering — no keeper self-join). */
  /** The ONE purge rule, shared by doc-grain q92 and chunk-grain q108
    * (review r12: the window logic was copy-pasted in four places —
    * a tie-break or rounding change applied to one grain would have
    * silently diverged the other): given ANY (doc_id, cluster_id)
    * component frame, the highest-quality member survives (q37 score,
    * ties by min doc_id — a total order) and every other member emits
    * (doc_id, cluster_id, kept_doc). */
  private[queries] def purgeFrom(s: SparkSession, dir: String,
      comp: DataFrame): DataFrame =
    purgeFromWith(comp, TextOps.qualityScore(s, dir)
      .select(col("doc_id"), col("quality_score")))

  /** [[purgeFrom]] against an EXPLICIT quality frame — the form the
    * warehouse build uses with its own `doc_stats` table, so the
    * stored purge list is derived from the stored quality column. */
  private[queries] def purgeFromWith(comp: DataFrame,
      quality: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQuality = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    comp.join(quality, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"),
        row_number().over(byQuality).as("rk"),
        first(col("doc_id")).over(
          byQuality.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("kept_doc"))
      .filter(col("rk") > 1)
      .select(col("doc_id"), col("cluster_id"), col("kept_doc"))
      .orderBy("doc_id")
  }

  /** Oracle mirror of [[purgeFrom]] as a CTE block ending in
    * `pg(doc_id, cluster_id, kept_doc)` over a component CTE named
    * `compCte(doc_id, cluster_id)` — factored from [[purgeTailSql]] so
    * queries that CONSUME the purge list (q122's audit) share the
    * same rule text as the queries that emit it (q92/q108). */
  /** The quality-score CTE pair (`q`, `sc`) the purge rank consumes —
    * factored out of [[purgeCteSql]] so a statement instantiating the
    * purge rule at BOTH grains (q136's curation summary) includes the
    * quality computation exactly once. */
  private[queries] val qualityScCteSql: String =
    s"""${TextOps.qualityCteSql},
       |sc AS (SELECT doc_id, ${TextOps.qualityScoreExprSql} AS quality_score FROM q)""".stripMargin

  /** The rank-and-keep block of [[purgeFromWith]] over a component CTE
    * (expects `sc` in scope; yields `<prefix>pg(doc_id, cluster_id,
    * kept_doc)`). `prefix` disambiguates multiple instantiations in
    * one statement. */
  private[queries] def purgeRankCteSql(compCte: String,
      prefix: String = ""): String =
    s"""${prefix}r AS (
       |  SELECT c.doc_id, c.cluster_id,
       |    row_number() OVER ${prefix}win AS rk,
       |    first_value(c.doc_id) OVER ${prefix}win AS kept_doc
       |  FROM $compCte c JOIN sc USING (doc_id)
       |  WINDOW ${prefix}win AS (PARTITION BY c.cluster_id
       |                 ORDER BY sc.quality_score DESC, c.doc_id ASC)),
       |${prefix}pg AS (SELECT doc_id, cluster_id, kept_doc FROM ${prefix}r WHERE rk > 1)""".stripMargin

  private[queries] def purgeCteSql(compCte: String): String =
    s"""$qualityScCteSql,
       |${purgeRankCteSql(compCte)}""".stripMargin

  /** Oracle mirror of [[purgeFrom]]: the purge CTE block plus the final
    * SELECT — the q92/q108 oracle tail. */
  private def purgeTailSql(compCte: String): String =
    s"""${purgeCteSql(compCte)}
       |SELECT doc_id, cluster_id, kept_doc
       |FROM pg
       |ORDER BY doc_id""".stripMargin

  def dedupPurge(s: SparkSession, dir: String): DataFrame =
    purgeFrom(s, dir, componentFrame(s, dir))

  val dedupPurgeSql: String =
    s"""WITH RECURSIVE $bandsCteSql,
       |$ccCompCteSql,
       |${purgeTailSql("comp")}""".stripMargin

  /** Chunks held by more docs than this are boilerplate (license
    * blocks, templated headers), not duplication evidence: they would
    * expand to O(df²) candidate pairs while saying nothing about any
    * single pair. Same stop-shingle discipline the banded MinHash path
    * applies; the cap bounds per-digest pair fan-out at df²=4096. */
  private[queries] val MaxChunkDf = 64

  /** q102 — chunk-grain deduplication: doc pairs sharing ≥ 50% of
    * their chunks (containment over the SMALLER doc, so a short doc
    * wholly embedded in a long one still scores 1.0 — exactly the
    * partial-overlap class whole-doc MinHash (q27/q28) under-weights
    * because the shared span is diluted in the longer doc's
    * signature). Consumes the q100 chunking contract: same 200-char /
    * 150-stride windows, same md5 digests, via the shared
    * [[PipelineOps.chunkedDocs]] fan-out.
    *
    * The ≥50% threshold is evaluated in EXACT integer arithmetic
    * (`2·n_shared ≥ min(nₐ, n_b)`) so both engines agree bit-for-bit;
    * the fractional `containment` column is display-rounded output,
    * never a predicate.
    *
    * Scale shape: candidates come from grouping on the 16-byte digest
    * (the q28 band idiom at chunk grain) — never an all-pairs join.
    * Digests with df > [[MaxChunkDf]] are dropped before pair
    * expansion, bounding each group's fan-out; the only shuffled
    * payloads are (digest, doc_id) then ((doc_a, doc_b), count) — the
    * chunk text never leaves its scan stage. Per-doc chunk counts join
    * on doc_id AFTER pair aggregation, i.e. on the (small) candidate
    * set, not the corpus. */
  /** ALL co-chunk candidate pairs with both docs' chunk counts — the
    * un-thresholded base the whole chunk-grain chain (q102 pairs,
    * q105 clusters, q107 curve, q108 purge) shares: one pair
    * definition, zero drift (the `componentFrame` discipline). */
  /** The distinct (doc_id, chunk_md5) digest set — what the chunk
    * chain actually indexes (and what `Warehouse.build` persists as
    * the `chunk_digests` table: 16-byte digests, never chunk text). */
  private[queries] def chunkDigests(s: SparkSession, dir: String): DataFrame =
    chunkDigestsOf(Tables.documents(s, dir))

  /** [[chunkDigests]] over an explicit docs frame — the seam the
    * warehouse merge path uses to digest ONLY the incoming batch. */
  private[queries] def chunkDigestsOf(docs: DataFrame): DataFrame =
    PipelineOps.chunkedDocsOf(docs)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_md5"))
      .distinct()

  private[queries] def allChunkPairsFrom(chunks: DataFrame): DataFrame = {
    val sizes = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val pairs = chunks
      .groupBy("chunk_md5")
      .agg(collect_set(col("doc_id")).as("docs"))
      .filter(size(col("docs")).between(2, MaxChunkDf))
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("n_chunks").as("n_chunks_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("n_chunks").as("n_chunks_b")), Seq("doc_b"))
  }

  private[queries] def allChunkPairs(s: SparkSession, dir: String): DataFrame =
    allChunkPairsFrom(chunkDigests(s, dir))

  /** The ≥ 50% containment threshold (exact integer predicate) over
    * [[allChunkPairsFrom]] — the q102/q105/q108 qualifying frame. */
  private[queries] def chunkPairFrameFrom(chunks: DataFrame): DataFrame =
    allChunkPairsFrom(chunks)
      .filter(col("n_shared") * 2 >= least(col("n_chunks_a"), col("n_chunks_b")))

  private def chunkPairFrame(s: SparkSession, dir: String): DataFrame =
    chunkPairFrameFrom(chunkDigests(s, dir))

  def chunkDedup(s: SparkSession, dir: String): DataFrame =
    chunkPairFrame(s, dir)
      .select(
        col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_chunks_a"), col("n_chunks_b"),
        round(col("n_shared").cast("double") /
          least(col("n_chunks_a"), col("n_chunks_b")), 6).as("containment"))
      .orderBy("doc_a", "doc_b")

  /** Oracle mirror of [[chunkPairFrame]] — CTE chain ending in
    * `ap` (all pairs) and its thresholded `cp`, shared by the q102,
    * q105, q107 and q108 SQL — change the chain's shape only with all
    * four oracles in view. */
  private[queries] val chunkPairCteSql: String =
    s"""${PipelineOps.chunkCteSql},
      |dd AS (SELECT DISTINCT doc_id, md5(chunk) AS chunk_md5 FROM x),
      |sz AS (SELECT doc_id, count(*) AS n_chunks FROM dd GROUP BY doc_id),
      |grp AS (
      |  SELECT chunk_md5 FROM dd GROUP BY chunk_md5
      |  HAVING count(*) BETWEEN 2 AND $MaxChunkDf),
      |pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      |  FROM dd a
      |  JOIN grp g ON g.chunk_md5 = a.chunk_md5
      |  JOIN dd b ON b.chunk_md5 = a.chunk_md5 AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |ap AS (
      |  SELECT p.doc_a, p.doc_b, p.n_shared,
      |    sa.n_chunks AS n_chunks_a, sb.n_chunks AS n_chunks_b
      |  FROM pr p
      |  JOIN sz sa ON sa.doc_id = p.doc_a
      |  JOIN sz sb ON sb.doc_id = p.doc_b),
      |cp AS (
      |  SELECT * FROM ap
      |  WHERE n_shared * 2 >= least(n_chunks_a, n_chunks_b))""".stripMargin

  val chunkDedupSql: String =
    s"""WITH $chunkPairCteSql
      |SELECT doc_a, doc_b, n_shared, n_chunks_a, n_chunks_b,
      |  round(CAST(n_shared AS DOUBLE)
      |    / least(n_chunks_a, n_chunks_b), 6) AS containment
      |FROM cp
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q105 — chunk-grain duplicate CLUSTERS: the q102 pairs closed
    * under transitivity by the same min-label
    * [[graft.operators.ConnectedComponents]] loop the doc-grain chain
    * uses (A shares half its chunks with B, B with C ⇒ {A,B,C} is one
    * provenance group even when A and C overlap below threshold).
    * Output matches the q49 contract — every clustered doc with its
    * canonical id (cluster min) and cluster size — so downstream
    * purge logic (q92's window pass) applies unchanged at chunk grain.
    *
    * Scale: the candidate graph is O(qualifying pairs), orders of
    * magnitude smaller than the corpus; the CC loop is the q49
    * machinery with its measured constant round count. */
  /** Shared q105/q108 clustering: chunk-overlap edges → min-label
    * components (the doc-grain `componentFrame` discipline). */
  private[queries] def chunkComponentFrameFrom(chunks: DataFrame): DataFrame = {
    val edges = chunkPairFrameFrom(chunks)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    graft.operators.ConnectedComponents.run(edges)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  private[queries] def chunkComponentFrame(s: SparkSession, dir: String): DataFrame =
    chunkComponentFrameFrom(chunkDigests(s, dir))

  /** [[chunkComponentFrameFrom]] over a SUBGRAPH of member docs with
    * the df cap supplied as a DENY list — the warehouse merge's
    * touched-component form. Within the member set a digest's doc
    * list sees only members, so the MaxChunkDf document-frequency
    * gate cannot be recomputed locally; but the gate's only effect is
    * EXCLUDING digests with global df > cap, so the stored
    * `chunk_heavy` table (global heavy digests, maintained O(batch)
    * per merge) is the complete correction: anti-join it, and the
    * within-member ≥ 2 holder filter supplies the lower bound (2
    * member holders ⇒ global df ≥ 2; a digest with global df in
    * 2..cap but one member holder forms no member–member pair, so its
    * absence from the gate is unobservable). A cap-crossing digest
    * (batch pushed its df past the cap) lands in the deny list and
    * drops edges — splitting components — exactly as the full rebuild
    * would. Pair enumeration itself needs only the two endpoints' own
    * rows, so restricting to members loses no member–member edge. */
  private[queries] def chunkComponentFrameWithout(chunks: DataFrame,
      heavy: DataFrame): DataFrame = {
    val sizes = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val pairs = chunks
      .join(broadcast(heavy), Seq("chunk_md5"), "left_anti")
      .groupBy("chunk_md5")
      .agg(collect_set(col("doc_id")).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("n_chunks").as("n_chunks_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("n_chunks").as("n_chunks_b")), Seq("doc_b"))
      .filter(col("n_shared") * 2 >= least(col("n_chunks_a"), col("n_chunks_b")))
    graft.operators.ConnectedComponents.run(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  def chunkDupClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    chunkComponentFrame(s, dir)
      .withColumn("n_cluster",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy("doc_id")
  }

  /** q107 — the containment-threshold sensitivity curve: ALL co-chunk
    * candidate pairs bucketed by containment decile
    * (`(10·n_shared) div min(nₐ,n_b)` — exact integers, no float
    * bucketing drift), with the descending-cumulative pair count.
    * This is the table a data lead reads to CHOOSE q102's threshold:
    * each row says "a cutoff at this decile keeps n_pairs_ge pairs" —
    * the survival curve dedup papers tune T against, computed in one
    * pass instead of re-running the pipeline per candidate T.
    *
    * Scale: same digest-grouped candidate generation as q102 (never
    * all-pairs), one ≤ 11-row aggregation on top; the unpartitioned
    * cumulative window is over those ≤ 11 rows, not data. */
  def chunkOverlapHistogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allChunkPairs(s, dir)
      .withColumn("decile",
        expr("(n_shared * 10) div least(n_chunks_a, n_chunks_b)"))
      .groupBy("decile").agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_ge", sum(col("n_pairs")).over(w))
      .orderBy("decile")
  }

  val chunkOverlapHistogramSql: String =
    s"""WITH $chunkPairCteSql,
      |h AS (
      |  SELECT (n_shared * 10) // least(n_chunks_a, n_chunks_b) AS decile,
      |    count(*) AS n_pairs
      |  FROM ap GROUP BY 1)
      |SELECT decile, n_pairs,
      |  CAST(sum(n_pairs) OVER (ORDER BY decile DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
      |FROM h
      |ORDER BY decile""".stripMargin

  /** The q105/q108 shared reachability CTE block (expects `cp` from
    * [[chunkPairCteSql]] in scope; yields `ccomp(doc_id, cluster_id)`). */
  private[queries] val chunkCcCteSql: String =
    """ce0 AS (SELECT doc_a AS src, doc_b AS dst FROM cp),
      |cedges AS (
      |  SELECT src, dst FROM ce0 UNION SELECT dst AS src, src AS dst FROM ce0),
      |cnodes AS (SELECT DISTINCT src AS id FROM cedges),
      |creach(id, r) AS (
      |  SELECT id, id FROM cnodes
      |  UNION
      |  SELECT e.dst, creach.r FROM creach JOIN cedges e ON e.src = creach.id),
      |ccomp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM creach GROUP BY id)""".stripMargin

  val chunkDupClustersSql: String =
    s"""WITH RECURSIVE $chunkPairCteSql,
      |$chunkCcCteSql
      |SELECT doc_id, cluster_id,
      |  count(*) OVER (PARTITION BY cluster_id) AS n_cluster
      |FROM ccomp
      |ORDER BY doc_id""".stripMargin

  /** q108 — the chunk-grain PURGE list, completing the chain q100
    * chunks → q102 pairs → q105 clusters → THIS (the q92 discipline at
    * chunk grain): per cluster the highest-quality member survives
    * (q37 score, 6-dp-rounded, ties by min doc_id — a total order) and
    * every other member emits (doc_id, cluster_id, kept_doc) — the
    * delete set a curation pipeline applies for the partial-overlap
    * duplication that whole-doc MinHash (q92's candidate source)
    * under-weights. One window pass computes rank + keeper together;
    * O(clustered docs), never O(corpus). */
  def chunkDedupPurge(s: SparkSession, dir: String): DataFrame =
    purgeFrom(s, dir, chunkComponentFrame(s, dir))

  val chunkDedupPurgeSql: String =
    s"""WITH RECURSIVE $chunkPairCteSql,
      |$chunkCcCteSql,
      |${purgeTailSql("ccomp")}""".stripMargin

  // ---- q113: incremental dedup (new batch vs standing index) ---------

  /** The "today's crawl" slice: the highest-numbered source plays the
    * incoming batch; everything else is the standing index. */
  private[queries] val NewSource = "src19"
  private[queries] val IncrementalTau = 0.5

  /** q113 — INCREMENTAL deduplication: dedup an incoming batch against
    * the standing corpus without ever comparing the corpus to itself.
    * This is the shape production dedup actually runs day-to-day — the
    * full-corpus passes (q27/q28/q49/q92) build the index ONCE; every
    * subsequent increment runs THIS. For each new-batch doc: LSH band
    * candidates from the index side only (new×index band equi-join —
    * no new×new, no index×index pairs), exact token-set Jaccard
    * confirmation on candidates only, and a per-doc verdict row:
    * candidate count, best-matching index doc (max Jaccard, ties to
    * the smaller doc_id via a lexicographic struct max mirrored by the
    * oracle's row_number), and the admit/reject flag at τ =
    * [[IncrementalTau]].
    *
    * Scale shape — why the increment is cheap at a 100 TB index:
    *  - the index band table and token-hash sets are the STORED
    *    outputs of the standing q28/q27 contract — since r13 read
    *    from the materialized [[Warehouse]] (PlanShapeSpec pins that
    *    the plan scans warehouse parquet, not the corpus); the new
    *    batch — small by premise — is the only side that computes
    *    signatures;
    *  - the candidate join touches only band buckets the new batch
    *    hashes into: traffic is O(new-batch bands + matching index
    *    rows), never O(index);
    *  - Jaccard confirmation joins hash SETS for candidate pairs only
    *    (8-byte hashes, the q26 arithmetic — |A∩B| exact, union by
    *    inclusion-exclusion), then ONE aggregation emits the verdict.
    * Docs with zero candidates are admitted implicitly (absent from
    * the output — the sparse contract of q66/q111). */
  /** The TWO band hashes of a text column as one map-only array
    * expression — the q27 signature + q28 banding contract collapsed
    * into a single per-row projection (no explode, no shuffle), for
    * the stream-side index probe (`StreamOps.flagIndexDuplicates`).
    * Hashes are the 60-bit md5-prefix longs of the band strings, the
    * same longs [[bandHashBloom]] folds index-side. */
  private[graft] def bandHashes60(text: Column): Column = {
    val hs = array_distinct(call_function("graft_token_hashes",
      array_distinct(split(text, " ")), lit(P)))
    val sigs = HashParams.map { case (a, b) =>
      array_min(transform(hs, h => (lit(a) * h + lit(b)) % P))
    }
    def bh(sl: Seq[Column]): Column =
      conv(substring(md5(concat_ws(",", sl.map(_.cast("string")): _*)), 1, 15),
        16, 10).cast("long")
    array(bh(sigs.take(4)), bh(sigs.drop(4)))
  }

  /** Bloom filter over the STORED band index's bucket hashes — the
    * broadcastable form of the standing q28 index a speed-layer stage
    * probes (state bound: the bloom's bits, fixed at build time; zero
    * state-store rows). No false negatives: any incoming doc sharing
    * a band bucket with the index is flagged; over-flagging is
    * fpp-bounded (the q94 certificate family). */
  private[graft] def bandHashBloom(s: SparkSession, dir: String,
      fpp: Double = 1e-6): Array[Byte] =
    bandHashBloomOf(Warehouse.stored(s, dir, "bands"), fpp)

  /** [[bandHashBloom]] over an EXPLICIT stored band frame — the seam
    * the corpus bench uses to fold the warehouse it just built. */
  private[graft] def bandHashBloomOf(bands: DataFrame,
      fpp: Double = 1e-6): Array[Byte] = {
    val hashes = bands
      .select(conv(substring(col("band_hash"), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct()
    graft.functions.Bloom.buildLong(hashes, "h", hashes.count(), fpp)
  }

  /** The verdict aggregation both incremental forms share: candidate
    * pairs → exact token-set Jaccard → one verdict row per new doc.
    *
    * Join shape matters for the O(new batch) claim: the index
    * token-hash table is probed MAP-SIDE by TWO SEPARATE broadcasts —
    * the SKINNY candidate pairs (16 B/row) and the batch's hash sets
    * (O(batch) rows) — without the hints the planner sort-merges and
    * shuffles the ENTIRE stored token set (measured 128 MB at the
    * 120k-doc bench scale vs ~0 after), which is exactly the O(index)
    * cost the increment exists to avoid. Broadcasting them SEPARATELY
    * matters as much as broadcasting at all: the r13 form broadcast
    * `cand ⋈ ha` — pairs × hash-set arrays, O(candidates · |hs|)
    * bytes — which at sf0.1's 479k bucket-heavy candidates built a
    * ~570 MB broadcast for what is ~8 MB of pairs + ~4 MB of batch
    * sets when shipped unjoined. */
  private def incrementVerdict(cand: DataFrame, ha: DataFrame,
      hb: DataFrame): DataFrame = {
    val scored = hb
      .join(broadcast(cand), "idx_doc")
      .join(broadcast(ha), "new_doc")
      // Native |A∩B| kernel: same count as size(array_intersect) on
      // the distinct hash SETS both sides carry, without materializing
      // the intersection array per candidate pair (the allocation is
      // the hot path at bucket-heavy fixtures — 479k pairs at sf0.1).
      .withColumn("n_inter",
        call_function("graft_inter_size", col("ha"), col("hb")))
      .withColumn("jac", col("n_inter").cast("double") /
        (size(col("ha")) + size(col("hb")) - col("n_inter")))
    scored.groupBy(col("new_doc"))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(struct(col("jac"), (-col("idx_doc")).as("neg"))).as("best"))
      .select(
        col("new_doc"), col("n_candidates"),
        (-col("best.neg")).as("best_match"),
        round(col("best.jac"), 6).as("best_jaccard"),
        (col("best.jac") >= IncrementalTau).as("is_dup"))
      .orderBy("new_doc")
  }

  /** The PRODUCTION form (since r13): the index side is the STORED
    * warehouse — band rows and token-hash sets read from parquet the
    * standing build wrote — and only the new batch computes signatures
    * from raw text. The plan scans `documents` solely for the
    * source-filtered new slice (PushedFilters pinned by
    * PlanShapeSpec); everything index-side is a warehouse scan, which
    * is what makes the increment O(new batch + matched buckets) at a
    * 100 TB index. q135 certifies row-identity with the recompute
    * form below. Construction is EAGER on first use per corpus dir
    * (the warehouse build — the q99 discipline). */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame =
    incrementAgainst(s, dir, Warehouse.stored(s, dir, _), NewSource)

  /** The stored-index increment against an EXPLICIT warehouse reader —
    * factored so the corpus-scale bench can run the SAME production
    * path against the warehouse its `buildDocChain` just committed
    * (q113 binds it to the fixture warehouse + [[NewSource]]). */
  private[graft] def incrementAgainst(s: SparkSession, dir: String,
      table: String => DataFrame, newSource: String): DataFrame =
    incrementAgainstDocs(
      Tables.documents(s, dir).filter(col("source") === newSource), table)

  /** [[incrementAgainst]] over an EXPLICIT new-batch frame — the seam
    * the corpus bench's fixed-batch sweep uses to hold the batch
    * CONSTANT while the index grows 10× (the r13 verdict #1 "done"
    * criterion: increment shuffle must stay flat across index size at
    * fixed batch size). */
  private[graft] def incrementAgainstDocs(newDocs: DataFrame,
      table: String => DataFrame): DataFrame = {
    val hsNew = tokenHashSetOf(newDocs)
    val nb = bandFrameOfSigs(sigsFromHs(hsNew))
      .select(col("doc_id").as("new_doc"), col("band"), col("band_hash"))
    // The index side NEVER shuffles (r13 verdict #1 — the old shape
    // sort-merged the whole stored band table, measured O(index):
    // 14 → 136 MB of increment shuffle across a 10× index sweep).
    // Two broadcast probes keep it map-only:
    //  - the batch's doc_ids anti-prune the fixture's own batch rows
    //    out of the index side map-side (production indexes don't
    //    contain the incoming batch; the stored `bands` schema needs
    //    no `source` column either way — the old form joined the
    //    whole `doc_stats` table in for exactly this filter);
    //  - the batch's band rows broadcast into the candidate equi-join,
    //    which prunes the stored scan to the MATCHED BUCKETS inside
    //    the same map-side hash probe (a separate distinct-keys
    //    semi-join would re-run the batch's signature subplan for
    //    zero extra pruning here; at 100 TB the stored `bands` table
    //    is additionally bucketed by band_hash — operators/Bucketing —
    //    so the same key set prunes the READ, not just the probe).
    // The first exchange in the whole increment is the candidate-pair
    // distinct — O(batch · bucket fan-out) rows, never O(index).
    val newIds = newDocs.select(col("doc_id"))
    val cand = table("bands")
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("idx_doc"), col("band"), col("band_hash"))
      .join(broadcast(nb), Seq("band", "band_hash"))
      .select("new_doc", "idx_doc").distinct()
    val ha = hsNew
      .select(col("doc_id").as("new_doc"), col("hs").as("ha"))
    val hb = table("token_hashes")
      .select(col("doc_id").as("idx_doc"), col("hs").as("hb"))
    incrementVerdict(cand, ha, hb)
  }

  /** The r12 recompute form (both sides derived from `documents`
    * in-query) — kept as the certification witness for q135: stored
    * path ≡ recompute path, row for row. */
  private[queries] def incrementalDedupRecompute(
      s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val hs = tokenHashSet(s, dir)
    val bands = bandFrame(s, dir).join(src, "doc_id")
    val nb = bands.filter(col("source") === NewSource)
      .select(col("doc_id").as("new_doc"), col("band"), col("band_hash"))
    val ib = bands.filter(col("source") =!= NewSource)
      .select(col("doc_id").as("idx_doc"), col("band"), col("band_hash"))
    val cand = nb.join(ib, Seq("band", "band_hash"))
      .select("new_doc", "idx_doc").distinct()
    incrementVerdict(cand,
      hs.select(col("doc_id").as("new_doc"), col("hs").as("ha")),
      hs.select(col("doc_id").as("idx_doc"), col("hs").as("hb")))
  }

  /** The q113 oracle chain with an optional extra output column —
    * factored so the q135 stored-vs-recompute certification oracle is
    * the SAME text plus its `matches_recompute` flag (the q34
    * pinned-flag idiom). */
  private[queries] def incrementalDedupSqlWith(extraCol: String): String =
    s"""WITH $bandsCteSql,
       |nb AS (SELECT b.* FROM bands b JOIN documents d USING (doc_id)
       |       WHERE d.source = '$NewSource'),
       |ib AS (SELECT b.* FROM bands b JOIN documents d USING (doc_id)
       |       WHERE d.source != '$NewSource'),
       |cand AS (
       |  SELECT DISTINCT nb.doc_id AS new_doc, ib.doc_id AS idx_doc
       |  FROM nb JOIN ib ON nb.band = ib.band AND nb.band_hash = ib.band_hash),
       |j AS (
       |  SELECT c.new_doc, c.idx_doc,
       |    CAST(len(list_intersect(ta.hs, tb.hs)) AS DOUBLE)
       |      / (len(ta.hs) + len(tb.hs) - len(list_intersect(ta.hs, tb.hs))) AS jac
       |  FROM cand c
       |    JOIN t ta ON ta.doc_id = c.new_doc
       |    JOIN t tb ON tb.doc_id = c.idx_doc),
       |r AS (
       |  SELECT new_doc, idx_doc, jac,
       |    row_number() OVER (PARTITION BY new_doc
       |                       ORDER BY jac DESC, idx_doc ASC) AS rk,
       |    count(*) OVER (PARTITION BY new_doc) AS n_candidates
       |  FROM j)
       |SELECT new_doc, CAST(n_candidates AS BIGINT) AS n_candidates,
       |  idx_doc AS best_match, round(jac, 6) AS best_jaccard,
       |  (jac >= $IncrementalTau) AS is_dup$extraCol
       |FROM r
       |WHERE rk = 1
       |ORDER BY new_doc""".stripMargin

  val incrementalDedupSql: String = incrementalDedupSqlWith("")

  // ---- q120: MinHash estimator error audit ---------------------------

  /** q120 — certification of the ESTIMATOR the entire banded dedup
    * chain (q27 → q28 → q49 → q92) rests on: for every candidate EDGE
    * the clustering propagates (the [[candidateEdges]] member→root
    * pairs — the decisions that actually form clusters), the MinHash
    * estimate ĵ = (matching signature components)/k is put next to
    * the EXACT token-set Jaccard, with the per-pair absolute error.
    * This is the audit a data lead runs before trusting a purge list:
    * MinHash theory says E[ĵ] = J with σ = √(J(1−J)/k), and this
    * table is the empirical check of that contract on the pairs the
    * pipeline acted on. (Auditing ALL in-bucket pairs would be the
    * O(df²) blowup the chunk chain caps with MaxChunkDf — the star
    * edges are both the bounded set AND the causally relevant one.)
    *
    * Exactness: ĵ = sig_match/8 has a power-of-two denominator, so it
    * is EXACT in double; J = |A∩B|/|A∪B| is one correctly-rounded
    * division of exact integers (the q26 arithmetic, union by
    * inclusion–exclusion); their difference is a deterministic double
    * both engines compute identically. Rounding is display-only.
    *
    * Scale shape: edges are O(clustered docs) by the star bound;
    * signatures are 8 longs per doc and the token hash sets join for
    * CANDIDATE docs only — since r13 both ARE the stored warehouse
    * tables (not a fixture recompute), so the audit reads the index,
    * never the corpus (PlanShapeSpec-pinned), and costs O(candidate
    * edges). */
  def minhashErrorAudit(s: SparkSession, dir: String): DataFrame = {
    // Since r13 every input is a STORED warehouse table — the audit
    // never touches `documents` (PlanShapeSpec pins zero corpus scans).
    val pairs = candidateEdgesFrom(Warehouse.stored(s, dir, "bands"))
      .select(col("dst").as("doc_a"), col("src").as("doc_b"))
    val sig = Warehouse.stored(s, dir, "signatures")
    val sigA = sig.select(col("doc_id").as("doc_a") +:
      HashParams.indices.map(i => col(s"sig_$i").as(s"a_$i")): _*)
    val sigB = sig.select(col("doc_id").as("doc_b") +:
      HashParams.indices.map(i => col(s"sig_$i").as(s"b_$i")): _*)
    val hs = Warehouse.stored(s, dir, "token_hashes")
    val sigMatch = HashParams.indices
      .map(i => when(col(s"a_$i") === col(s"b_$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = col("sig_match").cast("double") / lit(HashParams.size.toDouble)
    val jac = col("n_inter").cast("double") /
      (size(col("ha")) + size(col("hb")) - col("n_inter"))
    pairs
      .join(sigA, "doc_a").join(sigB, "doc_b")
      .withColumn("sig_match", sigMatch)
      .join(hs.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(hs.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .withColumn("n_inter",
        call_function("graft_inter_size", col("ha"), col("hb")))
      .select(
        col("doc_a"), col("doc_b"), col("sig_match"),
        round(est, 6).as("est_jaccard"),
        round(jac, 6).as("jaccard"),
        round(abs(est - jac), 6).as("abs_err"))
      .orderBy("doc_a", "doc_b")
  }

  val minhashErrorAuditSql: String = {
    val k = HashParams.size
    val matchSum = HashParams.indices
      .map(i => s"(CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $bandsCteSql,
       |$candidateEdgesCteSql,
       |pairs AS (SELECT dst AS doc_a, src AS doc_b FROM e0),
       |m AS (
       |  SELECT p.doc_a, p.doc_b,
       |    CAST($matchSum AS BIGINT) AS sig_match
       |  FROM pairs p
       |    JOIN sg sa ON sa.doc_id = p.doc_a
       |    JOIN sg sb ON sb.doc_id = p.doc_b),
       |j AS (
       |  SELECT m.doc_a, m.doc_b, m.sig_match,
       |    CAST(m.sig_match AS DOUBLE) / $k AS est,
       |    CAST(len(list_intersect(ta.hs, tb.hs)) AS DOUBLE)
       |      / (len(ta.hs) + len(tb.hs) - len(list_intersect(ta.hs, tb.hs))) AS jac
       |  FROM m
       |    JOIN t ta ON ta.doc_id = m.doc_a
       |    JOIN t tb ON tb.doc_id = m.doc_b)
       |SELECT doc_a, doc_b, sig_match,
       |  round(est, 6) AS est_jaccard,
       |  round(jac, 6) AS jaccard,
       |  round(abs(est - jac), 6) AS abs_err
       |FROM j
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- q122: purge-precision audit -----------------------------------

  /** q122 — the "was that purge justified?" report: every row of the
    * q92 purge list re-examined with the EXACT token-set Jaccard
    * between the purged doc and its keeper, plus the integer-exact
    * similarity decile. The approximate chain (bands → components →
    * purge) makes transitive decisions — a doc can be purged for a
    * keeper it never shared a bucket with — and this audit is where
    * those decisions become inspectable: low-decile rows are exactly
    * the purges a curation review queue should sample.
    *
    * Deliberately NOT an assertion: transitive purges with modest
    * direct similarity are legitimate (the cluster, not the pair, is
    * the dedup unit); the audit's job is to measure, not to gate.
    *
    * Scale shape: the purge list is the SMALL side by construction
    * (O(clustered docs)); token hash sets join on its keys only —
    * since r13 both sides ARE the stored warehouse tables, so the
    * audit never touches the corpus (PlanShapeSpec-pinned). Cost
    * O(purged). */
  def purgeAudit(s: SparkSession, dir: String): DataFrame = {
    // Since r13: the purge list and the token-hash sets are STORED
    // warehouse tables — the audit costs O(purged) reads, zero corpus
    // scans (PlanShapeSpec-pinned).
    val purged = Warehouse.stored(s, dir, "purge")
    val hs = Warehouse.stored(s, dir, "token_hashes")
    purged
      .join(hs.select(col("doc_id"), col("hs").as("hp")), "doc_id")
      .join(hs.select(col("doc_id").as("kept_doc"), col("hs").as("hk")), "kept_doc")
      .withColumn("n_inter",
        call_function("graft_inter_size", col("hp"), col("hk")))
      .withColumn("n_union",
        (size(col("hp")) + size(col("hk"))).cast("long") - col("n_inter"))
      .select(
        col("doc_id"), col("cluster_id"), col("kept_doc"),
        col("n_inter"), col("n_union"),
        round(col("n_inter").cast("double") / col("n_union"), 6).as("jaccard"),
        expr("(n_inter * 10) div n_union").as("decile"))
      .orderBy("doc_id")
  }

  val purgeAuditSql: String =
    s"""WITH RECURSIVE $bandsCteSql,
       |$ccCompCteSql,
       |${purgeCteSql("comp")},
       |a AS (
       |  SELECT pg.doc_id, pg.cluster_id, pg.kept_doc,
       |    CAST(len(list_intersect(tp.hs, tk.hs)) AS BIGINT) AS n_inter,
       |    CAST(len(tp.hs) + len(tk.hs)
       |      - len(list_intersect(tp.hs, tk.hs)) AS BIGINT) AS n_union
       |  FROM pg
       |    JOIN t tp ON tp.doc_id = pg.doc_id
       |    JOIN t tk ON tk.doc_id = pg.kept_doc)
       |SELECT doc_id, cluster_id, kept_doc, n_inter, n_union,
       |  round(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard,
       |  (n_inter * 10) // n_union AS decile
       |FROM a
       |ORDER BY doc_id""".stripMargin

  // ---- q123: purge rate by quality decile ----------------------------

  /** q123 — the dedup×quality interaction: purge rate per quality
    * decile. Dedup is supposed to delete REDUNDANCY, not quality — if
    * the top decile purges as heavily as the bottom one, the keeper
    * rule (or the candidate generator) is eating good data, and this
    * is the one-glance table that shows it. Deciles are exact global
    * ranks over the q37 score (the q117 rank-decile idiom: ties by
    * doc_id — a total order — then `((rk−1)·10) div n`), purge
    * membership is the q92 list via the shared [[purgeFrom]] rule.
    *
    * Scale: the rank window is a global sort at corpus grain — fine
    * at sf, and at 100 TB the documented swap is approx-quantile
    * decile EDGES (the q117 note) with a map-only bucket assignment;
    * the ppm arithmetic is integer-exact either way. The purge side
    * is O(clustered docs) and LEFT-joins the corpus on doc_id. */
  def purgeByQualityDecile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Since r13: purge membership and quality both come from STORED
    // warehouse tables (zero corpus scans, PlanShapeSpec-pinned).
    val purged = Warehouse.stored(s, dir, "purge")
      .select(col("doc_id"), lit(1L).as("purged"))
    val q = Warehouse.stored(s, dir, "doc_stats")
      .select(col("doc_id"), col("quality_score"))
    val w = Window.orderBy(col("quality_score").desc, col("doc_id").asc)
    // The at-scale decile swap (r13 verdict #4): flag on → sketch-edge
    // buckets, no global sort. Default = the exact oracle rank form.
    val withDecile =
      if (Deciles.useApprox(s))
        Deciles.withApproxDescDecile(q, "quality_score")
      else q.withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(q.agg(count(lit(1)).as("n_docs"))))
        .withColumn("decile", expr("((rk - 1) * 10) div n_docs"))
    withDecile
      .join(purged, Seq("doc_id"), "left")
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("purged"), lit(0L))).as("n_purged"))
      .withColumn("purge_ppm", expr("(n_purged * 1000000) div n"))
      .orderBy("decile")
  }

  val purgeByQualityDecileSql: String =
    s"""WITH RECURSIVE $bandsCteSql,
       |$ccCompCteSql,
       |${purgeCteSql("comp")},
       |rnk AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY quality_score DESC, doc_id ASC) AS rk
       |  FROM sc),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM sc),
       |d AS (
       |  SELECT ((r.rk - 1) * 10) // nn.n_docs AS decile,
       |    CASE WHEN pg.doc_id IS NULL THEN 0 ELSE 1 END AS purged
       |  FROM rnk r CROSS JOIN nn
       |  LEFT JOIN pg ON pg.doc_id = r.doc_id)
       |SELECT decile,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(purged) AS BIGINT) AS n_purged,
       |  (CAST(sum(purged) AS BIGINT) * 1000000) // count(*) AS purge_ppm
       |FROM d
       |GROUP BY decile
       |ORDER BY decile""".stripMargin

  // ---- q124: LSH recall certification --------------------------------

  /** The ground-truth duplicate threshold for the recall slice. */
  private[queries] val RecallTau = 0.5

  /** q124 — RECALL certification of the banded LSH candidate
    * generator, the complement of q120 (which audits the pairs LSH
    * DID surface; this asks what it MISSED). Exhaustive ground truth
    * is O(n²), so the certificate runs on a bounded, deterministic
    * slice — consecutive-id pairs, the q26 discipline — where exact
    * token-set Jaccard is computed for every pair and compared with
    * "the pair shares ≥ 1 band bucket" (the q28 detection event).
    * One row: slice size, true dups at τ = [[RecallTau]], detected
    * pairs, their overlap, and exact-ppm recall/precision on the
    * slice. MinHash theory prices recall at 1−(1−J^4)² for the 2×4
    * banding — the measured ppm is the empirical check of that curve
    * where it matters (J near τ).
    *
    * Scale: the slice is a linear-in-corpus sample contract (id
    * adjacency is arbitrary — any fixed 1-per-doc pairing works);
    * detection flags join the stored band table on (doc, doc+1) keys.
    * Everything after is a single-row aggregate. */
  def lshRecallAudit(s: SparkSession, dir: String): DataFrame = {
    // Since r13: token-hash sets and the band index are STORED
    // warehouse tables (zero corpus scans, PlanShapeSpec-pinned).
    val hs = Warehouse.stored(s, dir, "token_hashes")
    val pairs = hs.as("a")
      .join(hs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("doc_a"),
        call_function("graft_inter_size", col("a.hs"), col("b.hs")).as("ni"),
        (size(col("a.hs")) + size(col("b.hs"))).cast("long").as("sl"))
      .withColumn("jac", col("ni").cast("double") / (col("sl") - col("ni")))
    val bf = Warehouse.stored(s, dir, "bands")
    val det = bf.as("x")
      .join(bf.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("y.doc_id") === col("x.doc_id") + 1)
      .select(col("x.doc_id").as("doc_a")).distinct()
      .withColumn("detected", lit(true))
    pairs.join(det, Seq("doc_a"), "left")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("jac") >= RecallTau, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("detected"), 1L).otherwise(0L)).as("n_detected"),
        sum(when(col("jac") >= RecallTau && col("detected"), 1L)
          .otherwise(0L)).as("n_hits"))
      .select(col("n_pairs"), col("n_true"), col("n_detected"), col("n_hits"),
        when(col("n_true") === 0, lit(null))
          .otherwise(expr("(n_hits * 1000000) div n_true")).as("recall_ppm"),
        when(col("n_detected") === 0, lit(null))
          .otherwise(expr("(n_hits * 1000000) div n_detected"))
          .as("precision_ppm"))
  }

  val lshRecallAuditSql: String =
    s"""WITH $bandsCteSql,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a,
       |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |      / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jac
       |  FROM t a JOIN t b ON b.doc_id = a.doc_id + 1),
       |det AS (
       |  SELECT DISTINCT x.doc_id AS doc_a
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.band_hash = y.band_hash
       |      AND y.doc_id = x.doc_id + 1),
       |j AS (
       |  SELECT p.jac, (d.doc_a IS NOT NULL) AS detected
       |  FROM pairs p LEFT JOIN det d USING (doc_a)),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN jac >= $RecallTau THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |    CAST(sum(CASE WHEN detected THEN 1 ELSE 0 END) AS BIGINT) AS n_detected,
       |    CAST(sum(CASE WHEN jac >= $RecallTau AND detected THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM j)
       |SELECT n_pairs, n_true, n_detected, n_hits,
       |  CASE WHEN n_true = 0 THEN NULL
       |    ELSE (n_hits * 1000000) // n_true END AS recall_ppm,
       |  CASE WHEN n_detected = 0 THEN NULL
       |    ELSE (n_hits * 1000000) // n_detected END AS precision_ppm
       |FROM agg""".stripMargin

  // ---- q129: cross-source shingle provenance matrix ------------------

  /** q129 — SOURCE-level provenance: for every source pair, how many
    * distinct hashed word 3-grams they share, with exact containment
    * ppm over the smaller side. This is q89 lifted from "which spans
    * repeat" to "which SOURCES mirror each other" — the table that
    * catches a crawl slice republishing another's content, a mirror
    * site, or a template family spanning feeds, before doc-grain
    * dedup ever runs. Complements q98 (user-overlap between event
    * types, sketched): same matrix shape, different domain, EXACT.
    *
    * Scale shape: one distinct-(gram, source) aggregation — 8-byte
    * shingle hashes shuffle, never text (the q26/q89 kernel) and
    * map-side partials collapse each source's repeats locally; then
    * the q102 set-collect idiom per gram — the per-gram source set is
    * bounded by |sources| (≤ 20 here, still tiny at 100 TB where
    * sources are crawls/feeds), so pair fan-out is C(|sources|, 2)
    * per gram, never document-driven; the final count groups on 190
    * pairs. No df cap needed — the source-grain df IS the bound. */
  def sourceOverlapMatrix(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("source"),
        explode(hashedTriGrams(split(col("text"), " "))).as("gram"))
      .distinct()
    val sizes = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val pairs = g.groupBy("gram")
      .agg(collect_set(col("source")).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(col("srcs")).as("source_a"), col("srcs"))
      .select(col("source_a"), explode(col("srcs")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("source").as("source_a"),
        col("n_grams").as("n_grams_a")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"),
        col("n_grams").as("n_grams_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_grams_a"), col("n_grams_b"),
        expr("(n_shared * 1000000) div least(n_grams_a, n_grams_b)")
          .as("containment_ppm"))
      .orderBy("source_a", "source_b")
  }

  val sourceOverlapMatrixSql: String =
    """WITH g AS (
      |  SELECT DISTINCT source,
      |    unnest(list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
      |      i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT))) AS gram
      |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY source),
      |p AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM g a JOIN g b ON b.gram = a.gram AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT p.source_a, p.source_b, p.n_shared,
      |  sa.n_grams AS n_grams_a, sb.n_grams AS n_grams_b,
      |  (p.n_shared * 1000000) // least(sa.n_grams, sb.n_grams) AS containment_ppm
      |FROM p
      |  JOIN sz sa ON sa.source = p.source_a
      |  JOIN sz sb ON sb.source = p.source_b
      |ORDER BY source_a, source_b""".stripMargin

  // ---- q130: LSH bucket-size histogram (candidate-graph health) ------

  /** q130 — the capacity-planning audit for the banded chain: the
    * bucket-size histogram of the q28 LSH index, with the edge counts
    * each size class contributes under the star-edge discipline
    * (size−1 per bucket) NEXT TO what naive all-pairs expansion would
    * cost (size·(size−1)/2). This is the table an operator reads
    * BEFORE launching CC at 100 TB: a fat tail here means boilerplate
    * is about to blow up the candidate graph, and the all-pairs column
    * quantifies exactly how much the star bound saves. (The chunk
    * chain's MaxChunkDf exists because of this distribution — q130
    * makes the doc-grain version observable instead of assumed.)
    *
    * Scale: one (band, band_hash) count — the index aggregation the
    * chain already runs — then a ≤ |distinct sizes|-row histogram.
    * Nothing touches documents. */
  def bucketSizeHistogram(s: SparkSession, dir: String): DataFrame =
    bandFrame(s, dir)
      .groupBy("band", "band_hash")
      .agg(count(lit(1)).as("sz"))
      .groupBy("sz")
      .agg(count(lit(1)).as("n_buckets"))
      .select(col("sz").as("bucket_size"), col("n_buckets"),
        expr("(bucket_size - 1) * n_buckets").as("star_edges"),
        expr("(bucket_size * (bucket_size - 1)) div 2 * n_buckets")
          .as("allpairs_edges"))
      .orderBy("bucket_size")

  val bucketSizeHistogramSql: String =
    s"""WITH $bandsCteSql,
       |b AS (
       |  SELECT band, band_hash, CAST(count(*) AS BIGINT) AS sz
       |  FROM bands GROUP BY band, band_hash),
       |h AS (
       |  SELECT sz AS bucket_size, CAST(count(*) AS BIGINT) AS n_buckets
       |  FROM b GROUP BY sz)
       |SELECT bucket_size, n_buckets,
       |  (bucket_size - 1) * n_buckets AS star_edges,
       |  (bucket_size * (bucket_size - 1)) // 2 * n_buckets AS allpairs_edges
       |FROM h
       |ORDER BY bucket_size""".stripMargin

  // ---- q133: dedup impact report (what the purge costs, per source) --

  /** q133 — the "what did dedup do to my corpus" report: per source,
    * docs and whitespace tokens before the purge and in the q92
    * delete set, quality mass in exact micro-units (the q72
    * fixed-point idiom — the 6-dp-rounded q37 score ×10⁶ as int64, so
    * SUMS are order-free exact where a double mean would be
    * reassociation-dependent), and the exact-ppm retention rate.
    * This is the sign-off table a data lead reads after a dedup run:
    * which sources shrank, whether the removed mass was low-quality
    * (it should be — q123 checks the rate by decile, THIS shows the
    * absolute mass), and what the retained corpus weighs.
    *
    * Scale: the corpus side is one map-only pass (tokens + quality
    * per doc) into a source-keyed aggregation; the purge flag is a
    * LEFT join against the O(clustered docs) delete set. Nothing
    * new shuffles at corpus width. */
  def purgeImpact(s: SparkSession, dir: String): DataFrame = {
    // Since r13: the corpus-side stats (source, token counts, quality)
    // and the delete set are STORED warehouse tables — the report costs
    // one doc_stats pass + an O(purged) left join, zero corpus scans.
    val purged = Warehouse.stored(s, dir, "purge")
      .select(col("doc_id"), lit(1L).as("pu"))
    val base = Warehouse.stored(s, dir, "doc_stats")
      .select(col("doc_id"), col("source"),
        col("n_tokens").as("toks"),
        floor(col("quality_score") * 1e6 + 0.5).cast("long").as("q_micro"))
      .join(purged, Seq("doc_id"), "left")
      .withColumn("pu", coalesce(col("pu"), lit(0L)))
    base.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pu")).as("n_purged"),
        sum(col("toks")).as("tokens"),
        sum(col("toks") * col("pu")).as("tokens_purged"),
        sum(col("q_micro")).as("quality_micro"),
        sum(col("q_micro") * col("pu")).as("quality_micro_purged"))
      .withColumn("retained_ppm",
        expr("((n_docs - n_purged) * 1000000) div n_docs"))
      .orderBy("source")
  }

  val purgeImpactSql: String =
    s"""WITH RECURSIVE $bandsCteSql,
       |$ccCompCteSql,
       |${purgeCteSql("comp")},
       |base AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks,
       |    CAST(floor(sc.quality_score * 1e6 + 0.5) AS BIGINT) AS q_micro,
       |    CASE WHEN pg.doc_id IS NULL THEN 0 ELSE 1 END AS pu
       |  FROM documents d
       |    JOIN sc USING (doc_id)
       |    LEFT JOIN pg ON pg.doc_id = d.doc_id)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pu) AS BIGINT) AS n_purged,
       |  CAST(sum(toks) AS BIGINT) AS tokens,
       |  CAST(sum(toks * pu) AS BIGINT) AS tokens_purged,
       |  CAST(sum(q_micro) AS BIGINT) AS quality_micro,
       |  CAST(sum(q_micro * pu) AS BIGINT) AS quality_micro_purged,
       |  ((CAST(count(*) AS BIGINT) - CAST(sum(pu) AS BIGINT)) * 1000000)
       |    // count(*) AS retained_ppm
       |FROM base
       |GROUP BY source
       |ORDER BY source""".stripMargin
}
