package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-data curation operators beyond the dedup/similarity
  * families — the remaining stages every large-scale LLM data pipeline
  * runs between "raw corpus" and "training batches":
  *
  *  - q64 boilerplate scoring: corpus-frequency repeated-shingle
  *    detection (the RefinedWeb/CCNet "repeated n-gram" filter);
  *  - q65 sequence packing: the concat-and-chunk token layout that
  *    turns documents into fixed-budget training sequences;
  *  - q66 decontamination: benchmark-overlap flagging by shared
  *    n-grams (the GPT-3/PaLM eval-contamination check);
  *  - q67 source mixing: deterministic per-source downsampling to a
  *    target contribution (equal-chars rebalancing here).
  *
  * All shuffles carry 60-bit md5 gram hashes (`PortableHash` contract,
  * reproduced bit-for-bit by the DuckDB oracle), never gram text; all
  * sampling is content-hash Bernoulli (portable, rerun-stable); no
  * driver-side state. Each op is oracle-checked end-to-end.
  */
object PipelineOps {

  /** Portable 60-bit hash (first 15 md5 hex digits) of a column. */
  private[queries] def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The pinned q127 source-weight rule — `source` is 'src<N>', weight
    * is N + 1 — as ONE guarded expression shared by every
    * instantiation (`mixturePlanner`, the curation run's mixture
    * stage; ADVICE r13). A non-conforming source fails LOUDLY via
    * raise_error instead of silently nulling the weight and poisoning
    * the whole plan's denominators downstream. */
  private[queries] def srcWeightCol: Column = {
    val parsed = expr("TRY_CAST(substring(source, 4) AS BIGINT)")
    when(parsed.isNull,
      raise_error(concat(lit("q127: source not of form src<N>: "),
        col("source"))).cast("long"))
      .otherwise(parsed + 1L)
  }

  /** Distinct-per-doc hashed word n-grams: one row per (doc_id, gram),
    * via the native `graft_ngrams` kernel — split once, one pass,
    * per-doc dedup inside the expression (no distinct shuffle). Grams
    * are 60-bit longs BEFORE the explode hits any shuffle — at 100 TB
    * the gram traffic is 8 bytes/gram, not the text. (The declarative
    * `transform(sequence, i -> element_at(w, i)...)` form re-evaluates
    * the split per element — lambdas block subexpression elimination —
    * which measured 5 s at sf0.1 where the kernel takes 0.3 s.) */
  private[queries] def docGrams(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(call_function("graft_ngrams", split(col("text"), " "), lit(n))).as("g"))

  /** The gram CTE shared by the q64/q66 oracles (n-gram via list slice
    * + lateral range; hash60 = the `PortableHash` contract). */
  private def gramCte(n: Int): String =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, source,
       |    ('0x' || substr(md5(array_to_string(w[i:i+${n - 1}], ' ')), 1, 15))::BIGINT AS g
       |  FROM t, LATERAL (SELECT unnest(range(1, len(w)-${n - 2})) AS i) r
       |)""".stripMargin

  /** q64: repeated-shingle boilerplate scoring. A word 3-gram occurring
    * in ≥ `BoilerMinDocs` distinct documents is boilerplate; each doc
    * reports its distinct-gram count, boilerplate-gram count and ratio
    * — the per-doc signal the cleaning filter thresholds on.
    *
    * Plan shape: doc-frequency as a window count over the gram
    * partition, NOT groupBy-then-join-back. The join formulation
    * evaluates the gram explode TWICE — the engine has no common-
    * subplan reuse, and ReuseExchange can't save it because column
    * pruning narrows the aggregate side's scan so the two exchanges
    * never canonicalize equal. The window form is one explode pass,
    * one shuffle of 12-byte (doc_id, gram) rows, a radix sort on the
    * long key, zero joins. Skew note: a corpus-hot gram lands its
    * rows in one window partition, but the join formulation shuffles
    * the identical rows to the identical reducer — the skew is the
    * query's, not the plan's, and count-only window state is O(1). */
  val BoilerMinDocs = 5
  def boilerplate(s: SparkSession, dir: String): DataFrame = {
    val grams = docGrams(Tables.documents(s, dir), 3)
    grams
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("n_docs") >= BoilerMinDocs, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  val boilerplateSql: String =
    s"""${gramCte(3)},
       |wf AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS n_docs FROM g)
       |SELECT doc_id,
       |  count(*) AS n_grams,
       |  CAST(sum(CASE WHEN n_docs >= $BoilerMinDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  round(CAST(sum(CASE WHEN n_docs >= $BoilerMinDocs THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS boiler_ratio
       |FROM wf
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** q65: sequence packing — the concat-and-chunk layout. Documents
    * are sharded by content hash, ordered deterministically inside
    * each shard, laid head-to-tail on a token axis, and cut every
    * `PackBudget` tokens: `bin` is the training sequence a doc's first
    * token lands in. One window (running sum per shard) = one shuffle;
    * shards bound both window state and downstream writer parallelism.
    * Deterministic: rerunning (or re-sharding a grown corpus) moves
    * nothing that didn't change. */
  val PackBudget = 512L
  val PackShards = 4L
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("shard", pmod(hash60(concat(lit("shard"), col("doc_id"))), lit(PackShards)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", expr(s"start_offset div $PackBudget"))
      .select("doc_id", "shard", "n_tokens", "start_offset", "bin")
      .orderBy("doc_id")
  }

  /** The q65 pack rule as a reusable CTE chain (`pd` → `pk`) — ONE
    * text shared with the q182 shard manifest, so the manifest can
    * never describe a different layout than the pack emits. */
  private[queries] val packCteSql: String =
    s"""pd AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 15))::BIGINT % $PackShards AS shard
       |  FROM documents),
       |pk AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset,
       |    CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens) // $PackBudget AS BIGINT) AS bin
       |  FROM pd)""".stripMargin

  val packSequencesSql: String =
    s"""WITH $packCteSql
       |SELECT doc_id, shard, n_tokens, start_offset, bin
       |FROM pk
       |ORDER BY doc_id""".stripMargin

  /** q66: decontamination — flag training documents sharing any word
    * 5-gram with the held-out benchmark slice (`source = 'src0'` plays
    * the benchmark). The eval gram set is tiny by nature (benchmarks
    * are), so it BROADCASTS and the check is a map-side join of the
    * training grams — no shuffle of the corpus at any scale. Output:
    * every training doc with its shared-gram count and flag (hits are
    * rare by construction; that sparseness is the realistic shape). */
  val EvalSource = "src0"
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Source filters sit BELOW the gram explode on both sides: the
    // benchmark slice explodes alone (it's tiny — that's the premise),
    // and the training side never materializes grams it won't check.
    val evalGrams = docGrams(docs.filter(col("source") === EvalSource), 5)
      .select(col("g")).distinct()
    val train = docs.filter(col("source") =!= EvalSource)
    val shared = docGrams(train, 5)
      .join(broadcast(evalGrams), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    train.select("doc_id", "source")
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    s"""${gramCte(5)},
       |e AS (SELECT DISTINCT g.g FROM g WHERE source = '$EvalSource'),
       |sh AS (
       |  SELECT doc_id, count(*) AS n_shared
       |  FROM g JOIN e USING (g) WHERE g.source != '$EvalSource'
       |  GROUP BY doc_id)
       |SELECT d.doc_id, d.source,
       |  coalesce(sh.n_shared, 0) AS n_shared,
       |  CAST(CASE WHEN coalesce(sh.n_shared, 0) > 0 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
       |FROM documents d LEFT JOIN sh USING (doc_id)
       |WHERE d.source != '$EvalSource'
       |ORDER BY d.doc_id""".stripMargin

  /** q94: bloom-filter decontamination — q66's check re-shaped for the
    * 100 TB corpus: instead of joining every training gram against the
    * eval gram set, the eval grams (small by nature — benchmarks are)
    * are folded into a Bloom filter ONCE (distributed treeAggregate
    * build, `Bloom.buildLong`) and every training gram probes the bits
    * map-side via the codegen'd `graft_bloom_contains` kernel — the
    * corpus side needs NO join and NO shuffle of gram traffic at all,
    * at the price of a one-sided, fpp-bounded error.
    *
    * The certificate row pins exactly that contract, in the q63
    * cross-engine shape (exact counts + booleans, never raw
    * bloom-dependent numbers):
    *  - `no_false_negatives`: not one exact-shared gram probed false —
    *    a THEOREM of the structure, certified per-gram, so the bloom
    *    path can only ever over-flag, never leak contamination;
    *  - `fp_docs_within_bound`: spuriously flagged docs ≤ 10. At
    *    fpp = 1e-6 and ~10² grams/doc the per-doc false-flag
    *    probability is ~1e-4, so the expected count at this SF is
    *    ~0.05 and the bound sits hundreds of σ out — deterministic in
    *    practice while still probing the real bit array.
    * The exact counts (train docs, distinct eval grams, contaminated
    * docs) are engine-independent and hash-checked against DuckDB.
    *
    * One eval-side count + treeAggregate (both over the tiny slice),
    * then a single pass over training grams probing the filter, with
    * the broadcast exact eval-gram set joined ONLY to certify the
    * bloom answers against truth — the production path drops that
    * join and keeps just the probe. */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val evalGrams = docGrams(docs.filter(col("source") === EvalSource), 5)
      .select(col("g")).distinct()
    // Driver-side scalars over the EVAL slice only (the premise is
    // that it is tiny): the distinct-gram count sizes the filter so
    // the realized fpp matches the requested one.
    val nEval = evalGrams.count()
    val bits = graft.functions.Bloom.buildLong(evalGrams, "g", nEval, 1e-6)
    val train = docs.filter(col("source") =!= EvalSource)
    val probed = docGrams(train, 5)
      .join(broadcast(evalGrams.withColumn("exact_hit", lit(1))), Seq("g"), "left")
      .select(col("doc_id"),
        call_function("graft_bloom_contains", lit(bits), col("g"))
          .cast("int").as("bloom_hit"),
        coalesce(col("exact_hit"), lit(0)).as("exact_hit"))
    val perDoc = probed.groupBy(col("doc_id")).agg(
      max(col("bloom_hit")).as("bloom_flag"),
      max(col("exact_hit")).as("exact_flag"),
      sum(when(col("exact_hit") === 1 && col("bloom_hit") === 0, 1L)
        .otherwise(0L)).as("fn_grams"))
    val cert = perDoc.agg(
      sum(col("exact_flag").cast("long")).as("n_contaminated"),
      sum(when(col("bloom_flag") === 1 && col("exact_flag") === 0, 1L)
        .otherwise(0L)).as("n_fp_docs"),
      sum(col("fn_grams")).as("fn_total"))
    train.agg(count(lit(1)).as("n_train_docs"))
      .crossJoin(cert)
      .select(
        col("n_train_docs"),
        lit(nEval).as("n_eval_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("fn_total"), lit(0L)) === lit(0L))
          .as("no_false_negatives"),
        (coalesce(col("n_fp_docs"), lit(0L)) <= lit(10L))
          .as("fp_docs_within_bound"))
  }

  val bloomDecontaminateSql: String =
    s"""${gramCte(5)},
       |e AS (SELECT DISTINCT g.g FROM g WHERE source = '$EvalSource'),
       |sh AS (
       |  SELECT doc_id
       |  FROM g JOIN e USING (g) WHERE g.source != '$EvalSource'
       |  GROUP BY doc_id)
       |SELECT
       |  (SELECT count(*) FROM documents WHERE source != '$EvalSource') AS n_train_docs,
       |  (SELECT count(*) FROM e) AS n_eval_grams,
       |  (SELECT count(*) FROM sh) AS n_contaminated,
       |  true AS no_false_negatives,
       |  true AS fp_docs_within_bound""".stripMargin

  /** q67: source mixing — rebalance the corpus so every source
    * contributes the same character budget (the domain-weighting pass
    * before packing). Per-source totals reduce to a tiny dimension;
    * the smallest total sets the budget; every row keeps or drops by
    * content hash against its source's rate — deterministic, join is
    * a broadcast of |sources| rows, and the one full-data pass is
    * map-only. Output: per-source audit (docs in/kept, rate in ppm).
    */
  def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val totals = docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("total_chars"), count(lit(1)).as("n_docs"))
    // Global-window min over the |sources|-row totals frame, NOT a
    // separate `totals.agg(min)` + crossJoin branch (which re-ran the
    // per-source aggregation — see `Windows.all` for the rationale).
    val rated = totals
      .withColumn("min_total", min(col("total_chars")).over(graft.core.Windows.all))
      .withColumn("rate_scaled",
        col("min_total").cast("double") * 1000000.0 / col("total_chars").cast("double"))
    docs.join(broadcast(rated), "source")
      .withColumn("keep",
        pmod(hash60(concat(lit("mix"), col("doc_id"))), lit(1000000L))
          .cast("double") < col("rate_scaled"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        first(floor(col("rate_scaled")).cast("long")).as("rate_ppm"))
      .orderBy("source")
  }

  // ---- q68: PII / pattern redaction audit ---------------------------

  /** RE2-safe redaction patterns (no backreferences, no lookaround —
    * they must mean the same thing to Java's regex engine and the
    * DuckDB/RE2 oracle; that rules out lookbehind boundary guards, so
    * `\b` — which RE2 does support — is the strongest anchor
    * available). Emails and IPv4 literals are the classic PII shapes;
    * the digit-run pattern is the catch-all that also turns a payload
    * into its *template* (the prop-mining trick: mask the variable
    * parts, group by what's left).
    *
    * The IPv4 octet alternation rejects values > 255 (so
    * `999.999.999.999` is NOT an <IP> — the digit pass still masks
    * it), and the `\b` guards stop matches starting or ending inside
    * a digit run. A dotted run like `1234.5.6.7.8` can still yield a
    * tail match (`.` is a non-word char, so `5` sits on a word
    * boundary) — over-masking, which is the safe failure direction
    * for redaction. */
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat  = s"\\b$Octet(\\.$Octet){3}\\b"
  val NumPat   = "[0-9]+"

  /** Masking chain, most-specific first: an email/IP must be swallowed
    * whole before the digit pass can nibble its octets. Map-only — a
    * redaction sweep at 100 TB is embarrassingly parallel and this
    * compiles to three codegen'd regexp_replace calls, no shuffle. */
  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      NumPat, "<NUM>")

  /** q68: redaction audit over the event stream's `props` payloads —
    * mask every PII-shaped span, then report one row per
    * (event_type, masked template) with how many events collapsed into
    * it and how many spans were masked. The redact pass is the
    * operator; the groupBy is the audit that proves (a) nothing
    * identifying survives and (b) payloads are template-stable. The
    * shuffle carries masked templates (bounded cardinality), never raw
    * payloads.
    *
    * `n_masked` counts ACTUAL replacements — each pattern is counted
    * on the string it runs against, before its own mask is applied —
    * so a payload that already contains a literal `<NUM>` doesn't
    * inflate the audit (counting sentinels in the output would). */
  def redactAudit(s: SparkSession, dir: String): DataFrame = {
    val afterEmail = regexp_replace(col("props"), EmailPat, "<EMAIL>")
    val afterIp    = regexp_replace(afterEmail, Ipv4Pat, "<IP>")
    Tables.events(s, dir)
      .select(col("event_type"),
        regexp_replace(afterIp, NumPat, "<NUM>").as("template"),
        (regexp_count(col("props"), lit(EmailPat)) +
          regexp_count(afterEmail, lit(Ipv4Pat)) +
          regexp_count(afterIp, lit(NumPat))).as("n_spans"))
      .groupBy(col("event_type"), col("template"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("n_spans").cast("long")).as("n_masked"))
      .orderBy("event_type", "template")
  }

  val redactAuditSql: String =
    s"""WITH m AS (
       |  SELECT event_type,
       |    regexp_replace(props, '$EmailPat', '<EMAIL>', 'g') AS s1,
       |    len(regexp_extract_all(props, '$EmailPat')) AS c_email
       |  FROM events),
       |m2 AS (
       |  SELECT event_type, c_email,
       |    regexp_replace(s1, '$Ipv4Pat', '<IP>', 'g') AS s2,
       |    len(regexp_extract_all(s1, '$Ipv4Pat')) AS c_ip
       |  FROM m),
       |m3 AS (
       |  SELECT event_type,
       |    regexp_replace(s2, '$NumPat', '<NUM>', 'g') AS template,
       |    c_email + c_ip + len(regexp_extract_all(s2, '$NumPat')) AS n_spans
       |  FROM m2)
       |SELECT event_type, template,
       |  count(*) AS n_events,
       |  CAST(sum(n_spans) AS BIGINT) AS n_masked
       |FROM m3
       |GROUP BY event_type, template
       |ORDER BY event_type, template""".stripMargin

  // ---- q69: repetition statistics (Gopher-style quality rule) -------

  /** q69: within-document repetition — the "most frequent word" and
    * "words repeated ≥ `RepMinCount` times" mass fractions that
    * repetition-based quality filters (Gopher rules 4–8) threshold on.
    * Token→60-bit hash BEFORE the explode hits the shuffle (8-byte
    * keys, never words); per-(doc, token) counts map-side combine, and
    * the second aggregation reduces to one row per doc. Ratios are
    * 1e-6-quantized (`floor(x·1e6+0.5)/1e6`) so both engines do the
    * same exact arithmetic. */
  val RepMinCount = 3
  def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), hash60(col("w")).as("h"))
    toks.groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"),
        sum(when(col("c") >= RepMinCount, col("c")).otherwise(0L)).as("n_rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_count"),
        (floor(col("top_count").cast("double") / col("n_tokens") * 1e6 + 0.5) / 1e6)
          .as("top_ratio"),
        (floor(col("n_rep").cast("double") / col("n_tokens") * 1e6 + 0.5) / 1e6)
          .as("rep_ratio"))
      .orderBy("doc_id")
  }

  val repetitionStatsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(w.w), 1, 15))::BIGINT AS h
       |  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS w) w),
       |c AS (SELECT doc_id, h, count(*) AS c FROM t GROUP BY doc_id, h),
       |a AS (
       |  SELECT doc_id,
       |    CAST(sum(c) AS BIGINT) AS n_tokens,
       |    count(*) AS n_distinct,
       |    CAST(max(c) AS BIGINT) AS top_count,
       |    CAST(sum(CASE WHEN c >= $RepMinCount THEN c ELSE 0 END) AS BIGINT) AS n_rep
       |  FROM c GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_distinct, top_count,
       |  floor(CAST(top_count AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6 AS top_ratio,
       |  floor(CAST(n_rep AS DOUBLE) / n_tokens * 1e6 + 0.5) / 1e6 AS rep_ratio
       |FROM a
       |ORDER BY doc_id""".stripMargin

  // ---- q70: per-domain cap sampling ---------------------------------

  /** q70: cap every source's contribution at `DomainCap` documents,
    * chosen by content-hash order (deterministic "random" — rerun- and
    * growth-stable, like every sampling op here). One window shuffle on
    * `source`; the heavy corpus columns never move — only (doc_id,
    * source) rows do, and the capped winners join nothing. This is the
    * "no domain dominates the mix" guard that runs right before
    * source-mix rebalancing. */
  val DomainCap = 15
  def domainCap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(hash60(concat(lit("cap"), col("doc_id"))), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= DomainCap)
      .orderBy("source", "rk")
  }

  val domainCapSql: String =
    s"""WITH r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ('0x' || substr(md5('cap' || doc_id::VARCHAR), 1, 15))::BIGINT, doc_id)
       |      AS rk
       |  FROM documents)
       |SELECT doc_id, source, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $DomainCap
       |ORDER BY source, rk""".stripMargin

  // ---- q71: end-to-end curation funnel ------------------------------

  /** q71: the composed curation pipeline — quality gate → normalized
    * dedup → per-source funnel audit — as ONE declarative plan (each
    * stage is certified alone by q37/q25; this certifies their
    * composition). The dedup winner is picked by a row_number window
    * over (norm_hash, passed) rather than a groupBy-and-join-back:
    * one scan, one window shuffle, one final aggregation, zero joins
    * — the same no-self-join discipline as q64. Output per source:
    * docs in, docs past the quality gate, canonical docs surviving
    * dedup, and the surviving token budget. */
  val QualityMin = 0.48
  def curationChain(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("double").as("chars"),
        split(col("text"), " ").as("t"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("norm"))
      .select(col("doc_id"), col("source"), col("norm"),
        size(col("t")).cast("double").as("n"),
        size(array_distinct(col("t"))).cast("double").as("nd"),
        col("chars"))
      .select(col("doc_id"), col("source"), md5(col("norm")).as("norm_hash"),
        col("n").cast("long").as("n_tokens"),
        ((col("nd") / col("n")) * 0.5 +
          least((col("chars") - (col("n") - 1)) / col("n") / 10.0, lit(1.0)) * 0.3 +
          least(col("n") / 100.0, lit(1.0)) * 0.2).as("score_raw"))
      .withColumn("passed",
        (floor(col("score_raw") * 1e6 + 0.5) / 1e6) >= QualityMin)
    val w = Window.partitionBy(col("norm_hash"), col("passed")).orderBy(col("doc_id"))
    scored
      .withColumn("canonical", col("passed") && row_number().over(w) === 1)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("passed"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("canonical"), 1L).otherwise(0L)).as("n_canonical"),
        sum(when(col("canonical"), col("n_tokens")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("source")
  }

  val curationChainSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, source,
       |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
       |    CAST(length(text) AS DOUBLE) AS chars
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, norm_hash, n_tokens,
       |    floor(((nd / n) * 0.5 + least((chars - (n - 1)) / n / 10.0, 1.0) * 0.3
       |      + least(n / 100.0, 1.0) * 0.2) * 1e6 + 0.5) / 1e6 >= $QualityMin AS passed
       |  FROM q),
       |c AS (
       |  SELECT doc_id, source, n_tokens, passed,
       |    passed AND row_number() OVER (PARTITION BY norm_hash, passed ORDER BY doc_id) = 1
       |      AS canonical
       |  FROM p)
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |  CAST(sum(CASE WHEN canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       |  CAST(sum(CASE WHEN canonical THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept
       |FROM c
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** q93 — the token-budget report: whitespace tokens and docs per
    * (source × train/valid/test split), with the split assigned by the
    * exact-fraction deterministic `Features.hashSplit3` (stratified by
    * source, keyed on doc_id). This is the table a data lead reads
    * before a run — does each split draw the intended share of each
    * source, and how many tokens does that actually buy — and because
    * the split is a pure function of (salt, doc_id), the report is
    * reproducible across reruns, engines and backfills. One
    * stratum-keyed window shuffle + one 60-row aggregation. */
  def tokenBudget(s: SparkSession, dir: String): DataFrame =
    graft.log.Features.hashSplit3(
        Tables.documents(s, dir), "source", "doc_id", "budget")
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy("source", "split")

  /** The `hashSplit3(documents, "source", "doc_id", "budget")` split
    * as a SQL CTE (yields `sp(doc_id, source, ntok, split)`) — shared
    * by the q93 and q95 oracles so the split definition cannot drift
    * between them (their Spark sides already share
    * `Features.hashSplit3`). */
  private[queries] val splitCteSql: String =
    """ranked AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ('0x' || substr(md5('budget' || doc_id::VARCHAR), 1, 15))::BIGINT ASC,
      |        doc_id ASC) AS rn,
      |    count(*) OVER (PARTITION BY source) AS cnt
      |  FROM documents),
      |sp AS (
      |  SELECT doc_id, source, ntok,
      |    CASE WHEN rn <= floor(0.6 * cnt) THEN 'train'
      |         WHEN rn <= floor(0.8 * cnt) THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM ranked)""".stripMargin

  val tokenBudgetSql: String =
    s"""WITH $splitCteSql
      |SELECT source, split,
      |  count(*) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS n_tokens
      |FROM sp
      |GROUP BY source, split
      |ORDER BY source, split""".stripMargin

  /** The q104 piece table — a TRAINED BPE merge list (r16 verdict
    * #6), committed as `src/main/resources/graft/bpe_pieces.txt` in
    * the vocab.txt convention (one piece per line, rank order, `#`
    * comments) by `graft.tools.TrainBpe`: standard most-frequent-pair
    * merges over the corpus's lowercase whitespace words,
    * lexicographic tie-break, piece length capped at the
    * `graft_subwords` kernel's 4-char longest-match window. Loaded
    * once at class init; the Spark kernel AND the generated oracle
    * SQL both read THIS Seq, so the two engines share one artifact
    * and a retrain re-certifies q104/q177 automatically. Greedy
    * longest-match over the table is the real tokenizer ALGORITHM
    * (what BPE inference does), now over a real trained table. */
  private[graft] val SubwordVocab: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/bpe_pieces.txt")
    require(in != null, "bpe_pieces.txt piece-table artifact missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val pieces =
      try src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      finally src.close()
    // Validate the artifact AT LOAD, not at first divergence: the
    // kernel receives the table as one comma-joined literal and the
    // oracle as quoted IN-lists per length class, so a piece with a
    // comma/quote would silently desync the engines and an empty
    // length class would generate invalid oracle SQL (`IN ()`).
    require(pieces.nonEmpty, "bpe_pieces.txt holds no pieces")
    require(pieces.distinct.size == pieces.size,
      "bpe_pieces.txt holds duplicate pieces")
    pieces.foreach(p => require(
      p.length >= 2 && p.length <= 4 && !p.exists(",'\" \t".contains(_)),
      s"piece '$p' violates the table contract (2-4 chars, no " +
        "comma/quote/whitespace)"))
    Seq(2, 3, 4).foreach(n => require(pieces.exists(_.length == n),
      s"bpe_pieces.txt has no $n-char pieces — the oracle's " +
        "per-length IN lists need every class populated"))
    pieces
  }
  private val V4 = SubwordVocab.filter(_.length == 4)
  private val V3 = SubwordVocab.filter(_.length == 3)
  private val V2 = SubwordVocab.filter(_.length == 2)

  /** Greedy longest-match subword count of one lowercase word, as a
    * pure HOF loop: `aggregate` over a length-n step counter carrying
    * (pos, cnt) — at each step match the longest vocab piece at `pos`
    * (4 → 3 → 2 chars, else a 1-char unknown), advance, count. The
    * loop body is branch-only string/int work, so it stays inside
    * whole-stage codegen; n steps bound the ≤ n real iterations
    * (iterations past the end are no-ops).
    *
    * This is the EXECUTABLE SPEC of the semantics; the production
    * q104 path uses the native `graft_subwords` kernel (one linear
    * scan, hash-set piece lookups — no per-word step array, no isin
    * chain), parity-pinned in RecallSubwordSpec. */
  private def subwordCount(w: Column): Column = {
    val n = length(w)
    aggregate(
      sequence(lit(1), n),
      struct(lit(1).as("pos"), lit(0L).as("cnt")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val step = when(w.substr(pos, lit(4)).isin(V4: _*), 4)
          .when(w.substr(pos, lit(3)).isin(V3: _*), 3)
          .when(w.substr(pos, lit(2)).isin(V2: _*), 2)
          .otherwise(1)
        when(pos > n, acc).otherwise(struct(
          (pos + step).as("pos"), (acc.getField("cnt") + 1L).as("cnt")))
      },
      acc => acc.getField("cnt"))
  }

  /** q104 — the q93 token-budget report at SUBWORD grain: whitespace
    * tokens under-count what a sequence actually costs (a model
    * consumes subwords, and long/rare words fan out), so mix decisions
    * made on whitespace counts systematically misprice code-like and
    * morphology-heavy sources. Same deterministic hashSplit3 strata as
    * q93, plus per-cell subword totals from the pinned greedy
    * longest-match vocab ([[SubwordVocab]]) and the subword-per-token
    * inflation ratio a data lead uses to convert historical budgets.
    *
    * Scale: the tokenize loop is map-side work in the corpus scan
    * (per-row HOFs, no shuffle added over q93); the aggregation is the
    * same 60-row (source × split) cell grid. Swapping the literal
    * vocab for a real BPE piece table changes ONLY the literal lists —
    * the plan shape is already the production one. */
  /** The whole-document HOF form (split → filter → per-word count →
    * sum) the kernel is parity-pinned against. */
  private[graft] def docSubwordsHof(text: Column): Column =
    aggregate(
      transform(
        filter(split(lower(text), " "), w => length(w) > 0),
        w => subwordCount(w)),
      lit(0L), (acc, x) => acc + x)

  def subwordBudget(s: SparkSession, dir: String): DataFrame =
    graft.log.Features.hashSplit3(
        Tables.documents(s, dir), "source", "doc_id", "budget")
      .withColumn("n_ws", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_sub",
        call_function("graft_subwords", lower(col("text")),
          lit(SubwordVocab.mkString(","))))
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("n_ws_tokens"),
        sum(col("n_sub")).as("n_subwords"))
      .withColumn("subwords_per_token",
        round(col("n_subwords") / col("n_ws_tokens"), 6))
      .orderBy("source", "split")

  /** Oracle rule text of the per-doc subword count — the recursive
    * greedy longest-match chain over the TRAINED piece table, ending
    * in `per_doc(doc_id, n_sub)`. ONE text shared by q104 and the
    * q177 subword mixture planner so the tokenizer rule cannot
    * drift between them. */
  private[queries] val subwordPerDocCteSql: String = {
    def inList(vs: Seq[String]) = vs.map("'" + _ + "'").mkString(", ")
    s"""w AS (
      |  SELECT doc_id, i, lower(wl[i]) AS wrd
      |  FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(wl))) AS i) g
      |  WHERE length(wl[i]) > 0),
      |r AS (
      |  SELECT doc_id, i, wrd, 1 AS pos, 0 AS cnt FROM w
      |  UNION ALL
      |  SELECT doc_id, i, wrd,
      |    pos + CASE WHEN substr(wrd, pos, 4) IN (${inList(V4)}) THEN 4
      |               WHEN substr(wrd, pos, 3) IN (${inList(V3)}) THEN 3
      |               WHEN substr(wrd, pos, 2) IN (${inList(V2)}) THEN 2
      |               ELSE 1 END,
      |    cnt + 1
      |  FROM r WHERE pos <= length(wrd)),
      |per_word AS (SELECT doc_id, i, cnt FROM r WHERE pos > length(wrd)),
      |per_doc AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_sub
      |  FROM per_word GROUP BY doc_id)""".stripMargin
  }

  val subwordBudgetSql: String =
    s"""WITH RECURSIVE $splitCteSql,
      |$subwordPerDocCteSql
      |SELECT sp.source, sp.split,
      |  count(*) AS n_docs,
      |  CAST(sum(sp.ntok) AS BIGINT) AS n_ws_tokens,
      |  CAST(sum(COALESCE(pd.n_sub, 0)) AS BIGINT) AS n_subwords,
      |  round(CAST(sum(COALESCE(pd.n_sub, 0)) AS DOUBLE)
      |    / sum(sp.ntok), 6) AS subwords_per_token
      |FROM sp LEFT JOIN per_doc pd ON pd.doc_id = sp.doc_id
      |GROUP BY sp.source, sp.split
      |ORDER BY sp.source, sp.split""".stripMargin

  /** Chunking contract (q100): fixed window of `ChunkSize` chars,
    * stride `ChunkStride` (so adjacent chunks overlap by
    * `ChunkSize - ChunkStride` chars — the RAG convention that no
    * retrieval boundary splits a fact). Offsets are 0, stride,
    * 2·stride, …; a doc of length L ≤ size yields exactly 1 chunk,
    * else 1 + ⌈(L − size) / stride⌉ (the last chunk may be short,
    * never empty). Integer-exact in both engines. */
  private[queries] val ChunkSize   = 200
  private[queries] val ChunkStride = 150

  /** q100 — deterministic document chunking (context-window prep for
    * RAG indexing / sequence packing): explode each document into its
    * overlapping fixed-size chunks and emit per-chunk identity —
    * (doc_id, chunk_idx, chunk_len, chunk_md5). The md5 doubles as
    * the chunk-level dedup key downstream (the same chunk text
    * appearing under two docs collides on it, the q24 digest idiom at
    * chunk granularity).
    *
    * Scale: map-only — `sequence` + `explode` fan out rows inside one
    * stage, no shuffle anywhere in the operator (the final orderBy is
    * oracle determinism, not part of the pipeline form). Chunk count
    * is ⌈L/stride⌉ per doc, so output size tracks corpus bytes ×
    * (size/stride) ≈ 1.33× — bounded, and the chunks themselves never
    * shuffle (downstream consumers group on the 16-byte md5, not the
    * text). At 100 TB this is the shape you want: chunking happens in
    * the same scan that reads the corpus, and only digests + indexes
    * leave the stage. */
  /** The shared chunk fan-out (doc_id, chunk_idx, chunk) that q100
    * identity and q102 chunk-grain dedup both consume — one contract,
    * one implementation, so the two can never drift. */
  private[queries] def chunkedDocs(s: SparkSession, dir: String): DataFrame =
    chunkedDocsOf(Tables.documents(s, dir))

  /** [[chunkedDocs]] over an explicit docs frame — the seam the
    * warehouse merge path uses to chunk ONLY the incoming batch. */
  private[queries] def chunkedDocsOf(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    docs
      .withColumn("n_chunks",
        when(len <= ChunkSize, lit(1L)).otherwise(
          lit(1L) + expr(
            s"(length(text) - $ChunkSize + ${ChunkStride - 1}) div $ChunkStride")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk",
        col("text").substr(
          (col("chunk_idx") * ChunkStride + 1).cast("int"), lit(ChunkSize)))
  }

  /** Oracle mirror of [[chunkedDocs]]: CTEs `n` (chunk counts) and `x`
    * (doc_id, chunk_idx, chunk), shared by q100 and q102 SQL. */
  private[queries] val chunkCteSql: String =
    s"""n AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(text) <= $ChunkSize THEN 1
      |         ELSE 1 + (length(text) - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride
      |    END AS n_chunks
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, i AS chunk_idx,
      |    substr(text, CAST(i * $ChunkStride + 1 AS INTEGER), $ChunkSize) AS chunk
      |  FROM n, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) g)""".stripMargin

  def docChunks(s: SparkSession, dir: String): DataFrame =
    chunkedDocs(s, dir)
      .select(
        col("doc_id"),
        col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  val docChunksSql: String =
    s"""WITH $chunkCteSql
      |SELECT doc_id, chunk_idx,
      |  CAST(length(chunk) AS BIGINT) AS chunk_len,
      |  md5(chunk) AS chunk_md5
      |FROM x
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- q111: chunk-grain (surgical) decontamination ------------------

  /** q111 — chunk-grain decontamination: WHICH chunks of a training
    * document share a word 5-gram with the benchmark slice. q66
    * answers "is this doc contaminated?" — the actionable modern form
    * is "drop the contaminated CHUNKS, keep the doc" (surgical
    * removal: a 50 kB doc with one quoted benchmark item shouldn't
    * cost its other 49.8 kB). Consumes both standing contracts at
    * once: the q100 chunk fan-out ([[chunkedDocs]] — same windows,
    * same offsets, so the emitted (doc_id, chunk_idx) keys join
    * directly against the q100 chunk index) and the q66 eval-gram
    * definition (same source slice, same 5-gram kernel, so doc-grain
    * and chunk-grain verdicts can't drift: any doc with a contaminated
    * chunk is exactly a q66-flagged doc whose shared gram survived
    * chunking intact).
    *
    * Output is SPARSE — only contaminated chunks appear (hits are rare
    * by construction; that's the realistic shape and the reason this
    * is cheap to apply: the purge set is small even when the corpus is
    * 100 TB).
    *
    * Scale: the q66/q94 posture unchanged — eval grams are tiny and
    * broadcast, the corpus side chunk-grams in its scan stage (the
    * native distinct-n-gram kernel per chunk) and probes map-side; the
    * only aggregation is over hit rows. The bloom form (q94) composes
    * the same way if the eval set ever outgrows a broadcast. Grams are
    * computed on the chunk's own text: a gram STRADDLING a chunk
    * boundary is attributed to neither chunk — the 50-char overlap
    * ([[ChunkSize]] − [[ChunkStride]]) exists exactly so that any
    * ≤ 50-char span (a 5-gram of ≤ 9-char words) lands whole in at
    * least one window. */
  def chunkDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val evalGrams = docGrams(docs.filter(col("source") === EvalSource), 5)
      .select(col("g")).distinct()
    val chunkGrams = chunkedDocs(s, dir)
      .filter(col("source") =!= EvalSource)
      .select(col("doc_id"), col("chunk_idx"),
        explode(call_function("graft_ngrams",
          split(col("chunk"), " "), lit(5))).as("g"))
    chunkGrams.join(broadcast(evalGrams), "g")
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id", "chunk_idx")
  }

  val chunkDecontaminateSql: String =
    s"""${gramCte(5)},
       |$chunkCteSql,
       |e AS (SELECT DISTINCT g.g FROM g WHERE source = '$EvalSource'),
       |cw AS (
       |  SELECT x.doc_id, x.chunk_idx, string_split(x.chunk, ' ') AS w
       |  FROM x JOIN documents d ON d.doc_id = x.doc_id
       |  WHERE d.source != '$EvalSource'),
       |cg AS (
       |  SELECT DISTINCT doc_id, chunk_idx,
       |    ('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT AS g
       |  FROM cw, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) r)
       |SELECT cg.doc_id, cg.chunk_idx, CAST(count(*) AS BIGINT) AS n_shared
       |FROM cg JOIN e USING (g)
       |GROUP BY cg.doc_id, cg.chunk_idx
       |ORDER BY doc_id, chunk_idx""".stripMargin

  val sourceMixSql: String =
    """WITH t AS (
      |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
      |  FROM documents GROUP BY source),
      |m AS (SELECT min(total_chars) AS min_total FROM t),
      |r AS (
      |  SELECT source, n_docs,
      |    CAST(min_total AS DOUBLE) * 1000000.0 / CAST(total_chars AS DOUBLE) AS rate_scaled
      |  FROM t, m)
      |SELECT d.source,
      |  count(*) AS n_docs,
      |  CAST(sum(CASE WHEN
      |      CAST(('0x' || substr(md5('mix' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 AS DOUBLE)
      |        < r.rate_scaled
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(floor(r.rate_scaled) AS BIGINT) AS rate_ppm
      |FROM documents d JOIN r USING (source)
      |GROUP BY d.source, r.rate_scaled
      |ORDER BY d.source""".stripMargin

  // ---- q127: mixture planner under availability constraints ----------

  /** q127 — the MIXTURE PLANNER: given per-source token availability
    * and a target mixture (weights ∝ source index + 1 — a pinned
    * stand-in for the data lead's ratio table; swapping weights
    * changes one expression), compute the LARGEST total token budget
    * B* the corpus can serve at that mixture, and each source's take
    * and sampling rate under it. This is the planning step ABOVE
    * q67/q77/q93: those execute a sampling decision, this derives it —
    * B* = min over sources of availᵢ·den/wᵢ (the binding-constraint
    * rule: the scarcest source relative to its target share caps the
    * whole mix), takeᵢ = B*·wᵢ/den ≤ availᵢ by construction.
    *
    * Every number is exact int64 arithmetic (products ≤ avail·den ≪
    * 2⁶³ at any plausible corpus; floor division both engines): the
    * oracle checks the plan to the last token. `binding` marks the
    * limiting source(s) — the row a data lead acts on (buy/crawl more
    * of THAT, or lower its weight).
    *
    * Scale shape: one map-side-combined aggregation to
    * (source, avail) — |sources| rows; the planning windows run on
    * that constant-size frame. */
  def mixturePlanner(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
    Tables.documents(s, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("source")
      .agg(sum(col("toks")).as("avail_tokens"))
      // Fixture contract (pinned): source names are 'src<N>', so the
      // weight is the UNBOUNDED numeric suffix + 1 — the same parse
      // rule as the oracle's substr(source, 4) (ADVICE r12: the old
      // 10-char bound could silently diverge the engines on a long
      // suffix). A non-conforming source parses to NULL and fails
      // LOUDLY here instead of silently nulling `den` and poisoning
      // every row of the plan.
      .withColumn("w", srcWeightCol)
      .withColumn("den", sum(col("w")).over(wAll))
      .withColumn("b", expr("(avail_tokens * den) div w"))
      .withColumn("b_star", min(col("b")).over(wAll))
      .select(
        col("source"), col("w"), col("avail_tokens"),
        expr("(b_star * w) div den").as("take_tokens"),
        expr("(((b_star * w) div den) * 1000000) div avail_tokens")
          .as("rate_ppm"),
        (col("b") === col("b_star")).as("binding"))
      .orderBy("source")
  }

  // ---- q177: mixture planner at SUBWORD grain (r16 verdict #6) -------

  /** q177 — [[mixturePlanner]] with availability at SUBWORD grain:
    * what a model consumes is subwords, so planning a mixture on
    * whitespace availability misprices morphology-heavy / code-like
    * sources exactly the way q104 quantifies. Same exact int64
    * planning arithmetic as q127 (binding-constraint B*, takes,
    * ppm rates), availᵢ = Σ `graft_subwords` over the TRAINED piece
    * table — the native kernel in the corpus scan, one
    * map-side-combined aggregation to |sources| rows, the planning
    * windows on that constant frame. The oracle recomputes the
    * tokenizer (the shared [[subwordPerDocCteSql]] rule text) AND
    * the plan from raw text. */
  def subwordMixturePlanner(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
    Tables.documents(s, dir)
      .select(col("source"),
        call_function("graft_subwords", lower(col("text")),
          lit(SubwordVocab.mkString(","))).as("toks"))
      .groupBy("source")
      .agg(sum(col("toks")).as("avail_subwords"))
      .withColumn("w", srcWeightCol)
      .withColumn("den", sum(col("w")).over(wAll))
      .withColumn("b", expr("(avail_subwords * den) div w"))
      .withColumn("b_star", min(col("b")).over(wAll))
      .select(
        col("source"), col("w"), col("avail_subwords"),
        expr("(b_star * w) div den").as("take_subwords"),
        expr("(((b_star * w) div den) * 1000000) div avail_subwords")
          .as("rate_ppm"),
        (col("b") === col("b_star")).as("binding"))
      .orderBy("source")
  }

  val subwordMixturePlannerSql: String =
    s"""WITH RECURSIVE $subwordPerDocCteSql,
      |t AS (
      |  SELECT d.source,
      |    CAST(sum(COALESCE(pd.n_sub, 0)) AS BIGINT) AS avail_subwords
      |  FROM documents d LEFT JOIN per_doc pd ON pd.doc_id = d.doc_id
      |  GROUP BY d.source),
      |ww AS (
      |  SELECT source, avail_subwords,
      |    CAST(substr(source, 4) AS BIGINT) + 1 AS w
      |  FROM t),
      |m AS (
      |  SELECT source, avail_subwords, w,
      |    CAST(sum(w) OVER () AS BIGINT) AS den,
      |    (avail_subwords * CAST(sum(w) OVER () AS BIGINT)) // w AS b
      |  FROM ww),
      |f AS (
      |  SELECT source, w, avail_subwords, den, b,
      |    CAST(min(b) OVER () AS BIGINT) AS b_star
      |  FROM m)
      |SELECT source, w, avail_subwords,
      |  (b_star * w) // den AS take_subwords,
      |  (((b_star * w) // den) * 1000000) // avail_subwords AS rate_ppm,
      |  (b = b_star) AS binding
      |FROM f
      |ORDER BY source""".stripMargin

  val mixturePlannerSql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
      |  FROM documents GROUP BY source),
      |ww AS (
      |  SELECT source, avail_tokens,
      |    CAST(substr(source, 4) AS BIGINT) + 1 AS w
      |  FROM t),
      |m AS (
      |  SELECT source, avail_tokens, w,
      |    CAST(sum(w) OVER () AS BIGINT) AS den,
      |    (avail_tokens * CAST(sum(w) OVER () AS BIGINT)) // w AS b
      |  FROM ww),
      |f AS (
      |  SELECT source, w, avail_tokens, den, b,
      |    CAST(min(b) OVER () AS BIGINT) AS b_star
      |  FROM m)
      |SELECT source, w, avail_tokens,
      |  (b_star * w) // den AS take_tokens,
      |  (((b_star * w) // den) * 1000000) // avail_tokens AS rate_ppm,
      |  (b = b_star) AS binding
      |FROM f
      |ORDER BY source""".stripMargin

  // ---- q181: MODEL-BASED quality filter (r17) -------------------------

  /** The committed q181 model artifact (`quality_lr.txt`): line 1 the
    * bias, then one weight per hash bucket, all MICRO-INTEGERS
    * (round(w·1e6)) — scoring is an exact integer dot product, so
    * both engines agree bit for bit with no exp()/double-sum hazards.
    * Bucket count derives from the artifact (retraining with a wider
    * table re-certifies automatically — the bpe_pieces discipline).
    * Trained by [[graft.tools.TrainQualityLr]] on the q27 hashed-
    * token-set features, weak-labeled by the q37 heuristic gate. */
  private[graft] val QualityLr: (Long, Seq[Long]) = {
    val in = getClass.getResourceAsStream("/graft/quality_lr.txt")
    require(in != null, "quality_lr.txt model artifact missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val vals =
      try src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#")).map(_.toLong).toVector
      finally src.close()
    require(vals.length >= 3,
      s"quality_lr.txt needs a bias and >= 2 bucket weights, got ${vals.length}")
    (vals.head, vals.tail)
  }

  /** Per-document model logit (micro units) from a (doc_id, hs)
    * token-hash-set frame: bias + Σ_{h ∈ hs} w[h mod buckets] — the
    * exact-integer fold both q181 sides share. A null hash set (null
    * text) contributes nothing beyond the bias. */
  private[graft] def qualityLogitMicro(hs: Column): Column = {
    val (bias, w) = QualityLr
    val wLit = typedLit(w)
    lit(bias) + coalesce(
      aggregate(
        transform(hs, h =>
          element_at(wLit, (pmod(h, lit(w.length.toLong)) + 1).cast("int"))),
        lit(0L), (a, x) => a + x),
      lit(0L))
  }

  /** q181 — the MODEL-BASED quality filter (the CCNet-style
    * distillation stage a 100 TB curation pipeline runs after the
    * heuristics): every document scored by the pinned linear model
    * over hashed-token bag features, aggregated per source — docs,
    * passes (logit > 0 ⟺ p > 0.5), and the exact integer logit sum.
    * Reads the STORED `token_hashes` and `doc_stats` tables only (the
    * audit discipline: the features ARE the dedup chain's stored
    * stage); the oracle re-derives the hash sets from raw text
    * through the factored q27 `t` rule text and applies the SAME
    * artifact weights. Scale: one map-side fold per doc (64 integer
    * adds), one keyed exchange on source — the gate runs in the scan
    * stage at any corpus size.
    *
    * The model is deliberately a DISTILLATION of the q37 heuristic
    * (weak labels; committed train accuracy 0.707 vs 0.522 majority —
    * the artifact header records it): the production swap-in is human
    * or LM quality ratings on the same plumbing. */
  def modelQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val t = Warehouse.stored(s, dir, "token_hashes")
    val ds = Warehouse.stored(s, dir, "doc_stats")
      .select(col("doc_id"), col("source"))
    t.select(col("doc_id"), qualityLogitMicro(col("hs")).as("logit_micro"))
      .join(ds, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("logit_micro") > 0L).cast("long")).as("n_pass"),
        sum(col("logit_micro")).as("sum_logit_micro"))
      .orderBy("source")
  }

  /** The oracle's per-doc model logit chain — `t` (token hash sets
    * from raw text, the factored q27 rule) → `sc(doc_id,
    * logit_micro)` with the committed artifact weights inlined as a
    * VALUES table. ONE rule text for q181 (per-source aggregate) and
    * q187 (streamed per-doc admission), so the two certificates
    * cannot drift on the model arithmetic. */
  private def qualityLogitCteSql: String = {
    val (bias, w) = QualityLr
    val values = w.zipWithIndex
      .map { case (wm, b) => s"($b, CAST($wm AS BIGINT))" }.mkString(", ")
    s"""${Dedup.tokenSetCteSqlFor()},
       |w(b, wm) AS (VALUES $values),
       |x AS (SELECT doc_id, unnest(hs) AS h FROM t),
       |sw AS (
       |  SELECT x.doc_id, CAST(SUM(w.wm) AS BIGINT) AS s
       |  FROM x JOIN w ON w.b = x.h % ${w.length}
       |  GROUP BY x.doc_id),
       |sc AS (
       |  SELECT t.doc_id,
       |    CAST($bias AS BIGINT) + COALESCE(sw.s, 0) AS logit_micro
       |  FROM t LEFT JOIN sw ON sw.doc_id = t.doc_id)""".stripMargin
  }

  val modelQualityFilterSql: String =
    s"""WITH $qualityLogitCteSql
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN sc.logit_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pass,
       |  CAST(sum(sc.logit_micro) AS BIGINT) AS sum_logit_micro
       |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  // ---- q187: the STREAMING quality gate certified (r17 verdict #6) ---

  private val streamQualityFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Boolean)]()

  /** Replay the corpus through a REAL micro-batch stream — the
    * documents re-laid as multiple parquet files, a FileStreamSource
    * with maxFilesPerTrigger=1 (so several genuine triggers fire),
    * [[graft.streaming.StreamOps.qualityGate]] applied in-stream, a
    * checkpointed parquet sink — then compare the drained admission
    * rows against the batch gate over the same docs. Memoized per
    * corpus dir (the q176 fixture discipline). */
  private def ensureStreamQuality(s: SparkSession,
      dir: String): (String, Boolean) =
    streamQualityFixtures.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-streamq").toString
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      docs.repartition(3).write.parquet(s"$root/src")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
      val q = graft.streaming.StreamOps.qualityGate(stream, "text")
        .select(col("doc_id"), col("quality_logit_micro"),
          col("quality_pass"))
        .writeStream.format("parquet")
        .option("path", s"$root/sink")
        .option("checkpointLocation", s"$root/ck")
        .start()
      q.processAllAvailable(); q.stop()
      val streamed = s.read.parquet(s"$root/sink")
      val batch = graft.streaming.StreamOps.qualityGate(docs, "text")
        .select(col("doc_id"), col("quality_logit_micro"),
          col("quality_pass"))
      val matches = streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty
      (s"$root/sink", matches)
    })

  /** q187 — STREAM ADMISSION ≡ the batch q181 pass, content level
    * (the q176 idiom at the quality grain): every document's model
    * logit and pass flag as the SPEED LAYER emitted them from a real
    * replayed multi-trigger stream, hash-checked against DuckDB
    * re-deriving the artifact logit from raw text — plus the live
    * `matches_batch` flag pinning streamed ≡ batch row-identity. A
    * gate that scored even one document differently in-stream (state
    * leakage, a drifted feature text, a lost or duplicated trigger)
    * is a hash mismatch here, not a curation-time surprise. Scale:
    * the gate is stateless and map-only per micro-batch; the
    * certificate's cost is the replay itself. */
  def streamQualityCertify(s: SparkSession, dir: String): DataFrame = {
    val (sink, matches) = ensureStreamQuality(s, dir)
    s.read.parquet(sink)
      .select(col("doc_id"), col("quality_logit_micro"),
        col("quality_pass"), lit(matches).as("matches_batch"))
      .orderBy("doc_id")
  }

  val streamQualityCertifySql: String =
    s"""WITH $qualityLogitCteSql
       |SELECT doc_id, logit_micro AS quality_logit_micro,
       |  logit_micro > 0 AS quality_pass, TRUE AS matches_batch
       |FROM sc
       |ORDER BY doc_id""".stripMargin

  // ---- q182: training-shard MANIFEST (r17) ----------------------------

  /** Per-(shard, bin) manifest of a q65 pack assignment: row count,
    * exact token sum, id range, and an md5 over the ordered doc_id
    * list — the integrity record a trainer checks before consuming a
    * shard (and the idempotence witness for re-exports: same corpus,
    * same manifest, byte for byte). */
  private[graft] def manifestOf(pack: DataFrame): DataFrame =
    pack.groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("ids_md5"))
      .orderBy("shard", "bin")

  /** q182 — the training-shard manifest over the q65 pack (the LAST
    * MILE of the curation pipeline: what actually ships to a
    * trainer). One rule text with q65 on both engines (`packCteSql`),
    * so the manifest can never drift from the layout; the digest
    * column makes a silently dropped or duplicated document a hash
    * mismatch, not a training-time surprise.
    * [[graft.sources.Sinks.writeTrainingShards]] writes the physical
    * tree this manifest describes (round-trip spec-pinned). Scale:
    * the pack's per-shard window exchange, then a (shard, bin) keyed
    * aggregate — rows out = shards · bins. */
  def shardManifest(s: SparkSession, dir: String): DataFrame =
    manifestOf(packSequences(s, dir))

  val shardManifestSql: String =
    s"""WITH $packCteSql
       |SELECT shard, bin,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_md5
       |FROM pk
       |GROUP BY shard, bin
       |ORDER BY shard, bin""".stripMargin
}
