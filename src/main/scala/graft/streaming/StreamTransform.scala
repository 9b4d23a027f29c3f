package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.log.{Features, LogParser, Templates}
import graft.ml.Scorer

/** Stateless per-micro-batch enrichment (SURVEY.md §2.8 "Transform",
  * §3.2; reference `transform.py:8-97`, `kafka_consumer.py:29-37`).
  *
  * The reference re-parses each message's raw `log_full` text with
  * pandas regexes, rebuilds the per-block event counts, scores them,
  * and attaches `features` + `prediction`. Here the SAME batch-layer
  * code paths (`graft.log.LogParser` / `Templates` / `Features`) run
  * over the micro-batch DataFrame — one engine, two cadences — and
  * scoring is a codegen'd expression via `graft.ml.Scorer`.
  *
  * Every step is per-block-id local: the only shuffle is the
  * `eventCounts` aggregation keyed by block_id, whose group state is
  * one int per template — at full scale a micro-batch enrich is a
  * short map + one tiny keyed agg, no driver involvement.
  */
object StreamTransform {

  /** Keep only the newest message per block (last-write-wins upsert key
    * semantics, matching the reference's rowkey=BlockId overwrite).
    * Must run BEFORE line re-parse: two copies of one block in a batch
    * would otherwise double its event counts. Micro-batches are small,
    * so the row_number window is a per-batch detail, not a scale risk. */
  def dedupeLatest(messages: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("block_id"))
      .orderBy(col("end_ts").desc_nulls_last, col("num_lines").desc)
    messages.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** messages + templates + scorer → messages enriched with
    * `features array<int>`, `proba double`, `prediction int`, `ts_ms`
    * — MAP-ONLY (r18 verdict #5). The production stream form:
    * a message is a pre-blocked document (the reference's consumer
    * transforms ONE message at a time, `transform.py:8-97` — it never
    * groups across messages), so its feature vector is a pure
    * function of its own `log_full` text. Each row filters its lines
    * to its OWN re-extracted block id, tags them through the native
    * template kernel inside array HOFs, and counts per template —
    * zero exchanges besides [[dedupeLatest]]'s per-batch window, so
    * per-batch wall is decode + one map pass at ANY batch size
    * (measured 5.4× the [[enrich]] rows/s at the 2 k-message bench
    * shape, where enrich's explode → keyed agg → join chain cost ~5
    * scheduled stages of overhead per micro-batch).
    *
    * Value-identity with [[enrich]] holds whenever messages are
    * block-local (every line names the message's own block) — the
    * production invariant of the reference's upstream blocking, spec-
    * pinned (StreamingSpec). The forms differ only on a batch whose
    * message text names ANOTHER message's block: [[enrich]]'s global
    * regroup attributes such lines across messages (the batch-layer
    * formulation, where lines arrive unblocked); this form keeps
    * every message's verdict a function of its own payload — what a
    * per-message consumer computes.
    *
    * Blocks whose text matches no template get all-zero features —
    * the reference's explicit fallback (`transform.py:83-86`).
    * INTENTIONAL divergence (documented, ADVICE r19): the reference
    * has an EARLIER branch (`transform.py:79-82`) that, when a
    * payload's lines name only FOREIGN blocks, falls back to the
    * first parsed block's features and returns THAT block's id; this
    * form instead keeps the message's own `block_id` with all-zero
    * features. Under the block-local invariant above (every line
    * names its own block — how the reference's producer builds the
    * payload) the branch is unreachable, so the two agree on every
    * production message; on an adversarial foreign-lines payload this
    * form's per-message attribution is the deliberate choice. */
  def enrichLocal(
      messages: DataFrame,
      templates: Seq[Templates.Template],
      scorer: Scorer,
      threshold: Double = Scorer.DefaultThreshold): DataFrame = {
    val ids = templates.map(_.id)
    val deduped = dedupeLatest(messages)
    val ownLines = filter(split(col("log_full"), "\n"),
      l => LogParser.blockOf(l) === col("block_id"))
    val events = transform(ownLines,
      l => Templates.eventIdColumnNative(templates, LogParser.messageOf(l)))
    val features = array(ids.map(id =>
      size(filter(col("__events"), e => e === lit(id)))): _*)
    deduped
      .withColumn("__events", events)
      .withColumn("features", features)
      .drop("__events")
      .withColumn("proba", scorer.proba(col("features")))
      .withColumn("prediction", (col("proba") >= threshold).cast("int"))
      .withColumn("ts_ms", unix_millis(col("end_ts")))
  }

  /** messages + templates + scorer → messages enriched with
    * `features array<int>`, `proba double`, `prediction int`, `ts_ms`.
    *
    * The BATCH-formulated enrich: explode lines, regroup by the
    * re-extracted block id across the whole micro-batch, join counts
    * back (the q62 shape — correct when lines arrive unblocked).
    * The stream pipeline serves [[enrichLocal]] instead (map-only;
    * see its scaladoc for the exact semantic boundary); this form
    * remains the cross-message-grouping reference point the
    * value-identity spec compares against.
    *
    * Blocks whose text matches no template get all-zero features — the
    * reference's explicit fallback (`transform.py:83-86`). */
  def enrich(
      messages: DataFrame,
      templates: Seq[Templates.Template],
      scorer: Scorer,
      threshold: Double = Scorer.DefaultThreshold): DataFrame = {
    val ids = templates.map(_.id)
    val deduped = dedupeLatest(messages)
    // The block id is re-extracted from the log text itself (the
    // reference does the same: `transform.py:26,55`), so the parse
    // stage is exactly the batch-layer parse with no extra plumbing.
    val lines = deduped.select(explode(split(col("log_full"), "\n")).as("value"))
    val parsed = LogParser.withBlock(LogParser.parse(lines, "value"))
    val tagged = Templates.tagNative(parsed, templates)
    val counts = Features.eventCounts(tagged, ids)
    val features = array(ids.map(i => coalesce(col(i), lit(0))): _*)
    deduped
      .join(counts, Seq("block_id"), "left")
      .withColumn("features", features)
      .drop(ids: _*)
      .withColumn("proba", scorer.proba(col("features")))
      .withColumn("prediction", (col("proba") >= threshold).cast("int"))
      .withColumn("ts_ms", unix_millis(col("end_ts")))
  }
}
