package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-native dedup and sessionization (SURVEY §2.8 depth).
  *
  * These are the declarative complements to the imperative paths
  * already in the engine: `dropDuplicatesWithinWatermark` is the
  * stream-side of the batch dedup family (q24/q25 hash the corpus;
  * this bounds replay/at-least-once double-delivery state by the
  * watermark), and `session_window` is the built-in gap-session
  * aggregation that expresses `StatefulSessionize`'s common case
  * without custom state code (keep mapGroupsWithState only for
  * semantics session_window can't say — mid-session snapshots,
  * custom eviction payloads).
  *
  * Scale: both keep per-key state bounded by the watermark — the
  * state store holds only keys seen within the lag window, so state
  * size tracks the key-arrival RATE, not the corpus. That is the
  * difference between a stream job that runs for a year and one that
  * OOMs in week two.
  */
object StreamOps {

  /** Exactly-once-looking dedup over an at-least-once stream: drops
    * re-deliveries of the same `keys` arriving within the watermark
    * lag of the first copy. Batch frames fall back to plain
    * `dropDuplicates` (same result set; no state to bound). */
  def dedup(df: DataFrame, keys: Seq[String], tsCol: String,
      watermark: String = "5 minutes"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** Stream-stream interval join (the attribution join, live): each
    * left event pairs with right events of the same key arriving
    * within `[leftTs, leftTs + within]`. Both watermarks PLUS the
    * interval condition are what let Spark evict buffered rows — a
    * stream-stream join without a time bound buffers both streams
    * forever; with it, each side's state holds only rows younger than
    * watermark + interval. Column names must be disjoint across
    * sides (standard stream-stream join requirement). Works on batch
    * frames identically (the watermark is a no-op there). */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      within: String, watermark: String = "1 minute"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
        s"$rightTs >= $leftTs AND $rightTs <= $leftTs + interval $within"))
  }

  /** Stream-side benchmark decontamination: drop documents whose any
    * hashed word n-gram hits the (broadcast-as-literal) eval bloom —
    * the q94 bloom path applied AT INGESTION, so contaminated text
    * never lands in the corpus instead of being purged later. The
    * whole probe is one codegen'd per-row expression (gram array →
    * `exists` over `graft_bloom_contains`): map-only and STATELESS,
    * so it composes with any watermark/output mode and adds zero
    * state-store pressure — exactly the property a curation stage
    * needs to run inside the speed layer. The bloom's no-false-
    * negative guarantee means a dropped-set audit only ever finds
    * fpp-bounded over-drops, never leakage (the q94 certificate).
    * Works identically on batch frames.
    *
    * NULL text is KEPT explicitly (ADVICE r12): `exists` over a null
    * gram array yields null and a bare `!null` filter would silently
    * drop the row — an over-drop outside the advertised fpp bound. A
    * null document has no n-grams, so it cannot be contaminated; the
    * `coalesce(..., false)` pins that contract.
    *
    * Bloom size caveat: the bits ride the plan as an expression
    * LITERAL — ideal for the ≤ a-few-hundred-KB eval blooms this stage
    * targets (one broadcast-free codegen'd probe), but a multi-MB
    * bloom would inflate every task's serialized plan; at that size
    * switch the caller to a broadcast variable + UDF-free join on the
    * q94 batch path instead. */
  def decontaminate(df: DataFrame, textCol: String, bloomBits: Array[Byte],
      n: Int = 5): DataFrame =
    df.filter(!coalesce(
      exists(
        call_function("graft_ngrams", split(col(textCol), " "), lit(n)),
        g => call_function("graft_bloom_contains", lit(bloomBits), g)),
      lit(false)))

  /** STREAMING incremental dedup (round-13 verdict #6): flag each
    * incoming document against the STANDING band index — q113's
    * candidate probe moved into the speed layer. The stored q28 index
    * rides along as a bloom over its bucket hashes
    * (`Dedup.bandHashBloom`), and the whole probe is ONE codegen'd
    * per-row expression: MinHash signature → two band hashes → bloom
    * membership (`Dedup.bandHashes60` — no explode, no join, no
    * shuffle). STATELESS like [[decontaminate]]: zero state-store
    * rows at any stream length; the only memory is the bloom's fixed
    * bits (O(index buckets), built once per index version).
    *
    * Contract (the LSH detection event, advisory by design): a doc
    * sharing a band bucket with the index is ALWAYS flagged (bloom =
    * no false negatives over the band probe); over-flagging is
    * fpp-bounded. Flagged docs route to the batch confirmer (q113's
    * exact-Jaccard verdict) instead of being dropped blind — exactly
    * how a production speed layer splits cheap-routing from exact
    * adjudication. NULL text is kept unflagged via an EXPLICIT
    * null-gate (ADVICE r13): unlike [[decontaminate]]'s gram array,
    * `bandHashes60` over null text does NOT propagate null — the
    * all-null signature components fall through `concat_ws` (which
    * skips nulls) to md5("") and yield two REAL band hashes, so a
    * null-text doc would collide with any null-text doc already in
    * the index. The `when(isNull)` gate pins the contract instead of
    * relying on null propagation that never occurs. Works identically
    * on batch frames (the spec's stream≡batch parity). */
  def flagIndexDuplicates(df: DataFrame, textCol: String,
      bloomBits: Array[Byte]): DataFrame =
    df.withColumn("dup_candidate",
      when(col(textCol).isNull, lit(false)).otherwise(coalesce(
        exists(graft.queries.Dedup.bandHashes60(col(textCol)),
          b => call_function("graft_bloom_contains", lit(bloomBits), b)),
        lit(false))))

  /** STREAMING model-quality gate (r17): the q181 pinned linear model
    * scored per incoming document — the SAME micro-integer logit
    * expression the batch filter runs (one loaded artifact, one
    * feature rule text: [[graft.queries.Dedup.tokenHashSetCol]]), so
    * the speed layer admits exactly the documents the warehouse-side
    * q181 pass would. STATELESS: one codegen'd per-row fold (64
    * integer adds), zero state-store rows, works identically on batch
    * frames (the spec's stream ≡ batch parity). Adds
    * `quality_logit_micro` and `quality_pass` (logit > 0 ⟺ p > 0.5);
    * docs route on the flag — DROPPING is the caller's policy, the
    * gate only measures (the flagIndexDuplicates discipline). NULL
    * text scores exactly the bias, the batch contract. */
  def qualityGate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("quality_logit_micro",
        graft.queries.PipelineOps.qualityLogitMicro(
          graft.queries.Dedup.tokenHashSetCol(col(textCol))))
      .withColumn("quality_pass", col("quality_logit_micro") > 0L)

  /** Gap-based sessions via the built-in `session_window`: a session
    * extends while events keep arriving within `gap` of the previous
    * one and closes `gap` after the last. Emits one row per closed
    * session (streaming: append mode, sessions finalize when the
    * watermark passes session end). Works identically on batch
    * frames — the batch/stream parity the rest of the speed layer
    * already follows. */
  def gapSessions(df: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermark: String = "5 minutes"): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_millis(col("sw.start")).as("session_start_ms"),
        unix_millis(col("sw.end")).as("session_end_ms"),
        col("n_events"))
  }
}
