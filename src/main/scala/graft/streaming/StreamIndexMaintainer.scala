package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Warehouse

/** The speed layer MAINTAINING the batch layer's index: a document
  * stream merged into the materialized warehouse, one atomic version
  * per micro-batch (SURVEY.md §2.8 + §8 round-14 rows).
  *
  * The reference has no counterpart — its stream layer only writes
  * serving rows (`insert_data_to_HBase.py:6-46`); its dedup/index
  * artifacts are notebook batch jobs. But a 100 TB training-data
  * pipeline can't rebuild a corpus index per arrival hour, and round
  * 13/14 built exactly the pieces this needs: `Warehouse.mergeBatch`
  * appends O(batch) leaf rows (hard-linking the standing files),
  * reclusters only touched components/cells, and commits one atomic
  * pointer. This object is the thin, exactly-once wiring from a
  * Structured Streaming source onto that write path:
  *
  *  - **at-least-once in, exactly-once out**: foreachBatch can
  *    re-deliver a batch after a crash; `mergeBatch(streamBatchId)`
  *    records the batch id IN the snapshot pointer (one atomic file —
  *    the `ServingStore.upsert` high-water discipline) and re-applies
  *    nothing at or below the mark. The mark survives interleaved
  *    non-stream writers (`compact` carries it forward).
  *  - **readers never block**: every micro-batch is a full snapshot
  *    version; audits/increments read `_CURRENT` and see pre- or
  *    post-merge, never half-merged.
  *  - **embeddings ride the batch**: `embOf` maps a doc micro-batch to
  *    the vectors arriving with it (None for a doc-grain-only
  *    warehouse — `mergeBatch` refuses a semantic-grain warehouse
  *    without them rather than committing silently stale tables).
  */
object StreamIndexMaintainer {

  /** The delivering stream's IDENTITY (ADVICE r14): the Structured
    * Streaming query id from the checkpoint's `metadata` file — minted
    * once when a checkpoint is created, stable across restarts of that
    * checkpoint, FRESH when the checkpoint is lost and recreated.
    * Exactly the identity the replay guard needs: batch ids are
    * monotone per checkpoint, so a recreated checkpoint (ids restart
    * at 0) shows up as a NEW identity and `Warehouse.isReplay` refuses
    * loudly instead of silently dropping its batches as replays. Read
    * lazily per batch (the file exists from stream start, before the
    * first foreachBatch call); None when absent (direct sink calls in
    * certificates — the documented one-stream-per-store invariant). */
  private[streaming] def checkpointQueryId(
      checkpointDir: String): Option[String] = {
    val p = java.nio.file.Paths.get(checkpointDir, "metadata")
    if (!java.nio.file.Files.exists(p)) None
    else """"id"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(java.nio.file.Files.readString(p)).map(_.group(1))
  }

  /** The foreachBatch sink body, exposed for replay-path tests and
    * the q140 certificate (the q99 idiom: certify through the REAL
    * sink function, not a copy). `streamId` supplies the delivering
    * stream's identity per batch ([[checkpointQueryId]] when wired by
    * [[run]]; () => None for direct certificate calls). */
  def sink(s: SparkSession, whDir: String,
      embOf: (DataFrame, Long) => Option[DataFrame],
      streamId: () => Option[String] = () => None)(
      batch: DataFrame, batchId: Long): Unit = {
    Warehouse.mergeBatch(s, whDir, batch, embOf(batch, batchId),
      streamBatchId = Some(batchId), streamId = streamId())
    ()
  }

  /** Attach the maintainer to a streaming `docs` frame (doc_id,
    * source, text — the `documents` schema). The checkpoint makes
    * batch ids monotone across restarts; the pointer mark (keyed to
    * this checkpoint's query id) makes replays no-ops and foreign
    * streams loud failures. */
  def run(s: SparkSession, whDir: String, docs: DataFrame,
      embOf: (DataFrame, Long) => Option[DataFrame],
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(s, whDir, embOf,
        () => checkpointQueryId(checkpointDir)) _)
      .start()

  /** The RETRIEVAL store's sink body (r14): the same exactly-once
    * pointer-mark discipline over `RetrievalIndex.mergeBatchOf` —
    * postings are per-doc deterministic, so each micro-batch is a
    * hard-link append plus O(batch) new rows, one snapshot version. */
  def retrievalSink(s: SparkSession, whDir: String,
      streamId: () => Option[String] = () => None)(
      batch: DataFrame, batchId: Long): Unit = {
    graft.queries.RetrievalIndex.mergeBatchOf(s, whDir, batch,
      streamBatchId = Some(batchId), streamId = streamId())
    ()
  }

  /** Attach the retrieval maintainer to a streaming `docs` frame. */
  def runRetrieval(s: SparkSession, whDir: String, docs: DataFrame,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(retrievalSink(s, whDir,
        () => checkpointQueryId(checkpointDir)) _)
      .start()

  /** The PAIR sink (r15 verdict #7): one micro-batch delivered to
    * BOTH index stores — the dedup/ANN warehouse and the retrieval
    * index — under one stream identity, so the hybrid read path's
    * two legs track one corpus state. The two commits are not
    * atomic ACROSS stores; a crash between them leaves the pair one
    * batch apart, which `StreamConsistency.audit` refuses — and
    * which SELF-HEALS on restart: the checkpoint re-delivers the
    * batch, the already-committed store no-ops it as a certified
    * replay, the other applies it, and the marks reconverge. The
    * warehouse commits first, so the healing window is always
    * "warehouse ahead", never "retrieval ahead then double-applied". */
  def dualSink(s: SparkSession, whDir: String, retrDir: String,
      embOf: (DataFrame, Long) => Option[DataFrame],
      streamId: () => Option[String] = () => None)(
      batch: DataFrame, batchId: Long): Unit = {
    sink(s, whDir, embOf, streamId)(batch, batchId)
    retrievalSink(s, retrDir, streamId)(batch, batchId)
  }

  /** Attach the pair maintainer to a streaming `docs` frame — both
    * stores maintained from ONE checkpoint (one identity, one batch
    * sequence). */
  def runDual(s: SparkSession, whDir: String, retrDir: String,
      docs: DataFrame, embOf: (DataFrame, Long) => Option[DataFrame],
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(dualSink(s, whDir, retrDir, embOf,
        () => checkpointQueryId(checkpointDir)) _)
      .start()
}
