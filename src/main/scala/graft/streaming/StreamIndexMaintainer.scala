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

  /** The foreachBatch sink body, exposed for replay-path tests and
    * the q140 certificate (the q99 idiom: certify through the REAL
    * sink function, not a copy). */
  def sink(s: SparkSession, whDir: String,
      embOf: (DataFrame, Long) => Option[DataFrame])(
      batch: DataFrame, batchId: Long): Unit = {
    Warehouse.mergeBatch(s, whDir, batch, embOf(batch, batchId),
      streamBatchId = Some(batchId))
    ()
  }

  /** Attach the maintainer to a streaming `docs` frame (doc_id,
    * source, text — the `documents` schema). The checkpoint makes
    * batch ids monotone across restarts; the pointer mark makes
    * replays no-ops. */
  def run(s: SparkSession, whDir: String, docs: DataFrame,
      embOf: (DataFrame, Long) => Option[DataFrame],
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink(s, whDir, embOf) _)
      .start()

  /** The RETRIEVAL store's sink body (r14): the same exactly-once
    * pointer-mark discipline over `RetrievalIndex.mergeBatchOf` —
    * postings are per-doc deterministic, so each micro-batch is a
    * hard-link append plus O(batch) new rows, one snapshot version. */
  def retrievalSink(s: SparkSession, whDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    graft.queries.RetrievalIndex.mergeBatchOf(s, whDir, batch,
      streamBatchId = Some(batchId))
    ()
  }

  /** Attach the retrieval maintainer to a streaming `docs` frame. */
  def runRetrieval(s: SparkSession, whDir: String, docs: DataFrame,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(retrievalSink(s, whDir) _)
      .start()
}
