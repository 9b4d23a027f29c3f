package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Stateful streaming sessionization (SURVEY.md §2.8 "State", ST6).
  *
  * The reference sessionizes only in the batch layer
  * (`prepare_data_batch.ipynb:811-825`); its stream is stateless per
  * message. This is the Spark-native extension the SURVEY calls for:
  * per-block session accumulators maintained across micro-batches with
  * `mapGroupsWithState`, so a block whose lines arrive in several
  * batches still converges to the batch-layer session row.
  *
  * State per key is three longs — O(1), no line buffering — and keys
  * are EVICTED once idle past `idleTtlMs` of *event time*: when the
  * watermark passes `last_event + TTL` the session emits one final
  * snapshot and leaves the state store, so state size is |open blocks|,
  * not |blocks ever seen| (an unbounded-growth OOM on a long-running
  * job otherwise). Event-time (not processing-time) timeout is the
  * deliberate choice: it is deterministic under replay — a backfill
  * rushing through a week of logs closes sessions where the DATA says
  * they ended, where a wall-clock TTL would close them mid-catch-up —
  * and it never schedules speculative empty batches.
  *
  * Line ordering inside the session is irrelevant to the outputs
  * (min/max/count are order-free), matching the batch `Sessionize`
  * semantics for span/count without keeping text in state.
  */
object StatefulSessionize {

  /** One parsed log line on the stream. */
  final case class LineEvent(block_id: String, ts_ms: Long)

  /** Accumulator: closed under merge, three longs per open session. */
  final case class SessionAgg(start_ms: Long, end_ms: Long, n: Long)

  /** Emitted after every batch touching the key (update output mode). */
  final case class SessionSnapshot(
      block_id: String, start_ms: Long, end_ms: Long,
      duration_sec: Long, num_lines: Long)

  /** Default idle TTL (event time) before a session closes. */
  val DefaultIdleTtlMs: Long = 30L * 60 * 1000

  /** Default watermark delay — how out-of-order lines may arrive. */
  val DefaultLateness: String = "10 minutes"

  private def fold(idleTtlMs: Long, streaming: Boolean)(
      id: String,
      events: Iterator[LineEvent],
      state: GroupState[SessionAgg]): SessionSnapshot = {
    val prior = state.getOption.getOrElse(SessionAgg(Long.MaxValue, Long.MinValue, 0L))
    if (state.hasTimedOut) {
      // Watermark passed end_ms + TTL: final snapshot, release the key.
      state.remove()
      SessionSnapshot(id, prior.start_ms, prior.end_ms,
        prior.end_ms / 1000 - prior.start_ms / 1000, prior.n)
    } else {
      var agg = prior
      events.foreach { e =>
        agg = SessionAgg(
          math.min(agg.start_ms, e.ts_ms),
          math.max(agg.end_ms, e.ts_ms),
          agg.n + 1)
      }
      state.update(agg)
      // Close when the watermark passes TTL past the newest line seen.
      // Clamp above the current watermark — Spark rejects a timeout
      // already in the watermark's past (e.g. TTL shorter than the
      // allowed lateness). Batch mode has neither watermark nor
      // timeouts (getCurrentWatermarkMs THROWS there — the watermark
      // node is optimized away), so this is stream-only.
      if (streaming)
        state.setTimeoutTimestamp(
          math.max(agg.end_ms + idleTtlMs, state.getCurrentWatermarkMs + 1))
      // Reference duration semantics: whole seconds via long-cast diff
      // (prepare_data_batch.ipynb:845).
      SessionSnapshot(id, agg.start_ms, agg.end_ms,
        agg.end_ms / 1000 - agg.start_ms / 1000, agg.n)
    }
  }

  /** lines → per-block running session rows. Streaming requires
    * `outputMode("update")`; also runs on a batch Dataset (single
    * batch ≡ the batch-layer sessionize span/count columns; the
    * watermark is a no-op and timeouts never fire in batch). Rows more
    * than `lateness` behind the stream's max event time are dropped as
    * late — size it to the source's real disorder. */
  def sessions(
      lines: Dataset[LineEvent],
      idleTtlMs: Long = DefaultIdleTtlMs,
      lateness: String = DefaultLateness): Dataset[SessionSnapshot] = {
    val streaming = lines.isStreaming
    lines
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", lateness)
      .as[LineEvent](Encoders.product[LineEvent])
      .groupByKey(_.block_id)(Encoders.STRING)
      .mapGroupsWithState[SessionAgg, SessionSnapshot](
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fold(idleTtlMs, streaming))(
        Encoders.product[SessionAgg], Encoders.product[SessionSnapshot])
  }
}
