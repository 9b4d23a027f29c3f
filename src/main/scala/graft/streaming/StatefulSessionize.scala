package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
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
  * State per key is three longs — O(1), no line buffering — so state
  * store size is |open blocks| × ~24 bytes regardless of data volume.
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

  private def fold(
      id: String,
      events: Iterator[LineEvent],
      state: GroupState[SessionAgg]): SessionSnapshot = {
    var agg = state.getOption.getOrElse(SessionAgg(Long.MaxValue, Long.MinValue, 0L))
    events.foreach { e =>
      agg = SessionAgg(
        math.min(agg.start_ms, e.ts_ms),
        math.max(agg.end_ms, e.ts_ms),
        agg.n + 1)
    }
    state.update(agg)
    // Reference duration semantics: whole seconds via long-cast diff
    // (prepare_data_batch.ipynb:845).
    SessionSnapshot(id, agg.start_ms, agg.end_ms,
      agg.end_ms / 1000 - agg.start_ms / 1000, agg.n)
  }

  /** lines → per-block running session rows. Streaming requires
    * `outputMode("update")`; also runs on a batch Dataset (single
    * batch ≡ the batch-layer sessionize span/count columns). */
  def sessions(lines: Dataset[LineEvent]): Dataset[SessionSnapshot] =
    lines
      .groupByKey(_.block_id)(Encoders.STRING)
      .mapGroupsWithState[SessionAgg, SessionSnapshot](
        GroupStateTimeout.NoTimeout)(fold)(
        Encoders.product[SessionAgg], Encoders.product[SessionSnapshot])
}
