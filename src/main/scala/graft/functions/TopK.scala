package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate for bounded top-k selection. Struct-lexicographic
  * order (neg_cos ASC, id ASC) == cosine DESC with deterministic ties.
  */
final case class ScoredCand(neg_cos: Double, id: Long, c: Double)

/** Aggregation buffer: a wrapper case class so the buffer/output
  * encoders stay on the public `Encoders.product` API. */
final case class TopKBuf(cands: Seq[ScoredCand])

/** Bounded top-k aggregate (SURVEY W4 at group granularity; fixes the
  * round-2 q30 defect where `collect_list` buffered the entire group).
  *
  * Both the map-side partial state and the shuffled partial result are
  * O(k) per group: `reduce` keeps at most k candidates, and Spark's
  * ScalaAggregator machinery performs map-side partial aggregation, so
  * each input partition contributes at most k rows per group to the
  * exchange. At 100 TB with q query vectors the exchange carries
  * ≤ partitions·q·k tiny structs and per-group reducer state is k rows —
  * a bound, not an OOM knob.
  *
  * k is tiny (single digits) so the insert path is a sort of ≤ k+1
  * elements; for large k swap the Seq for a bounded heap.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredCand, TopKBuf, TopKBuf] {
  private implicit val ord: Ordering[ScoredCand] =
    Ordering.by((c: ScoredCand) => (c.neg_cos, c.id))

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: ScoredCand): TopKBuf =
    // Fast reject: if full and the new candidate sorts after the current
    // worst, the buffer is unchanged (no re-sort on the hot path).
    if (b.cands.size >= k && ord.gteq(a, b.cands.last)) b
    else TopKBuf((b.cands :+ a).sorted.take(k))

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.cands ++ y.cands).sorted.take(k))

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
