package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval (range) join.
  *
  * Spark plans a raw inequality join (`t BETWEEN lo AND hi`) as a
  * broadcast-nested-loop or cartesian product — O(|points|·|intervals|)
  * comparisons per key, the operator that quietly kills interval
  * workloads at scale. Bucketizing makes it an EQUI-join: intervals
  * explode to the fixed-width time buckets they cover, points map to
  * their single bucket, both sides shuffle on (key, bucket), and a
  * residual `lo <= t < hi` filter inside the join finishes the exact
  * semantics. Each matching pair meets in exactly one bucket (the
  * point's), so no post-join dedup is needed.
  *
  * Cost model: interval replication = ceil(length / bucketWidth)
  * rows. Pick `bucketWidth` around the typical interval length —
  * replication stays O(1) per interval while bucket population stays
  * fine-grained enough to prune; at 100 TB this is the difference
  * between a shuffle of ~|intervals| rows and a nested loop that
  * never finishes. (Same trick generalizes to interval-interval
  * overlap joins: explode BOTH sides and dedup on the pair.)
  */
object RangeJoin {

  private val BucketCol = "_graft_bucket"

  /** Join each `points` row to every `intervals` row of the same key
    * with `lo <= t < hi` (exclusive hi). Time/bound columns must be
    * integral (exact bucket math); intervals must be non-empty
    * (`hi > lo` — empty intervals are dropped, they can't contain a
    * point). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      tCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ib = intervals.filter(col(hiCol) > col(loCol))
      .withColumn(BucketCol, explode(sequence(
        expr(s"$loCol div $bucketWidth"), expr(s"($hiCol - 1) div $bucketWidth"))))
    val pb = points.withColumn(BucketCol, expr(s"$tCol div $bucketWidth"))
    // Residual bounds are frame-qualified too: the two inputs may
    // share column names (e.g. intervals derived from the same table
    // still carrying the point's time column).
    pb.join(ib,
        pb(pointKey) === ib(intervalKey) &&
          pb(BucketCol) === ib(BucketCol) &&
          pb(tCol) >= ib(loCol) && pb(tCol) < ib(hiCol))
      .drop(BucketCol)
  }
}
