package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table layout for shuffle-free joins.
  *
  * A fact⋈fact equi-join shuffles BOTH inputs on the join key every time
  * it runs. When the same join recurs — the reference's features⋈labels
  * and sessions⋈labels joins run on every batch — the shuffle is paid
  * over and over for a layout that never changes. Bucketing pays it once
  * at write time: both tables are hash-clustered (and sorted) into the
  * same number of buckets on the join key, so the sort-merge join reads
  * bucket i of A against bucket i of B directly — zero Exchange, zero
  * Sort in the recurring plan (BucketedJoinSpec asserts exactly that).
  *
  * At 100 TB this converts the dominant recurring cost (a full two-sided
  * shuffle) into a one-time write layout; it is also the standard layout
  * for incremental pipelines where today's delta joins yesterday's
  * snapshot on the same key. Bucket count rule of thumb: total table
  * size / target partition size (128–512 MB), rounded to a multiple of
  * the executor count; both sides MUST agree on count and key.
  */
object Bucketing {

  /** Write `df` as a parquet table hash-bucketed AND sorted on `key`.
    * The pre-write repartition aligns task layout with the bucket hash
    * (same Murmur3 HashPartitioning) so each bucket gets exactly ONE
    * file — a multi-file bucket makes the reader distrust the sort
    * order and re-Sort before every merge join, forfeiting half the
    * layout's value. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Inner equi-join of two bucketed tables on their bucket keys. With
    * matching bucket counts the physical plan is scan → merge-join:
    * no Exchange on either side. The merge hint pins the strategy: at
    * toy sizes the planner would rather broadcast one side (correct,
    * but it ignores the bucket layout this operator exists to exploit —
    * and a broadcast stops being available long before 100 TB).
    *
    * To ALSO elide the per-partition Sort, the session must opt in with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`: since
    * 3.0 the scan reports bucket sort order only under that flag (it is
    * sound exactly when each bucket is one file, which `writeBucketed`
    * guarantees). The Sort is in-memory per partition — the Exchange is
    * the cost that matters at scale — so the flag is a bonus, not a
    * requirement. */
  def cocolocatedJoin(
      s: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = s.table(leftTable).hint("merge")
    val r = s.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
