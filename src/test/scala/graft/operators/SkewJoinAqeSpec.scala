package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** AQE-vs-salting adjudication (round-11 verdict #6): does Spark's
  * runtime skew-join split make `SkewJoin.saltedHot` redundant?
  *
  * Measured answer, pinned here empirically and in the SkewJoin
  * Scaladoc decision rule:
  *
  *  - **AQE WINS the plain case**: a skewed INNER equi-join whose
  *    output feeds a different-keyed (or no) exchange gets its hot
  *    partition split at runtime (`AQEShuffleRead ... skewed`) with
  *    zero code. Manual salting is unnecessary there.
  *  - **Salting wins when AQE declines**: (1) the join output's hash
  *    partitioning is REUSED by a same-key downstream operator — the
  *    skew split would break the co-partitioning and force an extra
  *    shuffle, so `OptimizeSkewedJoin` (default
  *    `forceOptimizeSkewedJoin=false`) leaves the hot reducer whole;
  *    (2) the skewed side is the preserved side of an outer join,
  *    which is UNSPLITTABLE by construction (splitting the right side
  *    of a LEFT OUTER would emit spurious null-extended rows per
  *    split); (3) no exchange exists at all (bucketed/co-located
  *    inputs — AQE re-plans exchanges, and there is none).
  *
  * Thresholds are scaled to fixture size (64 KB where production is
  * 256 MB) — the MECHANISM under test is identical; only the byte
  * scale differs.
  */
class SkewJoinAqeSpec extends AnyFunSuite with SparkFixture {

  import org.apache.spark.sql.internal.SQLConf

  /** One pathological key (60k rows, ~60% of the fact) + 999 uniform
    * cold keys of 40 rows. Payload column keeps rows non-trivial. */
  private lazy val big = {
    import spark.implicits._
    (Seq.tabulate(60000)(i => (1L, i.toLong)) ++
      (2 to 1000).flatMap(k => Seq.tabulate(40)(i => (k.toLong, i.toLong * 1000 + k))))
      .toDF("k", "row")
  }
  private lazy val dim = {
    import spark.implicits._
    (1 to 1000).map(k => (k.toLong, s"name_$k")).toDF("dk", "name")
  }

  private val skewConfs = Seq(
    SQLConf.AUTO_BROADCASTJOIN_THRESHOLD.key -> "-1", // force a shuffle join
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536")

  private def withConf[A](pairs: Seq[(String, String)])(f: => A): A = {
    val olds = pairs.map { case (key, _) => key -> spark.conf.getOption(key) }
    pairs.foreach { case (key, v) => spark.conf.set(key, v) }
    try f
    finally olds.foreach { case (key, o) =>
      o.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  /** Execute fully (AQE finalizes during execution), then return the
    * final-plan string — `AQEShuffleRead ... skewed` marks a runtime
    * skew split. Must drive the dataset's OWN QueryExecution (collect
    * does; a sink write would execute a clone and leave this plan
    * `isFinalPlan=false`). */
  private def executedPlan(df: DataFrame): String = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    plan
  }

  test("AQE splits the hot partition of a plain inner join at runtime") {
    withConf(skewConfs) {
      val joined = big.join(dim, col("k") === col("dk"))
      val plan = executedPlan(joined)
      assert(plan.contains("skewed"),
        s"expected a runtime skew split (AQEShuffleRead ... skewed) in:\n$plan")
      // And the runtime-split join is result-identical to the salted form.
      val salted = SkewJoin.saltedHot(big, dim, "k", "dk",
        xxhash64(col("row")), nSalts = 8,
        SkewJoin.hotKeys(big, "k", fraction = 0.1, minSampleCount = 500))
      assert(joined.count() === salted.count())
    }
  }

  test("AQE declines the split when the join feeds a same-key aggregation; salting still bounds the reducer") {
    withConf(skewConfs) {
      // groupBy(k) right after join-on-k reuses the join's hash
      // partitioning: a skew split would break co-partitioning and add
      // a shuffle, so OptimizeSkewedJoin leaves the hot reducer whole.
      val aggAfter = big.join(dim, col("k") === col("dk"))
        .groupBy("k").agg(sum("row").as("s"))
      val plan = executedPlan(aggAfter)
      assert(!plan.contains("skewed"),
        s"AQE should decline the split under a same-key downstream agg:\n$plan")
      // The manual salt bounds the JOIN's per-reducer key group anyway
      // (the agg's own skew is absorbed by partial aggregation):
      val salted = SkewJoin.saltedHot(big, dim, "k", "dk",
        xxhash64(col("row")), nSalts = 8,
        SkewJoin.hotKeys(big, "k", fraction = 0.1, minSampleCount = 500))
        .groupBy("k").agg(sum("row").as("s"))
      assert(salted.orderBy("k").collect().toSeq ===
        aggAfter.orderBy("k").collect().toSeq)
    }
  }

  test("AQE cannot split preserved-side skew of an outer join") {
    withConf(skewConfs) {
      // LEFT OUTER with the skew on the RIGHT: splitting the right
      // partition would null-extend unmatched left rows once per split
      // — unsound, so AQE never marks it. (OptimizeSkewedJoin can only
      // split the left side of a LeftOuter / the right of a RightOuter.)
      val outer = dim.join(big, col("dk") === col("k"), "left_outer")
      val plan = executedPlan(outer)
      assert(!plan.contains("skewed"),
        s"right-side skew of a LEFT OUTER must be unsplittable:\n$plan")
    }
  }

  test("salting bounds the hottest (key, salt) group to ~hot/nSalts") {
    val n = 8
    val groups = big
      .withColumn("_s", pmod(xxhash64(col("row")), lit(n.toLong)).cast("int"))
      .groupBy("k", "_s").agg(count(lit(1)).as("c"))
      .agg(max("c")).head().getLong(0)
    // Hot key is 60k rows; a fair 8-way split is 7.5k per sub-key.
    assert(groups <= 60000 / n * 1.2,
      s"hottest (key, salt) group $groups exceeds the salted bound")
  }
}
