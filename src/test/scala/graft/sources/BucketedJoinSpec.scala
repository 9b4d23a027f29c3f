package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The bucketed-layout contract behind `Sinks.writeBucketed`: a join
  * between two tables bucketed on the join key with equal bucket
  * counts plans NO Exchange — the write-time shuffle replaces every
  * query-time shuffle. This is the 100 TB fact-table discipline
  * (shuffle orders/lineitem once at ingest, join shuffle-free
  * forever), provable only at the plan level, so it is a spec rather
  * than an oracle query: DuckDB sees identical ROWS either way; the
  * absent Exchange is the entire point.
  */
class BucketedJoinSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val buckets = 8

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("equi-join of co-bucketed tables plans no Exchange on either side") {
    val s = spark
    import graft.core.Tables
    Sinks.writeBucketed(Tables.orders(s, sfDir), "orders_bkt",
      Seq("o_orderkey"), buckets)
    Sinks.writeBucketed(
      Tables.lineitem(s, sfDir).select("l_orderkey", "l_quantity",
        "l_extendedprice"),
      "lineitem_bkt", Seq("l_orderkey"), buckets)
    try {
      // Disable broadcast so the join actually needs a distribution —
      // at 100 TB neither side of a fact-fact join broadcasts anyway.
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("orders_bkt")
        .join(s.table("lineitem_bkt"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
      val plan = planOf(joined)
      withClue("bucketed join must not re-shuffle either input:\n" + plan) {
        // The only acceptable exchange is the one ABOVE the join for
        // the groupBy on a different key; the join inputs themselves
        // (below SortMergeJoin/ShuffledHashJoin) read straight from
        // the bucketed scans.
        val joinIdx = plan.linesIterator.indexWhere(l =>
          l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        joinIdx should be >= 0
        val belowJoin = plan.linesIterator.drop(joinIdx + 1).toSeq
        belowJoin.filter(_.contains("Exchange")) shouldBe empty
      }
      plan should include regex "SelectedBucketsCount: 8 out of 8|Bucketed: true"
      // And the rows are right: same answer as the plain-path join.
      val plain = Tables.orders(s, sfDir)
        .join(Tables.lineitem(s, sfDir),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
      joined.exceptAll(plain).count() shouldBe 0
      plain.exceptAll(joined).count() shouldBe 0
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS orders_bkt")
      s.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val s = spark
    import graft.core.Tables
    Sinks.writeBucketed(
      Tables.lineitem(s, sfDir).select("l_orderkey", "l_quantity"),
      "lineitem_bkt2", Seq("l_orderkey"), buckets)
    try {
      val agg = s.table("lineitem_bkt2")
        .groupBy("l_orderkey")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
      val plan = planOf(agg)
      withClue("bucket-key aggregation must be exchange-free:\n" + plan) {
        plan.linesIterator.filter(_.contains("Exchange")).toSeq shouldBe empty
      }
    } finally s.sql("DROP TABLE IF EXISTS lineitem_bkt2")
  }
}
