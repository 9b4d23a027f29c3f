package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Scale-layout operators: salted skew join and bucketed co-located
  * join. Both are *layout* transformations — the assertions here pin
  * (a) result-set identity with the plain join and (b) the physical
  * plan property each layout buys (spread sub-keys / zero Exchange). */
class OperatorsSpec extends AnyFunSuite with SparkFixture {

  test("salted join is set-identical to the plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
    val saltedRes = SkewJoin.salted(li, ord, "l_orderkey", "o_orderkey",
      xxhash64(col("l_orderkey"), col("l_linenumber")), nSalts = 8)
    val plainRes = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(saltedRes.count() === plainRes.count())
    // Exact set equality both directions.
    assert(saltedRes.exceptAll(plainRes).isEmpty)
    assert(plainRes.exceptAll(saltedRes).isEmpty)
  }

  test("salting spreads a hot key over nSalts sub-keys") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "row")
    val dim = Seq((1L, "x")).toDF("dk", "name")
    val n = 8
    // Count distinct salt values the hot key lands on (inspect the salt
    // column before the join drops it).
    val salts = hot
      .withColumn("_graft_salt", pmod(xxhash64(col("k"), col("row")), lit(n.toLong)).cast("int"))
      .select(countDistinct(col("_graft_salt")))
      .head().getLong(0)
    assert(salts === n.toLong)
    // And the join still matches every row exactly once.
    assert(SkewJoin.salted(hot, dim, "k", "dk",
      xxhash64(col("k"), col("row")), n).count() === 1000L)
  }

  test("hot-key salted join: detection finds the skewed key, result is set-identical") {
    import spark.implicits._
    // One pathological key (10k rows) among 99 uniform keys (20 each).
    val big = (Seq.tabulate(10000)(i => (1L, i.toLong)) ++
      (2 to 100).flatMap(k => Seq.tabulate(20)(i => (k.toLong, i.toLong * 1000 + k))))
      .toDF("k", "row")
    val dim = (1 to 100).map(k => (k.toLong, s"name_$k")).toDF("dk", "name")
    val hot = SkewJoin.hotKeys(big, "k", fraction = 0.1, minSampleCount = 50)
    val hotSet = hot.collect().map(_.getLong(0)).toSet
    assert(hotSet.contains(1L), "the 10k-row key must be detected hot")
    assert(hotSet.size < 10, s"uniform keys must stay cold, got $hotSet")
    val got = SkewJoin.saltedHot(big, dim, "k", "dk",
      xxhash64(col("k"), col("row")), nSalts = 8, hot)
    val want = big.join(dim, col("k") === col("dk"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty)
    assert(want.exceptAll(got).isEmpty)
  }

  test("hot-key salted join works when both sides share the key name") {
    import spark.implicits._
    val big = Seq.tabulate(200)(i => (i.toLong % 4, i.toLong)).toDF("k", "row")
    val dim = Seq.tabulate(4)(i => (i.toLong, s"d$i")).toDF("k", "name")
    val hot = SkewJoin.hotKeys(big, "k", fraction = 1.0, minSampleCount = 10)
    val got = SkewJoin.saltedHot(big, dim, "k", "k",
      xxhash64(col("row")), nSalts = 4, hot)
    assert(got.count() === 200L)
  }

  test("q48 salted-join aggregate equals the unsalted aggregate") {
    val got = SkewJoin.saltedJoinAgg(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("o_orderstatus")
      .collect()
    assert(got.toSeq === want.toSeq)
  }

  test("bucketed tables join with zero Exchange and zero Sort") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 4)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", buckets = 4)
    val joined = Bucketing.cocolocatedJoin(
      spark, "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // Reading the bucket SORT order is opt-in since 3.0 (sound only
    // with one file per bucket — writeBucketed guarantees that).
    val sortedKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(sortedKey, "true")
    try {
      val sortedPlan = Bucketing.cocolocatedJoin(
          spark, "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
        .queryExecution.executedPlan.toString
      assert(!sortedPlan.contains("Exchange"), s"must not shuffle:\n$sortedPlan")
      assert(!sortedPlan.contains("Sort "), s"must not re-sort:\n$sortedPlan")
    } finally spark.conf.set(sortedKey, "false")
    // Same result as the plain (shuffling) join.
    val plainCount = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === plainCount)
  }

  test("bucketed band index joins a bucketed batch with zero Exchange (the increment's too-big-to-broadcast form)") {
    // r13 verdict #1's last step, executed: q113's production form
    // broadcasts the batch's band rows (map-only index side); once a
    // batch outgrows a broadcast, BOTH the stored band index and the
    // batch's band frame are bucketed on band_hash and the candidate
    // equi-join reads bucket i against bucket i — zero Exchange on
    // the index side (or either side), at any batch size.
    val bands = graft.queries.Warehouse.stored(spark, sfDir, "bands")
    val idx = bands.filter(col("doc_id") % 20 =!= 19)
      .select(col("doc_id").as("idx_doc"), col("band_hash"))
    val batch = bands.filter(col("doc_id") % 20 === 19)
      .select(col("doc_id").as("new_doc"), col("band_hash"))
    Bucketing.writeBucketed(idx, "bands_idx_bucketed", "band_hash", buckets = 4)
    Bucketing.writeBucketed(batch, "bands_batch_bucketed", "band_hash", buckets = 4)
    val joined = Bucketing.cocolocatedJoin(
      spark, "bands_idx_bucketed", "bands_batch_bucketed",
      "band_hash", "band_hash")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed candidate join must not shuffle the index:\n$plan")
    val plainCount = idx.join(batch, "band_hash").count()
    assert(joined.count() === plainCount)
  }

  test("aggregation on the bucket key also plans with zero Exchange") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_bucketed_agg", "l_orderkey", buckets = 4)
    val agg = spark.table("li_bucketed_agg")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucket-key agg must not shuffle:\n$plan")
    assert(agg.count() === li.select("l_orderkey").distinct().count())
  }

  test("the same join without bucketing shuffles (negative control)") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
    val plan = li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"), s"control join should shuffle:\n$plan")
  }
}
