package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Partition-layout specs for the parquet sink: static partition
  * pruning (a literal predicate on the partition column eliminates
  * directories at planning time) and dynamic partition pruning (a
  * join against a filtered dim prunes fact partitions at RUNTIME from
  * the dim's build side). At 100 TB these are the difference between
  * scanning one event_type's files and scanning the store.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkFixture {

  private lazy val store = {
    val dir = Files.createTempDirectory("graft-part").toString
    Sinks.writeParquet(
      Tables.events(spark, sfDir).select("event_id", "user_id", "value", "event_type"),
      dir, partitionBy = Seq("event_type"))
    dir
  }

  // The dim must live in a real source (not a LocalRelation): on a
  // local relation the selective filter constant-folds away and the
  // DPP rule sees no predicate to derive pruning from.
  private lazy val dimPath = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dim").toString
    Seq(("error", 1L), ("view", 2L), ("click", 3L))
      .toDF("t_name", "t_id").write.mode("overwrite").parquet(dir)
    dir
  }

  test("static partition pruning: literal filter reaches PartitionFilters") {
    val df = spark.read.parquet(store).filter(col("event_type") === "error")
    val scan = df.queryExecution.executedPlan.toString
    // The predicate must appear as a PARTITION filter (directory-level
    // pruning), not a data filter.
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filters on the scan:\n$scan")
    assert(scan.replaceAll("#\\d+", "").contains("(event_type = error)"),
      s"expected the literal inside PartitionFilters:\n$scan")
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error").count()
    assert(df.count() === expected)
  }

  test("dynamic partition pruning fires on a dim-filtered join") {
    val joined = spark.read.parquet(store)
      .join(spark.read.parquet(dimPath).filter(col("t_id") === 1L),
        col("event_type") === col("t_name"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery on the fact scan:\n$plan")
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error").count()
    assert(joined.count() === expected)
  }
}
