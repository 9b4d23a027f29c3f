package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.core.Tables

/** Interchange-format coverage (SURVEY §2.1 S-family breadth): the
  * same relation must survive parquet ⇄ ORC ⇄ JSONL round-trips
  * bit-identically, and the columnar formats must keep the
  * predicate-pushdown posture the scan layer relies on.
  */
class SourceFormatsSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val base = Tables.customer(spark, sfDir)
    .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("ORC round-trip is value- and schema-identical to the source") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Sinks.writeOrc(base, dir)
    val back = spark.read.orc(dir)
    back.schema shouldBe base.schema
    canon(back) shouldBe canon(base)
  }

  test("JSONL round-trip with explicit schema preserves values") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Sinks.writeJsonl(base, dir)
    // Schema-on-read by contract: no inference scan.
    val back = spark.read.schema(base.schema).json(dir)
    back.schema shouldBe base.schema
    canon(back) shouldBe canon(base)
  }

  test("ORC scans push predicates like parquet does") {
    val dir = Files.createTempDirectory("graft-orc-push").toString
    Sinks.writeOrc(base, dir)
    val plan = spark.read.orc(dir)
      .filter(col("c_custkey") === 42L)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)")
  }

  test("partitioned ORC prunes partitions on the partition key") {
    val dir = Files.createTempDirectory("graft-orc-part").toString
    Sinks.writeOrc(base, dir, partitionBy = Seq("c_mktsegment"))
    val pruned = spark.read.orc(dir).filter(col("c_mktsegment") === "BUILDING")
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    // The filter actually selects data (non-vacuous fixture)...
    pruned.count() should be > 0L
    // ...and matches the unpartitioned relation's answer.
    pruned.count() shouldBe base.filter(col("c_mktsegment") === "BUILDING").count()
  }
}
