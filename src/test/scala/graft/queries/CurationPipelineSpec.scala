package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** End-to-end contract of the production curation entry point
  * (round-13 verdict #2): one `run` persists every stage, the stages
  * agree with the standing per-operator contracts, and the summary
  * reconciles with the stored flags exactly. */
class CurationPipelineSpec extends AnyFunSuite with Matchers with SparkFixture {

  // sf0.01 — the driver's own gate SF, so the e2e covers a corpus with
  // real duplicate/contamination structure at meaningful volume.
  private val dir = "/root/testdata/sf0.01"

  private lazy val outDir = {
    val out = java.nio.file.Files.createTempDirectory("graft-cur-spec").toString
    CurationPipeline.run(spark, dir, out)
    out
  }

  test("run commits all four stage tables under one atomic version") {
    Warehouse.version(outDir) shouldBe 1L
    CurationPipeline.StageNames.foreach { t =>
      Warehouse.read(spark, outDir, t).count() should be > 0L
    }
  }

  test("flags exclude the benchmark slice and match the standing operators") {
    val flags = Warehouse.read(spark, outDir, "cur_flags")
    flags.filter(col("source") === PipelineOps.EvalSource).count() shouldBe 0L
    // Contamination flag ≡ q66's verdict (doc-grain, same gram kernel).
    val q66 = PipelineOps.decontaminate(spark, dir)
      .filter(col("contaminated") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = flags.filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    got shouldBe q66
    // Doc-purge flag ≡ the stored q92 delete set ∩ the training slice
    // (the flags table excludes the benchmark source by definition, so
    // purged src0 docs never appear in it).
    val trainIds = Warehouse.stored(spark, dir, "doc_stats")
      .filter(col("source") =!= PipelineOps.EvalSource).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val q92 = Warehouse.stored(spark, dir, "purge").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    flags.filter(col("doc_purged")).select("doc_id")
      .collect().map(_.getLong(0)).toSet shouldBe (q92 & trainIds)
    // A retained doc carries no adverse flag.
    flags.filter(col("retained") &&
      (col("contaminated") || col("doc_purged") || col("chunk_purged") ||
        col("sem_purged") || !col("quality_pass"))).count() shouldBe 0L
  }

  test("summary reconciles with the stored flags and mixture is feasible") {
    val flags = Warehouse.read(spark, outDir, "cur_flags")
    val summary = Warehouse.read(spark, outDir, "cur_summary")
    val totRetained = summary.agg(sum("n_retained")).first().getLong(0)
    flags.filter(col("retained")).count() shouldBe totRetained
    // The mixture can never take more than a source has retained.
    summary.filter(col("take_tokens") > col("tokens_retained"))
      .count() shouldBe 0L
    // Pack bins cover every retained doc's source.
    summary.filter(col("n_retained") > 0 && col("n_pack_bins") === 0)
      .count() shouldBe 0L
  }

  test("pack layout over retained docs is gap-free per shard") {
    val pack = Warehouse.read(spark, outDir, "cur_pack")
    // Within each shard, offsets tile exactly: next start = prev end.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val gaps = pack
      .withColumn("prev_end",
        lag(col("start_offset") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_offset") =!= col("prev_end"))
    gaps.count() shouldBe 0L
  }
}
