package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The at-scale decile swap (round-13 verdict #4): sketch-edge
  * bucketing must agree with the exact rank window within the
  * sketch's published bound, and the flagged q117/q123 paths must
  * keep their output contract. */
class DecileSwapSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("approx buckets agree with exact rank deciles within the GK bound") {
    val q = TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
    val exact = Deciles
      .withExactDescDecile(q, "quality_score", "doc_id", "d_exact")
    val approx = Deciles
      .withApproxDescDecile(q, "quality_score", "d_approx")
      .select(col("doc_id"), col("d_approx"))
    val joined = exact.join(approx, "doc_id")

    // GK guarantee: rank error ≤ n/Accuracy. At n ≪ Accuracy the
    // edges are rank-exact, so assignments can differ ONLY for rows
    // whose score TIES an edge score (rank splits ties by doc_id;
    // buckets keep equal scores together) — and then by at most one
    // bucket.
    joined.filter(abs(col("d_exact") - col("d_approx")) > 1)
      .count() shouldBe 0L

    val n = q.count()
    val edgeTied = {
      // Rows sharing a score with any exact decile boundary row.
      val boundaryScores = exact
        .groupBy("d_exact").agg(min("quality_score").as("s"))
        .select("s").collect().map(_.getDouble(0)).toSet
      q.filter(col("quality_score").isin(boundaryScores.toSeq: _*)).count()
    }
    val slack = 9L * (2L * n / Deciles.Accuracy + 1L)
    val disagree = joined.filter(col("d_exact") =!= col("d_approx")).count()
    assert(disagree <= edgeTied + slack,
      s"disagreements $disagree exceed tie+sketch bound ${edgeTied + slack}")
  }

  test("per-group approx buckets agree with q131's exact percentile deciles") {
    val exact = TextOps.qualityNormalize(spark, sfDir)
      .withColumn("d_exact", expr("(pct_ppm * 10) div 1000001"))
      .select("doc_id", "d_exact")
    val approx = TextOps.qualityNormalizeAtScale(spark, sfDir)
      .select(col("doc_id"), col("decile").as("d_approx"))
    // The percentile→decile projection and the edge buckets use
    // slightly different boundary conventions; adjacent-bucket
    // agreement is the contract (never 2+ buckets apart).
    exact.join(approx, "doc_id")
      .filter(abs(col("d_exact") - col("d_approx")) > 1)
      .count() shouldBe 0L
  }

  test("flag on: q117 and q123 keep schema, totals and decile domain") {
    val key = Deciles.ApproxConf
    def totals(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n")).first().getLong(0)
    val exact117 = MLOps.scoreCalibration(spark, sfDir)
    val exact123 = Dedup.purgeByQualityDecile(spark, sfDir)
    try {
      spark.conf.set(key, "true")
      val approx117 = MLOps.scoreCalibration(spark, sfDir)
      val approx123 = Dedup.purgeByQualityDecile(spark, sfDir)
      approx117.columns.toSeq shouldBe exact117.columns.toSeq
      approx123.columns.toSeq shouldBe exact123.columns.toSeq
      totals(approx117) shouldBe totals(exact117)
      totals(approx123) shouldBe totals(exact123)
      // No global-sort window in the flagged plan.
      approx117.queryExecution.executedPlan.toString should not include "Window"
      Seq(approx117, approx123).foreach { df =>
        df.select("decile").collect().map(_.getLong(0))
          .foreach(d => assert(d >= 0 && d <= 9))
      }
    } finally spark.conf.unset(key)
  }
}
