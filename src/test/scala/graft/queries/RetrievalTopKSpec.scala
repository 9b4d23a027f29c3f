package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The q137 at-scale ranking swap: bounded per-query top-K lists must
  * reproduce the exact full-rank metrics within the truncation bound
  * (the DecileSwapSpec discipline applied to retrieval). */
class RetrievalTopKSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def metricsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  // leg -> (recall1_ppm, recall10_ppm, mrr_ppm)

  test("top-K leg ranking preserves recall@1/@10 exactly and MRR within 1e6/K") {
    val k = 100
    val exact = metricsOf(RetrievalEval.retrievalEval(spark, sfDir))
    try {
      spark.conf.set(RetrievalEval.TopKConf, k.toString)
      val flagged = RetrievalEval.retrievalEval(spark, sfDir)
      // The flagged plan ranks both corpus-sized legs via the bounded
      // aggregator; the only RANKING window left is the fusion re-rank
      // over the ≤ 2K-rows-per-query joined lists. What this pin
      // forbids is a full-rank LEG window (row_number over a
      // corpus-per-query partition), so it counts row_number windows —
      // the r20 dfq per-term posting-count window (partitioned by the
      // 8-byte term hash, bounded by a term's posting list) is a
      // count(1) window and deliberately not in scope.
      val plan = flagged.queryExecution.executedPlan.toString
      plan should include("TopKAggregator")
      "row_number".r.findAllMatchIn(plan).size should be <= 1
      val approx = metricsOf(flagged)
      exact.keySet shouldBe approx.keySet
      exact.foreach { case (leg, (r1, r10, mrr)) =>
        val (a1, a10, amrr) = approx(leg)
        withClue(s"$leg recall@1:") { a1 shouldBe r1 }
        withClue(s"$leg recall@10:") { a10 shouldBe r10 }
        // Truncation can only LOWER MRR, by < 1e6/K ppm per query
        // (+1 for the integer divisions).
        withClue(s"$leg MRR:") {
          amrr should be <= mrr
          amrr should be >= mrr - (1000000L / k + 1)
        }
      }
    } finally spark.conf.unset(RetrievalEval.TopKConf)
  }
}
