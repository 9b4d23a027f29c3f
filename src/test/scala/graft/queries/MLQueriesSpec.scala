package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Local invariants for the oracle-checked ML-adjacent queries
  * (q73 class weights, q75 PR curve). The driver's DuckDB oracle is
  * the cross-engine gate; these pin the mathematical laws the queries
  * must satisfy on any data, so a fixture change cannot silently turn
  * them vacuous.
  */
class MLQueriesSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("q73: balanced class weights satisfy the N/(K*n) law exactly") {
    val rows = MLOps.classWeights(spark, sfDir).collect()
    rows.length should be >= 1
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    val k = rows.length
    rows.foreach { r =>
      r.getAs[Double]("weight") shouldBe
        n.toDouble / (k * r.getAs[Long]("n_rows"))
    }
    // Balanced weighting: every class contributes equal total weight
    // (n_class * w_class = N/K).
    rows.foreach { r =>
      r.getAs[Long]("n_rows") * r.getAs[Double]("weight") shouldBe
        (n.toDouble / k +- 1e-9)
    }
  }

  test("q75: PR curve is a valid confusion-count walk") {
    val rows = MLOps.prCurve(spark, sfDir).collect()
    rows.length should be >= 2
    // Precondition, not a law: the fixture must actually contain
    // positive labels — with zero positives recall is a NULL division
    // and every assertion below would fail confusingly rather than
    // flag the vacuous fixture.
    withClue("fixture has no positive (anomaly) labels — q75's spec is vacuous:") {
      rows.last.getAs[Long]("cum_tp") should be > 0L
    }
    val tp = rows.map(_.getAs[Long]("cum_tp"))
    val fp = rows.map(_.getAs[Long]("cum_fp"))
    // Cumulative counts are nondecreasing down the threshold list.
    tp.sliding(2).foreach { w => w(1) should be >= w(0) }
    fp.sliding(2).foreach { w => w(1) should be >= w(0) }
    // Recall ends at exactly 1.0 (all positives recovered at the
    // lowest threshold); precision stays in (0, 1].
    rows.last.getAs[Double]("recall_pt") shouldBe 1.0
    rows.foreach { r =>
      val p = r.getAs[Double]("precision_pt")
      p should be > 0.0
      p should be <= 1.0
      r.getAs[Double]("precision_pt") shouldBe
        r.getAs[Long]("cum_tp").toDouble /
          (r.getAs[Long]("cum_tp") + r.getAs[Long]("cum_fp"))
    }
  }

  test("q117: rank deciles partition users evenly; top decile is most anomalous") {
    val out = MLOps.scoreCalibration(spark, sfDir).collect()
    out.map(_.getLong(0)).toSeq shouldBe (0L to 9L)
    val sizes = out.map(_.getLong(1))
    // row_number deciles: sizes differ by at most 1 and sum to n_users.
    (sizes.max - sizes.min) should be <= 1L
    val nUsers = graft.queries.LogOps.eventPivot(spark, sfDir).count()
    sizes.sum shouldBe nUsers
    out.foreach { r =>
      r.getLong(4) shouldBe r.getLong(2) * 1000000L / r.getLong(1)
      r.getLong(2) should be <= r.getLong(1)
    }
    // The scorer weights error counts positively and the label IS
    // error share: the top-score decile must be at least as anomalous
    // as the bottom one (a flat or inverted diagram would mean the
    // pinned scorer stopped ranking).
    out.head.getLong(4) should be >= out.last.getLong(4)
    // Mean score is non-increasing across deciles (rank-cut property).
    val means = out.map(_.getDouble(3))
    means.zip(means.tail).foreach { case (a, b) => a should be >= (b - 1e-9) }
  }
}
