package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.queries.MLOps

/** q34's oracle-closure certificate (round 11; flag moved here in
  * round 18). `MLOps.lrAnomaly` reports the confusion matrix of the
  * PINNED literal export of the trained model (`TrainedWeights`/
  * `TrainedBias`, produced and provenance-checked by
  * `tools/DiagLrCoefs` at sf0.01) — every output column
  * oracle-checked. The refit-vs-pin agreement is certified HERE, at
  * the pin's own scale, via `refitPinMismatches` (label-anchored:
  * the frequency-derived index orientation flips between fixtures,
  * so the compare anchors decisions to the pinned "normal" class):
  *   1. the fresh refit reproduces the pinned decisions on every row
  *      (bit-deterministic refit at the pin's fixture),
  *   2. the certified counts equal the trained model's own confusion
  *      matrix (the pre-r11 q34 output — nothing was lost by moving
  *      to the oracle-checkable form), and
  *   3. a perturbed pin produces mismatches (mutation control — the
  *      audit is sensitive, not vacuously zero).
  */
class LrPinnedScorerSpec extends AnyFunSuite with Matchers with SparkFixture {

  // The pin was produced at sf0.01 (DiagLrCoefs); audit there, not
  // at the sf0.001 spec default — at other scales the mismatch count
  // honestly reports deployment drift instead.
  override def sfDir: String = "/root/testdata/sf0.01"

  test("q34 certificate: refit agrees with the pinned literals on every row") {
    val rows = MLOps.lrAnomaly(spark, sfDir).collect()
    rows should not be empty
    rows.head.schema.fieldNames.toSeq shouldBe
      Seq("label_index", "prediction", "n")
    MLOps.refitPinMismatches(spark, sfDir,
      MLOps.TrainedWeights, MLOps.TrainedBias) shouldBe 0L

    // The certified counts ARE the trained model's confusion matrix.
    val (weighted, assembled) = MLOps.lrFrames(spark, sfDir)
    val model = Pipeline.trainLR(assembled, tol = MLOps.LrEarlyStopTol)
    val cm = MLOps.lrConfusion(weighted, model).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq shouldBe cm
  }

  test("q34 audit flags a perturbed pin (mutation control)") {
    MLOps.refitPinMismatches(spark, sfDir,
      MLOps.TrainedWeights, MLOps.TrainedBias + 2.0) should be > 0L
  }
}
