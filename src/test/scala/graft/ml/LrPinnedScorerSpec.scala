package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.queries.MLOps

/** q34's oracle-closure certificate (round 11 — the registry's last
  * rows-only query). `MLOps.lrAnomaly` reports the confusion matrix of
  * the PINNED literal export of the trained model (`TrainedWeights`/
  * `TrainedBias`, produced and provenance-checked by
  * `tools/DiagLrCoefs` at sf0.01) plus a per-cell flag that the
  * freshly RE-TRAINED model's threshold-0.83 decisions agree with the
  * pin. This spec pins, at the snapshot scale:
  *   1. the flag is true on every cell (refit reproduces the pin),
  *   2. the certified counts equal the trained model's own confusion
  *      matrix (the pre-r11 q34 output — nothing was lost by moving
  *      to the oracle-checkable form), and
  *   3. a perturbed pin flips the flag (mutation control — the
  *      certificate is sensitive, not vacuously true).
  */
class LrPinnedScorerSpec extends AnyFunSuite with Matchers with SparkFixture {

  // The pin was produced at sf0.01 (DiagLrCoefs); certify there, not
  // at the sf0.001 spec default — at other scales the flag honestly
  // reports deployment drift instead.
  override def sfDir: String = "/root/testdata/sf0.01"

  test("q34 certificate: refit agrees with the pinned literals on every cell") {
    val rows = MLOps.lrAnomaly(spark, sfDir).collect()
    rows should not be empty
    rows.head.schema.fieldNames.toSeq shouldBe
      Seq("label_index", "prediction", "n", "trained_matches_pinned")
    rows.foreach { r =>
      withClue(s"cell (${r.getInt(0)}, ${r.getInt(1)}): ") {
        r.getAs[Boolean]("trained_matches_pinned") shouldBe true
      }
    }

    // The certified counts ARE the trained model's confusion matrix.
    val (weighted, assembled) = MLOps.lrFrames(spark, sfDir)
    val model = Pipeline.trainLR(assembled, tol = MLOps.LrEarlyStopTol)
    val cm = MLOps.lrConfusion(weighted, model).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq shouldBe cm
  }

  test("q34 certificate flips under a perturbed pin (mutation control)") {
    val mutated = MLOps.lrAnomalyWith(spark, sfDir,
      MLOps.TrainedWeights, MLOps.TrainedBias + 2.0).collect()
    mutated.exists(!_.getAs[Boolean]("trained_matches_pinned")) shouldBe true
  }
}
