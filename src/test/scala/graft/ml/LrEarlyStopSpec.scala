package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.queries.MLOps

/** The q34 early-stop parity proof (round 9). q34's wall cost is
  * LBFGS iteration count × per-job scheduler latency — the training
  * frame is a few thousand aggregated rows in one cached partition,
  * so every iteration past convergence is pure overhead. `lrAnomaly`
  * therefore trains at `MLOps.LrEarlyStopTol` (1e-4) instead of
  * Spark's 1e-6 default. This spec is the license for that: at the
  * reference hyperparameters (maxIter=200, regParam=0.01,
  * `prepare_data_batch.ipynb:641-650`), the early-stopped model must
  * produce the IDENTICAL q34 confusion matrix on the identical q34
  * dataflow, while actually stopping earlier. If a future data or
  * label change makes the loosened tol decision-relevant, the parity
  * assertion — not production drift — is what fails. */
class LrEarlyStopSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("tol=1e-4 stops LBFGS earlier yet yields the exact q34 confusion matrix") {
    val spark = SparkFixture.session
    val (weighted, assembled) = MLOps.lrFrames(spark, sfDir)

    val full = Pipeline.trainLR(assembled) // Spark-default tol 1e-6
    val early = Pipeline.trainLR(assembled, tol = MLOps.LrEarlyStopTol)

    // The knob does something: strictly fewer LBFGS iterations.
    val itFull = full.summary.totalIterations
    val itEarly = early.summary.totalIterations
    withClue(s"iterations full=$itFull early=$itEarly: ") {
      itEarly should be < itFull
    }

    // And changes nothing the query reports: the confusion matrices
    // (threshold-0.83 expression scorer vs derived label, the exact
    // q34 output shape) are row-for-row identical.
    val cmFull = MLOps.lrConfusion(weighted, full).collect().toSeq
    val cmEarly = MLOps.lrConfusion(weighted, early).collect().toSeq
    cmEarly should contain theSameElementsInOrderAs cmFull

    // Belt and braces: the coefficient gap between the two fits is
    // far below anything a 0.83-threshold decision could feel.
    val diff = full.coefficients.toArray.zip(early.coefficients.toArray)
      .map { case (a, b) => math.abs(a - b) }.max
      .max(math.abs(full.intercept - early.intercept))
    withClue(s"max |coef delta| $diff: ") {
      diff should be < 1e-2
    }
  }
}
