package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable scoring surface (SURVEY.md §2.10 M6; reference
  * `ML_predict.py:78-115`, threshold call-site `kafka_consumer.py:35`).
  *
  * A Scorer turns a feature-array column (`array<int>`/`array<double>`)
  * into a probability column, entirely with Catalyst expressions — no
  * UDF, so scoring stays inside whole-stage codegen and is map-only at
  * any scale. The deployed decision rule is `proba >= threshold` with
  * threshold 0.83 (`kafka_consumer.py:35`).
  */
trait Scorer {
  /** P(positive | features) as a Column over a feature-array column. */
  def proba(features: Column): Column

  /** 0/1 decision at `threshold` (reference default 0.83). */
  def predict(features: Column, threshold: Double = Scorer.DefaultThreshold): Column =
    (proba(features) >= threshold).cast("int")
}

object Scorer {
  /** The reference's deployed decision threshold (`kafka_consumer.py:35`). */
  val DefaultThreshold = 0.83

  /** Logistic-form linear scorer: sigmoid(w·f + b). Weights are inlined
    * as literals into the plan (the model is a dim of ~30 doubles — the
    * same "manual broadcast" the reference does for its model file).
    * Also the expression form MLlib's LogisticRegressionModel reduces to
    * for binary models, so `graft.ml.Pipeline` can export one here. */
  final case class LinearScorer(weights: Seq[Double], bias: Double) extends Scorer {
    override def proba(features: Column): Column = {
      val margin = zip_with(
        features,
        array(weights.map(lit): _*),
        (x, w) => x.cast("double") * w)
      val z = aggregate(margin, lit(bias), (acc, v) => acc + v)
      lit(1.0) / (lit(1.0) + exp(-z))
    }
  }
}
