package graft.ml

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batch ML surface (SURVEY.md §2.10 M1–M6; reference
  * `prepare_data_batch.ipynb:458-696`, `ML_predict.py:78-115`).
  *
  * Thin, explicit wrappers over spark.ml with the reference's exact
  * hyperparameters pinned as defaults: weighted LogisticRegression
  * (maxIter 200, regParam 0.01, elasticNet 0, standardization on),
  * PR-AUC + F1 evaluators, the learning-curve loop over sample
  * fractions, and an export of the fitted binary model as a
  * `Scorer.LinearScorer` — a pure Catalyst expression, so the
  * streaming layer scores with codegen'd column math instead of
  * per-row model invocation (M6; the reference ships its model to the
  * consumer as a pickle and calls predict per message).
  *
  * Scale notes: fit is Spark-distributed (LBFGS over partitioned
  * gradients); everything downstream of `toScorer` is map-only
  * expression evaluation — no model broadcast, no UDF, no driver loop.
  */
object Pipeline {

  /** M1: label string → 0-based double index by descending frequency
    * (StringIndexer default — majority class = 0.0, matching the
    * reference where Normal ≫ Anomaly). */
  def indexLabel(df: DataFrame, labelCol: String = "label",
      outCol: String = "label_index"): DataFrame =
    new StringIndexer()
      .setInputCol(labelCol).setOutputCol(outCol)
      .fit(df).transform(df)
      // Reference parity: the notebook casts the index to int
      // (prepare_data_batch.ipynb:515-520).
      .withColumn(outCol, col(outCol).cast("int"))

  /** M2: E1..En count columns → one ml Vector column. */
  def assemble(df: DataFrame, inputCols: Seq[String],
      outCol: String = "features"): DataFrame =
    new VectorAssembler()
      .setInputCols(inputCols.toArray).setOutputCol(outCol)
      .transform(df)

  /** M3: weighted binary LR, reference hyperparameters
    * (`prepare_data_batch.ipynb:641-650`). `tol` is LBFGS's relative
    * convergence tolerance (Spark default 1e-6): each LBFGS iteration
    * is one distributed job over the training frame, so on a small
    * aggregated frame iteration count IS the wall cost and a looser
    * tol is a direct early-stop knob. Callers loosening it own the
    * proof that downstream decisions are unchanged (LrEarlyStopSpec
    * pins q34's confusion matrix across tols). */
  def trainLR(
      train: DataFrame,
      featuresCol: String = "features",
      labelCol: String = "label_index",
      weightCol: Option[String] = Some("weight"),
      maxIter: Int = 200,
      regParam: Double = 0.01,
      tol: Double = 1e-6): LogisticRegressionModel = {
    val lr = new LogisticRegression()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam).setTol(tol)
      .setElasticNetParam(0.0).setStandardization(true)
    weightCol.foreach(lr.setWeightCol)
    lr.fit(train)
  }

  /** M4: area under the precision-recall curve. */
  def prAuc(scored: DataFrame, labelCol: String = "label_index",
      rawCol: String = "rawPrediction"): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol(rawCol)
      .setMetricName("areaUnderPR")
      .evaluate(scored)

  /** M4: multiclass F1. */
  def f1(scored: DataFrame, labelCol: String = "label_index",
      predictionCol: String = "prediction"): Double =
    new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol(predictionCol)
      .setMetricName("f1")
      .evaluate(scored)

  /** One learning-curve point: (fraction, train PR-AUC, test PR-AUC). */
  final case class CurvePoint(fraction: Double, trainPrAuc: Double, testPrAuc: Double)

  /** M5: train on increasing uniform samples of the train split and
    * evaluate train/test PR-AUC at each point
    * (`prepare_data_batch.ipynb:659-696`; SA2 sampling). */
  def learningCurve(
      train: DataFrame,
      test: DataFrame,
      fractions: Seq[Double] = (1 to 10).map(_ / 10.0),
      seed: Long = 42L,
      weightCol: Option[String] = Some("weight")): Seq[CurvePoint] =
    fractions.map { f =>
      val sub = if (f >= 1.0) train else train.sample(withReplacement = false, f, seed)
      val m = trainLR(sub, weightCol = weightCol)
      CurvePoint(f, prAuc(m.transform(sub)), prAuc(m.transform(test)))
    }

  /** M6 (GBDT form): gradient-boosted trees — the Spark-native
    * counterpart of the reference's LightGBM scorer
    * (`XGBoot.ipynb`, `lgb_hdfs_meta.json`: 3000-tree cap, best_iter
    * 149 → a ~150-tree default here; lossType logistic matches). Tree
    * ensembles have no closed-form expression export, so scoring goes
    * through `thresholdPredict` over the model's probability column. */
  def trainGBT(
      train: DataFrame,
      featuresCol: String = "features",
      labelCol: String = "label_index",
      weightCol: Option[String] = Some("weight"),
      maxIter: Int = 150,
      maxDepth: Int = 5,
      seed: Long = 42L): GBTClassificationModel = {
    val gbt = new GBTClassifier()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
    weightCol.foreach(gbt.setWeightCol)
    gbt.fit(train)
  }

  /** M6: the deployed decision rule — P(positive) >= threshold → 0/1 —
    * applied to any model's `probability` vector column
    * (`ML_predict.py:112-114`, threshold 0.83). */
  def thresholdPredict(scored: DataFrame,
      threshold: Double = Scorer.DefaultThreshold,
      probabilityCol: String = "probability",
      outCol: String = "prediction_at_threshold"): DataFrame =
    scored.withColumn(outCol,
      (vector_to_array(col(probabilityCol)).getItem(1) >= threshold).cast("int"))

  /** M6: export a fitted binary model as a pure-expression scorer over
    * an `array<int|float>` feature column — sigmoid(w·f + b) is exactly
    * the binary LR decision function, so `toScorer(m).proba` equals
    * `m.transform(...)` probabilities to machine precision. */
  def toScorer(model: LogisticRegressionModel): Scorer.LinearScorer = {
    require(model.numClasses == 2,
      s"expression export needs a binary model, got ${model.numClasses} classes")
    Scorer.LinearScorer(model.coefficients.toArray.toSeq, model.intercept)
  }
}
