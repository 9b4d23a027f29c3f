package graft.ml

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.log.Features

/** ML surface spec (M1–M6) on a deterministic, linearly separable
  * fixture shaped like the feature-matrix output: block_id, E1..E4
  * counts, a string label with ~10% positives (mirroring the
  * reference's 2.93% anomaly share at small scale).
  */
class MLPipelineSpec extends AnyFunSuite with Matchers with SparkFixture {

  // Anomalies (every 10th block) have E2 >= 5; normals have E2 <= 1.
  private lazy val data = {
    import spark.implicits._
    (1 to 120).map { i =>
      val anomaly = i % 10 == 0
      (s"blk_$i", i % 3, if (anomaly) 5 + i % 2 else i % 2, i % 4, 1,
        if (anomaly) "Anomaly" else "Normal")
    }.toDF("block_id", "E1", "E2", "E3", "E4", "label")
  }

  private val featureCols = Seq("E1", "E2", "E3", "E4")

  private lazy val prepared = {
    val indexed = Pipeline.indexLabel(data)
    val weighted = Features.withClassWeights(indexed, "label_index")
    Pipeline.assemble(weighted, featureCols)
  }

  test("StringIndexer maps the majority class to 0 and casts to int") {
    val m = prepared.select("label", "label_index").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    m("Normal") shouldBe 0
    m("Anomaly") shouldBe 1
  }

  test("weighted LR separates the fixture; evaluators report sane metrics") {
    val (train, test) =
      Features.stratifiedSplit(prepared, "label_index", "block_id", 0.25, 42L)
    val model = Pipeline.trainLR(train)
    model.numClasses shouldBe 2
    val scored = model.transform(test)
    val pr = Pipeline.prAuc(scored)
    val f1 = Pipeline.f1(scored)
    pr should be > 0.95
    pr should be <= 1.0
    f1 should be > 0.95
    // Class weights actually fed the optimizer: the weight column is
    // the N/(K*n) balance, higher for the rare class.
    val w = train.select("label_index", "weight").distinct()
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    w(1) should be > w(0)
  }

  test("learning curve evaluates every fraction on train and test") {
    val (train, test) =
      Features.stratifiedSplit(prepared, "label_index", "block_id", 0.25, 42L)
    val curve = Pipeline.learningCurve(train, test, Seq(0.5, 1.0))
    curve.map(_.fraction) shouldBe Seq(0.5, 1.0)
    all(curve.map(_.trainPrAuc)) should (be >= 0.0 and be <= 1.0)
    all(curve.map(_.testPrAuc)) should (be >= 0.0 and be <= 1.0)
    // Full-data point on separable data is near-perfect.
    curve.last.testPrAuc should be > 0.95
  }

  test("exported expression scorer matches model probabilities to 1e-9") {
    val model = Pipeline.trainLR(prepared)
    val scorer = Pipeline.toScorer(model)
    val featuresArr = array(featureCols.map(col): _*)
    val both = model.transform(prepared)
      .withColumn("p_model", vector_to_array(col("probability")).getItem(1))
      .withColumn("p_expr", scorer.proba(featuresArr))
      .select("p_model", "p_expr").collect()
    both.length shouldBe 120
    both.foreach(r => r.getDouble(1) shouldBe r.getDouble(0) +- 1e-9)
  }

  test("GBT classifier separates the fixture and scores at 0.83") {
    val model = Pipeline.trainGBT(prepared, maxIter = 20)
    model.numClasses shouldBe 2
    val scored = Pipeline.thresholdPredict(model.transform(prepared))
    Pipeline.prAuc(scored) should be > 0.95
    // Threshold rule consistent with the probability column.
    import org.apache.spark.ml.functions.vector_to_array
    scored.filter(
      (vector_to_array(col("probability")).getItem(1) >= 0.83) =!=
        (col("prediction_at_threshold") === 1)).count() shouldBe 0
    // Separable fixture: the 0.83 rule recovers the labels.
    scored.filter((col("prediction_at_threshold") === 1) =!=
      (col("label") === "Anomaly")).count() shouldBe 0
  }

  test("threshold-0.83 decision matches the probability rule") {
    val model = Pipeline.trainLR(prepared)
    val scorer = Pipeline.toScorer(model)
    val featuresArr = array(featureCols.map(col): _*)
    val out = prepared
      .withColumn("proba", scorer.proba(featuresArr))
      .withColumn("pred", scorer.predict(featuresArr))
    out.filter((col("proba") >= 0.83) =!= (col("pred") === 1)).count() shouldBe 0
    // On this fixture the 0.83 rule recovers the labels exactly.
    out.filter((col("pred") === 1) =!= (col("label") === "Anomaly")).count() shouldBe 0
  }
}
