package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The q181 model-based quality filter: the oracle certifies the
  * per-source aggregate; this spec pins the artifact contract, the
  * scoring laws, and that the pinned model actually carries signal on
  * held-out data (trained on sf0.1; this suite scores sf0.001).
  */
class QualityModelSpec extends AnyFunSuite with SparkFixture {

  private val (bias, ws) = PipelineOps.QualityLr

  test("the committed artifact is well-formed") {
    assert(ws.length == 64, s"expected 64 bucket weights, got ${ws.length}")
    assert(ws.exists(_ != 0L), "an all-zero model carries no signal")
    // Micro-integer weights stay far from Long-overflow territory even
    // summed over a million-distinct-token document.
    assert(ws.forall(w => math.abs(w) < 100L * 1000000L))
  }

  test("scoring laws: empty set scores the bias; null set stays bias-only") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[Long])),
      (2L, None),
      (3L, Some(Seq(0L, 64L, 65L)))).toDF("doc_id", "hs")
      .select(col("doc_id"),
        PipelineOps.qualityLogitMicro(col("hs")).as("lm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df(1L) == bias, "empty token set must score exactly the bias")
    assert(df(2L) == bias, "null token set must score exactly the bias")
    // Buckets wrap mod |w|: hashes 0 and 64 share bucket 0.
    assert(df(3L) == bias + 2 * ws(0) + ws(1))
  }

  test("the engine logit equals a plain-Scala rescoring of the stored sets") {
    val stored = Warehouse.stored(spark, sfDir, "token_hashes")
      .limit(50)
    val got = stored
      .select(col("doc_id"),
        PipelineOps.qualityLogitMicro(col("hs")).as("lm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    stored.collect().foreach { r =>
      val id = r.getLong(0)
      val expect = bias + r.getSeq[Long](1)
        .map(h => ws((h % ws.length).toInt)).sum
      assert(got(id) == expect, s"doc $id logit")
    }
  }

  test("the pinned model generalizes: held-out accuracy beats majority by >= 10pp") {
    // Weak labels re-derived from the q37 heuristic at the training
    // threshold; the model never saw this corpus (trained on sf0.1).
    val labels = TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"),
        (col("quality_score") >= graft.tools.TrainQualityLr.Tau).as("label"))
    val preds = Warehouse.stored(spark, sfDir, "token_hashes")
      .select(col("doc_id"),
        (PipelineOps.qualityLogitMicro(col("hs")) > 0L).as("pred"))
    val joined = preds.join(labels, Seq("doc_id"))
      .agg(
        avg((col("pred") === col("label")).cast("double")).as("acc"),
        greatest(avg(col("label").cast("double")),
          lit(1.0) - avg(col("label").cast("double"))).as("majority"))
      .head
    val (acc, majority) = (joined.getDouble(0), joined.getDouble(1))
    assert(acc >= 0.65, s"held-out accuracy $acc under the 0.65 floor")
    assert(acc >= majority + 0.10,
      s"accuracy $acc does not beat the majority class $majority by 10pp")
  }
}
