package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the q34-trained LR coefficients/intercept with full
  * (round-trippable) precision, plus the confusion matrix they
  * produce — the provenance tool for the pinned deployment literals
  * in `queries/MLOps.TrainedWeights` / `TrainedBias` (q34's oracle
  * needs the trained decision surface as literals both engines can
  * evaluate; rerun this after changing the trainer, its
  * hyperparameters, or the fixture to refresh the pin):
  * `sbt "runMain graft.tools.DiagLrCoefs /root/testdata/sf0.01"`.
  * Trains TWICE in the same JVM and compares bit patterns, so the
  * printout also certifies run-to-run determinism of the fit.
  */
object DiagLrCoefs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fit() = {
      val (_, assembled) = graft.queries.MLOps.lrFrames(spark, sfDir)
      graft.ml.Pipeline.trainLR(assembled, tol = graft.queries.MLOps.LrEarlyStopTol)
    }
    val m1 = fit()
    val m2 = fit()
    def bits(m: org.apache.spark.ml.classification.LogisticRegressionModel) =
      (m.coefficients.toArray :+ m.intercept).map(java.lang.Double.doubleToLongBits)
    val deterministic = bits(m1).sameElements(bits(m2))
    // java.lang.Double.toString is the shortest decimal that
    // round-trips to the same IEEE double — safe to paste as a
    // Scala/SQL literal.
    println(s"[lr-coefs] sf=$sfDir deterministic_refit=$deterministic")
    println(s"[lr-coefs] weights=Seq(${m1.coefficients.toArray.mkString(", ")})")
    println(s"[lr-coefs] bias=${m1.intercept}")
    val (weighted, _) = graft.queries.MLOps.lrFrames(spark, sfDir)
    graft.queries.MLOps.lrConfusion(weighted, m1)
      .show(20, truncate = false)
    spark.stop()
  }
}
