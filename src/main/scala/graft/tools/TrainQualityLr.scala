package graft.tools

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Train the q181 model-based quality filter and write it as a
  * committed artifact — the CCNet-style distillation stage: a linear
  * model over hashed-token bag features, weak-labeled by the q37
  * heuristic quality gate (in production the labels would be human or
  * LM ratings; the PLUMBING — features, training, pinned scoring — is
  * what this stage exercises).
  *
  * Features per document: f_b = |{h ∈ token-hash set : h mod
  * [[Buckets]] = b}| — counts of DISTINCT token hashes per bucket
  * (the q27 `token_hashes` chain, so the scoring path reads the
  * stored table and the oracle reuses the `t` CTE text). Weak label:
  * quality_score ≥ [[Tau]] (≈ the sf0.1 median — balanced classes).
  *
  * The artifact stores MICRO-INTEGER weights (round(w·1e6) as long):
  * scoring is then an exact integer dot product — order-free, engine-
  * portable, no exp()/double-summation hazards — and the decision
  * threshold sits at logit_micro > 0 (sigmoid is monotone, so the 0.5
  * probability gate IS the zero logit gate).
  *
  *   sbt "runMain graft.tools.TrainQualityLr /root/testdata/sf0.1 \
  *     src/main/resources/graft/quality_lr.txt"
  */
object TrainQualityLr {

  val Buckets = 64
  val Tau = 0.48
  val MaxIter = 200
  val RegParam = 0.01

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out =
      if (args.length > 1) args(1)
      else "src/main/resources/graft/quality_lr.txt"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-train-quality-lr")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val docs = graft.core.Tables.documents(spark, dir)
      val labels = graft.queries.TextOps.qualityScore(spark, dir)
        .select(col("doc_id"),
          (col("quality_score") >= Tau).cast("double").as("label"))
      val feats = graft.queries.Dedup.tokenHashSetOf(docs)
        .select(col("doc_id"), explode(col("hs")).as("h"))
        .groupBy(col("doc_id"), pmod(col("h"), lit(Buckets.toLong)).as("b"))
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(collect_list(struct(col("b"), col("c"))).as("bc"))
        .join(labels, Seq("doc_id"))
        .collect()
        .map { r =>
          val pairs = r.getSeq[org.apache.spark.sql.Row](1)
            .map(p => (p.getLong(0).toInt, p.getLong(1).toDouble))
            .sortBy(_._1)
          (r.getDouble(2), Vectors.sparse(Buckets, pairs))
        }.toSeq.toDF("label", "features")
      val model = new LogisticRegression()
        .setMaxIter(MaxIter).setRegParam(RegParam)
        .fit(feats)
      val acc = model.transform(feats)
        .select(avg((col("prediction") === col("label")).cast("double")))
        .head.getDouble(0)
      val pos = feats.select(avg("label")).head.getDouble(0)
      def micro(x: Double): Long = math.round(x * 1e6)
      val lines = Seq(
        "# graft quality-filter model — trained by graft.tools.TrainQualityLr",
        s"# corpus: $dir; weak label: q37 quality_score >= $Tau " +
          f"(positive rate $pos%.3f)",
        s"# LogisticRegression(maxIter=$MaxIter, regParam=$RegParam); " +
          f"train accuracy $acc%.3f",
        s"# line 1: bias_micro; lines 2..${Buckets + 1}: w_micro per " +
          s"hash bucket (h mod $Buckets)",
        micro(model.intercept).toString) ++
        (0 until Buckets).map(b => micro(model.coefficients(b)).toString)
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        lines.mkString("\n").concat("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $out (train accuracy $acc, positive rate $pos)")
    } finally spark.stop()
  }
}
