package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic for the q47-vs-q22 bench question (not part of
  * the driver contract): runs both template-match forms with
  * whole-stage-codegen fallback DISABLED (so a Janino failure throws
  * instead of silently interpreting), prints whether the scan stage is
  * inside WholeStageCodegen, and times N reps of each.
  */
object DiagTemplate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.logging.maxLinesPerFunction", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (name <- Seq("q22_template_match", "q47_template_native")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      // With spark.sql.codegen.fallback=false a Janino compile failure
      // in any stage THROWS here instead of silently interpreting —
      // success is the proof that the native expression codegens.
      noop(df) // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $name%-24s reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f s")
    }
    spark.stop()
  }
}
