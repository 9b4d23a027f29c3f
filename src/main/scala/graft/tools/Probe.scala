package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc exploration main used during development (not part of the
  * driver contract). Prints formatted physical plans and timings for
  * the named queries: `sbt "runMain graft.tools.Probe <sfDir> q26,q30"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val wanted = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // GRAFT_PROBE_SHOW=1: also print the first rows of each probed
    // query — for eyeballing result contracts (e.g. certification
    // booleans) at SFs the spec fixtures don't cover.
    val show = sys.env.get("GRAFT_PROBE_SHOW").exists(_ == "1")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted.exists(name.startsWith)) {
        val df = fn(spark, sfDir)
        println(s"===== $name =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        noop(df) // warm
        val t0 = System.nanoTime()
        noop(df)
        println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (show) df.show(20, truncate = false)
      }
    }
    spark.stop()
  }
}
