package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not part of the driver contract): run ONLY the
  * stored-index serve latency battery and print its JSON — the
  * ~40-second loop for iterating on serving-path latency without
  * paying the full-registry bench
  * (`sbt "runMain graft.tools.DiagIndexServe /root/testdata/sf0.1"`).
  * Sections beyond index_serve: pass `param` as arg 2 to also run the
  * parameterized + batched batteries. */
object DiagIndexServe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("index_serve=" + ServingLatencyBench.indexSection(spark, sfDir))
    if (args.length > 1 && args(1) == "param") {
      val (p, b) = ServingLatencyBench.paramAndBatchSections(spark, sfDir)
      println("index_serve_param=" + p)
      println("index_serve_batch=" + b)
    }
    spark.stop()
  }
}
