package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off q44 cost decomposition (not part of the driver contract):
  * times the scan, the direct try_cast, the native kernel extract and
  * the regexp_extract form separately over events.props.
  */
object DiagExtract {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ev = graft.core.Tables.events(spark, sfDir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => ev.select(col("props")).agg(count(col("props")).as("n"))),
      "direct_trycast" -> (() => ev.select(expr("try_cast(props AS BIGINT)").as("d"))
        .agg(count(col("d")).as("n"))),
      "kernel_extract" -> (() => ev.select(
        call_function("graft_extract_long", col("props"), lit("\"k\": ")).as("k"))
        .agg(count(col("k")).as("n"), sum(col("k")).as("s"))),
      "regex_extract" -> (() => ev.select(
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT)").as("k"))
        .agg(count(col("k")).as("n"), sum(col("k")).as("s"))),
      "full_q44" -> (() => graft.SparkEntry.queries("q44_try_cast")(spark, sfDir)))

    variants.foreach { case (name, mk) =>
      val df = mk()
      noop(df) // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $name%-16s reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f s")
    }
    spark.stop()
  }
}
