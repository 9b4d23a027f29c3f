package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off q62 cost decomposition: analysis vs optimization vs physical
  * planning vs execution (not part of the driver contract). */
object DiagRawLog {
  def main(args: Array[String]): Unit = {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    import graft.log.{Features, LogParser, Templates}
    import graft.queries.RawLog

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Optional scale mode: args = <logDir> <labelsDir> runs the same
    // decomposition against a MakeBigLogFixture corpus.
    val logPath = if (args.nonEmpty) args(0) else RawLog.logPath
    val labPath = if (args.length > 1) args(1) else RawLog.labelsPath
    val templates = Templates.load(spark, RawLog.templatesPath)
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val raw = spark.read.text(logPath)
      t("scan")(noop(raw))
      val parsed = LogParser.withBlock(LogParser.parse(raw))
      t("parse")(noop(parsed))
      val tagged = Templates.tag(parsed, templates)
      t("tag")(noop(tagged))
      val long = tagged.filter(col("event_id").isNotNull)
        .groupBy(col("block_id"), col("event_id")).agg(count(lit(1)).as("n"))
      t("longagg")(noop(long))
      val feat = Features.eventCounts(tagged, templates.map(_.id))
      t("features")(noop(feat))
      t("full_q61")(noop(RawLog.rawLogSessionsAt(spark, logPath, labPath)))
      t("full_q62")(noop(RawLog.rawLogFeaturesAt(spark, logPath, labPath)))
    }
    spark.stop()
  }
}
