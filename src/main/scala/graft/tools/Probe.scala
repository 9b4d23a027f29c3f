package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc exploration main used during development (not part of the
  * driver contract). `sbt "runMain graft.tools.Probe <sfDir>"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column

    def triGrams(words: Column): Column =
      when(size(words) >= 3,
        array_distinct(transform(
          sequence(lit(1), size(words) - 2),
          i => concat_ws(" ",
            element_at(words, i), element_at(words, i + 1), element_at(words, i + 2)))))
        .otherwise(array().cast("array<string>"))

    val docs = graft.core.Tables.documents(spark, sfDir)
    val g = docs.select(col("doc_id"), triGrams(split(col("text"), " ")).as("grams"))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warm scan")(noop(docs))
    time("grams only")(noop(g))
    time("grams only x2")(noop(g))
    val joined = g.as("a").join(g.withColumn("doc_id", col("doc_id") - 1).as("b"), Seq("doc_id"))
    time("join no intersect")(noop(joined))
    time("join + intersect")(noop(joined.withColumn("n_inter",
      size(array_intersect(col("a.grams"), col("b.grams"))).cast("long"))))
    val q = graft.queries.Dedup.ngramJaccard(spark, sfDir)
    time("q26 full")(noop(q))

    spark.stop()
  }
}
