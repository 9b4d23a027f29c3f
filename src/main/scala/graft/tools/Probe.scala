package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc exploration main used during development (not part of the
  * driver contract). `sbt "runMain graft.tools.Probe <sfDir>"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.core.Tables.events(spark, sfDir)
    ev.printSchema()
    ev.show(3, truncate = false)
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    em.printSchema()
    spark.stop()
  }
}
