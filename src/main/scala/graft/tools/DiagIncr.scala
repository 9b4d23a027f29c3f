package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway attribution for the q113 increment (round-14 verdict #1):
  * times each sub-frame of the stored-path increment in isolation so
  * the steady-state cost is attributed, not guessed. Not part of the
  * driver contract. */
object DiagIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val wh = Warehouse.ensure(spark, sfDir)
    println(s"[diag] warehouse at $wh")
    def table(n: String) = Warehouse.read(spark, wh, n)
    t("bands count")(table("bands").count())
    t("token_hashes count")(table("token_hashes").count())
    t("token_hashes scan hs")(
      table("token_hashes").select(sum(size(col("hs")))).count())
    // Piecewise re-build of incrementAgainst's stages.
    val newDocs = graft.core.Tables.documents(spark, sfDir)
      .filter(col("source") === "src19")
    val hsNew = Dedup.tokenHashSetOf(newDocs).localCheckpoint(false)
    t("hsNew materialize")(hsNew.count())
    val nb = Dedup.bandFrameOfSigs(Dedup.sigsFromHs(hsNew))
      .select(col("doc_id").as("new_doc"), col("band"), col("band_hash"))
    val nbKeys = nb.select("band", "band_hash").distinct()
    val newIds = hsNew.select(col("doc_id"))
    val ib = table("bands")
      .join(broadcast(nbKeys), Seq("band", "band_hash"), "left_semi")
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("idx_doc"), col("band"), col("band_hash"))
    t("ib pruned count")(ib.count())
    val cand = ib.join(broadcast(nb), Seq("band", "band_hash"))
      .select("new_doc", "idx_doc").distinct()
    t("cand count")(println("[diag]   n_cand = " + cand.count()))
    val ha = hsNew.select(col("doc_id").as("new_doc"), col("hs").as("ha"))
    val hb = table("token_hashes")
      .select(col("doc_id").as("idx_doc"), col("hs").as("hb"))
    val scored = hb
      .join(broadcast(cand.join(ha, "new_doc")), "idx_doc")
      .withColumn("n_inter",
        size(array_intersect(col("ha"), col("hb"))).cast("long"))
    t("scored count")(scored.count())
    val full = Dedup.incrementalDedup(spark, sfDir)
    t("q113 full")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
