package graft.sources

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.queries.PipelineOps

/** The q182 shard export: the oracle certifies the manifest against
  * the pack rule; this spec pins the PHYSICAL side — the written tree
  * matches the manifest it ships with, nothing is lost or duplicated,
  * and a re-export is deterministic.
  */
class ShardExportSpec extends AnyFunSuite with SparkFixture {

  private def treeManifest(out: String) = {
    // Recompute the manifest FROM THE WRITTEN FILES (partition
    // columns come back as parsed ints — normalize to the pack's
    // longs) and compare against the shipped one.
    PipelineOps.manifestOf(
      spark.read.parquet(s"$out/shards")
        .select(col("doc_id"), col("n_tokens"),
          col("shard").cast("long").as("shard"),
          col("bin").cast("long").as("bin")))
      .collect().map(_.toSeq).toSeq
  }

  test("the written tree matches its manifest; nothing lost; re-export deterministic") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    Sinks.writeTrainingShards(spark, sfDir, out)
    val shipped = spark.read.parquet(s"$out/manifest")
      .orderBy("shard", "bin").collect().map(_.toSeq).toSeq
    assert(shipped.nonEmpty)
    assert(treeManifest(out) == shipped,
      "the shipped manifest does not describe the written files")
    // Conservation: every corpus document lands exactly once.
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    val tree = spark.read.parquet(s"$out/shards")
    assert(tree.count() == nDocs)
    assert(tree.select("doc_id").distinct().count() == nDocs)
    // Manifest totals reconcile with the corpus.
    assert(shipped.map(_(2).asInstanceOf[Long]).sum == nDocs)
    // Determinism: a second export ships the identical manifest.
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-shards-2").toString
    Sinks.writeTrainingShards(spark, sfDir, out2)
    val shipped2 = spark.read.parquet(s"$out2/manifest")
      .orderBy("shard", "bin").collect().map(_.toSeq).toSeq
    assert(shipped2 == shipped, "re-export changed the manifest")
  }

  test("every file row sits in the partition its pack assignment names") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-shards-3").toString
    Sinks.writeTrainingShards(spark, sfDir, out)
    val assigned = PipelineOps.packSequences(spark, sfDir)
      .select(col("doc_id"), col("shard").as("a_shard"),
        col("bin").as("a_bin"))
    val misplaced = spark.read.parquet(s"$out/shards")
      .select(col("doc_id"), col("shard").cast("long"),
        col("bin").cast("long"))
      .join(assigned, Seq("doc_id"))
      .filter(col("shard") =!= col("a_shard") || col("bin") =!= col("a_bin"))
      .count()
    assert(misplaced == 0L)
  }

  test("curated shards ship ONLY retained documents, tree matching manifest") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-cur-shards").toString
    Sinks.writeCuratedShards(spark, sfDir, out)
    val shipped = spark.read.parquet(s"$out/manifest")
      .orderBy("shard", "bin").collect().map(_.toSeq).toSeq
    assert(shipped.nonEmpty)
    assert(treeManifest(out) == shipped,
      "the curated manifest does not describe the written files")
    // Exclusion: no shipped doc is flagged non-retained.
    val flagged = graft.queries.CurationPipeline
      .stored(spark, sfDir, "cur_flags")
      .filter(!col("retained")).select("doc_id")
    val leaked = spark.read.parquet(s"$out/shards")
      .join(flagged, Seq("doc_id"), "left_semi").count()
    assert(leaked == 0L, s"$leaked non-retained docs leaked into the shards")
  }
}
