package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.core.Tables

/** Multimodal plumbing spec: payload attachment, schema and
  * determinism of the mapPartitions feature pass, bounded-batch
  * behavior, and metadata-only frame sampling. The decode itself is
  * the documented stub — these tests pin the plumbing contract a real
  * codec drops into.
  */
class MediaSpec extends AnyFunSuite with Matchers with SparkFixture {

  import Media._

  private lazy val records = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .transform(withPayload(_, "text", "kind"))
      .select(col("doc_id").as("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
  }

  test("payload column is real bytes with modality metadata") {
    val r = records.filter(col("media_id") === 0).head()
    r.payload should not be empty
    Seq("image", "audio", "video") should contain(r.kind)
    // utf-8 bytes of the text column — byte length == char length here
    // (ascii corpus).
    new String(r.payload, "UTF-8") should include(" ")
  }

  test("feature extraction preserves rows, schema and determinism") {
    val out1 = extractFeatures(records).collect().sortBy(_.media_id)
    val out2 = extractFeatures(records).collect().sortBy(_.media_id)
    out1.length shouldBe records.count()
    out1.foreach { f =>
      f.embedding should have length EmbeddingDim
      all(f.embedding.toSeq) should (be >= 0f and be <= 1f)
      f.width should (be >= 16 and be < 256)
      f.height should (be >= 16 and be < 256)
      f.n_frames should be >= 1
      if (f.kind == "image") f.n_frames shouldBe 1
    }
    // Deterministic: identical output across runs (the stub contract).
    out1.map(f => (f.media_id, f.width, f.height, f.n_frames, f.embedding.toSeq)) shouldBe
      out2.map(f => (f.media_id, f.width, f.height, f.n_frames, f.embedding.toSeq))
  }

  test("batch size does not change results (bounded-batch shape)") {
    val big = extractFeatures(records, batchSize = 1024).collect().sortBy(_.media_id)
    val tiny = extractFeatures(records, batchSize = 3).collect().sortBy(_.media_id)
    big.map(f => (f.media_id, f.embedding.toSeq)) shouldBe
      tiny.map(f => (f.media_id, f.embedding.toSeq))
  }

  test("frame sampling is a pure metadata op") {
    import spark.implicits._
    val meta = extractFeatures(records).toDF()
    val sampled = frameSampleIndices(meta, stride = 4)
      .filter(col("kind") === "video")
      .select(col("n_frames"), col("sampled_frames"))
      .as[(Int, Seq[Long])].collect()
    sampled should not be empty
    sampled.foreach { case (n, idx) =>
      idx shouldBe (0L until n.toLong).filter(_ % 4 == 0)
    }
  }
}
