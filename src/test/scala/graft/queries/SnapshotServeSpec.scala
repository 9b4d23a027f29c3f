package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** The q183 time-travel serve: the oracle certifies the standing/
  * merged pair on the q139 fixture; this spec pins the
  * REPRODUCIBILITY laws on a live store — a pinned version replays
  * byte for byte after the store moves on (merge or delete), the
  * current version tracks the pointer, and unretained versions refuse
  * instead of half-reading.
  */
class SnapshotServeSpec extends AnyFunSuite with SparkFixture {

  private val opts = Similarity.AnnServeOpts(nprobe = 2, k = 10)

  private def qv: Seq[Double] = Tables.embeddings(spark, sfDir)
    .filter(col("vec_id") === lit(123L))
    .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    .head.getSeq[Double](0)

  test("a pinned snapshot replays byte for byte across a later delete") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-ttl-wh").toString
    Warehouse.build(spark, sfDir, wh)
    val v1 = Warehouse.version(wh)
    val rows = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(_.toSeq).toSeq
    val before = rows(Similarity.serveAt(spark, wh, v1, Seq((0L, qv)), opts))
    assert(before.nonEmpty)
    assert(before == rows(
      Similarity.serveFrom(spark, wh, Seq((0L, qv)), opts)),
      "serveAt(current) must equal serveFrom")
    // Delete the top hit; the pointer moves, the old snapshot must not.
    import spark.implicits._
    val topId = before.head(2).asInstanceOf[Long]
    Warehouse.deleteVectors(spark, wh, Seq(topId).toDF("vec_id"))
    val v2 = Warehouse.version(wh)
    assert(v2 == v1 + 1)
    val replay = rows(Similarity.serveAt(spark, wh, v1, Seq((0L, qv)), opts))
    assert(replay == before,
      "the pinned pre-delete snapshot must replay the original ranking")
    val current = rows(Similarity.serveFrom(spark, wh, Seq((0L, qv)), opts))
    assert(!current.map(_(2)).contains(topId),
      "the deleted vector leaked into the current serve")
    assert(current == rows(
      Similarity.serveAt(spark, wh, v2, Seq((0L, qv)), opts)),
      "serveAt(new version) must equal the current serve")
  }

  test("unretained versions refuse instead of half-reading") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-ttl-wh2").toString
    Warehouse.build(spark, sfDir, wh)
    val err = intercept[IllegalArgumentException] {
      Similarity.serveAt(spark, wh, Warehouse.version(wh) + 7,
        Seq((0L, qv)), opts).collect()
    }
    assert(err.getMessage.contains("not retained"))
  }
}
