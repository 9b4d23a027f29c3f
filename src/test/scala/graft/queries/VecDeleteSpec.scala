package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Vector-grain deletes on the dense family (q158, r15 verdict #6):
  * the oracle certifies the served ranking over the remaining
  * vectors; this spec drives the lifecycle the one query can't —
  * refusals and bounds, every dense serve path honoring the list,
  * the physical purge via compact, the refresh's purge-and-refit,
  * and the merge carrying the list forward.
  */
class VecDeleteSpec extends AnyFunSuite with SparkFixture {

  private def freshWh(): String = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-vecdel-spec").toString
    Warehouse.build(spark, sfDir, wh)
    wh
  }

  private def deadIds(wh: String): Set[Long] =
    Warehouse.vecTombstones(spark, wh)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)

  private def qvOf(vid: Long): Seq[Double] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === lit(vid))
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()(0).getSeq[Double](0)

  test("deleteVectors refuses unindexed ids and over-bound totals; idempotent otherwise") {
    import spark.implicits._
    val wh = freshWh()
    val ex = intercept[IllegalArgumentException] {
      Warehouse.deleteVectors(spark, wh, Seq(999999L).toDF("vec_id"))
    }
    assert(ex.getMessage.contains("no stored cell row"))
    intercept[IllegalArgumentException] {
      Warehouse.deleteVectors(spark, wh, Seq(10L, 11L).toDF("vec_id"),
        maxTombstones = 1L)
    }
    Warehouse.deleteVectors(spark, wh, Seq(10L, 11L).toDF("vec_id"))
    assert(deadIds(wh) == Set(10L, 11L))
    // Re-deleting an already-dead id adds nothing and does not throw.
    Warehouse.deleteVectors(spark, wh, Seq(11L, 12L).toDF("vec_id"))
    assert(deadIds(wh) == Set(10L, 11L, 12L))
  }

  test("every dense serve path excludes tombstoned vectors") {
    import spark.implicits._
    val wh = freshWh()
    val qv = qvOf(123L)
    // Kill the top neighbours of the request so exclusion is visible.
    val before = Similarity.annServeFrom(spark, wh, qv, 3, 12)
      .collect().map(_.getLong(0))
    val kill = before.take(3).toSeq
    Warehouse.deleteVectors(spark, wh, kill.toDF("vec_id"))
    val after = Similarity.annServeFrom(spark, wh, qv, 3, 12)
      .collect().map(_.getLong(0))
    assert(after.intersect(kill).isEmpty, "param serve must exclude")
    assert(after.length == 12, "ranking refills from surviving vectors")
    val quant = Similarity.annServeQuantFrom(spark, wh, qv, 3, 12)
      .collect().map(_.getLong(0))
    assert(quant.intersect(kill).isEmpty, "quant serve must exclude")
    assert(quant.toSeq == after.toSeq,
      "quant serve still matches the exact probed serve post-delete")
    val batch = Similarity.annServeBatchFrom(spark, wh,
      Seq((0L, qv)), nprobe = 3, k = 12).collect().map(_.getLong(2))
    assert(batch.intersect(kill).isEmpty, "batch serve must exclude")
    assert(batch.toSeq == after.toSeq, "batch slice == param serve post-delete")
    val qbatch = Similarity.annServeQuantBatchFrom(spark, wh,
      Seq((0L, qv)), nprobe = 3, k = 12).collect().map(_.getLong(2))
    assert(qbatch.intersect(kill).isEmpty, "quant batch serve must exclude")
    assert(qbatch.toSeq == after.toSeq,
      "quant batch slice == param serve post-delete")
  }

  test("compact(purgeVecTombstones) drops dead rows physically and clears the list") {
    import spark.implicits._
    val wh = freshWh()
    val qv = qvOf(123L)
    val total = Warehouse.read(spark, wh, "cells").count()
    Warehouse.deleteVectors(spark, wh,
      Seq(1L, 2L, 3L, 40L, 41L).toDF("vec_id"))
    val served = Similarity.annServeFrom(spark, wh, qv, 3, 12)
      .collect().map(_.toSeq).toSeq
    Warehouse.compact(spark, wh, purgeVecTombstones = true)
    assert(Warehouse.vecTombstones(spark, wh).isEmpty, "list cleared")
    assert(Warehouse.read(spark, wh, "cells").count() == total - 5)
    assert(Warehouse.read(spark, wh, "cells_q8").count() == total - 5)
    val reserved = Similarity.annServeFrom(spark, wh, qv, 3, 12)
      .collect().map(_.toSeq).toSeq
    assert(reserved == served, "physical purge must not change the serve")
  }

  test("semantic refresh purges dead rows, refits without them, and clears the list") {
    import spark.implicits._
    val wh = freshWh()
    val total = Warehouse.read(spark, wh, "cells").count()
    Warehouse.deleteVectors(spark, wh, Seq(20L, 21L).toDF("vec_id"))
    Warehouse.refreshSemantic(spark, wh)
    assert(Warehouse.vecTombstones(spark, wh).isEmpty,
      "refresh is the refit path AND the physical purge")
    assert(Warehouse.read(spark, wh, "cells").count() == total - 2)
    assert(Warehouse.read(spark, wh, "cells")
      .filter(col("vec_id").isin(20L, 21L)).count() == 0)
  }

  test("a merge carries the tombstone list forward; the batch's vectors serve") {
    import spark.implicits._
    val wh = freshWh()
    Warehouse.deleteVectors(spark, wh, Seq(30L, 31L).toDF("vec_id"))
    // Merge a small doc+vector batch (fresh ids beyond the corpus).
    val batchDocs = Seq((90001L, "srcx", "merge carries tombstones pin"))
      .toDF("doc_id", "source", "text")
    val dim = qvOf(0L).length
    val batchEmb = Seq((90001L, Seq.fill(dim)(0.25f), "x"))
      .toDF("vec_id", "embedding", "label")
    Warehouse.mergeBatch(spark, wh, batchDocs, Some(batchEmb))
    assert(deadIds(wh) == Set(30L, 31L), "merge must carry the list")
    val served = Similarity.annServeFrom(spark, wh, qvOf(123L), 8, 2000)
      .collect().map(_.getLong(0)).toSet
    assert(!served.contains(30L) && !served.contains(31L))
    assert(served.contains(90001L), "the merged vector is servable")
  }
}
