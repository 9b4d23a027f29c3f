package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Hot-cell split — IVF list balancing (q163/q164): the oracle
  * certifies exact membership and the served ranking; this spec
  * asserts the CLAIMS the certificate states only indirectly — the
  * max cell fraction strictly drops, sub-cells partition their
  * parent, untouched cells and centroids are bit-identical — plus
  * the lifecycle the one query can't drive: the balanced-store gate
  * (None, no version churn), exhaustive-probe serve invariance
  * (partitioning must never change an all-cells-probed ranking), the
  * refusal branch, and the tombstone purge-and-drop discipline the
  * split shares with the semantic refresh.
  */
class CellSplitSpec extends AnyFunSuite with SparkFixture {

  private def freshWh(): String = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-split-spec").toString
    Warehouse.build(spark, sfDir, wh)
    wh
  }

  private def membership(wh: String): Map[Long, Long] =
    Warehouse.read(spark, wh, "cells").select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def qvOf(vid: Long): Seq[Double] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === lit(vid))
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()(0).getSeq[Double](0)

  test("split drops the max cell fraction; sub-cells partition their parent; untouched state is bit-identical") {
    val wh = freshWh()
    val before = membership(wh)
    val centsBefore = Warehouse.read(spark, wh, "centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val maxCid = centsBefore.keys.max
    assert(Warehouse.splitHotCells(spark, wh, Similarity.SplitRatio).nonEmpty,
      "fixture must have hot cells at the pinned ratio")
    val after = membership(wh)
    val centsAfter = Warehouse.read(spark, wh, "centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(after.keySet == before.keySet, "split must not add or drop vectors")
    val hot = before.groupBy(_._2).view.mapValues(_.size).toMap
      .filter { case (_, n) =>
        n > Similarity.SplitRatio * before.size / centsBefore.size }
      .keySet
    assert(hot.nonEmpty)
    // Sub-cells partition the parent: every moved vector came from a
    // hot cell and landed in a NEW id; unsplit members are untouched.
    before.foreach { case (vid, cell) =>
      if (hot.contains(cell))
        assert(after(vid) == cell || after(vid) > maxCid,
          s"vec $vid left hot cell $cell for a pre-existing cell")
      else assert(after(vid) == cell, s"vec $vid moved from unsplit cell")
    }
    // Balance: the max cell size strictly drops.
    def maxSize(m: Map[Long, Long]): Int =
      m.groupBy(_._2).map(_._2.size).max
    assert(maxSize(after) < maxSize(before),
      s"split must shrink the largest cell: ${maxSize(before)} -> ${maxSize(after)}")
    // Untouched centroids are bit-identical; split parents were refit.
    centsAfter.foreach { case (cid, v) =>
      if (!hot.contains(cid) && cid <= maxCid)
        assert(centsBefore(cid) == v, s"unsplit centroid $cid changed")
    }
    assert(centsAfter.size == centsBefore.size + hot.size,
      "one new centroid per split cell")
  }

  test("balanced store gates to None without version churn; ratio <= 1 refused") {
    val wh = freshWh()
    val v0 = Warehouse.version(wh)
    assert(Warehouse.splitHotCells(spark, wh, ratio = 3.0).isEmpty,
      "no cell exceeds 3x uniform in the fixture")
    assert(Warehouse.version(wh) == v0, "a gated split must not commit")
    intercept[IllegalArgumentException] {
      Warehouse.splitHotCells(spark, wh, ratio = 1.0)
    }
  }

  test("exhaustive-probe serving is invariant under the split") {
    // With nprobe >= every cell, the probe prunes nothing and the
    // serve is the exact scan — any partitioning must produce the
    // identical ranking. A split that lost, duplicated, or re-scored
    // a vector shows up here regardless of probe luck.
    val wh = freshWh()
    val qv = qvOf(123L)
    val before = Similarity.annServeFrom(spark, wh, qv, nprobe = 16, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    Warehouse.splitHotCells(spark, wh, Similarity.SplitRatio)
    val after = Similarity.annServeFrom(spark, wh, qv, nprobe = 16, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(after.toSeq == before.toSeq,
      "exhaustive probe must be partition-independent")
  }

  test("split purges tombstoned rows physically and drops the list (refresh discipline)") {
    import spark.implicits._
    val wh = freshWh()
    val dead = Seq(10L, 11L)
    Warehouse.deleteVectors(spark, wh, dead.toDF("vec_id"))
    assert(Warehouse.splitHotCells(spark, wh, Similarity.SplitRatio).nonEmpty)
    val ids = Warehouse.read(spark, wh, "cells")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dead.forall(!ids.contains(_)), "dead rows must not survive the rewrite")
    val q8Ids = Warehouse.read(spark, wh, "cells_q8")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(q8Ids == ids, "the two dense tiers must stay row-aligned")
    assert(Warehouse.vecTombstones(spark, wh).isEmpty,
      "the tombstone list must not carry past a full dense rewrite")
  }
}
