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

  test("merge drops cold cells; survivors only absorb; survivor centroids bit-identical") {
    val wh = freshWh()
    val before = membership(wh)
    val centsBefore = Warehouse.read(spark, wh, "centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(Warehouse.mergeColdCells(spark, wh, Similarity.ColdRatio).nonEmpty,
      "fixture must have cold cells at the pinned ratio")
    val after = membership(wh)
    val centsAfter = Warehouse.read(spark, wh, "centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(after.keySet == before.keySet, "merge must not add or drop vectors")
    val cold = centsBefore.keySet.filter { cid =>
      before.count(_._2 == cid) <
        Similarity.ColdRatio * before.size / centsBefore.size }
    assert(cold.nonEmpty)
    assert(centsAfter.keySet == centsBefore.keySet -- cold,
      "exactly the cold centroids vanish")
    centsAfter.foreach { case (cid, v) =>
      assert(centsBefore(cid) == v, s"survivor centroid $cid changed") }
    before.foreach { case (vid, cell) =>
      if (cold.contains(cell))
        assert(!cold.contains(after(vid)), s"vec $vid re-homed to a cold cell")
      else assert(after(vid) == cell, s"vec $vid moved from a surviving cell")
    }
  }

  test("merge gates to None when nothing is cold; ratio bounds refused") {
    val wh = freshWh()
    val v0 = Warehouse.version(wh)
    assert(Warehouse.mergeColdCells(spark, wh, ratio = 0.05).isEmpty,
      "no fixture cell is below 0.05x uniform")
    assert(Warehouse.version(wh) == v0, "a gated merge must not commit")
    intercept[IllegalArgumentException] {
      Warehouse.mergeColdCells(spark, wh, ratio = 1.0)
    }
    intercept[IllegalArgumentException] {
      Warehouse.mergeColdCells(spark, wh, ratio = 0.0)
    }
  }

  test("exhaustive-probe serving is invariant under the merge; memberless centroids drop") {
    import spark.implicits._
    val wh = freshWh()
    val qv = qvOf(123L)
    val before = Similarity.annServeFrom(spark, wh, qv, nprobe = 16, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // Empty one whole cell via vector deletes: its centroid must fall
    // to the merge (count 0 < any bound) and its id never serve again.
    val victim = membership(wh).groupBy(_._2).view.mapValues(_.size)
      .toSeq.minBy(_._2)._1
    val victimIds = membership(wh).filter(_._2 == victim).keys.toSeq
    Warehouse.deleteVectors(spark, wh, victimIds.toDF("vec_id"))
    assert(Warehouse.mergeColdCells(spark, wh, Similarity.ColdRatio).nonEmpty)
    assert(!Warehouse.read(spark, wh, "centroids")
      .collect().map(_.getLong(0)).contains(victim),
      "a memberless centroid must not survive the merge")
    assert(Warehouse.vecTombstones(spark, wh).isEmpty,
      "the tombstone list must not carry past a full dense rewrite")
    val after = Similarity.annServeFrom(spark, wh, qv, nprobe = 16, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val deadSet = victimIds.toSet
    val surviving = before.filterNot(r => deadSet.contains(r._1)).toSeq
    assert(after.toSeq.startsWith(surviving),
      "exhaustive probe after merge must equal before minus the deleted " +
        "vectors (the tail refills from survivors)")
    assert(after.length == 15, "ranking refills to k")
  }

  test("rebalance quiesces at production ratios; narrow bands refused; serving invariant") {
    import spark.implicits._
    // A narrow quiet band thrashes (the uniform share moves with k, so
    // at 1.06x some cell is above the moving bound essentially
    // forever) — the API refuses it up front.
    intercept[IllegalArgumentException] {
      Warehouse.rebalance(spark, freshWh(),
        hotRatio = Similarity.SplitRatio, coldRatio = Similarity.ColdRatio)
    }
    // The natural fixture is already balanced at production ratios.
    val natural = freshWh()
    assert(Warehouse.rebalance(spark, natural) == 0,
      "a balanced store must commit zero waves")
    // Synthetic skewed index: 8 one-hot seed directions; cells 0–6
    // get 23 jittered members each, cell 7 two 96-member blobs
    // (around e7+0.3·e0 and e7+0.3·e1) — ~4.3× the uniform share,
    // hot at the production 1.5 ratio; the min/max-vec_id split
    // seeds (the pure e7 seed vs a B-blob member) separate them.
    def unit(i: Int): Array[Double] =
      Array.tabulate(8)(j => if (j == i) 1.0 else 0.0)
    def plus(a: Array[Double], b: Array[Double], s: Double): Array[Double] =
      a.zip(b).map { case (x, y) => x + s * y }
    val rows = Seq.tabulate(8)(i => (i.toLong, unit(i).toSeq)) ++
      (for { i <- 0 until 7; m <- 0 until 23 } yield
        ((10 + i * 30 + m).toLong,
          plus(unit(i), unit((i + 1) % 8), 0.01 + 0.001 * m).toSeq)) ++
      (for (m <- 0 until 96) yield ((300 + m).toLong,
        plus(plus(unit(7), unit(0), 0.3), unit(2), 0.001 * m).toSeq)) ++
      (for (m <- 0 until 96) yield ((500 + m).toLong,
        plus(plus(unit(7), unit(1), 0.3), unit(3), 0.001 * m).toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val docs = (0L until 20L).map(i => (i, "src", s"alpha beta w$i gamma"))
      .toDF("doc_id", "source", "text")
    def buildSkewed(): String = {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-rebal-spec").toString
      Warehouse.buildOf(spark, docs, emb, wh)
      wh
    }
    val wh = buildSkewed()
    val waves = Warehouse.rebalance(spark, wh)
    assert(waves > 0 && waves < 8,
      s"expected a quiescing rebalance on the skewed store, got $waves")
    val vQuiet = Warehouse.version(wh)
    // Quiet means quiet: neither operation finds work at the default
    // ratios, and a second rebalance commits nothing.
    assert(Warehouse.splitHotCells(spark, wh,
      Warehouse.DefaultHotCellRatio).isEmpty)
    assert(Warehouse.mergeColdCells(spark, wh,
      Warehouse.DefaultColdCellRatio).isEmpty)
    assert(Warehouse.rebalance(spark, wh) == 0)
    assert(Warehouse.version(wh) == vQuiet)
    // The rebalanced store still serves: exhaustive probe over the
    // final cell set is the exact ranking regardless of partitioning.
    val qv = plus(unit(7), unit(0), 0.3).toSeq
    val served = Similarity.annServeFrom(spark, wh, qv,
      nprobe = 32, k = 10).collect().map(r => (r.getLong(0), r.getDouble(2)))
    val pristine = Similarity.annServeFrom(spark, buildSkewed(), qv,
      nprobe = 32, k = 10).collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(served.toSeq == pristine.toSeq,
      "rebalanced exhaustive probe == pristine exhaustive probe")
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
