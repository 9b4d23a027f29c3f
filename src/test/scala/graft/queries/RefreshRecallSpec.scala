package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q152's strict half (r14 verdict #3): the oracle certifies the
  * refresh is NO WORSE on the synthetic fixture; this spec plants a
  * corpus where the build-time seeding is demonstrably BAD (all 8
  * seeds drawn from 2 of the 8 true clusters) and pins that two Lloyd
  * steps STRICTLY lift probed recall — the geometry a real drifting
  * corpus presents, where `refreshSemanticIfDrifted` earns its keep.
  */
class RefreshRecallSpec extends AnyFunSuite with SparkFixture {

  test("Lloyd refresh strictly lifts recall on planted clusters with bad seeding") {
    import spark.implicits._
    val dim = 16
    val nClusters = 8
    val perCluster = 40
    def center(c: Int): Array[Double] = {
      val v = Array.fill(dim)(0.0)
      v(c * 2 % dim) = 1.0
      v((c * 2 + 1) % dim) = 0.5
      v
    }
    def vecOf(id: Long, c: Int): (Long, Seq[Double]) = {
      val base = center(c)
      (id, (0 until dim).map(d =>
        base(d) + 0.02 * (((id * 31 + d * 7) % 11) - 5)))
    }
    // Seeds (ids 0-7, the first-k seeding) all come from clusters 0/1;
    // the remaining members interleave clusters so the five probe
    // queries (ids 40-44) land in five DIFFERENT clusters — most with
    // no seed anywhere near them.
    val members =
      (0 until 8).map(i => vecOf(i.toLong, i % 2)) ++
        (0 until perCluster).flatMap(j => (0 until nClusters).map { c =>
          vecOf((8 + j * nClusters + c).toLong, c)
        })
    val e = members.toDF("vec_id", "v")
    val out = Similarity.refreshRecallLiftOf(e).collect()
    assert(out.length == 5)
    val totalBuild = out.map(_.getLong(1)).sum
    val totalRefresh = out.map(_.getLong(2)).sum
    assert(totalRefresh > totalBuild,
      s"no strict lift: build $totalBuild, refreshed $totalRefresh")
    assert(out.forall(_.getBoolean(4)), "refresh_no_worse flag must hold")
    // The refreshed centroids recover the plant completely: every
    // probe query's pruned top-10 equals the exact top-10.
    assert(totalRefresh == 50L,
      s"refreshed recall not perfect on the plant: $totalRefresh/50")
  }

  test("refreshSemanticUntilConverged iterates the drift gate to quiescence (r15 #5)") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-refresh-conv").toString
    Warehouse.build(spark, sfDir, wh)
    val v0 = Warehouse.version(wh)
    val eps = Similarity.LloydEpsMicro
    val steps = Warehouse.refreshSemanticUntilConverged(spark, wh,
      thresholdMicro = eps, maxSteps = 6)
    // The fixture's first-k seeding is far from the means: at least
    // one step runs, each committed as its own snapshot version, and
    // the loop ends either inside the dither band or at the bound.
    assert(steps >= 1 && steps <= 6)
    assert(Warehouse.version(wh) == v0 + steps)
    if (steps < 6)
      assert(Warehouse.semanticDriftMicro(spark, wh) <= eps,
        "an early stop must mean the gate closed")
    // Idempotent at quiescence: a converged store refreshes no more.
    if (steps < 6)
      assert(Warehouse.refreshSemanticUntilConverged(spark, wh,
        thresholdMicro = eps, maxSteps = 6) == 0)
  }

  test("semantic refresh carries PQ codes forward (== re-encode) and tolerates a pre-PQ store") {
    // r17 verdict #3: codes are a function of the BOOKS alone, so a
    // semantic refresh must join them forward, never re-encode — and
    // the carried tier must be bit-identical to what a fresh encode
    // against the (unchanged, linked-forward) books would produce.
    val wh = java.nio.file.Files
      .createTempDirectory("graft-refresh-pqcarry").toString
    Warehouse.build(spark, sfDir, wh)
    Warehouse.refreshSemantic(spark, wh)
    def pqRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq, r.getDouble(3)))
      .sortBy(_._1).toSeq
    val books = Similarity.collectPqBooks(Warehouse.read(spark, wh, "pq_books"))
    val carried = pqRows(Warehouse.read(spark, wh, "cells_pq"))
    val reencoded = pqRows(
      Similarity.cellsPqOf(Warehouse.read(spark, wh, "cells"), books))
    assert(carried.nonEmpty && carried == reencoded,
      "carried-forward cells_pq must equal a fresh re-encode bit for bit")
    // ADVICE r17: a store committed BEFORE the PQ family existed must
    // still accept semantic maintenance (refresh skips the absent
    // tier) instead of refusing until rebuilt.
    val wh2 = java.nio.file.Files
      .createTempDirectory("graft-refresh-prepq").toString
    Warehouse.build(spark, sfDir, wh2)
    val v = Warehouse.version(wh2)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    Seq("pq_books", "cells_pq")
      .foreach(t => rm(new java.io.File(s"$wh2/v=$v/$t")))
    val v2 = Warehouse.refreshSemantic(spark, wh2)
    assert(!new java.io.File(s"$wh2/v=$v2/cells_pq").exists(),
      "a pre-PQ store must refresh without inventing a PQ family")
    assert(Warehouse.read(spark, wh2, "cells").count() > 0)
  }
}
