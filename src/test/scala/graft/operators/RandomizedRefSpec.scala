package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Randomized cross-checks of the graph/temporal operators against
  * brute-force in-memory references (fixed seeds — reproducible).
  * The fixture specs pin known answers; these sweep the input space:
  * random graphs vs a union-find, random event streams vs a per-row
  * latest-at-or-before scan.
  */
class RandomizedRefSpec extends AnyFunSuite with SparkFixture {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(v: Int): Int = { var r = v; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Path-compress to the min root (min-label semantics).
    (0 until n).map(v => v.toLong -> find(v).toLong).toMap
  }

  test("connected components agree with union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val n = 25
      val edges = Seq.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(n, edges)
      val got = ConnectedComponents.run(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // CC only labels vertices incident to an edge.
      got.foreach { case (v, comp) =>
        assert(comp === want(v), s"seed=$seed vertex=$v")
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet === touched, s"seed=$seed labeled-vertex set")
    }
  }

  test("as-of join agrees with a per-row scan on random streams") {
    import spark.implicits._
    for (seed <- Seq(3, 9, 17, 23, 31)) {
      val rnd = new Random(seed)
      val left = Seq.tabulate(60)(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      // Unique (key, time) on the right — the operator's contract.
      val right = Seq.tabulate(40)(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
        .distinct.map { case (k, t) => (k, t, s"p$k-$t") }
      val got = AsOfJoin.asof(
          left.toDF("k", "t", "row_id"), right.toDF("rk", "rt", "payload"),
          "k", "rk", "t", "rt", payload = Seq("payload", "rt"))
        .collect()
        .map(r => r.getLong(2) -> Option(r.get(3)))
        .toMap
      val want = left.map { case (k, t, id) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("range join agrees with a nested-loop scan on random intervals") {
    import spark.implicits._
    // Sweep bucket widths smaller than / comparable to / larger than
    // the interval lengths — each regime exercises different
    // replication and residual-filter behavior. Degenerate intervals
    // (hi <= lo) are generated on purpose: they must match nothing.
    for (seed <- Seq(5, 11, 29); bucketWidth <- Seq(3L, 10L, 64L)) {
      val rnd = new Random(seed)
      val points = Seq.tabulate(60)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(120).toLong, i.toLong))
      val intervals = Seq.tabulate(30) { j =>
        val lo = rnd.nextInt(120).toLong
        (rnd.nextInt(4).toLong, lo, lo + rnd.nextInt(25) - 2, j.toLong)
      }
      val got = RangeJoin.pointInInterval(
          points.toDF("k", "t", "pid"), intervals.toDF("ik", "lo", "hi", "iid"),
          "k", "ik", "t", "lo", "hi", bucketWidth)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pk, t, pid) <- points
        (ik, lo, hi, iid) <- intervals
        if ik == pk && t >= lo && t < hi
      } yield (pid, iid)).toSet
      assert(got === want, s"seed=$seed bucketWidth=$bucketWidth")
    }
  }
}
