package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The literal-centroid scale seam (r14 verdict #2): above
  * `MaxLiteralCentroids` the cell assignment switches from k inlined
  * cosine expression trees to the single-node `graft_cell_argmax`
  * kernel. The oracle can't see this (every fixture query runs k = 8,
  * literal form), so this spec pins the three things the swap must
  * preserve: BIT-IDENTICAL assignment to the literal form at any k,
  * exactness on planted clusters at production-scale k, and a plan
  * whose size no longer grows with k.
  */
class CellArgmaxSpec extends AnyFunSuite with SparkFixture {

  private def vecsDf(vecs: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    vecs.toDF("vec_id", "v")
  }

  /** Deterministic pseudo-random vectors (no RNG in fixtures). */
  private def synth(n: Int, dim: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { d =>
        val x = ((i * 1103515245L + d * 12345L + 6789L) % 2000003L).toDouble
        (x / 1000001.5) - 1.0
      })
    }

  test("kernel assignment is bit-identical to the literal form at any k") {
    val vecs = synth(400, 16)
    // Adversarial rows: a zero vector (all cosines hit the -2.0
    // sentinel, tie -> largest id) and exact duplicates of centroids
    // (cos == 1 region, tie-prone).
    val withEdge = vecs ++ Seq(
      (400L, Seq.fill(16)(0.0)),
      (401L, vecs(3)._2), (402L, vecs(7)._2))
    Seq(2, 8, 65, 150).foreach { k =>
      val cents = vecs.take(k).map { case (id, v) => (id, v) }.toArray
      val lit = Similarity.assignCellsLiteral(vecsDf(withEdge), cents)
        .select("vec_id", "nv", "cell").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
      val ker = Similarity.assignCellsKernel(vecsDf(withEdge), cents)
        .select("vec_id", "nv", "cell").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
      assert(ker.toSeq == lit.toSeq, s"kernel != literal at k=$k")
    }
  }

  test("the dispatch threshold routes small k to the literal plan, large k to the kernel") {
    val vecs = synth(50, 8)
    // The analyzed plan: a local fixture folds to LocalTableScan in
    // the physical plan, hiding the expressions this test pins.
    def planOf(k: Int): String = {
      val cents = synth(k, 8).toArray
      Similarity.assignCellsWith(vecsDf(vecs), cents)
        .queryExecution.analyzed.toString
    }
    val small = planOf(8)
    assert(small.contains("array_max") && !small.contains("graft_cell_argmax"),
      "fixture-k plans must keep the (oracle-pinned) literal form")
    val large = planOf(Similarity.MaxLiteralCentroids + 1)
    assert(large.contains("graft_cell_argmax") && !large.contains("array_max"),
      "above-threshold plans must use the kernel")
  }

  test("plan size is O(1) in k — no O(k) literal expression (the r14 seam, pinned)") {
    val vecs = synth(50, 8)
    def planLen(k: Int): Int = {
      val cents = synth(k, 8).toArray
      Similarity.assignCellsKernel(vecsDf(vecs), cents)
        .queryExecution.analyzed.toString.length
    }
    val at100 = planLen(100)
    val at2000 = planLen(2000)
    // 2000 centroids × 8 dims ≈ 300 KB of doubles as text if the
    // payload leaked into the plan string; the kernel's toString hides
    // it, so the plan grows by ~nothing.
    assert(at2000 - at100 < 2000,
      s"plan grew with k: $at100 chars at k=100, $at2000 at k=2000")
    assert(at2000 < 20000, s"kernel plan unexpectedly large: $at2000 chars")
  }

  test("planted clusters at k = sqrt(n) assign exactly (production-k truth)") {
    // n vectors in k tight clusters around k well-separated centroids:
    // every vector's best cosine is its own cluster's centroid, so the
    // kernel's assignment must reproduce the plant exactly at a k far
    // past the literal threshold.
    val dim = 16
    val k = 128
    val perCell = 16 // n = 2048, k = sqrt(n) * ~2.8 — production shape
    val cents = (0 until k).map { c =>
      // Orthogonal-ish: two fixed coordinates per centroid.
      val v = Array.fill(dim)(0.0)
      v(c % dim) = 1.0
      v((c / dim) % dim) += 2.0 + (c % 5) * 0.25
      (c.toLong, v.toSeq)
    }
    val vecs = (0 until k * perCell).map { i =>
      val c = i % k
      val base = cents(c)._2.toArray.clone()
      // Tiny deterministic jitter — well inside the cluster margin.
      base(i % dim) += 0.001 * ((i % 7) - 3)
      ((k + i).toLong, base.toSeq)
    }
    val assigned = Similarity
      .assignCellsKernel(vecsDf(vecs), cents.map { case (id, v) => (id, v) }.toArray)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, _) =>
      val planted = (id - k) % k
      assert(assigned(id) == planted,
        s"vec $id assigned to ${assigned(id)}, planted $planted")
    }
  }

  test("kernel null/mismatch contract mirrors graft_dot") {
    import spark.implicits._
    val cents = synth(70, 4).toArray // above threshold
    val bad = Seq(
      (1L, Seq(0.1, 0.2, 0.3)), // length mismatch vs dim-4 centroids
      (2L, Seq(0.1, 0.2, 0.3, 0.4))) // clean control row
      .toDF("vec_id", "v")
    val out = Similarity.assignCellsKernel(bad, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).isEmpty, "length mismatch must surface as NULL")
    assert(out(2L).nonEmpty, "clean row must assign")
  }

  test("malformed-input divergence from the literal form is deliberate (ADVICE r15)") {
    import spark.implicits._
    // The bit-identity claim is scoped to WELL-FORMED input: on a row
    // with a null element or a dim mismatch the kernel returns NULL
    // (no honest cell for a broken vector), while the literal form's
    // struct max resolves NULL cosines through the c_id tie-break to
    // the LARGEST centroid id. Both behaviors pinned here so the
    // divergence stays a decision, not a drift.
    val cents = synth(3, 4).toArray // literal-form k
    val bad = Seq(
      (1L, Seq[java.lang.Double](0.1, null, 0.3, 0.4)), // null element
      (2L, Seq[java.lang.Double](0.1, 0.2, 0.3))) // dim mismatch
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    def cellsOf(df: DataFrame): Map[Long, Option[Long]] = df
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val lit = cellsOf(Similarity.assignCellsLiteral(bad, cents))
    val ker = cellsOf(Similarity.assignCellsKernel(bad, cents))
    val largestId = cents.map(_._1).max
    assert(lit(1L).contains(largestId) && lit(2L).contains(largestId),
      "literal form resolves malformed rows via the c_id tie-break")
    assert(ker(1L).isEmpty && ker(2L).isEmpty,
      "kernel surfaces malformed rows as NULL")
  }
}
