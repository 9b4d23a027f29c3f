package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q112 (BM25 top-k): brute-force recomputation of the Okapi scoring
  * (rational-idf variant) in plain Scala over the collected fixture —
  * ranks, tfs and scores must match the distributed plan exactly.
  */
class Bm25Spec extends AnyFunSuite with SparkFixture {

  test("q112 top-k matches a driver-side brute force, ranks and scores") {
    val (k1, b) = (1.2, 0.75)
    val terms = TextOps.Bm25Terms
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, w) =>
      val dl = w.length.toLong
      val s = terms.map { t =>
        val tf = w.count(_ == t).toDouble
        val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
        idf * (tf * (k1 + 1)) /
          (tf + k1 * (1.0 - b + b * (dl / avgdl)))
      }.reduceLeft(_ + _)
      (id, dl, s)
    }
    val expected = scored.sortBy { case (id, _, s) => (-s, id) }
      .take(TextOps.Bm25K)
    val out = TextOps.bm25TopK(spark, sfDir).collect()
    assert(out.length == TextOps.Bm25K)
    out.zip(expected).foreach { case (r, (id, dl, s)) =>
      assert(r.getLong(0) == id, s"rank order differs at doc ${r.getLong(0)}")
      assert(r.getLong(1) == dl)
      assert(math.abs(r.getDouble(r.length - 1) - s) < 1e-6, s"doc $id score")
    }
    // Non-degenerate: the winning scores actually separate documents.
    assert(expected.map(_._3).distinct.size > 1)
  }
}
