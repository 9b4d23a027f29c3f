package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q118 (hybrid RRF fusion) and q119 (semantic decontamination):
  * brute-force replication in plain Scala over the collected fixture —
  * both legs' ranks, the fused scores, and the probe hit sets must
  * match the distributed plans exactly.
  */
class RetrievalFusionSpec extends AnyFunSuite with SparkFixture {

  /** Left-to-right double fold — the graft_dot contract. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val denom = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (denom == 0.0) -2.0 else dot(a, b) / denom
  }

  private def embeddings(): Array[(Long, Array[Double])] =
    graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)

  test("q118 fusion matches a driver-side brute force of both legs") {
    val k = TextOps.Bm25K
    // Sparse leg: the Bm25Spec brute force, kept independent of the plan.
    val (k1, b) = (1.2, 0.75)
    val terms = TextOps.Bm25Terms
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val sparseRank: Map[Long, Long] = docs.map { case (id, w) =>
      val dl = w.length.toLong
      val s = terms.map { t =>
        val tf = w.count(_ == t).toDouble
        val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
        idf * (tf * (k1 + 1)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
      }.reduceLeft(_ + _)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // Dense leg: cosine to vec 0.
    val embs = embeddings()
    val qv = embs.find(_._1 == 0L).get._2
    val denseRank: Map[Long, Long] = embs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(v, qv)) }
      .sortBy { case (id, c) => (-c, id) }.take(k)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    val expected = (sparseRank.keySet ++ denseRank.keySet).map { id =>
      val rs = sparseRank.getOrElse(id, 0L)
      val rd = denseRank.getOrElse(id, 0L)
      val rrf = (if (rs > 0) 1.0 / (Similarity.RrfK + rs) else 0.0) +
        (if (rd > 0) 1.0 / (Similarity.RrfK + rd) else 0.0)
      id -> (rs, rd, rrf)
    }.toMap

    val out = Similarity.hybridRrf(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (rs, rd, rrf) = expected(r.getLong(0))
      assert(r.getLong(1) == rs, s"doc ${r.getLong(0)} rank_sparse")
      assert(r.getLong(2) == rd, s"doc ${r.getLong(0)} rank_dense")
      assert(math.abs(r.getDouble(3) - rrf) < 1e-6, s"doc ${r.getLong(0)} rrf")
    }
    // The fusion is non-degenerate: docs found by both legs outrank
    // the per-leg tail iff their combined reciprocal terms say so —
    // at minimum the output must be strictly larger than one leg alone
    // only when the legs disagree, and never larger than 2k.
    assert(out.length >= k && out.length <= 2 * k)
  }

  test("q119 flags exactly the corpus vectors within tau of a probe") {
    val embs = embeddings()
    val probes = embs.filter(_._1 < Similarity.SemDecontamProbes)
    val corpus = embs.filter(_._1 >= Similarity.SemDecontamProbes)
    assert(probes.length == Similarity.SemDecontamProbes)
    val expected = corpus.flatMap { case (id, v) =>
      val hits = probes.map { case (pid, pv) => (pid, cosine(v, pv)) }
        .filter(_._2 >= Similarity.SemDecontamTau)
      if (hits.isEmpty) None
      else {
        val (bestP, bestC) = hits.minBy { case (pid, c) => (-c, pid) }
        Some(id -> (hits.length.toLong, bestP, bestC))
      }
    }.toMap

    assert(expected.nonEmpty, "fixture must flag at least one vector")
    val out = Similarity.semanticDecontaminate(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nHits, bestP, bestC) = expected(r.getLong(0))
      assert(r.getLong(1) == nHits, s"vec ${r.getLong(0)} n_probes_hit")
      assert(r.getLong(2) == bestP, s"vec ${r.getLong(0)} top_probe")
      assert(math.abs(r.getDouble(3) - bestC) < 1e-6, s"vec ${r.getLong(0)} max_cos")
    }
    // Probes never flag themselves (the corpus excludes the probe slice).
    out.foreach(r => assert(r.getLong(0) >= Similarity.SemDecontamProbes))
  }
}
