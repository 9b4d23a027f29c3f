package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q109 (SemDeDup-style semantic dedup): the oracle hash-match proves
  * value agreement with DuckDB; this spec proves the PURGE-RULE
  * semantics against an independent brute-force recomputation in plain
  * Scala over the collected fixture (500×64 doubles — bounded), so the
  * keep-first-index contract is pinned by code that shares nothing
  * with the Spark plan.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkFixture {

  /** Sequential left-to-right dot — the same fold the native kernel
    * runs, so cosines agree bitwise with the query's. */
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

  test("q109 purge list is exactly the keep-first-index rule over within-cell pairs") {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // Cell assignment: argmax cosine over the first-CentroidK
    // centroids, ties to the larger c_id (the assignCells contract).
    val cents = vecs.filter(_._1 < Similarity.CentroidK)
    val cellOf = vecs.map { case (id, v) =>
      val best = cents.map { case (cId, cv) => (cosine(v, cv), cId) }.max
      id -> best._2
    }.toMap
    // Brute-force qualifying pairs (i < j, same cell, cos >= tau).
    val tau = Similarity.SemDedupTau
    val byId = vecs.toMap
    val covering = for {
      (j, cj) <- cellOf.toSeq
      (i, ci) <- cellOf.toSeq
      if i < j && ci == cj
      c = cosine(byId(i), byId(j))
      if c >= tau
    } yield (j, i, c)
    val expected = covering.groupBy(_._1).map { case (j, rs) =>
      j -> (rs.size.toLong, rs.map(_._2).min, rs.map(_._3).max)
    }

    val out = Similarity.semanticDedup(spark, sfDir).collect()
    assert(out.nonEmpty, "fixture must exercise the purge rule")
    assert(out.map(_.getLong(0)).toSet == expected.keySet,
      "purged set must match brute force")
    out.foreach { r =>
      val (id, cell) = (r.getLong(0), r.getLong(1))
      val (nCov, keptBy, maxCos) = expected(id)
      assert(cell == cellOf(id), s"vec $id cell")
      assert(r.getLong(2) == nCov, s"vec $id n_covering")
      assert(r.getLong(3) == keptBy, s"vec $id kept_by")
      assert(math.abs(r.getDouble(4) - maxCos) < 1e-6, s"vec $id max_cos")
      // The covering vector is earlier — the greedy rule's invariant.
      assert(keptBy < id)
    }
    // Survivors really survive: no non-listed vector has a qualifying
    // earlier neighbour (brute force found none — assert the split).
    val purged = expected.keySet
    val survivors = vecs.map(_._1).filterNot(purged).toSet
    assert(survivors.size + purged.size == vecs.length)
  }

  test("q126 increment verdicts match a brute force; batch/index sides never mix") {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cents = vecs.filter(_._1 < Similarity.CentroidK)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cId, cv) => (cosine(v, cv), cId) }.max._2
    }.toMap
    val byId = vecs.toMap
    val isNew = (id: Long) => id % Similarity.IncrSemMod == Similarity.IncrSemMod - 1
    val idx = vecs.map(_._1).filterNot(isNew)
    val expected = vecs.map(_._1).filter(isNew).flatMap { nv =>
      val members = idx.filter(i => cellOf(i) == cellOf(nv))
      if (members.isEmpty) None
      else {
        val scored = members.map(i => (i, cosine(byId(nv), byId(i))))
        val nCov = scored.count(_._2 >= Similarity.SemDedupTau).toLong
        val (bestI, bestC) = scored.minBy { case (i, c) => (-c, i) }
        Some(nv -> ((cellOf(nv), members.length.toLong, nCov, bestI, bestC)))
      }
    }.toMap
    assert(expected.nonEmpty)

    val out = Similarity.incrementalSemanticDedup(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val nv = r.getLong(0)
      val (cell, nCell, nCov, bestI, bestC) = expected(nv)
      assert(r.getLong(1) == cell, s"vec $nv cell")
      assert(r.getLong(2) == nCell, s"vec $nv n_cell_index")
      assert(r.getLong(3) == nCov, s"vec $nv n_covering")
      assert(r.getLong(4) == bestI, s"vec $nv best_match")
      assert(math.abs(r.getDouble(5) - bestC) < 1e-6, s"vec $nv best_cos")
      assert(r.getBoolean(6) == (bestC >= Similarity.SemDedupTau), s"vec $nv flag")
      // The increment never compares new x new or index x index.
      assert(isNew(nv) && !isNew(r.getLong(4)))
    }
  }

  test("q142 stored-index ANN serve matches a brute-force probe + rerank") {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cents = vecs.filter(_._1 < Similarity.CentroidK)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cId, cv) => (cosine(v, cv), cId) }.max._2
    }.toMap
    val byId = vecs.toMap
    val (queryId, nprobe, k) = (42L, 2, 10)
    val qv = byId(queryId)
    // Probe cells: the nprobe best centroids by cosine, ties to the
    // larger c_id (the query's orderBy contract).
    val probes = cents.map { case (cId, cv) => (cosine(qv, cv), cId) }
      .sortBy { case (c, id) => (-c, -id) }.take(nprobe).map(_._2).toSet
    val expected = vecs
      .filter { case (id, _) => id != queryId && probes(cellOf(id)) }
      .map { case (id, v) => (id, cellOf(id), cosine(qv, v)) }
      .sortBy { case (id, _, c) => (-c, id) }
      .take(k)

    val out = Similarity.annServe(spark, sfDir).collect()
    assert(out.length == k)
    out.zip(expected).foreach { case (r, (id, cell, cos)) =>
      assert(r.getLong(0) == id, s"rank mismatch: got ${r.getLong(0)}, want $id")
      assert(r.getLong(1) == cell, s"vec $id cell")
      assert(math.abs(r.getDouble(2) - cos) < 1e-6, s"vec $id cosine")
    }
    // The serve path really pruned: candidates outside the probed
    // cells never appear, and at least one cell was NOT probed.
    assert(out.map(_.getLong(1)).toSet.subsetOf(probes))
    assert(probes.size < cellOf.values.toSet.size ||
      cellOf.values.toSet.size <= nprobe)
  }

  test("q148 sem-purge-aware serve is the q142 ranking minus purged vectors") {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cents = vecs.filter(_._1 < Similarity.CentroidK)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cId, cv) => (cosine(v, cv), cId) }.max._2
    }.toMap
    val byId = vecs.toMap
    // The q109 keep-first-index rule: j is purged iff some earlier
    // same-cell vector covers it at tau.
    val purged = vecs.collect { case (j, vj)
        if vecs.exists { case (i, vi) =>
          i < j && cellOf(i) == cellOf(j) &&
            cosine(vi, vj) >= Similarity.SemDedupTau } => j
      }.toSet
    assert(purged.nonEmpty, "fixture has no purged vectors — vacuous test")
    val qv = byId(Similarity.AnnQueryId)
    val probes = cents.map { case (cId, cv) => (cosine(qv, cv), cId) }
      .sortBy { case (c, id) => (-c, -id) }
      .take(Similarity.AnnProbeN).map(_._2).toSet
    val expected = vecs
      .filter { case (id, _) =>
        id != Similarity.AnnQueryId && probes(cellOf(id)) && !purged(id) }
      .map { case (id, v) => (id, cellOf(id), cosine(qv, v)) }
      .sortBy { case (id, _, c) => (-c, id) }
      .take(Similarity.AnnServeK)

    val out = Similarity.annServePurged(spark, sfDir).collect()
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (id, cell, cos)) =>
      assert(r.getLong(0) == id, s"rank: got ${r.getLong(0)}, want $id")
      assert(r.getLong(1) == cell, s"vec $id cell")
      assert(math.abs(r.getDouble(2) - cos) < 1e-6, s"vec $id cosine")
    }
    assert(out.map(_.getLong(0)).toSet.intersect(purged).isEmpty)
  }

  test("q116 centroid-drift matrix matches an exact integer brute force") {
    val rows = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("label", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val byLabel = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dim = rows.head._2.length
    // Micro-unit integer centroid per label — the q72 fixed-point rule.
    val cents: Map[Int, Array[Long]] = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(dim) { p =>
        val s = vs.map(v => math.floor(v(p) * 1e6 + 0.5).toLong).sum
        math.floor(s.toDouble / vs.length + 0.5).toLong
      }
    }
    val out = Similarity.labelCentroidDrift(spark, sfDir).collect()
    val labels = byLabel.keys.toSeq.sorted
    assert(out.length == labels.size * (labels.size - 1) / 2)
    out.foreach { r =>
      val (la, lb) = (r.getInt(0), r.getInt(1))
      assert(la < lb)
      assert(r.getLong(2) == byLabel(la).length)
      assert(r.getLong(3) == byLabel(lb).length)
      val (ca, cb) = (cents(la), cents(lb))
      val dot = ca.zip(cb).map { case (a, b) => a * b }.sum
      val cos = dot.toDouble /
        (math.sqrt(ca.map(x => x * x).sum.toDouble) *
          math.sqrt(cb.map(x => x * x).sum.toDouble))
      assert(math.abs(r.getDouble(4) - cos) < 1e-6, s"pair ($la,$lb)")
    }
  }
}
