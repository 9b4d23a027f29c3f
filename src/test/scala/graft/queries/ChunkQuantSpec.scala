package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q100 (doc chunking) and q101 (int8 quantization): the properties a
  * value-hash match against DuckDB does not state explicitly —
  * lossless reconstruction for the chunker, certificate non-vacuity
  * for the quantizer. Both recompute the reference answer in plain
  * Scala over the collected fixture (500 docs / 500×64 floats —
  * bounded), so the checks are independent of Spark's expression
  * evaluation.
  */
class ChunkQuantSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q100 chunks reconstruct every document exactly (lossless, ordered, contiguous)") {
    val size = PipelineOps.ChunkSize
    val stride = PipelineOps.ChunkStride
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = PipelineOps.docChunks(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).toSeq
      }
    assert(chunks.keySet == docs.keySet, "every doc must be chunked")
    chunks.foreach { case (id, rs) =>
      val text = docs(id)
      // contiguous indexes from 0
      assert(rs.map(_.getLong(1)) == (0L until rs.size))
      // reconstruct: first `stride` chars of every chunk + the tail of
      // the last one re-derive the document (overlap carries no new
      // information — the losslessness that makes the chunker safe to
      // run destructively at corpus scale).
      val expected = rs.indices.map { i =>
        text.substring(i * stride, math.min(i * stride + size, text.length))
      }
      rs.zip(expected).foreach { case (r, exp) =>
        assert(r.getLong(2) == exp.length, s"doc $id chunk_len")
        assert(r.getString(3) == md5hex(exp), s"doc $id chunk_md5")
      }
      val rebuilt = expected.init.map(_.take(stride)).mkString + expected.last
      assert(rebuilt == text, s"doc $id must reconstruct")
      // every chunk except the last is full-width; the last is non-empty
      assert(expected.init.forall(_.length == size))
      assert(expected.last.nonEmpty)
    }
  }

  test("q101 certificate holds everywhere and is non-vacuous (a 2x-tighter bound fails)") {
    val out = Similarity.quantizeInt8(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"vec ${r.getLong(0)}")
      // max-abs scaling pins the extreme element to exactly ±127
      val hi = r.getAs[Long]("q_max"); val lo = r.getAs[Long]("q_min")
      assert(hi <= 127L && lo >= -127L, s"vec ${r.getLong(0)} int8 range")
      // An all-zero vector (scale 0) legitimately quantizes to all
      // zeros — only non-degenerate vectors must pin an extreme.
      if (r.getAs[Double]("scale_r6") != 0d || hi != 0L || lo != 0L)
        assert(hi == 127L || lo == -127L, s"vec ${r.getLong(0)} extreme pin")
    }
    // Non-vacuity: recompute the error in plain Scala and show the
    // half-step bound is TIGHT — some vector exceeds half of it (a
    // mutated quantizer, e.g. floor instead of round, would be caught).
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    // Degenerate all-zero vectors have scale 0 (and zero error); they
    // carry no information about the bound's tightness, so skip them.
    val ratios = vecs.filter(_.exists(_ != 0d)).map { v =>
      val scale = v.map(math.abs).max
      val maxErr = v.map { x =>
        math.abs(x - math.round(x * 127 / scale).toDouble * scale / 127)
      }.max
      maxErr / (scale / 254)
    }
    assert(ratios.max > 0.5, f"bound should be near-tight, got ${ratios.max}%.3f")
    assert(ratios.max <= 1.0 + 1e-9)
  }

  test("q102 chunk-grain pairs match an independent brute-force recompute") {
    val size = PipelineOps.ChunkSize; val stride = PipelineOps.ChunkStride
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def digestsOf(text: String): Set[String] = {
      val n = if (text.length <= size) 1
              else 1 + (text.length - size + stride - 1) / stride
      (0 until n).map { i =>
        md5hex(text.substring(i * stride, math.min(i * stride + size, text.length)))
      }.toSet
    }
    val perDoc = docs.map { case (id, t) => id -> digestsOf(t) }.toMap
    val byDigest = perDoc.toSeq
      .flatMap { case (id, ds) => ds.map(_ -> id) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet)
      .filter { case (_, s) => s.size >= 2 && s.size <= Dedup.MaxChunkDf }
    val shared = byDigest.values.toSeq
      .flatMap { s =>
        val ids = s.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }
      .groupBy(identity).view.mapValues(_.size)
    val expected = shared.collect {
      case ((a, b), ns) if 2 * ns >= math.min(perDoc(a).size, perDoc(b).size) =>
        (a, b) -> ns
    }.toMap
    val got = Dedup.chunkDedup(spark, sfDir).collect()
    assert(got.nonEmpty, "fixture should contain chunk-sharing doc pairs")
    assert(got.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap ==
      expected.map { case (k, v) => k -> v.toLong })
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ns, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "canonical pair order")
      assert(na == perDoc(a).size && nb == perDoc(b).size)
      assert(ns <= math.min(na, nb))
      assert(math.abs(r.getDouble(5) - ns.toDouble / math.min(na, nb)) <= 5e-7)
    }

    // q105: the same pairs closed under transitivity must match a
    // plain union-find over the brute-force edge set.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expected.keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = expected.keys.flatMap { case (a, b) => Seq(a, b) }.toSet
    val byComp = members.groupBy(find)
    val expectedClusters = byComp.flatMap { case (_, ms) =>
      val label = ms.min
      ms.map(m => m -> (label, ms.size.toLong))
    }
    val gotClusters = Dedup.chunkDupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotClusters == expectedClusters)

    // q108: the purge list must delete exactly size-1 docs per
    // cluster, keep one member, agree with q105's clustering, and the
    // keeper must be the HIGHEST-quality member (min-doc-id ties) —
    // an orderBy-direction flip applied to both engines would pass
    // the oracle; this pins the direction independently.
    val quality = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expectedKeeper = expectedClusters.groupBy(_._2._1).map {
      case (cluster, ms) =>
        cluster -> ms.keys.minBy(d => (-quality(d), d))
    }
    val purge = Dedup.chunkDedupPurge(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    purge.foreach { case (doc, cluster, kept) =>
      assert(expectedClusters(doc)._1 == cluster, s"doc $doc cluster drift")
      assert(kept == expectedKeeper(cluster),
        s"cluster $cluster kept $kept, expected highest-quality ${expectedKeeper(cluster)}")
      assert(doc != kept)
    }
    val purged = purge.map(_._1).toSet
    assert(!purge.exists(p => purged.contains(p._3)), "a kept doc was purged")
    expectedClusters.groupBy(_._2._1).foreach { case (cluster, ms) =>
      assert(purge.count(_._2 == cluster) == ms.size - 1,
        s"cluster $cluster must purge size-1 docs")
    }

    // q107: the decile histogram over ALL candidate pairs (no
    // threshold) must match the brute-force pair set, and the
    // descending-cumulative column must be self-consistent.
    val expectedHist = shared.toSeq.map { case ((a, b), ns) =>
      (10L * ns) / math.min(perDoc(a).size, perDoc(b).size)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hist = Dedup.chunkOverlapHistogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(h => h._1 -> h._2).toMap == expectedHist)
    val descending = hist.sortBy(-_._1)
    assert(descending.map(_._2).scanLeft(0L)(_ + _).tail.toSeq ==
      descending.map(_._3).toSeq)
  }
}
