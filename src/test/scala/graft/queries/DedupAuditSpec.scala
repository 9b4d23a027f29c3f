package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The dedup audit layer — q120 (MinHash estimator error), q122
  * (purge precision), q123 (purge rate by quality decile), q124 (LSH
  * recall certificate): brute-force replication of the hashing,
  * banding, star-edge, union-find, ranking and Jaccard arithmetic in
  * plain Scala over the collected fixture — no Spark expressions
  * shared with the plans.
  */
class DedupAuditSpec extends AnyFunSuite with SparkFixture {

  private val P = 2147483647L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tokHash(t: String): Long =
    java.lang.Long.parseLong(md5hex(t).take(15), 16) % P

  /** (token hash set, 8 signature longs, 2 band hashes) per doc. */
  private def chain(): Map[Long, (Set[Long], Seq[Long], Seq[String])] =
    graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val hsList = r.getString(1).split(" ", -1).distinct.map(tokHash)
        val sigs = Dedup.HashParams.map { case (a, b) =>
          hsList.map(h => (a * h + b) % P).min
        }
        val bands = Seq(sigs.take(4).mkString(","), sigs.drop(4).mkString(","))
          .map(md5hex)
        r.getLong(0) -> ((hsList.toSet, sigs, bands))
      }.toMap

  /** The q49 candidate star edges: (bucket-min root, member). */
  private def starEdges(c: Map[Long, (Set[Long], Seq[Long], Seq[String])])
      : Set[(Long, Long)] = {
    val buckets = c.toSeq.flatMap { case (id, (_, _, bands)) =>
      bands.zipWithIndex.map { case (bh, i) => (i, bh) -> id }
    }.groupBy(_._1).values.map(_.map(_._2))
    buckets.filter(_.size > 1).flatMap { members =>
      val root = members.min
      members.filter(_ != root).map(m => (root, m))
    }.toSet
  }

  test("q120 audits exactly the clustering's star edges, all arithmetic exact") {
    val c = chain()
    val expected = starEdges(c).map { case (a, b) =>
      val sigMatch = c(a)._2.zip(c(b)._2).count { case (x, y) => x == y }.toLong
      val (ha, hb) = (c(a)._1, c(b)._1)
      val inter = (ha & hb).size
      val jac = inter.toDouble / (ha.size + hb.size - inter)
      (a, b) -> ((sigMatch, sigMatch / 8.0, jac))
    }.toMap
    assert(expected.nonEmpty, "fixture must produce candidate edges")

    val out = Dedup.minhashErrorAudit(spark, sfDir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == expected.keySet)
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (sm, est, jac) = expected(key)
      assert(r.getLong(2) == sm, s"$key sig_match")
      assert(math.abs(r.getDouble(3) - est) < 1e-6, s"$key est")
      assert(math.abs(r.getDouble(4) - jac) < 1e-6, s"$key jaccard")
      assert(math.abs(r.getDouble(5) - math.abs(est - jac)) < 1e-6, s"$key err")
    }
    // Sanity of the estimator on this fixture: identical docs (J = 1)
    // must show a full signature match (est = 1, err = 0).
    val exact = expected.filter { case (_, (_, _, j)) => j == 1.0 }
    assert(exact.nonEmpty)
    exact.foreach { case (key, (sm, _, _)) =>
      assert(sm == 8L, s"$key: J=1 pair must match all components")
    }
  }

  test("q122 audits every q92 purge row with exact Jaccard and decile") {
    val c = chain()
    // Union-find over the star edges → the q49/q92 components.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    starEdges(c).foreach { case (a, b) => union(a, b) }
    val members = parent.keySet ++ parent.values
    val comp = members.map(m => m -> find(m)).toMap

    // Keeper rule on q37's (oracle-green) quality scores.
    val quality = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = comp.groupBy(_._2).values.flatMap { m =>
      val ordered = m.keys.toSeq.sortBy(id => (-quality(id), id))
      val kept = ordered.head
      ordered.tail.map { id =>
        val (hp, hk) = (c(id)._1, c(kept)._1)
        val inter = (hp & hk).size.toLong
        val union = hp.size + hk.size - inter
        id -> ((comp(id), kept, inter, union,
          inter.toDouble / union, (inter * 10) / union))
      }
    }.toMap
    assert(expected.nonEmpty, "fixture must purge at least one doc")

    val out = Dedup.purgeAudit(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val id = r.getLong(0)
      val (cid, kept, inter, union, jac, dec) = expected(id)
      assert(r.getLong(1) == cid, s"doc $id cluster")
      assert(r.getLong(2) == kept, s"doc $id kept_doc")
      assert(r.getLong(3) == inter, s"doc $id n_inter")
      assert(r.getLong(4) == union, s"doc $id n_union")
      assert(math.abs(r.getDouble(5) - jac) < 1e-6, s"doc $id jaccard")
      assert(r.getLong(6) == dec, s"doc $id decile")
      assert(id != kept, s"doc $id purged for itself")
    }
    // The audit covers the purge list exactly — same rows as q92.
    val purge = Dedup.dedupPurge(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == purge)
  }

  test("q123 decile purge rates match a brute force and partition the corpus") {
    val purgedSet = Dedup.dedupPurge(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val quality = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val n = quality.length.toLong
    val ranked = quality.sortBy { case (id, q) => (-q, id) }
    val expected = ranked.zipWithIndex
      .map { case ((id, _), i) => (i.toLong * 10 / n, purgedSet(id)) }
      .groupBy(_._1)
      .map { case (d, xs) =>
        d -> (xs.length.toLong, xs.count(_._2).toLong)
      }

    val out = Dedup.purgeByQualityDecile(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nD, nP) = expected(r.getLong(0))
      assert(r.getLong(1) == nD, s"decile ${r.getLong(0)} n")
      assert(r.getLong(2) == nP, s"decile ${r.getLong(0)} n_purged")
      assert(r.getLong(3) == nP * 1000000L / nD, s"decile ${r.getLong(0)} ppm")
    }
    // The deciles partition the corpus and the purges exactly.
    assert(out.map(_.getLong(1)).sum == n)
    assert(out.map(_.getLong(2)).sum == purgedSet.size.toLong)
  }

  test("q124 recall certificate matches a brute force over the slice") {
    val c = chain()
    val ids = c.keys.toSeq.sorted
    val slice = ids.zip(ids.tail).filter { case (a, b) => b == a + 1 }
    val stats = slice.map { case (a, b) =>
      val (ha, hb) = (c(a)._1, c(b)._1)
      val inter = (ha & hb).size
      val jac = inter.toDouble / (ha.size + hb.size - inter)
      val detected = c(a)._3.zip(c(b)._3).exists { case (x, y) => x == y }
      (jac >= Dedup.RecallTau, detected)
    }
    val nTrue = stats.count(_._1).toLong
    val nDet = stats.count(_._2).toLong
    val nHits = stats.count(s => s._1 && s._2).toLong
    assert(nTrue > 0, "fixture must contain true dups in the slice")
    assert(nDet > 0, "fixture must contain detected pairs in the slice")

    val r = Dedup.lshRecallAudit(spark, sfDir).collect().head
    assert(r.getLong(0) == slice.length.toLong)
    assert(r.getLong(1) == nTrue)
    assert(r.getLong(2) == nDet)
    assert(r.getLong(3) == nHits)
    assert(r.getLong(4) == nHits * 1000000L / nTrue)
    assert(r.getLong(5) == nHits * 1000000L / nDet)
    // Hits are an intersection — never exceed either side.
    assert(nHits <= math.min(nTrue, nDet))
  }

  test("q130 bucket histogram reassembles the index and prices both edge rules") {
    val c = chain()
    val sizes = c.toSeq
      .flatMap { case (id, (_, _, bands)) =>
        bands.zipWithIndex.map { case (bh, i) => (i, bh) -> id }
      }
      .groupBy(_._1).values.map(_.size.toLong)
    val expected = sizes.groupBy(identity)
      .map { case (sz, xs) => sz -> xs.size.toLong }

    val out = Dedup.bucketSizeHistogram(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val sz = r.getLong(0)
      assert(r.getLong(1) == expected(sz), s"size $sz n_buckets")
      assert(r.getLong(2) == (sz - 1) * expected(sz), s"size $sz star")
      assert(r.getLong(3) == sz * (sz - 1) / 2 * expected(sz), s"size $sz allpairs")
    }
    // The histogram accounts for every (doc, band) row exactly, and
    // the star edge total matches the q120 audit's edge count.
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum == 2L * c.size)
    assert(out.map(_.getLong(2)).sum >= starEdges(c).size.toLong)
  }

  test("q133 impact report reconciles with the purge list and corpus totals") {
    val purgedSet = Dedup.dedupPurge(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    val quality = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(1) * 1e6 + 0.5).toLong).toMap
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val p = ds.filter(d => purgedSet(d._1))
      src -> ((ds.length.toLong, p.length.toLong,
        ds.map(_._3).sum, p.map(_._3).sum,
        ds.map(d => quality(d._1)).sum, p.map(d => quality(d._1)).sum))
    }

    val out = Dedup.purgeImpact(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val src = r.getString(0)
      val (n, np, tk, tkp, qm, qmp) = expected(src)
      assert(r.getLong(1) == n, s"$src n_docs")
      assert(r.getLong(2) == np, s"$src n_purged")
      assert(r.getLong(3) == tk, s"$src tokens")
      assert(r.getLong(4) == tkp, s"$src tokens_purged")
      assert(r.getLong(5) == qm, s"$src quality_micro")
      assert(r.getLong(6) == qmp, s"$src quality_micro_purged")
      assert(r.getLong(7) == (n - np) * 1000000L / n, s"$src retained_ppm")
    }
    // The report reconciles exactly with the purge list and corpus.
    assert(out.map(_.getLong(2)).sum == purgedSet.size.toLong)
    assert(out.map(_.getLong(1)).sum == docs.length.toLong)
  }

  test("q129 source overlap matrix matches a brute-force gram-set recompute") {
    // 60-bit gram hash — the graft_tri_grams contract (NO mod-P fold,
    // unlike the token hash).
    def gram60(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(15), 16)
    val bySource = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
      .groupBy(_._1)
      .map { case (src, docs) =>
        src -> docs.flatMap { case (_, w) =>
          w.sliding(3).filter(_.length == 3).map(t => gram60(t.mkString(" ")))
        }.toSet
      }
    val expected = (for {
      (sa, ga) <- bySource.toSeq
      (sb, gb) <- bySource.toSeq
      if sa < sb
      inter = (ga & gb).size.toLong
      if inter > 0
    } yield (sa, sb) -> ((inter, ga.size.toLong, gb.size.toLong))).toMap
    assert(expected.nonEmpty)

    val out = Dedup.sourceOverlapMatrix(spark, sfDir).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == expected.keySet)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (inter, na, nb) = expected(key)
      assert(r.getLong(2) == inter, s"$key n_shared")
      assert(r.getLong(3) == na, s"$key n_grams_a")
      assert(r.getLong(4) == nb, s"$key n_grams_b")
      assert(r.getLong(5) == inter * 1000000L / math.min(na, nb), s"$key ppm")
    }
  }

  test("q143 merge delta is exactly full-purge minus standing-purge (brute force)") {
    val c = chain()
    val sources = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val quality = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // The full q49/q92 chain (union-find + keeper rule) over an
    // arbitrary doc population — instantiated for the whole corpus and
    // for the standing corpus (minus the batch source).
    def purgeOf(ids: Set[Long]): Map[Long, (Long, Long)] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      starEdges(c.filter { case (id, _) => ids(id) })
        .foreach { case (a, b) => union(a, b) }
      val members = parent.keySet ++ parent.values
      val comp = members.map(m => m -> find(m)).toMap
      comp.groupBy(_._2).values.flatMap { m =>
        val ordered = m.keys.toSeq.sortBy(id => (-quality(id), id))
        ordered.tail.map(id => id -> ((comp(id), ordered.head)))
      }.toMap
    }
    val all = c.keySet
    val full = purgeOf(all)
    val standing = purgeOf(all.filter(sources(_) != Dedup.NewSource))
    // Purge membership is monotone under merge (a non-keeper stays a
    // non-keeper when its cluster grows) — the premise behind reading
    // the delta as "batch-arrived dups + demoted standing keepers".
    assert(standing.keySet.subsetOf(full.keySet))
    val expected = full.filter { case (id, _) => !standing.contains(id) }
    assert(expected.nonEmpty, "the merge must newly purge at least one doc")

    val out = Warehouse.mergePurgeDelta(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val id = r.getLong(0)
      val (cid, kept) = expected(id)
      assert(r.getString(1) == sources(id), s"doc $id source")
      assert(r.getLong(2) == cid, s"doc $id cluster_id")
      assert(r.getLong(3) == kept, s"doc $id kept_doc")
      assert(r.getBoolean(4) == (sources(id) == Dedup.NewSource), s"doc $id flag")
      // No delta row was purged pre-merge.
      assert(!standing.contains(id), s"doc $id was already purged pre-merge")
    }
  }
}
