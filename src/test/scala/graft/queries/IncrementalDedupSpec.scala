package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q113 (incremental dedup): full brute-force replication of the
  * pipeline — token hashes, MinHash signatures, band hashes, new×index
  * candidates, exact Jaccard, per-doc verdict — in plain Scala over
  * the collected fixture, sharing no Spark expressions with the plan.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkFixture {

  private val P = 2147483647L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** PortableHash.hash60 over a string, mod P — the token-hash
    * contract (first 15 md5 hex digits as a long). */
  private def tokHash(t: String): Long =
    java.lang.Long.parseLong(md5hex(t).take(15), 16) % P

  test("q113 verdicts match a full brute-force replication") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val hs: Map[Long, Set[Long]] = docs.map { case (id, _, text) =>
      id -> text.split(" ", -1).distinct.map(tokHash).toSet
    }.toMap
    // Signatures preserve the column order (hs as first-seen distinct
    // list); min is order-free, so a Set suffices.
    val bandsOf: Map[Long, Seq[String]] = docs.map { case (id, _, text) =>
      val hset = text.split(" ", -1).distinct.map(tokHash)
      val sigs = Dedup.HashParams.map { case (a, b) =>
        hset.map(h => (a * h + b) % P).min
      }
      id -> Seq(sigs.take(4).mkString(","), sigs.drop(4).mkString(","))
        .map(md5hex)
    }.toMap
    val newDocs = docs.filter(_._2 == Dedup.NewSource).map(_._1)
    val idxDocs = docs.filter(_._2 != Dedup.NewSource).map(_._1)
    val expected = newDocs.flatMap { nd =>
      val cands = idxDocs.filter { id =>
        bandsOf(nd).zip(bandsOf(id)).exists { case (a, b) => a == b }
      }
      if (cands.isEmpty) None
      else {
        val scored = cands.map { id =>
          val inter = (hs(nd) & hs(id)).size
          val jac = inter.toDouble / (hs(nd).size + hs(id).size - inter)
          (id, jac)
        }
        val (bestId, bestJac) = scored.minBy { case (id, j) => (-j, id) }
        Some(nd -> (cands.size.toLong, bestId, bestJac))
      }
    }.toMap

    val out = Dedup.incrementalDedup(spark, sfDir).collect()
    assert(out.nonEmpty, "fixture must produce candidates")
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val id = r.getLong(0)
      val (nCand, bestId, bestJac) = expected(id)
      assert(r.getLong(1) == nCand, s"doc $id n_candidates")
      assert(r.getLong(2) == bestId, s"doc $id best_match")
      assert(math.abs(r.getDouble(3) - bestJac) < 1e-6, s"doc $id jaccard")
      assert(r.getBoolean(4) == (bestJac >= Dedup.IncrementalTau), s"doc $id flag")
    }
    // The increment never reports new×new or index×index pairs.
    val newSet = newDocs.toSet
    out.foreach { r =>
      assert(newSet(r.getLong(0)) && !newSet(r.getLong(2)))
    }
  }
}
