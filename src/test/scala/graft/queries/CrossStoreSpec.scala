package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Unified cross-store document delete (r16 verdict #4): one call
  * composes the three family disciplines; the oracle (q175) certifies
  * the served values — this spec pins the exclusion per family, the
  * re-run heal (idempotence across the non-atomic window) and the
  * refusal passthrough.
  */
class CrossStoreSpec extends AnyFunSuite with SparkFixture {

  private def freshStores(): (String, String) = {
    val dense = java.nio.file.Files
      .createTempDirectory("graft-crossspec-wh").toString
    val retr = java.nio.file.Files
      .createTempDirectory("graft-crossspec-retr").toString
    Warehouse.build(spark, sfDir, dense)
    RetrievalIndex.buildOf(spark, Tables.documents(spark, sfDir), retr)
    (dense, retr)
  }

  test("one call excludes the ids from every family's serve and store") {
    val (dense, retr) = freshStores()
    val ids = Seq(17L, 137L, 257L)
    CrossStore.deleteDoc(spark, dense, retr, ids)
    // Dense: an exhaustive probe (nprobe = all cells, k = corpus)
    // must not surface any deleted vector.
    val qv = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 123L)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()(0).getSeq[Double](0)
    val served = Similarity.annServeFrom(spark, dense, qv, 8, 10000)
      .collect().map(_.getLong(0))
    assert(served.nonEmpty && served.intersect(ids).isEmpty,
      "the dense serve must exclude every deleted vector")
    // Sparse: a request whose terms the deleted docs held must not
    // return them (every fixture doc shares the small vocabulary).
    val bm = RetrievalIndex.bm25Serve(spark, retr,
        RetrievalIndex.ParamTerms, 10000)
      .collect().map(_.getLong(0))
    assert(bm.nonEmpty && bm.intersect(ids).isEmpty,
      "the sparse serve must exclude every deleted doc")
    // Media: the digest rows are physically gone.
    val media = Warehouse.read(spark, dense, "media_digests")
      .filter(col("media_id").isin(ids: _*)).count()
    assert(media == 0L, "deleted media digests must be physically gone")
  }

  test("re-running the same wave heals instead of refusing (non-atomic window)") {
    val (dense, retr) = freshStores()
    val ids = Seq(21L, 42L)
    CrossStore.deleteDoc(spark, dense, retr, ids)
    // The second run must be a no-op on every family — the recovery
    // path after a crash between the three per-store commits.
    CrossStore.deleteDoc(spark, dense, retr, ids)
    val tombs = Warehouse.read(spark, dense, "vec_tombstones")
      .collect().map(_.getLong(0)).sorted
    assert(tombs.toSeq == ids.sorted, "dense tombstones must not duplicate")
    val stats = Warehouse.read(spark, retr, "corpus_stats").collect()(0)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(stats.getLong(0) == nDocs - ids.size,
      "corpus stats must subtract each deleted doc exactly once")
  }

  test("an unindexed id refuses through the composed call") {
    val (dense, retr) = freshStores()
    intercept[IllegalArgumentException] {
      CrossStore.deleteDoc(spark, dense, retr, Seq(999999L))
    }
    intercept[IllegalArgumentException] {
      CrossStore.deleteDoc(spark, dense, retr, Seq.empty)
    }
  }
}
