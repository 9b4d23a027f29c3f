package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Batched multi-request serving (q154–q156, r15 verdict #1): the
  * oracle certifies every request's ranking against a from-scratch
  * recompute; this spec pins the property the oracle states only
  * indirectly — the batch answer is IDENTICAL, row for row, to the
  * sequential per-request serve APIs it amortizes — plus the
  * contracts the fixture battery doesn't exercise (tombstoned stores,
  * no-candidate requests).
  */
class BatchServeSpec extends AnyFunSuite with SparkFixture {

  test("batched BM25 slices are row-identical to the sequential serve") {
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val reqs = RetrievalIndex.batchBm25Requests
    val k = RetrievalIndex.BatchBm25K
    val batch = RetrievalIndex.bm25ServeBatch(spark, wh, reqs, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    // Every 6th request re-served sequentially (full battery would be
    // 60 driver jobs — the cost the batch API exists to avoid).
    reqs.filter(_._1 % 6 == 0).foreach { case (rid, terms) =>
      val seq = RetrievalIndex.bm25Serve(spark, wh, terms, k).collect()
        .zipWithIndex
        .map { case (r, i) =>
          (rid, i + 1L, r.getLong(0), r.getLong(1), r.getDouble(2)) }
      assert(batch(rid).sortBy(_._2).toSeq == seq.toSeq,
        s"request $rid: batch != sequential")
    }
  }

  test("batched ANN slices are row-identical to the sequential serve") {
    val vecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(Similarity.BatchAnnIds: _*))
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val (np, k) = (Similarity.BatchAnnNprobe, Similarity.BatchAnnK)
    val batch = Similarity.annServeBatch(spark, sfDir, vecs.toSeq, np, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    vecs.zipWithIndex.filter(_._2 % 12 == 0).map(_._1).foreach { case (rid, v) =>
      val seq = Similarity.annServe(spark, sfDir, v, np, k).collect()
        .zipWithIndex
        .map { case (r, i) =>
          (rid, i + 1L, r.getLong(0), r.getLong(1), r.getDouble(2)) }
      assert(batch(rid).sortBy(_._2).toSeq == seq.toSeq,
        s"request $rid: batch != sequential")
    }
  }

  test("batched QUANTIZED ANN slices are row-identical to the sequential quant serve") {
    val vecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(Similarity.QuantBatchIds: _*))
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val (np, k) = (Similarity.QuantBatchNprobe, Similarity.QuantBatchK)
    val batch = Similarity.annServeQuantBatch(spark, sfDir, vecs.toSeq, np, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    vecs.zipWithIndex.filter(_._2 % 12 == 0).map(_._1).foreach { case (rid, v) =>
      val seq = Similarity.annServeQuant(spark, sfDir, v, np, k).collect()
        .zipWithIndex
        .map { case (r, i) =>
          (rid, i + 1L, r.getLong(0), r.getLong(1), r.getDouble(2)) }
      assert(batch(rid).sortBy(_._2).toSeq == seq.toSeq,
        s"request $rid: quant batch != sequential quant")
    }
  }

  test("batched hybrid slices carry the sequential fusion's exact values") {
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val byId = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(RetrievalIndex.BatchHybridVecIds: _*))
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val reqs = RetrievalIndex.batchHybridTermReqs
      .zip(RetrievalIndex.BatchHybridVecIds)
      .map { case ((rid, ts), vid) => (rid, ts, byId(vid)) }
    val batch = RetrievalIndex.hybridServeBatch(spark, wh, sfDir, reqs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    reqs.filter(_._1 % 8 == 1).foreach { case (rid, ts, v) =>
      val seq = RetrievalIndex.hybridServe(spark, wh, sfDir, ts, v).collect()
        .map(r => (rid, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(batch(rid).toSet == seq, s"request $rid: batch != sequential")
    }
  }

  test("batched BM25 honors tombstones and drops no-candidate requests") {
    import spark.implicits._
    def docsOf(ids: Seq[Long]) = ids
      .map(i => (i, "src", s"alpha beta w$i gamma"))
      .toDF("doc_id", "source", "text")
    val wh = java.nio.file.Files
      .createTempDirectory("graft-batch-tomb").toString
    RetrievalIndex.buildOf(spark, docsOf(0L until 20L), wh)
    RetrievalIndex.deleteDocs(spark, wh,
      docsOf(0L until 20L).filter(col("doc_id") < 5))
    val reqs = Seq(
      (0L, Seq("alpha")),       // candidates = surviving docs only
      (1L, Seq("w3", "w7")),    // w3's only doc is tombstoned
      (2L, Seq("nosuchterm")))  // zero candidates -> request absent
    val out = RetrievalIndex.bm25ServeBatch(spark, wh, reqs, 30).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byReq = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byReq(0L) == (5L until 20L).toSet,
      "tombstoned docs must not appear in any request's candidates")
    assert(byReq(1L) == Set(7L),
      "a term whose only doc is tombstoned contributes no candidates")
    assert(!byReq.contains(2L),
      "a request with zero candidates returns no rows (q147 contract)")
  }
}
