package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** In-plan batch-hybrid fusion (r16 verdict #2): above
  * [[RetrievalIndex.InPlanFusionThreshold]] requests the fusion
  * composes both legs and the RRF algebra into ONE lazy plan with
  * zero driver-side rank collection; below it the collected form
  * overlaps the two family jobs. This spec pins row-identity of the
  * two forms on the q156 battery and the zero-collect plan shape of
  * an eval-scale (≥500-request) population.
  */
class HybridFusionSpec extends AnyFunSuite with SparkFixture {

  private def reqsOf(n: Int): Seq[(Long, Seq[String], Seq[Double])] = {
    val vecs = Warehouse.stored(spark, sfDir, "cells")
      .select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val nVecs = vecs.size
    (0L until n.toLong).map { i =>
      val terms = Seq(
        RetrievalIndex.BatchVocab(((i * 7 + 2) % RetrievalIndex.BatchVocab.length).toInt),
        RetrievalIndex.BatchVocab(((i * 13 + 5) % RetrievalIndex.BatchVocab.length).toInt))
        .distinct
      (i, terms, vecs((i % nVecs)))
    }
  }

  test("in-plan fusion is row-identical to the collected fusion") {
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val reqs = reqsOf(12) // below threshold: hybridServeBatch collects
    val collected = RetrievalIndex.hybridServeBatch(spark, wh, sfDir, reqs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val inPlan = RetrievalIndex.fuseBatchInPlan(
        RetrievalIndex.bm25ServeBatch(spark, wh,
          reqs.map(r => (r._1, r._2)), graft.queries.TextOps.Bm25K),
        Similarity.annServeBatch(spark, sfDir,
          reqs.map(r => (r._1, r._3)), Similarity.AnnProbeN,
          Similarity.AnnServeK))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(inPlan.toSeq == collected.toSeq,
      "the two fusion forms must agree row for row")
  }

  test("an eval-scale hybrid batch fuses in-plan: both stores in ONE plan, zero rank collection") {
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val reqs = reqsOf(520) // above threshold: must route in-plan
    val fused = RetrievalIndex.hybridServeBatch(spark, wh, sfDir, reqs)
    // Zero driver-side rank collection: the RETURNED frame still
    // reads both stored indexes (a collected fusion would be a
    // LocalTableScan of driver rows with no store scan left).
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("graft-retr-wh"),
      "the sparse leg must read the stored postings inside the fused plan")
    assert(plan.contains("graft-warehouse"),
      "the dense leg must read the stored cells inside the fused plan")
    assert(!plan.contains("documents.parquet") &&
      !plan.contains("embeddings.parquet"),
      "no corpus file may appear in the fused plan")
    // The population executes: every request fuses both legs' ranks.
    val rows = fused.groupBy("req_id").count().collect()
    assert(rows.length == 520, "every request must serve")
    val sample = fused.filter(col("req_id") === 0L).collect()
    assert(sample.nonEmpty && sample.exists(_.getLong(2) > 0L) &&
      sample.exists(_.getLong(3) > 0L),
      "request 0 must carry both sparse and dense leg ranks")
  }
}
