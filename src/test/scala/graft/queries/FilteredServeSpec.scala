package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** Filtered ANN serving (q167): the oracle certifies the pinned
  * battery's ranking; this spec pins the DEFINITION (the filter
  * must not touch scores — filtered serve equals the unfiltered
  * serve post-filtered), the edge filters the fixture battery
  * doesn't exercise, and the tombstone composition.
  */
class FilteredServeSpec extends AnyFunSuite with SparkFixture {

  private def qvOf(vid: Long): Seq[Double] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === lit(vid))
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()(0).getSeq[Double](0)

  test("filtered serve == unfiltered serve post-filtered; only allowed sources served") {
    val sources = Similarity.FilterSources
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val qv = qvOf(123L)
    // k = corpus size: the unfiltered serve then carries EVERY probed
    // candidate, so post-filtering it is exact, not truncated.
    val unfiltered = Similarity.annServe(spark, sfDir, qv,
        Similarity.ParamNprobe, srcOf.size).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = unfiltered
      .filter(r => sources.contains(srcOf(r._1)))
      .take(Similarity.ParamAnnK)
      .map(r => (r._1, r._2, srcOf(r._1), r._3))
    val got = Similarity.annServeFiltered(spark, sfDir, qv,
        Similarity.ParamNprobe, Similarity.ParamAnnK, sources).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq,
      "the filter must not change scores or order")
    assert(got.nonEmpty && got.forall(r => sources.contains(r._3)))
  }

  test("empty filter refused; unknown source serves zero rows") {
    val qv = qvOf(123L)
    intercept[IllegalArgumentException] {
      Similarity.annServeFiltered(spark, sfDir, qv, 3, 12, Seq.empty)
    }
    assert(Similarity.annServeFiltered(spark, sfDir, qv, 3, 12,
      Seq("nosuchsource")).collect().isEmpty)
  }

  test("filtered BM25 == unfiltered BM25 post-filtered; scores untouched") {
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val sources = Similarity.FilterSources
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val terms = RetrievalIndex.ParamTerms
    // k = corpus size: the unfiltered serve carries every candidate.
    val unfiltered = RetrievalIndex.bm25Serve(spark, wh, terms, srcOf.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = unfiltered
      .filter(r => sources.contains(srcOf(r._1)))
      .take(RetrievalIndex.ParamK)
      .map(r => (r._1, r._2, srcOf(r._1), r._3))
    val got = RetrievalIndex.bm25ServeFiltered(spark, wh, sfDir, terms,
        RetrievalIndex.ParamK, sources).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == expected.toSeq,
      "the filter must not change BM25 scores or order")
    assert(got.nonEmpty && got.forall(r => sources.contains(r._3)))
    intercept[IllegalArgumentException] {
      RetrievalIndex.bm25ServeFiltered(spark, wh, sfDir, terms, 10, Seq.empty)
    }
  }

  test("filtered hybrid fuses within-filter leg ranks over allowed docs only") {
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val sources = Similarity.FilterSources
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val qv = qvOf(RetrievalIndex.HybridParamVecId)
    val fused = RetrievalIndex.hybridServeFiltered(spark, wh, sfDir,
        RetrievalIndex.HybridParamTerms, qv, sources).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fused.nonEmpty &&
      fused.forall(r => sources.contains(srcOf(r._1))),
      "every fused doc must be allowed")
    // The sparse leg's ranks are the within-filter ranks: rank r in
    // the fusion == position r of the post-filtered sparse serve.
    val sparseAll = RetrievalIndex.bm25Serve(spark, wh,
        RetrievalIndex.HybridParamTerms, srcOf.size)
      .collect().map(_.getLong(0))
      .filter(id => sources.contains(srcOf(id)))
      .take(graft.queries.TextOps.Bm25K)
    fused.filter(_._2 > 0).foreach { case (id, rs, _, _) =>
      assert(sparseAll((rs - 1).toInt) == id,
        s"sparse rank $rs of doc $id must match the post-filtered serve")
    }
  }

  test("tombstones compose with the filter") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft-filtered-spec").toString
    Warehouse.build(spark, sfDir, wh)
    val qv = qvOf(123L)
    val sources = Similarity.FilterSources
    val before = Similarity.annServeFilteredFrom(spark, wh, qv, 3, 12,
      sources).collect().map(_.getLong(0))
    val kill = before.take(2).toSeq
    Warehouse.deleteVectors(spark, wh, kill.toDF("vec_id"))
    val after = Similarity.annServeFilteredFrom(spark, wh, qv, 3, 12,
      sources).collect().map(_.getLong(0))
    assert(after.intersect(kill).isEmpty, "filtered serve must exclude")
    assert(after.take(10).toSeq == before.drop(2).toSeq,
      "survivors keep their order")
    assert(after.length == 12, "the tail refills from allowed survivors")
  }
}
