package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables

/** The UNIFIED dense-serve kernel (r16 verdict #1): every cell of the
  * param/batch × full/quant × filtered/unfiltered matrix is ONE
  * pipeline under an option vector. The oracle certifies the pinned
  * batteries (q150/q155/q157/q162/q167/q170–q172); this spec pins the
  * DEFINITIONS the three round-17 cells must satisfy — batch ≡
  * sequential per request, filter-before-rescore, tombstone
  * composition through the full option vector — so a kernel edit
  * cannot drift one cell without failing here.
  */
class UnifiedServeSpec extends AnyFunSuite with SparkFixture {

  private def qvOf(vid: Long): Seq[Double] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === lit(vid))
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()(0).getSeq[Double](0)

  private def battery(ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  test("filtered batch slices are row-identical to the sequential filtered serve") {
    val reqs = battery(Seq(10L, 77L, 230L, 401L))
    val got = Similarity.annServeFilteredBatch(spark, sfDir, reqs, 2, 6,
        Similarity.FilterSources).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))
      .groupBy(_._1)
    reqs.foreach { case (rid, qv) =>
      val seq = Similarity.annServeFiltered(spark, sfDir, qv, 2, 6,
          Similarity.FilterSources).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      val slice = got.getOrElse(rid, Array.empty).sortBy(_._2)
        .map(t => (t._3, t._4, t._5, t._6))
      assert(slice.toSeq == seq.toSeq,
        s"request $rid: batch slice must equal the sequential filtered serve")
      assert(slice.zipWithIndex.forall { case (_, i) =>
        got(rid).exists(_._2 == i + 1) }, s"request $rid: ranks must be 1..n")
    }
  }

  test("single-request fast path equals the broadcast-frame batch row for row") {
    // r17 verdict #2: exactly one request takes the literal
    // single-request plan (typedLit vector, in-plan TakeOrdered
    // probe, orderBy+limit selection); two or more take the
    // broadcast-frame form. A multi-request batch forces the batch
    // path, while each sequential call takes the fast path — their
    // row-identity is exactly the single ≡ batch pin (same cosine
    // arithmetic, same zero-denominator -2.0, same cos DESC /
    // vec_id ASC selection and cos_c DESC / c_id DESC probe ties).
    val n = 12
    val reqs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .orderBy("vec_id").limit(n).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(reqs.size == n, s"fixture too small for a $n-request battery")
    val opts = Similarity.AnnServeOpts(nprobe = 2, k = 6)
    val batch = Similarity.serve(spark, sfDir, reqs, opts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    // Spot-check a spread of the batch's requests against the
    // sequential (literal-probe) form — first, middle, last.
    Seq(reqs.head, reqs(n / 2), reqs.last).foreach { case (rid, qv) =>
      val solo = Similarity.serve(spark, sfDir, Seq((rid, qv)), opts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSeq
      assert(batch(rid).sortBy(_._2).toSeq == solo,
        s"request $rid: broadcast-probe batch slice != literal-probe serve")
    }
  }

  test("filtered quant batch slices are row-identical to the sequential form") {
    val reqs = battery(Seq(3L, 123L, 250L))
    val got = Similarity.annServeQuantFilteredBatch(spark, sfDir, reqs,
        2, 6, Similarity.FilterSources).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))
      .groupBy(_._1)
    reqs.foreach { case (rid, qv) =>
      val seq = Similarity.annServeQuantFiltered(spark, sfDir, qv, 2, 6,
          Similarity.FilterSources).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      val slice = got.getOrElse(rid, Array.empty).sortBy(_._2)
        .map(t => (t._3, t._4, t._5, t._6))
      assert(slice.toSeq == seq.toSeq,
        s"request $rid: quant batch slice must equal the sequential form")
    }
  }

  test("filtered quant serve at full rescore depth equals the filtered full-precision serve") {
    // The filter gates BEFORE the prefilter window, so with rescore ≥
    // every probed allowed candidate the int8 prefilter drops nothing
    // and the exact rescore IS the full-precision filtered serve.
    val qv = qvOf(123L)
    val full = Similarity.annServeFiltered(spark, sfDir, qv, 3, 12,
        Similarity.FilterSources).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val deep = Similarity.annServeQuantFiltered(spark, sfDir, qv, 3, 12,
        Similarity.FilterSources, rescore = 100000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(deep.toSeq == full.toSeq,
      "a lossless-depth quantized filtered serve must equal the exact one")
  }

  test("filter-before-rescore: the window fills with allowed candidates only") {
    // Post-filtering the unfiltered quant serve at the SAME shallow
    // rescore depth can starve (disallowed candidates burn the
    // window); the filtered form must still return k allowed rows
    // whenever the probed cells hold them. Pin with a rescore depth
    // equal to k: every prefilter survivor must be allowed.
    val qv = qvOf(123L)
    val k = 6
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Similarity.annServeQuantFiltered(spark, sfDir, qv, 3, k,
        Similarity.FilterSources, rescore = k).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.length == k, "the window must fill from allowed candidates")
    assert(got.forall { case (id, src) =>
      Similarity.FilterSources.contains(src) && srcOf(id) == src })
  }

  test("tombstones compose through the full option vector") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft-unified-spec").toString
    Warehouse.build(spark, sfDir, wh)
    val qv = qvOf(123L)
    val reqs = Seq((0L, qv))
    def serveIds(): Seq[Long] =
      Similarity.annServeQuantFilteredBatchFrom(spark, wh, reqs, 3, 10,
        Similarity.FilterSources).collect().map(_.getLong(2)).toSeq
    val before = serveIds()
    val kill = before.take(2)
    Warehouse.deleteVectors(spark, wh, kill.toDF("vec_id"))
    val after = serveIds()
    assert(after.intersect(kill).isEmpty,
      "the full option vector must exclude tombstoned vectors")
    assert(after.take(before.length - 2) == before.drop(2),
      "survivors keep their order")
  }

  test("empty filter and bad depths are refused on the new forms") {
    val qv = qvOf(123L)
    intercept[IllegalArgumentException] {
      Similarity.annServeFilteredBatch(spark, sfDir, Seq((0L, qv)), 2, 6,
        Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Similarity.annServeQuantFiltered(spark, sfDir, qv, 2, 6,
        Similarity.FilterSources, rescore = 3) // rescore < k
    }
    intercept[IllegalArgumentException] {
      Similarity.annServeQuantFilteredBatch(spark, sfDir,
        Seq((1L, qv), (1L, qv)), 2, 6, Similarity.FilterSources)
    }
  }
}
