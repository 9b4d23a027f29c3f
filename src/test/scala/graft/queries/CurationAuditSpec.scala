package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Structural invariants of the round-10 audit queries (q94–q97)
  * that the value-hash oracle doesn't state explicitly: the bloom
  * certificate must agree with the exact q66 path it certifies, the
  * drift histogram must partition the corpus, and the retention
  * matrix must be anchored at its cohort sizes. */
class CurationAuditSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def s = SparkFixture.session

  test("q94 certificate agrees with the exact q66 contamination count") {
    val cert = PipelineOps.bloomDecontaminate(s, sfDir).head()
    val exact = PipelineOps.decontaminate(s, sfDir)
      .filter(org.apache.spark.sql.functions.col("contaminated") === 1).count()
    cert.getAs[Long]("n_contaminated") shouldBe exact
    cert.getAs[Boolean]("no_false_negatives") shouldBe true
    cert.getAs[Boolean]("fp_docs_within_bound") shouldBe true
    cert.getAs[Long]("n_train_docs") should be > 0L
  }

  test("q95 histogram partitions the corpus and certifies drift") {
    import org.apache.spark.sql.functions._
    val hist = TextOps.splitDrift(s, sfDir)
    val sums = hist.agg(
      sum("n_train").as("t"), sum("n_valid").as("v"), sum("n_test").as("x")).head()
    val total = graft.core.Tables.documents(s, sfDir).count()
    (sums.getLong(0) + sums.getLong(1) + sums.getLong(2)) shouldBe total
    val rows = hist.collect()
    rows.foreach { r =>
      withClue(s"bin ${r.getAs[Long]("bin")}: ") {
        r.getAs[Boolean]("train_valid_drift_ok") shouldBe true
        r.getAs[Boolean]("train_test_drift_ok") shouldBe true
      }
    }
    // Non-vacuity: the 1/10 bound must actually discriminate — the
    // observed max proportion drift is nonzero, so a sufficiently
    // tight threshold (1/1000) WOULD fail some bin. Recomputed from
    // the certified counts in exact BigInt arithmetic (the query's own
    // inequality at the tighter threshold).
    val nt = rows.map(_.getAs[Long]("n_train")).sum
    val nv = rows.map(_.getAs[Long]("n_valid")).sum
    val tighterFails = rows.exists { r =>
      val (nb, n2b) = (r.getAs[Long]("n_train"), r.getAs[Long]("n_valid"))
      (BigInt(1000) * (BigInt(nb) * nv - BigInt(n2b) * nt)).abs >
        BigInt(nt) * BigInt(nv)
    }
    tighterFails shouldBe true
  }

  test("q97 per-group heavy hitters: ≤5 rows per source, all flags true") {
    val rows = TextOps.cmHeavyHittersByGroup(s, sfDir).collect()
    rows should not be empty
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      withClue(s"source $src: ") { rs.length should be <= 5 }
    }
    rows.foreach { r =>
      r.getAs[Boolean]("no_underestimate") shouldBe true
      r.getAs[Boolean]("within_eps") shouldBe true
    }
  }

  test("q96 retention matrix is anchored at full cohorts on day 0") {
    val m = LogOps.cohortRetention(s, sfDir).collect()
    m should not be empty
    val day0 = m.filter(_.getAs[Long]("day_offset") == 0L)
    day0 should not be empty
    // Every cohort member is by construction active on its first day.
    day0.foreach { r =>
      r.getAs[Long]("n_users") shouldBe r.getAs[Long]("cohort_size")
      r.getAs[Long]("retention_ppm") shouldBe 1000000L
    }
    // No cell can exceed its cohort.
    m.foreach { r =>
      r.getAs[Long]("n_users") should be <= r.getAs[Long]("cohort_size")
    }
  }

  test("q125 chi-square matrix matches a brute force and is dense") {
    val docs = graft.core.Tables.documents(s, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val counts = docs.flatMap { case (src, w) => w.map(t => (src, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val termTotals = counts.groupBy(_._1._2)
      .map { case (t, m) => t -> m.values.sum }
    val top = termTotals.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextOps.DriftTopTerms)
    val sources = docs.map(_._1).distinct.sorted
    val rowTotals = sources.map(src =>
      src -> top.map { case (t, _) => counts.getOrElse((src, t), 0L) }.sum).toMap
    val grand = rowTotals.values.sum

    val out = TextOps.vocabDriftChi2(s, sfDir).collect()
    assert(out.length == sources.length * TextOps.DriftTopTerms,
      "matrix must be dense: every source x top-term cell present")
    out.foreach { r =>
      val (src, tok) = (r.getString(0), r.getString(1))
      val o = counts.getOrElse((src, tok), 0L)
      val ct = termTotals(tok)
      val e = (rowTotals(src) * ct).toDouble / grand
      val contrib = if (e == 0.0) 0.0 else (o - e) * (o - e) / e
      assert(r.getLong(2) == o, s"($src,$tok) o")
      assert(math.abs(r.getDouble(3) - e) < 1e-6, s"($src,$tok) expected")
      assert(math.abs(r.getDouble(4) - contrib) < 1e-6, s"($src,$tok) contrib")
    }
    // Per-term observed counts reassemble the term totals over the
    // top slice, and some cell actually drifts (non-degenerate).
    top.foreach { case (t, ct) =>
      assert(out.filter(_.getString(1) == t).map(_.getLong(2)).sum == ct)
    }
    assert(out.map(_.getDouble(4)).max > 0.0)
  }

  test("q131 percentile is an exact within-source rank, comparable across sources") {
    val quality = TextOps.qualityScore(s, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val srcOf = graft.core.Tables.documents(s, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = srcOf.groupBy(_._2).values.flatMap { docs =>
      val ordered = docs.keys.toSeq.sortBy(id => (-quality(id), id))
      val n = ordered.length.toLong
      ordered.zipWithIndex.map { case (id, i) =>
        id -> ((i + 1).toLong,
          if (n == 1) 0L else i.toLong * 1000000L / (n - 1))
      }
    }.toMap

    val out = TextOps.qualityNormalize(s, sfDir).collect()
    assert(out.length == srcOf.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val (rk, ppm) = expected(id)
      assert(r.getString(1) == srcOf(id), s"doc $id source")
      assert(math.abs(r.getDouble(2) - quality(id)) < 1e-9, s"doc $id score")
      assert(r.getLong(3) == rk, s"doc $id rank")
      assert(r.getLong(4) == ppm, s"doc $id pct_ppm")
    }
    // Every source spans the full percentile range (0 at its best
    // doc, 1e6 at its worst when n > 1) — that is the comparability
    // contract mixture decisions rely on.
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      assert(rows.map(_.getLong(4)).min == 0L, s"$src min")
      if (rows.length > 1)
        assert(rows.map(_.getLong(4)).max == 1000000L, s"$src max")
    }
  }
}
