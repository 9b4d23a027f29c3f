package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.core.Tables

/** The approximate-aggregate surface — the 100 TB path the exact,
  * oracle-checked forms (q08 distinct, q51 percentiles) swap to at
  * scale. Approximate results can't hash-match another engine, so
  * the contract checked here is the one that matters operationally:
  * bounded error against the exact answer, and MERGEABILITY — HLL
  * sketches built per slice (per partition, per day) union to the
  * global answer without rescanning, which is what makes
  * distinct-count reaggregation free on a partitioned 100 TB store.
  */
class SketchesSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val events = Tables.events(SparkFixture.session, sfDir)

  test("approx_count_distinct lands within rsd of the exact count") {
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = events.select(approx_count_distinct(col("user_id"), rsd = 0.05))
      .head().getLong(0)
    approx.toDouble shouldBe exact.toDouble +- (exact * 0.15)
  }

  test("percentile_approx tracks the exact interpolated percentile") {
    val exact = events.select(expr("percentile(value, 0.95)")).head().getDouble(0)
    val approx = events
      .select(percentile_approx(col("value"), lit(0.95), lit(10000)))
      .head().getDouble(0)
    // percentile_approx returns an actual data value; at accuracy 10k
    // it must land within the local value spacing of the exact answer.
    approx shouldBe exact +- math.max(math.abs(exact) * 0.01, 1.0)
  }

  test("HLL sketches built per-slice union to the global estimate") {
    val global = events
      .select(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .head().getLong(0)
    // Sketch each event_type slice independently, then merge — the
    // partitioned-store reaggregation path (no rescan of the slices).
    val merged = events
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head().getLong(0)
    merged shouldBe global
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    merged.toDouble shouldBe exact.toDouble +- (exact * 0.15)
  }

  test("count-min sketches built per-slice union to the one-pass sketch exactly") {
    import graft.functions.CountMin
    val spark = SparkFixture.session
    val tokens = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    // Counter addition is exact, so the union of per-source sketches
    // must be BYTE-IDENTICAL to the sketch of the whole stream.
    val build = "count_min_sketch(token, 0.001d, 0.999d, 42)"
    val merged = tokens.groupBy(col("source")).agg(expr(build).as("sk"))
      .agg(CountMin.union(col("sk")).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val global = tokens.agg(expr(build).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    merged should contain theSameElementsInOrderAs global
  }

  test("graft_cm_estimate never undershoots and respects the eps bound on every token") {
    val spark = SparkFixture.session
    val tokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = tokens.count()
    val sk = tokens.agg(expr("count_min_sketch(token, 0.001d, 0.999d, 42)").as("sk"))
    val checked = tokens.groupBy(col("token")).agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(col("token"), col("exact"),
        expr("graft_cm_estimate(sk, token)").as("est"))
      .filter(col("est") < col("exact") ||
        col("est") > col("exact") + lit(math.ceil(0.001 * n).toLong))
    checked.count() shouldBe 0L
  }

  test("q79 heavy-hitter rows carry exact counts and all-true contract flags") {
    val rows = TextOps.cmHeavyHitters(SparkFixture.session, sfDir).collect()
    rows should have length 10
    rows.foreach { r =>
      withClue(s"${r.getAs[String]("token")}: ") {
        r.getAs[Boolean]("no_underestimate") shouldBe true
        r.getAs[Boolean]("within_eps") shouldBe true
      }
    }
    // Descending by exact count — the certified set really is the top.
    val ns = rows.map(_.getAs[Long]("n"))
    ns.toSeq shouldBe ns.sorted(Ordering[Long].reverse).toSeq
  }

  test("theta sketches built per-slice union to the global estimate (mergeability)") {
    // Per-event-type theta sketches rolled up with theta_union_agg
    // must estimate the same global distinct count as a one-pass
    // sketch — the q63 HLL law, theta edition.
    val global = events
      .select(theta_sketch_estimate(theta_sketch_agg(col("user_id"))).as("n"))
      .head().getLong(0)
    val merged = events
      .groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
      .select(theta_sketch_estimate(theta_union_agg(col("sk"))).as("n"))
      .head().getLong(0)
    merged shouldBe global
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    merged.toDouble shouldBe exact.toDouble +- (exact * 0.15)
  }

  test("q80 theta set algebra: exact flags consistent, contract booleans all true") {
    val row = Extras.thetaOverlap(SparkFixture.session, sfDir).head()
    val both = row.getAs[Long]("n_both")
    val aOnly = row.getAs[Long]("n_purchase_only")
    val either = row.getAs[Long]("n_either")
    // Inclusion-exclusion sanity on the exact side: both + a-only +
    // b-only = either, so both + a-only can never exceed either.
    (both + aOnly) should be <= either
    row.getAs[Boolean]("union_within_bound") shouldBe true
    row.getAs[Boolean]("intersection_within_bound") shouldBe true
    row.getAs[Boolean]("difference_within_bound") shouldBe true
  }

  test("KLL per-partition sketches union to bounded-rank-error quantiles") {
    import graft.functions.Kll
    val spark = SparkFixture.session
    import spark.implicits._
    val vals = events.select(col("value")).as[java.lang.Double]
    val merged = Kll.partitionSketches(vals).toDF("psk")
      .agg(Kll.union(col("psk")).as("sk"))
    val est = merged.select(expr("graft_kll_quantile(sk, 0.5d)")).head().getDouble(0)
    // True rank of the estimated median within 2× the published bound.
    val n = events.count().toDouble
    val below = events.filter(col("value") <= est).count().toDouble
    math.abs(below / n - 0.5) should be <= 2 * Kll.rankError
    // Empty input → NULL quantile, not a crash.
    val empty = Kll.partitionSketches(spark.emptyDataset[java.lang.Double])
      .toDF("psk").agg(Kll.union(col("psk")).as("sk"))
      .select(expr("graft_kll_quantile(sk, 0.5d)")).head()
    empty.isNullAt(0) shouldBe true
  }

  test("q81 quantile rows carry exact n and all-true rank-error flags") {
    val row = Extras.kllQuantiles(SparkFixture.session, sfDir).head()
    row.getAs[Long]("n_total") should be > 0L
    Seq(25, 50, 75, 95, 99).foreach { q =>
      withClue(s"q$q: ") {
        row.getAs[Boolean](s"q${q}_within_rank_err") shouldBe true
      }
    }
  }

  test("graft_kll_agg grouped build: exact per-group n, bounded per-group median rank") {
    import graft.functions.Kll
    // One sketch per event_type via the TypedImperativeAggregate.
    // KLL's n counter is exact (only quantile positions are
    // approximate), so each group's sketch must carry exactly the
    // group's non-null count; each group's estimated median must sit
    // within the published rank-error bound of rank 0.5 in ITS group.
    val perGroup = events.groupBy(col("event_type"))
      .agg(expr("graft_kll_agg(value)").as("sk"))
      .select(col("event_type"),
        expr("graft_kll_quantile(sk, 0.5d)").as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val counts = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perGroup.keySet shouldBe counts.keySet
    perGroup.foreach { case (et, est) =>
      val n = counts(et).toDouble
      val below = events
        .filter(col("event_type") === et && col("value") <= est)
        .count().toDouble
      withClue(s"$et: ") {
        math.abs(below / n - 0.5) should be <= 2 * Kll.rankError
      }
    }
  }

  test("graft_kll_agg output bytes compose with Kll.union (grouped -> global rollup)") {
    import graft.functions.Kll
    // The serving-store design: per-slice sketch COLUMNS merged by
    // Kll.union answer global quantiles without rescanning rows.
    val rolled = events.groupBy(col("event_type"))
      .agg(expr("graft_kll_agg(value)").as("sk"))
      .agg(Kll.union(col("sk")).as("sk"))
    val est = rolled.select(expr("graft_kll_quantile(sk, 0.95d)"))
      .head().getDouble(0)
    val n = events.count().toDouble
    val below = events.filter(col("value") <= est).count().toDouble
    math.abs(below / n - 0.95) should be <= 2 * Kll.rankError
  }

  test("q82 per-group quantile rows: one per event_type, exact n, all-true flags") {
    val rows = Extras.kllByGroup(SparkFixture.session, sfDir).collect()
    val counts = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.map(_.getAs[String]("event_type")).toSet shouldBe counts.keySet
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      withClue(s"$et: ") {
        r.getAs[Long]("n_total") shouldBe counts(et)
        Seq(50, 95, 99).foreach { q =>
          r.getAs[Boolean](s"q${q}_within_rank_err") shouldBe true
        }
      }
    }
  }

  test("CountMin.union names the compatibility contract on mismatched sketches") {
    import graft.functions.CountMin
    val spark = SparkFixture.session
    val tokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token")).limit(100)
    // Two sketches with different width (eps) — unionable never.
    val a = tokens.agg(expr("count_min_sketch(token, 0.001d, 0.999d, 42)").as("sk"))
    val b = tokens.agg(expr("count_min_sketch(token, 0.01d, 0.999d, 42)").as("sk"))
    val ex = intercept[org.apache.spark.SparkException] {
      a.unionByName(b).agg(CountMin.union(col("sk"))).head()
    }
    // The contract name must survive Spark's exception wrapping.
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    messages(ex).mkString(" ") should include("depth, width, seed")
  }

  test("q81/q82 certification stays total on all-NaN/all-NULL groups (ADVICE r9)") {
    // A group whose value column never ingests (all NaN or all NULL)
    // has an EMPTY sketch: graft_kll_quantile returns NULL and the
    // rank denominator is 0. The certification booleans must come back
    // `true` (trivially certified), never NULL — the oracle hard-codes
    // `true`. Fixtures are NaN-free, so this path only exists here.
    val s = SparkFixture.session
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-kll-degenerate").toString
    val rows =
      (1 to 100).map(i => (i.toLong * 1000000L, "a", Some(i.toDouble), i.toLong)) ++
      (1 to 10).map(i => (i.toLong * 1000000L, "b", Some(Double.NaN), i.toLong)) ++
      (1 to 10).map(i => (i.toLong * 1000000L, "c", None: Option[Double], i.toLong))
    rows.toDF("ts", "event_type", "value", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val byGroup = Extras.kllByGroup(s, tmp).collect()
    byGroup.map(_.getString(0)).toSeq shouldBe Seq("a", "b", "c")
    byGroup.foreach { r =>
      val n = r.getAs[Long]("n_total")
      if (r.getString(0) == "a") n shouldBe 100L else n shouldBe 0L
      Seq("q50", "q95", "q99").foreach { q =>
        withClue(s"${r.getString(0)}/$q: ") {
          r.getAs[Boolean](s"${q}_within_rank_err") shouldBe true
        }
      }
    }

    // Global form on an all-degenerate slice: n_total = 0, flags true.
    val tmpAll = java.nio.file.Files.createTempDirectory("graft-kll-allnan").toString
    (1 to 10).map(i => (i.toLong * 1000000L, "x", Some(Double.NaN), i.toLong))
      .toDF("ts", "event_type", "value", "user_id")
      .write.mode("overwrite").parquet(s"$tmpAll/events.parquet")
    val global = Extras.kllQuantiles(s, tmpAll).head()
    global.getAs[Long]("n_total") shouldBe 0L
    Seq("q25", "q50", "q75", "q95", "q99").foreach { q =>
      global.getAs[Boolean](s"${q}_within_rank_err") shouldBe true
    }
  }

  test("q98 pair matrix agrees with q80 on the purchase/view pair, all flags true") {
    val m = Extras.thetaOverlapMatrix(SparkFixture.session, sfDir).collect()
    m should not be empty
    m.foreach { r =>
      withClue(s"${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}: ") {
        r.getAs[Boolean]("intersection_within_bound") shouldBe true
        r.getAs[Boolean]("union_within_bound") shouldBe true
        r.getAs[Long]("n_both") should be <= r.getAs[Long]("n_either")
      }
    }
    // The (purchase, view) cell must reproduce q80's exact overlap.
    val pv = m.find(r => r.getAs[String]("type_a") == "purchase" &&
      r.getAs[String]("type_b") == "view")
    pv shouldBe defined
    val q80row = Extras.thetaOverlap(SparkFixture.session, sfDir).head()
    pv.get.getAs[Long]("n_both") shouldBe q80row.getAs[Long]("n_both")
    // Full-matrix coverage (ADVICE r10): every ordered type pair has a
    // row — zero-overlap pairs included, with n_both coalesced to 0 —
    // so the "full pair matrix" claim is structural, not data-lucky.
    val types = graft.core.Tables.events(SparkFixture.session, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).sorted
    val expected = for {
      a <- types; b <- types if a < b
    } yield (a, b)
    m.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")))
      .sorted.toSeq shouldBe expected.toSeq
  }

  test("q63 sketch-union row certifies itself (merge == global, error bounded)") {
    val row = Extras.sketchUnion(SparkFixture.session, sfDir).head()
    // Oracle-convertible contract: both flags unconditionally true,
    // exact count matches a direct countDistinct, raw estimate absent.
    row.schema.fieldNames.toSeq shouldBe
      Seq("exact_distinct", "merge_matches_global", "within_bound")
    row.getAs[Boolean]("merge_matches_global") shouldBe true
    row.getAs[Boolean]("within_bound") shouldBe true
    val exact = graft.core.Tables.events(SparkFixture.session, sfDir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    row.getAs[Long]("exact_distinct") shouldBe exact
  }
}
