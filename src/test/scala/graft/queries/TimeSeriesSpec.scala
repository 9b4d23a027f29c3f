package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q114 (gap fill + LOCF), q115 (ordered funnel) and q121 (transition
  * matrix): brute-force recomputation over the collected events
  * fixture.
  */
class TimeSeriesSpec extends AnyFunSuite with SparkFixture {

  private lazy val events =
    graft.core.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("user_id", "event_type", "ts_ns", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("q114 spine is contiguous, fills are marked, LOCF carries the last real sum") {
    val dayOf = (ns: Long) => {
      val ms = Math.floorDiv(ns, 1000000L)
      Math.floorDiv(ms, 86400000L)
    }
    val daily = events.groupBy(e => (e._1, dayOf(e._3))).map {
      case ((u, d), es) => (u, d) -> (es.length.toLong, es.map(_._4).sum)
    }
    val out = LogOps.gapFillDaily(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    assert(out.exists(_._4), "fixture must contain gap days")
    out.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val days = sorted.map(_._2)
      // contiguous spine from the user's first to last active day
      val active = daily.keys.filter(_._1 == u).map(_._2)
      assert(days.head == active.min && days.last == active.max)
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
      var lastV = Double.NaN
      sorted.foreach { case (_, d, n, filled, locf) =>
        daily.get((u, d)) match {
          case Some((en, ev)) =>
            assert(!filled && n == en)
            lastV = ev
          case None =>
            assert(filled && n == 0L)
        }
        assert(math.abs(locf - (math.rint(lastV * 100) / 100)) < 1e-9 ||
          math.abs(locf - lastV) < 5e-3, s"user $u day $d locf")
      }
    }
  }

  test("q115 funnel counts match an ordered brute force") {
    val window = 7L * 86400L * 1000000000L
    val byUser = events.groupBy(_._1)
    def stepTimes(u: Long): (Option[Long], Option[Long], Option[Long]) = {
      val es = byUser(u)
      val tView = es.filter(_._2 == "view").map(_._3)
        .sorted.headOption
      val tClick = tView.flatMap(v => es.filter(e =>
        e._2 == "click" && e._3 > v && e._3 <= v + window)
        .map(_._3).sorted.headOption)
      val tPurchase = (tView, tClick) match {
        case (Some(v), Some(c)) => es.filter(e =>
          e._2 == "purchase" && e._3 > c && e._3 <= v + window)
          .map(_._3).sorted.headOption
        case _ => None
      }
      (tView, tClick, tPurchase)
    }
    val steps = byUser.keys.map(stepTimes).toSeq
    val (nV, nC, nP) = (steps.count(_._1.isDefined).toLong,
      steps.count(_._2.isDefined).toLong,
      steps.count(_._3.isDefined).toLong)
    val r = LogOps.funnel(spark, sfDir).collect().head
    assert(r.getLong(0) == nV && r.getLong(1) == nC && r.getLong(2) == nP)
    assert(r.getLong(3) == nC * 1000000L / nV)
    assert(r.getLong(4) == nP * 1000000L / nC)
    // Monotone funnel — each step is a subset of the previous.
    assert(nV >= nC && nC >= nP && nP > 0)
  }

  test("q121 transition matrix matches an ordered brute force, ppm floors exact") {
    val withIds = graft.core.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("user_id", "ts_ns", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = withIds.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.tail)
    }.toSeq
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val srcTotals = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }

    val out = LogOps.transitionMatrix(spark, sfDir).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == counts.keySet)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == counts(key), s"$key n")
      assert(r.getLong(3) == counts(key) * 1000000L / srcTotals(key._1), s"$key ppm")
    }
    // Floor-division law: per-src ppm sums land within |dst| of 1e6.
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val total = rows.map(_.getLong(3)).sum
      assert(total <= 1000000L && total > 1000000L - rows.length, s"$src ppm sum")
    }
    // Total transitions = sum over users of (events - 1).
    val nTrans = withIds.groupBy(_._1).values.map(_.length - 1).sum.toLong
    assert(out.map(_.getLong(2)).sum == nTrans)
  }

  test("q132 gap quantiles are the exact rank values of a brute-force sort") {
    val withIds = graft.core.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("user_id", "ts_ns", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = withIds.groupBy(e => (e._1, e._4)).values.flatMap { es =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      ts.zip(ts.tail).map { case (a, b) =>
        es.head._4 -> Math.floorDiv(b - a, 1000000L)
      }
    }.toSeq.groupBy(_._1).map { case (t, gs) =>
      val sorted = gs.map(_._2).sorted
      val n = sorted.length.toLong
      val med = sorted(((n + 1) / 2 - 1).toInt)
      val p90 = sorted(((9 * n + 9) / 10 - 1).toInt)
      t -> ((n, med, p90))
    }

    val out = LogOps.gapQuantiles(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (n, med, p90) = expected(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n_gaps")
      assert(r.getLong(2) == med, s"${r.getString(0)} median")
      assert(r.getLong(3) == p90, s"${r.getString(0)} p90")
      assert(r.getLong(2) <= r.getLong(3), "median <= p90")
    }
  }
}
