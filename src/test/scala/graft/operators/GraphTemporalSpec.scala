package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Specs for the graph (connected components) and temporal (as-of
  * join) operators — synthetic fixtures with known answers, covering
  * the shapes the oracle queries can't isolate: long chains, isolated
  * pairs, equal timestamps, and keys with no match. */
class GraphTemporalSpec extends AnyFunSuite with SparkFixture {

  test("connected components: chain + pair + star converge to min labels") {
    import spark.implicits._
    // Component A: chain 1-2-3-4-5 (diameter 4 forces >1 iteration).
    // Component B: pair 10-11. Component C: star 20-{21,22,23}.
    val edges = Seq(
      (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (11L, 10L),
      (21L, 20L), (22L, 20L), (23L, 20L)
    ).toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    assert(got === want)
  }

  test("connected components: empty edge set yields empty labels") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(edges).count() === 0L)
  }

  test("as-of join: latest at-or-before per key, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"), // key 1: right rows at 50, 100 -> matches 100 (inclusive)
      (1L, 99L, "e2"),  // -> matches 50
      (1L, 10L, "e3"),  // before all right rows -> NULL
      (2L, 500L, "e4"), // key 2: right row at 400 -> matches 400
      (3L, 7L, "e5")    // key 3: no right rows at all -> NULL
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 50L, "r50"), (1L, 100L, "r100"), (1L, 150L, "r150"),
      (2L, 400L, "r400")
    ).toDF("k", "rt", "payload")
    val got = AsOfJoin.asof(left, right, "k", "k", "t", "rt",
        payload = Seq("payload", "rt"))
      .collect()
      .map(r => r.getString(2) -> (Option(r.get(3)), Option(r.get(4))))
      .toMap
    val want = Map(
      "e1" -> (Some("r100"), Some(100L)),
      "e2" -> (Some("r50"), Some(50L)),
      "e3" -> (None, None),
      "e4" -> (Some("r400"), Some(400L)),
      "e5" -> (None, None))
    assert(got === want)
  }

  test("range join equals the naive inequality join, without its plan") {
    import spark.implicits._
    val points = Seq(
      (1L, 5L, "p1"), (1L, 100L, "p2"), (1L, 250L, "p3"),
      (2L, 50L, "p4"), (3L, 1L, "p5")
    ).toDF("k", "t", "tag")
    val intervals = Seq(
      (1L, 0L, 10L, "i1"),      // contains p1
      (1L, 90L, 300L, "i2"),    // contains p2 and p3 (spans 3+ buckets at width 100)
      (1L, 100L, 101L, "i3"),   // ALSO contains p2 (overlapping intervals both match)
      (2L, 60L, 70L, "i4"),     // contains nothing (p4 before it)
      (2L, 40L, 40L, "i5")      // empty interval: dropped
    ).toDF("ik", "lo", "hi", "iname")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "ik",
      "t", "lo", "hi", bucketWidth = 100L)
    val want = points.join(intervals,
      col("k") === col("ik") && col("t") >= col("lo") && col("t") < col("hi"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty)
    assert(want.exceptAll(got).isEmpty)
    assert(got.collect().map(r => (r.getString(2), r.getString(6))).toSet ===
      Set(("p1", "i1"), ("p2", "i2"), ("p2", "i3"), ("p3", "i2")))
    // The bucketized form must plan as an equi-join, the naive form as
    // a nested loop — that contrast IS the operator's reason to exist.
    val gotPlan = got.queryExecution.executedPlan.toString
    assert(!gotPlan.contains("BroadcastNestedLoopJoin") && !gotPlan.contains("CartesianProduct"),
      s"bucketized range join must be an equi-join:\n$gotPlan")
  }

  test("as-of join: NULL keys never match (join-equality semantics)") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), 100L, "normal"),
      (Option.empty[Long], 100L, "null-key")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), 50L, "r1"),
      (Option.empty[Long], 50L, "rnull")
    ).toDF("k", "rt", "payload")
    val got = AsOfJoin.asof(left, right, "k", "k", "t", "rt", Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got === Map("normal" -> Some("r1"), "null-key" -> None))
  }

  test("range join works when both frames share column names") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("k", "t")
    // Interval frame deliberately reuses the names "k" and "t".
    val intervals = Seq((1L, 0L, 10L, 99L)).toDF("k", "lo", "hi", "t")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "k",
      "t", "lo", "hi", bucketWidth = 100L)
    assert(got.count() === 1L)
  }

  test("as-of join plan: one shuffle on the key, no join explosion") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1")).toDF("k", "t", "tag")
    val right = Seq((1L, 50L, "r")).toDF("k", "rt", "payload")
    val plan = AsOfJoin.asof(left, right, "k", "k", "t", "rt", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected the running window:\n$plan")
  }
}
