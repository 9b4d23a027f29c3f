package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Smoke contract for the bench's serving point-query latency section
  * (tools/ServingLatencyBench): it must build a compacted store, run
  * all four dashboard shapes, and emit well-formed JSON — so a
  * refactor of ServingStore or the serving queries cannot silently
  * break the bench artifact the round's perf claims cite.
  */
class ServingLatencySpec extends AnyFunSuite with SparkFixture {

  test("serving latency section runs end-to-end and reports all four queries") {
    val json = graft.tools.ServingLatencyBench
      .section(spark, sfDir, reps = 3, warm = 1)
    Seq("\"store_rows\":", "\"poll_budget_ms\":", "\"within_budget\":",
      "\"q1_latest\"", "\"q2_by_user\"", "\"q5_threshold\"", "\"q8_facet\"",
      "\"p50_ms\"", "\"p95_ms\"").foreach { key =>
      assert(json.contains(key), s"missing $key in: $json")
    }
    // All four shapes are LIMIT-bounded; rows must be positive and
    // within each query's limit at the fixture SF.
    val rows = "\"rows\":(\\d+)".r.findAllMatchIn(json).map(_.group(1).toInt).toSeq
    assert(rows.size == 4)
    rows.foreach(r => assert(r > 0 && r <= 200, s"rows out of range: $r"))
    // p50 ordering sanity: every p95 >= its p50 (same sorted sample).
    val p50s = "\"p50_ms\":([0-9.]+)".r.findAllMatchIn(json).map(_.group(1).toDouble).toSeq
    val p95s = "\"p95_ms\":([0-9.]+)".r.findAllMatchIn(json).map(_.group(1).toDouble).toSeq
    p50s.zip(p95s).foreach { case (a, b) => assert(b >= a) }
  }
}
