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
