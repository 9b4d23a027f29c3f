package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The Bloom membership kernel's contract (q94's foundation):
  * one-sided error — NO false negatives ever (structural theorem),
  * false positives bounded by the configured fpp — plus determinism
  * (rerun-stable bits) and null totality. */
class BloomSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def buildOver(n: Int, fpp: Double): Array[Byte] = {
    val s = SparkFixture.session
    import s.implicits._
    Bloom.buildLong((0 until n).map(i => i.toLong * 7919L).toDF("v"), "v", n.toLong, fpp)
  }

  test("no false negatives: every inserted value probes true") {
    val s = SparkFixture.session
    import s.implicits._
    val bits = buildOver(10000, 1e-4)
    val misses = (0 until 10000).map(i => i.toLong * 7919L).toDF("v")
      .filter(!call_function("graft_bloom_contains", lit(bits), col("v")))
      .count()
    misses shouldBe 0L
  }

  test("false positives stay near the configured fpp") {
    val s = SparkFixture.session
    import s.implicits._
    val bits = buildOver(10000, 1e-4)
    // Probe 100k values disjoint from the inserted set (odd multiples
    // offset by 1 never collide with multiples of 7919).
    val fp = (0 until 100000).map(i => i.toLong * 7919L + 1L).toDF("v")
      .filter(call_function("graft_bloom_contains", lit(bits), col("v")))
      .count()
    // Expected 10 at fpp=1e-4 (Poisson sd ≈ √10 ≈ 3.2); 100 is ~28σ out.
    fp.toDouble should be < 100.0
  }

  test("bits are deterministic across builds (rerun-stable probes)") {
    buildOver(1000, 1e-4).toSeq shouldBe buildOver(1000, 1e-4).toSeq
  }

  test("mutation control: corrupting the bit array breaks inserted-value probes") {
    // Non-vacuity of q94's no_false_negatives certificate: the probe
    // must actually read the bits. Zeroing a stretch of the serialized
    // filter's bit array must make at least one inserted value probe
    // false — if this spec ever passes with an intact filter path that
    // ignores the bytes, the certificate is decorative.
    val s = SparkFixture.session
    import s.implicits._
    val bits = buildOver(10000, 1e-4)
    val corrupted = bits.clone()
    // Leave the header (version/hash-count/word-count ints) intact and
    // zero a 64-byte stretch of the bit data further in.
    val from = math.max(16, corrupted.length / 2)
    (from until math.min(from + 64, corrupted.length))
      .foreach(i => corrupted(i) = 0)
    val misses = (0 until 10000).map(i => i.toLong * 7919L).toDF("v")
      .filter(!call_function("graft_bloom_contains", lit(corrupted), col("v")))
      .count()
    misses should be > 0L
  }

  test("null value probes NULL; null bits probe NULL") {
    val s = SparkFixture.session
    import s.implicits._
    val bits = buildOver(100, 1e-4)
    val row = Seq((Option.empty[Long], 1L)).toDF("nv", "v")
      .select(
        call_function("graft_bloom_contains", lit(bits), col("nv")).as("a"),
        call_function("graft_bloom_contains",
          lit(null).cast("binary"), col("v")).as("b"))
      .head()
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
  }
}
