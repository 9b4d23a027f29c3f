package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** q91's 3σ integer identity beyond the Long domain (ADVICE r9): the
  * z-score test `(n·x−Σx)² > 9·(n·Σx²−(Σx)²)` runs in DECIMAL(38,0),
  * so per-minute counts whose squares overflow Long (cnt ≥ ~3·10⁹)
  * must still score EXACTLY — the previous all-Long form silently
  * wrapped there (Spark non-ANSI), while DuckDB promoted, so the two
  * engines diverged differently. The spec feeds `anomalyScore` a
  * synthetic minute frame deep inside the Long-overflow region and
  * checks it against an independent BigInt re-derivation.
  */
class AnomalyOverflowSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("anomaly flags match a BigInt reference where cnt² overflows Long") {
    val base = 4000000000L // cnt² = 1.6e19 > Long.MaxValue
    val counts: IndexedSeq[(Long, Long)] = (0 until 80).map { i =>
      val jitter = (i.toLong * 2654435761L) % 1000L
      val cnt = if (i == 70) base + 10000000L else base + jitter
      (i.toLong * 60000L, cnt)
    }
    // Premise guard: this data really is in the wrap region.
    assert(counts.forall { case (_, c) => BigInt(c) * BigInt(c) > Long.MaxValue })

    // Independent reference in exact BigInt arithmetic.
    val expected = (60 until 80).filter { i =>
      val win = counts.slice(i - 60, i).map(c => BigInt(c._2))
      val sx = win.sum
      val sxx = win.map(x => x * x).sum
      val dev = BigInt(60) * BigInt(counts(i)._2) - sx
      dev * dev > BigInt(9) * (BigInt(60) * sxx - sx * sx)
    }.map(i => counts(i)._1).toSet

    import spark.implicits._
    val out = LogOps.anomalyScore(counts.toDF("minute_start_ms", "cnt"))
      .collect().map(_.getLong(0)).toSet

    out shouldBe expected
    expected should contain(70L * 60000L) // the planted outlier flags
  }

  test("anomaly flags match the BigInt reference on randomized sequences (property)") {
    // Three seeded regimes sweep the documented domain (per-minute
    // counts below ~10¹⁷): small counts (the fixtures' regime), the
    // Long-overflow edge (~3e9 where cnt² wraps), and deep overflow
    // (10¹⁵, where dev² needs ~34 decimal digits) — each with
    // occasional large spikes so both flag outcomes occur.
    import spark.implicits._
    for ((seed, base) <- Seq((1L, 100L), (2L, 3200000000L), (3L, 1000000000000000L))) {
      val rnd = new scala.util.Random(seed)
      val counts: IndexedSeq[(Long, Long)] = (0 until 90).map { i =>
        val jitter = math.abs(rnd.nextLong() % math.max(base / 100, 10L))
        val spike = if (rnd.nextInt(10) == 0) math.max(base / 5, 50L) else 0L
        (i.toLong * 60000L, base + jitter + spike)
      }
      val expected = (60 until 90).filter { i =>
        val win = counts.slice(i - 60, i).map(c => BigInt(c._2))
        val sx = win.sum
        val sxx = win.map(x => x * x).sum
        val dev = BigInt(60) * BigInt(counts(i)._2) - sx
        dev * dev > BigInt(9) * (BigInt(60) * sxx - sx * sx)
      }.map(i => counts(i)._1).toSet
      val out = LogOps.anomalyScore(counts.toDF("minute_start_ms", "cnt"))
        .collect().map(_.getLong(0)).toSet
      withClue(s"seed $seed base $base: ") { out shouldBe expected }
    }
  }
}
