package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Determinism sweep over the WHOLE driver surface: every registered
  * query must produce byte-identical row sets when re-executed, and
  * when re-executed under a different shuffle parallelism. This is
  * the property the driver's hash compare silently assumes — one
  * unordered collect_list, unseeded rand, or partition-order-
  * sensitive aggregate anywhere in the 60 queries would pass today's
  * gate and flake tomorrow's. Rows are canonicalized by sorting their
  * string forms, NOT by trusting output order (orderBy ties are
  * allowed to land differently; the driver sorts too).
  */
class DeterminismSpec extends AnyFunSuite with SparkFixture {

  private def canonical(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("every registered query is rerun-deterministic, across parallelism") {
    val partKey = "spark.sql.shuffle.partitions"
    val original = spark.conf.get(partKey)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val first = canonical(fn(spark, sfDir))
      val again = canonical(fn(spark, sfDir))
      assert(first == again, s"$name differs on rerun")
      spark.conf.set(partKey, "7")
      try {
        val reshaped = canonical(fn(spark, sfDir))
        assert(first == reshaped, s"$name differs under 7 shuffle partitions")
      } finally spark.conf.set(partKey, original)
    }
  }
}
