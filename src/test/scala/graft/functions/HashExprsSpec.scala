package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.queries.{Dedup, Similarity, TextOps}

/** Bit-identity specs for the native hash/vector kernels against the
  * higher-order-function forms they replaced. The HOF forms are the
  * executable semantics spec (and what every DuckDB oracle was written
  * against), so equality here — on real sf0.001 data plus synthetic
  * edge rows — certifies the kernels can't drift the oracle.
  */
class HashExprsSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def embs: DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  private def assertSame(df: DataFrame): Unit = {
    val diff = df.filter(
      (col("a").isNull =!= col("b").isNull) ||
        (col("a").isNotNull && col("a") =!= col("b")))
    assert(diff.isEmpty, s"native vs HOF mismatch:\n${diff.limit(5).collect().mkString("\n")}")
  }

  test("graft_dot matches the zip_with/aggregate fold bit-for-bit") {
    // Disable the HOF->kernel rewrite so the reference side really
    // executes the fold (otherwise this comparison is vacuous).
    spark.conf.set(graft.plans.RewriteDotProduct.ConfKey, "false")
    try {
      val pairs = embs.as("x").crossJoin(embs.limit(3).select(col("v").as("qv")))
      assertSame(pairs.select(
        call_function("graft_dot", col("v"), col("qv")).as("a"),
        Similarity.dotHof(col("v"), col("qv")).as("b")))
    } finally spark.conf.unset(graft.plans.RewriteDotProduct.ConfKey)
  }

  test("optimizer rule rewrites the HOF dot-product idiom to the kernel") {
    val hof = embs.limit(10).select(
      Similarity.dotHof(col("v"), col("v")).as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rewrite must fire:\n$optimized")
    assert(!optimized.contains("aggregate("), s"fold must be gone:\n$optimized")
    // And with the kill switch, the fold survives.
    spark.conf.set(graft.plans.RewriteDotProduct.ConfKey, "false")
    try {
      val kept = embs.limit(10).select(Similarity.dotHof(col("v"), col("v")).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!kept.contains("graft_dot"), s"kill switch must hold:\n$kept")
      // Same numbers either way.
      val a = hof.collect().map(_.getDouble(0)).toSeq
      val b = embs.limit(10).select(Similarity.dotHof(col("v"), col("v")).as("d"))
        .collect().map(_.getDouble(0)).toSeq
      assert(a === b)
    } finally spark.conf.unset(graft.plans.RewriteDotProduct.ConfKey)
  }

  test("graft_dot: length mismatch and null element give NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)),
      (Seq(1.0, 2.0), Seq(3.0, 4.0))
    ).toDF("x", "y")
    val out = df.select(call_function("graft_dot", col("x"), col("y"))).collect()
    out(0).isNullAt(0) shouldBe true
    out(1).getDouble(0) shouldBe 11.0
  }

  test("graft_simhash matches the struct-fold bucket at 4 and 6 planes") {
    for (planes <- Seq(4, 6)) {
      assertSame(embs.select(
        call_function("graft_simhash", col("v"), lit(planes)).as("a"),
        Similarity.simhashBucketHof(col("v"), planes).as("b")))
    }
  }

  test("graft_token_hashes matches transform(conv(md5)) including unicode") {
    import spark.implicits._
    val words = docs.select(split(col("text"), " ").as("w"))
      .union(Seq(Seq("héllo", "日本語", "", "x"), Seq.empty[String]).toDF("w"))
    assertSame(words.select(
      call_function("graft_token_hashes", col("w"), lit(2147483647L)).as("a"),
      transform(col("w"), Dedup.tokenHash(_)).as("b")))
  }

  test("graft_fingerprint matches the rolling aggregate fold") {
    assertSame(docs.select(
      call_function("graft_fingerprint", split(col("text"), " "), lit(2147483647L)).as("a"),
      TextOps.fingerprintHof(col("text")).as("b")))
    // Single-token doc: fold over an empty slice returns the seed hash.
    import spark.implicits._
    val one = Seq("solo").toDF("text")
    assertSame(one.select(
      call_function("graft_fingerprint", split(col("text"), " "), lit(2147483647L)).as("a"),
      TextOps.fingerprintHof(col("text")).as("b")))
  }

  test("graft_extract_long matches try_cast(regexp_extract) exactly") {
    import spark.implicits._
    val edge = Seq(
      """{"k": 42, "x": 1}""",          // normal
      """{"x": 1}""",                   // no key
      """{"k": , "k": 7}""",            // first occurrence digit-less -> later one
      """{"k": 99999999999999999999}""", // overflow -> NULL (cast fails)
      """{"k": 0042}""",                // leading zeros
      """k": 5""",                      // truncated
      "",                               // empty
      """{"k": 3""").toDF("props")      // digits at end of string
    val all = spark.read.parquet(s"$sfDir/events.parquet").select("props")
      .union(edge)
    val diff = all.select(
        call_function("graft_extract_long", col("props"), lit("\"k\": ")).as("a"),
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT)").as("b"))
      .filter((col("a").isNull =!= col("b").isNull) ||
        (col("a").isNotNull && col("a") =!= col("b")))
    assert(diff.isEmpty, s"mismatch:\n${diff.limit(5).collect().mkString("\n")}")
  }

  test("graft_tri_grams matches the sequence/transform/distinct form") {
    import spark.implicits._
    val words = docs.select(split(col("text"), " ").as("w"))
      .union(Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "a", "a", "a"))
        .toDF("w"))
    assertSame(words.select(
      call_function("graft_tri_grams", col("w")).as("a"),
      Dedup.hashedTriGramsHof(col("w")).as("b")))
  }
}
