package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.queries.{Dedup, Similarity, TextOps}

/** Property tests for the native kernels over GENERATED inputs —
  * arbitrary unicode tokens (including empty strings, surrogate-range
  * chars, whitespace) and arbitrary double vectors — asserting
  * bit-identity with the HOF reference forms. The fixed-row spec
  * (HashExprsSpec) pins known edge cases; this sweeps the space the
  * fixtures can't enumerate (multi-byte UTF-8 boundaries, signed-zero
  * and denormal doubles, token lists of every small length). */
class HashPropertiesSpec extends AnyFunSuite with SparkFixture {

  private def forAllSeeded[T](gen: Gen[T], trials: Int)(check: T => Unit): Unit =
    (0 until trials).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(7L + i)))
    }

  private val token: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(12)),
    Gen.listOfN(4, Gen.choose(0x20, 0x2FFF)).map(_.map(_.toChar).mkString),
    Gen.const(""),
    Gen.const(" "),
    Gen.const("日本語テスト"))

  private val tokenList: Gen[List[String]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, token))

  private def assertCol(rows: Seq[Seq[String]], native: org.apache.spark.sql.Column,
      ref: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    val df = rows.map(Tuple1(_)).toDF("w")
    val diff = df.select(native.as("a"), ref.as("b"))
      .filter((col("a").isNull =!= col("b").isNull) ||
        (col("a").isNotNull && col("a") =!= col("b")))
    assert(diff.isEmpty, s"mismatch:\n${diff.limit(3).collect().mkString("\n")}")
  }

  test("graft_inter_size == size(array_intersect) for arbitrary long sets") {
    import spark.implicits._
    // NOT distinct-ified (ADVICE r14): the kernel is a public SQL
    // function and must match size(array_intersect) — distinct common
    // elements — even when either side carries duplicates. A small
    // value range makes duplicate draws likely.
    val longList: Gen[List[Long]] =
      Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-25L, 25L)))
    val pairs = Seq.newBuilder[(Seq[Long], Seq[Long])]
    forAllSeeded(Gen.zip(longList, longList), 120)(p => pairs += p)
    // Skewed overlap cases the uniform generator rarely hits.
    pairs += ((Seq.empty, Seq(1L, 2L)))
    pairs += ((Seq(1L, 2L, 3L), Seq.empty))
    pairs += ((Seq(5L), Seq(5L)))
    // Duplicates on probe side, build side, and both (the r14 ADVICE
    // overcount shape: probe-side duplicates of a matching element).
    pairs += ((Seq(1L, 1L, 2L, 2L, 2L), Seq(2L)))
    pairs += ((Seq(3L), Seq(3L, 3L, 3L, 4L)))
    pairs += ((Seq(7L, 7L, 8L), Seq(8L, 8L, 7L, 7L, 9L)))
    val df = pairs.result().toDF("a", "b")
    val diff = df.select(
        call_function("graft_inter_size", col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("r"))
      .filter(col("n") =!= col("r"))
    assert(diff.isEmpty, s"mismatch:\n${diff.limit(3).collect().mkString("\n")}")
    // Null-element inputs surface as NULL (the broken-set contract).
    val withNull = Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L)))
      .toDF("a", "b")
      .select(call_function("graft_inter_size", col("a"), col("b")).as("n"))
    assert(withNull.filter(col("n").isNotNull).isEmpty)
  }

  test("token hashes == conv(md5) transform for arbitrary unicode tokens") {
    val batches = Seq.newBuilder[Seq[String]]
    forAllSeeded(tokenList, 60)(ws => batches += ws)
    assertCol(batches.result(),
      call_function("graft_token_hashes", col("w"), lit(2147483647L)),
      transform(col("w"), Dedup.tokenHash(_)))
  }

  test("fingerprint == rolling HOF fold for arbitrary token lists") {
    import spark.implicits._
    val batches = Seq.newBuilder[String]
    // fingerprintHof splits on spaces, so build texts from space-free
    // tokens (split semantics themselves are not under test here).
    forAllSeeded(tokenList.map(_.map(_.replace(" ", "_"))), 60) { ws =>
      if (ws.nonEmpty) batches += ws.mkString(" ")
    }
    val df = batches.result().map(Tuple1(_)).toDF("text")
    val diff = df.select(
        call_function("graft_fingerprint", split(col("text"), " "), lit(2147483647L)).as("a"),
        TextOps.fingerprintHof(col("text")).as("b"))
      .filter((col("a").isNull =!= col("b").isNull) ||
        (col("a").isNotNull && col("a") =!= col("b")))
    assert(diff.isEmpty, s"mismatch:\n${diff.limit(3).collect().mkString("\n")}")
  }

  test("tri-grams == sequence/transform/distinct for arbitrary word lists") {
    val batches = Seq.newBuilder[Seq[String]]
    forAllSeeded(tokenList, 60)(ws => batches += ws)
    assertCol(batches.result(),
      call_function("graft_tri_grams", col("w")),
      Dedup.hashedTriGramsHof(col("w")))
  }

  test("dot and simhash == HOF folds for arbitrary double vectors") {
    import spark.implicits._
    val special = Gen.oneOf(0.0, -0.0, 1e-320, -1e-320, 1e300, -1e300, 0.1, -0.1)
    val vec = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(special, Gen.choose(-1e6, 1e6))))
    val pairs = Seq.newBuilder[(Seq[Double], Seq[Double])]
    forAllSeeded(Gen.zip(vec, vec), 60)(p => pairs += (p._1 -> p._2))
    // Equal-length pairs for dot (unequal covered by the fixed spec).
    val df = pairs.result().map { case (a, b) =>
      val n = math.min(a.length, b.length)
      (a.take(n), b.take(n))
    }.toDF("x", "y")
    spark.conf.set(graft.plans.RewriteDotProduct.ConfKey, "false")
    try {
      val diff = df.select(
          call_function("graft_dot", col("x"), col("y")).as("a"),
          Similarity.dotHof(col("x"), col("y")).as("b"),
          call_function("graft_simhash", col("x"), lit(4)).as("c"),
          Similarity.simhashBucketHof(col("x"), 4).as("d"))
        .filter(
          (col("a").isNull =!= col("b").isNull) ||
            (col("a").isNotNull && col("a") =!= col("b")) ||
            (col("c").isNull =!= col("d").isNull) ||
            (col("c").isNotNull && col("c") =!= col("d")))
      assert(diff.isEmpty, s"mismatch:\n${diff.limit(3).collect().mkString("\n")}")
    } finally spark.conf.unset(graft.plans.RewriteDotProduct.ConfKey)
  }

  test("graft_ngrams(w, 3) == graft_tri_grams(w) for arbitrary token lists") {
    val batches = Seq.newBuilder[Seq[String]]
    forAllSeeded(tokenList, 60)(ws => batches += ws)
    assertCol(batches.result(),
      call_function("graft_ngrams", col("w"), lit(3)),
      call_function("graft_tri_grams", col("w")))
  }

  test("graft_ngrams == declarative window-hash form for n in 1..5") {
    import spark.implicits._
    val batches = Seq.newBuilder[Seq[String]]
    // Space-free tokens: the declarative reference below concat_ws's
    // with spaces, and distinct-gram semantics assume the separator
    // can't occur inside a token.
    forAllSeeded(tokenList.map(_.map(_.replace(" ", "_"))), 40)(ws => batches += ws)
    val df = batches.result().map(Tuple1(_)).toDF("w")
    for (n <- 1 to 5) {
      // Reference: hash60 over each window, array_distinct, with the
      // size-< n guard. (Fine at test scale; in a query this shape
      // re-evaluates `w`'s source per element — the kernel's reason.)
      val gram = (i: org.apache.spark.sql.Column) =>
        conv(substring(md5(concat_ws(" ",
          (0 until n).map(j => element_at(col("w"), i + lit(j))): _*)), 1, 15), 16, 10)
          .cast("long")
      val ref = when(size(col("w")) >= n,
        array_distinct(transform(sequence(lit(1), size(col("w")) - lit(n - 1)), gram)))
        .otherwise(array().cast("array<long>"))
      val diff = df.select(
          call_function("graft_ngrams", col("w"), lit(n)).as("a"), ref.as("b"))
        .filter((col("a").isNull =!= col("b").isNull) ||
          (col("a").isNotNull && col("a") =!= col("b")))
      assert(diff.isEmpty, s"n=$n mismatch:\n${diff.limit(3).collect().mkString("\n")}")
    }
  }

  test("graft_try_long == try_cast(s AS BIGINT) on adversarial + random strings") {
    import spark.implicits._
    // Adversarial fixtures: every shape where the exception-free parse
    // could plausibly diverge from the ANSI TRY cast.
    val fixed = Seq(
      "0", "-0", "+0", "42", "-42", "+42", " 42 ", "\t42\n", "042",
      "9223372036854775807", "9223372036854775808",   // Long.Max, Max+1
      "-9223372036854775808", "-9223372036854775809", // Long.Min, Min-1
      "99999999999999999999999999", "1.5", "-1.5", "1.", ".5", "5.",
      "1.0", "0.0", "1..2", "1.2.3", "1e3", "1E3", "0x1F", "1_000",
      "", " ", "  ", "+", "-", "+-1", "--1", "1-", "12abc", "abc12",
      "NaN", "Infinity", "null", " 5 ", " 5",
      "7", "{\"k\": 12, \"v\": \"x\"}", "[1,2,3]",
      "１２３" /* fullwidth digits */, "٤٢" /* arabic-indic */)
    val randomDigits = Gen.choose(1, 22).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val decorated = for {
      core <- randomDigits
      sign <- Gen.oneOf("", "+", "-")
      padL <- Gen.oneOf("", " ", "\t", " ")
      padR <- Gen.oneOf("", " ", "\n")
      dot <- Gen.oneOf("", ".", ".5")
    } yield padL + sign + core + dot + padR
    val arbitrary = Gen.oneOf(decorated, Gen.asciiPrintableStr.map(_.take(16)))
    val gend = Seq.newBuilder[String]
    forAllSeeded(arbitrary, 300)(s => gend += s)
    val df = (fixed ++ gend.result()).map(Tuple1(_)).toDF("s")
    val diff = df.select(col("s"),
        call_function("graft_try_long", col("s")).as("a"),
        expr("try_cast(s AS BIGINT)").as("b"))
      .filter((col("a").isNull =!= col("b").isNull) ||
        (col("a").isNotNull && col("a") =!= col("b")))
    assert(diff.isEmpty, s"mismatch:\n${diff.limit(5).collect().mkString("\n")}")
  }

  test("subword count == HOF greedy loop for arbitrary texts incl. astral chars") {
    import spark.implicits._
    // Space-joined fragments: vocab pieces (full and truncated), random
    // ASCII words, supplementary-plane chars alone and embedded — the
    // shapes that distinguish code-point from UTF-16-unit stepping.
    // Lone-surrogate code points are excluded (UTF8String round-trips
    // them lossily for BOTH forms, proving nothing about the kernel).
    val fragment: Gen[String] = Gen.oneOf(
      Gen.oneOf("the", "tion", "ing", "ti", "t", "ingestion", "testing"),
      Gen.asciiPrintableStr.map(_.filter(_ != ' ').take(8)),
      Gen.const("😀"),
      Gen.const("a😀b"),
      Gen.const("ing😀tion"),
      Gen.listOfN(3, Gen.choose(0x1F300, 0x1F64F))
        .map(_.flatMap(Character.toChars(_).toSeq).mkString))
    val text: Gen[String] = Gen.choose(0, 10)
      .flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString(" "))
    val gend = Seq.newBuilder[String]
    forAllSeeded(text, 200)(s => gend += s)
    val vocabCsv = graft.queries.PipelineOps.SubwordVocab.mkString(",")
    val df = gend.result().map(Tuple1(_)).toDF("t")
    val diff = df.select(col("t"),
        call_function("graft_subwords", lower(col("t")), lit(vocabCsv)).as("a"),
        graft.queries.PipelineOps.docSubwordsHof(col("t")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, s"mismatch:\n${diff.limit(5).collect().mkString("\n")}")
  }
}
