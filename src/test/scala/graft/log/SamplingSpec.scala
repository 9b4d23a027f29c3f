package graft.log

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Sampling surface spec (SA2/SA3/W6 native APIs — the portable
  * hash-based forms are oracle-checked as q41/q42).
  */
class SamplingSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val df = {
    import spark.implicits._
    (1 to 500).map(i => (s"blk_$i", i % 5)).toDF("block_id", "label_index")
  }

  test("SA2: seeded uniform sample is reproducible and near the fraction") {
    val a = df.sample(withReplacement = false, 0.2, 42L)
    val b = df.sample(withReplacement = false, 0.2, 42L)
    a.count() shouldBe b.count()
    a.count().toDouble shouldBe (100.0 +- 40.0)
    a.exceptAll(b).count() shouldBe 0
  }

  test("SA3: stratified 60/20/20 split partitions the table disjointly") {
    val (train, valid, test) =
      Features.stratifiedSplit3(df, "label_index", "block_id", 42L)
    val (nTr, nVa, nTe) = (train.count(), valid.count(), test.count())
    nTr + nVa + nTe shouldBe 500
    nTe.toDouble shouldBe (100.0 +- 40.0)
    nVa.toDouble shouldBe (100.0 +- 40.0)
    train.join(valid, Seq("block_id")).count() shouldBe 0
    train.join(test, Seq("block_id")).count() shouldBe 0
    valid.join(test, Seq("block_id")).count() shouldBe 0
    // Stratification: every label present in every split.
    Seq(train, valid, test).foreach(
      _.select("label_index").distinct().count() shouldBe 5)
  }

  test("SA3 (exact form): hashSplit3 cuts 60/20/20 per stratum, disjoint-exhaustive, deterministic") {
    import org.apache.spark.sql.functions.col
    val split = Features.hashSplit3(df, "label_index", "block_id", "s3")
    // Every input row gets exactly one split label (the column is
    // total by construction — no anti-joins to disagree).
    split.count() shouldBe 500
    split.columns.toSeq shouldBe (df.columns.toSeq :+ "split")
    // Exact floor-arithmetic sizes inside EVERY stratum: 100 rows →
    // 60/20/20 exactly, not approximately.
    val sizes = split.groupBy("label_index", "split").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    (0 until 5).foreach { l =>
      withClue(s"stratum $l: ") {
        sizes((l, "train")) shouldBe 60L
        sizes((l, "valid")) shouldBe 20L
        sizes((l, "test")) shouldBe 20L
      }
    }
    // Deterministic: re-evaluation assigns every key identically.
    val again = Features.hashSplit3(df, "label_index", "block_id", "s3")
    split.join(again.withColumnRenamed("split", "split2"), Seq("block_id"))
      .filter(col("split") =!= col("split2")).count() shouldBe 0L
    // A different salt deals a different hand (same sizes).
    val other = Features.hashSplit3(df, "label_index", "block_id", "s4")
    split.join(other.withColumnRenamed("split", "split2"), Seq("block_id"))
      .filter(col("split") =!= col("split2")).count() should be > 0L
  }

  test("SA1 (exact form): hashStratifiedSample takes floor(f*n) per stratum, deterministically") {
    val sampled = Features.hashStratifiedSample(df, "label_index", "block_id", 0.2, "t")
    // 500 rows, 5 strata of 100 → exactly 20 per stratum.
    sampled.groupBy("label_index").count()
      .collect().foreach(_.getLong(1) shouldBe 20L)
    // Deterministic: a second evaluation is the identical row set.
    val again = Features.hashStratifiedSample(df, "label_index", "block_id", 0.2, "t")
    sampled.exceptAll(again).count() shouldBe 0
    again.exceptAll(sampled).count() shouldBe 0
    // A subset of the input, schema preserved.
    sampled.columns shouldBe df.columns
    sampled.exceptAll(df).count() shouldBe 0
    // A different salt draws a different sample (same sizes).
    val other = Features.hashStratifiedSample(df, "label_index", "block_id", 0.2, "u")
    other.count() shouldBe 100
    sampled.exceptAll(other).count() should be > 0L
  }

  test("SA1 (exact form): floor(f*n) holds per stratum for ragged stratum sizes") {
    import spark.implicits._
    // Strata sized to exercise the floor boundary: 0.3*7=2.1→2,
    // 0.3*10=3 exactly, 0.3*13=3.9→3, 0.3*1=0.3→0 (empty stratum out).
    val sizes = Map("a" -> 7, "b" -> 10, "c" -> 13, "d" -> 1)
    val ragged = sizes.toSeq.flatMap { case (s, n) =>
      (1 to n).map(i => (s"$s-$i", s))
    }.toDF("k", "stratum")
    val got = Features.hashStratifiedSample(ragged, "stratum", "k", 0.3, "r")
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 2L, "b" -> 3L, "c" -> 3L)
  }

  test("SA1 general form: hashStratifiedTake matches a JVM brute-force reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.PortableHash
    // Randomized ragged strata and quotas (some above stratum size →
    // take-all). The expected set is computed OUTSIDE Spark with the
    // JVM kernel — so this also pins PortableHash.hash60 ==
    // PortableHash.keyedHash60's Column formula, the scaladoc's
    // portability contract, on arbitrary keys.
    val rng = new scala.util.Random(11)
    val strata = ('a' to 'f').map(_.toString)
    val rows = strata.flatMap { st =>
      (1 to (rng.nextInt(40) + 1)).map(i => (s"$st#$i", st))
    }
    val quotas = strata.map(st => st -> rng.nextInt(50)).toMap
    val joined = rows.toDF("k", "stratum")
      .join(broadcast(quotas.toSeq.toDF("stratum", "q")), Seq("stratum"))
    val got = Features.hashStratifiedTake(joined, "stratum", "k", col("q"), "bf")
      .select("k").as[String].collect().toSet
    val expected = rows.groupBy(_._2).flatMap { case (st, ms) =>
      ms.map(_._1)
        .sortBy(k => (PortableHash.hash60(UTF8String.fromString("bf" + k)), k))
        .take(quotas(st))
    }.toSet
    got shouldBe expected
  }

  test("SA1 general form: caller columns named like the scratch columns survive untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A caller that legitimately owns __graft_quota/__graft_rn (or the
    // historical __quota/__rn) must get them back unmodified — the
    // operator's scratch names are collision-checked, not clobbered.
    val d = (1 to 10)
      .map(i => (s"k$i", "s", i * 100, i * 7, i))
      .toDF("k", "stratum", "__graft_quota", "__graft_rn", "__quota")
    val out = Features.hashStratifiedTake(d, "stratum", "k", lit(4), "c")
    out.columns.toSeq shouldBe d.columns.toSeq
    out.count() shouldBe 4L
    // Caller values intact on the surviving rows (k_i carries i).
    out.select("k", "__graft_quota", "__graft_rn", "__quota").collect().foreach { r =>
      val i = r.getString(0).drop(1).toInt
      r.getInt(1) shouldBe i * 100
      r.getInt(2) shouldBe i * 7
      r.getInt(3) shouldBe i
    }
  }

  test("q77 guard: non-srcN and overflow sources yield NULL quota, no ANSI cast error") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q77").toString
    // 'raw_src7' pins the ANCHORED contract (an unanchored extract
    // would hand it quota 40); 'src99999999999' pins try_cast (ANSI
    // cast("int") threw CAST_OVERFLOW here before r8).
    val docs = Seq(
      (1L, "src1"), (2L, "src1"), (3L, "src1"),
      (4L, "raw_src7"), (5L, "src99999999999"))
      .toDF("doc_id", "source")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.Extras.mixtureSample(spark, tmp)
      .select("doc_id").as[Long].collect().toSet
    got shouldBe Set(1L, 2L, 3L)
  }

  test("W6: rand(seed) pick returns one reproducible row") {
    import org.apache.spark.sql.functions._
    val p1 = df.orderBy(rand(7L), col("block_id")).limit(1).head().getString(0)
    val p2 = df.orderBy(rand(7L), col("block_id")).limit(1).head().getString(0)
    p1 shouldBe p2
  }

  test("q110: bounded top-k aggregate equals the window row_number form exactly") {
    // The 100 TB claim is that the TopKAggregator form is a plan-shape
    // optimization ONLY — same rows, same ranks, same hashes as the
    // window form the oracle runs. Assert exact frame equality in
    // Spark itself, independent of DuckDB.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sfDir001 = sfDir
    val agg = graft.queries.Extras.groupReservoir(spark, sfDir001)
    val h = graft.functions.PortableHash
      .keyedHash60(col("doc_id"), "res") % 1000000000000L
    val win = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val windowed = graft.core.Tables.documents(spark, sfDir001)
      .select(col("source"), col("lang"), col("doc_id"), h.as("h"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= graft.queries.Extras.ReservoirK)
      .select("source", "lang", "rank", "doc_id", "h")
    agg.exceptAll(windowed).count() shouldBe 0
    windowed.exceptAll(agg).count() shouldBe 0
    agg.count() should be > 0L
    // Every stratum is represented with at most k exemplars.
    val perGroup = agg.groupBy("source", "lang").count().collect()
    perGroup.foreach(r => r.getLong(2) should be <= graft.queries.Extras.ReservoirK.toLong)
  }
}
