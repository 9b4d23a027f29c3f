package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Unit-level checks for the curation operators that the sf-oracle
  * can't exercise: the synthetic corpus contains no PII-shaped spans,
  * so q68's email/IPv4 patterns only ever see digit runs there —
  * these fixtures prove the full mask set on realistic strings. Plus
  * the structural invariants (cap bound, funnel monotonicity) that a
  * value-hash match alone doesn't state explicitly.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkFixture {

  test("redactText masks emails, IPv4s and digit runs, most-specific first") {
    import spark.implicits._
    val rows = Seq(
      "contact alice.smith+x@example.org for access",
      "node 10.0.143.7 rebooted at 17:03",
      "order 123456 from bob@corp.io on 192.168.1.1",
      "no pii here at all").toDF("s")
      .select(PipelineOps.redactText(col("s")).as("r"))
      .as[String].collect().toSeq
    assert(rows == Seq(
      "contact <EMAIL> for access",
      "node <IP> rebooted at <NUM>:<NUM>",
      "order <NUM> from <EMAIL> on <IP>",
      "no pii here at all"))
  }

  test("IPv4 masking rejects invalid octets and digit-run-interior starts") {
    import spark.implicits._
    val rows = Seq(
      "999.999.999.999 is not an address",   // octets > 255: digit pass only
      "1234.5.6.7.8 build id",               // match can't START inside 1234
      "v2.251.1.10.77 semverish").toDF("s")  // tail 251.1.10.77 IS IP-shaped
      .select(PipelineOps.redactText(col("s")).as("r"))
      .as[String].collect().toSeq
    assert(rows == Seq(
      "<NUM>.<NUM>.<NUM>.<NUM> is not an address",
      "<NUM>.<IP> build id",
      "v<NUM>.<IP> semverish"))
  }

  test("redactText leaves no raw email/IP/digit span behind") {
    import spark.implicits._
    val leaked = Seq(
      "a@b.co 1.2.3.4 99 x@y.io 255.255.255.255 007")
      .toDF("s")
      .select(PipelineOps.redactText(col("s")).as("r"))
      .filter(col("r").rlike("[0-9]") || col("r").contains("@"))
      .count()
    assert(leaked == 0L)
  }

  test("domainCap keeps at most the cap per source and ranks densely") {
    val out = PipelineOps.domainCap(spark, sfDir).cache()
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) <= PipelineOps.DomainCap))
    // rk is 1..n dense within each source
    val bad = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"), min(col("rk")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      .count()
    assert(bad == 0L)
    out.unpersist()
  }

  test("curationChain funnel is monotone and consistent with its stages") {
    val rows = PipelineOps.curationChain(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, qual, canon) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(qual <= docs, s"quality>docs in $r")
      assert(canon <= qual, s"canonical>quality in $r")
    }
    // Total canonical docs across sources == distinct norm-hashes among
    // quality-passed docs (the dedup stage's own contract).
    val totalCanon = rows.map(_.getLong(3)).sum
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("h"),
        length(col("text")).cast("double").as("chars"),
        split(col("text"), " ").as("t"))
      .select(col("h"),
        size(col("t")).cast("double").as("n"),
        size(array_distinct(col("t"))).cast("double").as("nd"),
        col("chars"))
      .withColumn("score",
        floor(((col("nd") / col("n")) * 0.5 +
          least((col("chars") - (col("n") - 1)) / col("n") / 10.0, lit(1.0)) * 0.3 +
          least(col("n") / 100.0, lit(1.0)) * 0.2) * 1e6 + 0.5) / 1e6)
      .filter(col("score") >= PipelineOps.QualityMin)
      .select(col("h")).distinct().count()
    assert(totalCanon == docs)
  }

  test("q111 chunk decontamination matches a string-level brute force") {
    // Recompute contaminated chunks from raw strings (no hashing, no
    // Spark expressions): eval gram set = distinct word 5-grams of the
    // src0 docs; a training chunk is contaminated once per distinct
    // matching gram. Pins both the gram kernel's hash fidelity and the
    // chunk/gram composition.
    def grams5(text: String): Set[String] = {
      val w = text.split(" ", -1)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evalGrams = docs.filter(_._2 == PipelineOps.EvalSource)
      .flatMap(d => grams5(d._3)).toSet
    val size = PipelineOps.ChunkSize
    val stride = PipelineOps.ChunkStride
    val expected = (for {
      (id, src, text) <- docs if src != PipelineOps.EvalSource
      nChunks = if (text.length <= size) 1
        else 1 + (text.length - size + stride - 1) / stride
      idx <- 0 until nChunks
      chunk = text.substring(idx * stride,
        math.min(idx * stride + size, text.length))
      n = grams5(chunk).count(evalGrams)
      if n > 0
    } yield (id, idx.toLong) -> n.toLong).toMap
    val out = PipelineOps.chunkDecontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty, "fixture must exercise chunk-grain hits")
    assert(out == expected)
  }

  test("q127 plan is exact, feasible, mixture-true, and tight at the binder") {
    val avail = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("source", "size(split(text, ' ')) AS t").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = avail.keys.map(s => s -> (s.drop(3).toLong + 1)).toMap
    val den = w.values.sum
    val bStar = avail.keys.map(s => avail(s) * den / w(s)).min

    val out = PipelineOps.mixturePlanner(spark, sfDir).collect()
    assert(out.length == avail.size)
    out.foreach { r =>
      val s = r.getString(0)
      val take = bStar * w(s) / den
      assert(r.getLong(1) == w(s), s"$s w")
      assert(r.getLong(2) == avail(s), s"$s avail")
      assert(r.getLong(3) == take, s"$s take")
      assert(r.getLong(4) == take * 1000000L / avail(s), s"$s rate")
      assert(r.getBoolean(5) == (avail(s) * den / w(s) == bStar), s"$s binding")
      // Feasible: never asks a source for more than it has.
      assert(take <= avail(s))
    }
    // At least one source binds, and the binder is (near-)exhausted:
    // its take misses avail only by the floor-division remainder.
    val binders = out.filter(_.getBoolean(5))
    assert(binders.nonEmpty)
    binders.foreach { r =>
      val s = r.getString(0)
      assert(avail(s) - r.getLong(3) < den / w(s) + 1, s"$s not tight")
    }
    // Mixture-true: takes deviate from exact proportionality only by
    // floor rounding (cross-multiplied comparison, no floats).
    out.foreach { r =>
      val s = r.getString(0)
      assert((r.getLong(3) * den - bStar * w(s)).abs < den, s"$s mixture")
    }
  }
}
