package graft.queries

import org.apache.spark.sql.functions.{call_function, col, encode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The media-grain perceptual-hash dedup (q153, r14 verdict #4): the
  * oracle certifies the full chain against DuckDB; this spec pins what
  * the oracle can't see — the kernel against a pure-Scala replica on
  * adversarial payloads, the bounded-perturbation property that makes
  * the Hamming radius meaningful, and planted byte-level near-dups
  * flowing through the real purge chain.
  */
class MediaPhashSpec extends AnyFunSuite with SparkFixture {

  /** Pure-Scala replica of the kernel contract (shares nothing with
    * the Expression). */
  private def refHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val sums = (0 until 64).map { b =>
      val from = (b.toLong * n / 64).toInt
      val to = ((b + 1).toLong * n / 64).toInt
      (from until to).map(i => (bytes(i) & 0xff).toLong).sum
    }
    (0 until 63).foldLeft(0L)((h, i) =>
      if (sums(i) > sums(i + 1)) h | (1L << i) else h)
  }

  private def synthBytes(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 17 + i * i % 251) % 256).toByte)

  test("graft_blockhash matches the pure-Scala replica on adversarial payloads") {
    import spark.implicits._
    val payloads: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray, Array[Byte](0), Array[Byte](-1),
        synthBytes(1, 63), synthBytes(2, 64), synthBytes(3, 65),
        synthBytes(4, 1000), synthBytes(5, 4096),
        Array.fill[Byte](200)(42)) ++
        (6 to 25).map(s => synthBytes(s, 37 + s * 13))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val out = df.select(col("id"),
        call_function("graft_blockhash", col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(out(i.toLong) == refHash(p), s"payload $i (${p.length} bytes)")
      assert(out(i.toLong) >= 0L, "hash must stay in 63 bits (non-negative)")
    }
  }

  test("a perturbation confined to one block flips at most 2 bits") {
    // The property the Hamming radius is calibrated on: one block sum
    // changing affects only its two adjacent comparisons.
    (0 until 20).foreach { s =>
      val n = 640 + s * 64 // block size ≥ 10 bytes
      val base = synthBytes(s, n)
      val h0 = refHash(base)
      val block = (s * 7) % 64
      val from = (block.toLong * n / 64).toInt
      val mutated = base.clone()
      mutated(from) = (mutated(from) ^ 0x7f).toByte
      val h1 = refHash(mutated)
      val hamming = java.lang.Long.bitCount(h0 ^ h1)
      assert(hamming <= 2, s"seed $s: one-block perturbation flipped $hamming bits")
    }
  }

  test("planted near-dups purge through the real chain; distinct payloads survive") {
    import spark.implicits._
    // Three families of byte-identical or one-block-perturbed texts
    // (ids 0-2, 10-12, 20-21) + distinct singletons (30, 31).
    def text(family: Int, variant: Int): String = {
      // Distinct families get distinct lengths AND distinct byte
      // distributions (the quadratic term breaks cross-family
      // periodicity that a cyclic pattern would alias into similar
      // block sums).
      val base = (0 until 400 + family * 57).map(i =>
        ('a' + ((family * 131 + i * 7 + (i * i * family) % 97) % 26)).toChar)
        .mkString
      if (variant == 0) base
      else base.updated(variant * 3, ('z' - variant).toChar) // ≤ few bytes
    }
    val docs = Seq(
      (0L, text(1, 0)), (1L, text(1, 1)), (2L, text(1, 2)),
      (10L, text(2, 0)), (11L, text(2, 1)), (12L, text(2, 2)),
      (20L, text(3, 0)), (21L, text(3, 0)),
      (30L, text(4, 0)), (31L, text(5, 0))).toDF("doc_id", "text")
    val dig = TextOps.mediaDigestsOf(docs)
    val purge = TextOps.mediaPhashDedupOf(dig).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purged = purge.map(_._1).toSet
    // Every non-minimal family member purges to its family's keeper.
    assert(purge.toSet == Set(
      (1L, 0L, 0L), (2L, 0L, 0L),
      (11L, 10L, 10L), (12L, 10L, 10L),
      (21L, 20L, 20L)), s"unexpected purge set: ${purge.mkString(", ")}")
    assert(!purged.contains(30L) && !purged.contains(31L),
      "distinct payloads must survive")
    // Hamming sanity: within-family distance is small, cross-family large.
    val hashes = dig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hashes(0L) ^ hashes(1L)) <=
      TextOps.PhashMaxHamming)
    assert(java.lang.Long.bitCount(hashes(30L) ^ hashes(31L)) >
      TextOps.PhashMaxHamming)
  }

  test("the PGM container codec round-trips and refuses malformed payloads (r15 #4)") {
    import graft.multimodal.Media
    // encode ∘ decode = identity on the plane — the property that
    // lets the oracle model decoded bytes as content bytes.
    Seq(Array.emptyByteArray, Array[Byte](0), Array[Byte](-128, 127, 0, 42),
        ("P5 5 1 255\n" + "x" * 9).getBytes("US-ASCII") // payload containing a header-lookalike
    ).foreach { plane =>
      val img = Media.decodePgm(Media.pgmPayload(plane))
      assert(img.width == plane.length && img.height == 1)
      assert(img.pixels.toSeq == plane.toSeq)
    }
    // A real multi-row raster with multi-whitespace header parses too.
    val raster = Media.decodePgm(
      "P5\n 3\t2  255\n".getBytes("US-ASCII") ++ Array.tabulate(6)(_.toByte))
    assert(raster.width == 3 && raster.height == 2 &&
      raster.pixels.length == 6)
    // Malformed containers refuse loudly instead of digesting garbage.
    def refuses(bytes: Array[Byte], why: String): Unit = {
      val ex = intercept[IllegalArgumentException](Media.decodePgm(bytes))
      assert(ex.getMessage.contains(why), s"$why: got ${ex.getMessage}")
    }
    refuses("P6 1 1 255\nx".getBytes, "magic")
    refuses("P5 1 1".getBytes, "truncated header")
    refuses("P5 a 1 255\nx".getBytes, "non-numeric")
    refuses("P5 1 1 70000\nx".getBytes, "maxval")
    refuses("P5 4 1 255\nxy".getBytes, "truncated pixel plane")
  }

  test("the incremental probe finds planted cross-boundary near-dups only") {
    import spark.implicits._
    // Standing digests + a batch whose first payload is a near-dup of
    // a standing one, second is distinct, third near-dups ANOTHER
    // BATCH member only (must NOT pair — within-batch is out of scope).
    def text(family: Int, variant: Int): String = {
      val base = (0 until 400).map(i =>
        ('a' + ((family * 131 + i * 7 + (i * i * family) % 97) % 26)).toChar)
        .mkString
      if (variant == 0) base else base.updated(variant * 3, 'Z')
    }
    val standing = TextOps.mediaDigestsOf(
      Seq((1L, text(1, 0)), (2L, text(2, 0))).toDF("doc_id", "text"))
    val batch = TextOps.mediaDigestsOf(
      Seq((101L, text(1, 1)), (102L, text(3, 0)), (103L, text(3, 1)))
        .toDF("doc_id", "text"))
    val out = TextOps.mediaIncrementOf(batch, standing).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((101L, 1L)),
      s"expected only the planted cross pair, got ${out.mkString(", ")}")
    // The q188 verdict form: best match per new payload — on this
    // plant, exactly the one pair, and in general the (hamming ASC,
    // dup_of ASC)-minimal row of the pair list per media_id.
    val verdict = TextOps.mediaIncrementVerdictOf(batch, standing).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(verdict.toSeq == Seq((101L, 1L)),
      s"verdict must be the best pair per payload, got ${verdict.mkString(", ")}")
  }

  test("the verdict form is the per-payload minimum of the pair list") {
    import spark.implicits._
    // Denser plant: several standing near-dups per new payload with
    // DIFFERENT Hamming distances — the verdict must pick the
    // (hamming ASC, dup_of ASC) minimum of exactly the pair rows.
    val base = 0x0123456789ABCDL
    val standing = Seq(
      (1L, base), (2L, base ^ 0x3L), (3L, base ^ 0xFFL), (4L, base ^ 0x1L))
      .toDF("media_id", "phash")
    val batch = Seq((101L, base)).toDF("media_id", "phash")
    val pairs = TextOps.mediaIncrementOf(batch, standing).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pairs.groupBy(_._1).map { case (id, ps) =>
      val best = ps.map(p => (p._3, p._2)).min
      (id, best._2, best._1)
    }.toSeq.sortBy(_._1)
    val verdict = TextOps.mediaIncrementVerdictOf(batch, standing).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(verdict == want, s"verdict $verdict != min-of-pairs $want")
    assert(verdict == Seq((101L, 1L, 0L)),
      "the exact-match standing payload (hamming 0, smallest id) must win")
  }

  test("the Hamming gate sits BELOW the dedup exchange in both candidate stages (r17 #2)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join}
    // The 4×16-bit banding's collision floor must cost map-side
    // popcounts only: in the OPTIMIZED plan the bit_count filter has
    // to be a descendant of every distinct (Aggregate), so no
    // ungated collision pair ever reaches a shuffle. Checked
    // structurally — the gate is written before the distinct and
    // must not depend on a pushdown rule firing.
    val dig = (0 until 64).map(i => (i.toLong, (i * 2654435761L) & Long.MaxValue))
      .toDF("media_id", "phash")
    Seq(
      TextOps.mediaPhashEdges(dig),
      TextOps.mediaIncrementOf(dig.filter($"media_id" < 8), dig.filter($"media_id" >= 8)),
      TextOps.mediaIncrementVerdictOf(dig.filter($"media_id" < 8), dig.filter($"media_id" >= 8))
    ).zip(Seq("edges", "increment", "verdict")).foreach { case (df, which) =>
      val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      assert(aggs.nonEmpty, s"$which: expected a distinct Aggregate in the plan")
      aggs.foreach { a =>
        // The optimizer may fold the gate into the join condition
        // itself (strictly better: evaluated as pairs are produced);
        // either placement keeps ungated collisions out of the
        // exchange.
        assert(a.find {
          case f: Filter => f.condition.toString.contains("bit_count")
          case j: Join => j.condition.exists(_.toString.contains("bit_count"))
          case _ => false
        }.isDefined, s"$which: the Hamming gate must sit below the distinct")
      }
    }
  }

  test("the Hamming gate precedes every pair-level EXCHANGE on all media paths (r18 #4)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // PHYSICAL-plan complement of the logical pin above: no shuffle
    // may move ungated collision pairs. Every ShuffleExchangeExec
    // whose subtree produces pairs (contains the banding join) must
    // have the popcount gate below it — as a FilterExec or folded
    // into the join condition. Exchanges BELOW the join (the edge
    // path's band-row repartition, O(n) digest rows) are exempt:
    // they move band rows, not pairs. Pinned on the EXECUTED plan's
    // initial tree (exchanges only exist after EnsureRequirements);
    // inputs repartitioned so the test-scale plan carries the same
    // exchanges a multi-partition production input does.
    // Round-robin repartition: hash-partitioning by media_id would
    // legitimately let the distinct skip its exchange (rows already
    // clustered by src), leaving nothing to pin.
    val dig = (0 until 64).map(i => (i.toLong, (i * 2654435761L) & Long.MaxValue))
      .toDF("media_id", "phash").repartition(3)
    def gatedBelow(p: SparkPlan): Boolean = p.collectFirst {
      case f: FilterExec if f.condition.toString.contains("bit_count") => f
      case j: BaseJoinExec
        if j.condition.exists(_.toString.contains("bit_count")) => j
    }.isDefined
    def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case o => o
      }
    Seq(
      TextOps.mediaPhashEdges(dig),
      TextOps.mediaIncrementOf(dig.filter($"media_id" < 8), dig.filter($"media_id" >= 8)),
      TextOps.mediaIncrementVerdictOf(dig.filter($"media_id" < 8), dig.filter($"media_id" >= 8))
    ).zip(Seq("edges", "increment", "verdict")).foreach { case (df, which) =>
      val plan = physical(df)
      val pairExchanges = plan.collect {
        case e: ShuffleExchangeExec
          if e.child.collectFirst { case j: BaseJoinExec => j }.isDefined => e
      }
      assert(pairExchanges.nonEmpty,
        s"$which: expected at least one pair-level exchange (distinct/agg)" +
          s"\n${plan.treeString}")
      pairExchanges.foreach(e =>
        assert(gatedBelow(e.child),
          s"$which: an exchange moves ungated collision pairs:\n${e.treeString}"))
    }
  }

  test("the banded recall bound is exactly as documented (ADVICE r15)") {
    import spark.implicits._
    // Synthetic digest rows drive the edge stage directly: the
    // 4×16-bit banding guarantees a candidate only when the pair's
    // flips leave ≥ 1 band intact. Pin BOTH sides of the bound:
    //  - ≤ 3 perturbed bands at Hamming 8 ⇒ pair FOUND;
    //  - all 4 bands perturbed at Hamming 8 (2 flips per band, the
    //    adversarial corner the doc concedes) ⇒ pair MISSED.
    val base = 0x0123456789ABCDL // 63-bit
    val threeBands = base ^ 0x00FF.toLong // 8 flips, band 0 only
    val fourBands = base ^
      ((3L << 0) | (3L << 16) | (3L << 32) | (3L << 48)) // 2 flips/band
    assert(java.lang.Long.bitCount(base ^ threeBands) == 8)
    assert(java.lang.Long.bitCount(base ^ fourBands) == 8)
    def edgesOf(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
      TextOps.mediaPhashEdges(rows.toDF("media_id", "phash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgesOf(Seq((1L, base), (2L, threeBands))) == Set((1L, 2L)),
      "≤3 perturbed bands within Hamming 8 must collide on an intact band")
    assert(edgesOf(Seq((1L, base), (2L, fourBands))).isEmpty,
      "all-4-band perturbation is the documented recall concession")
  }
}
