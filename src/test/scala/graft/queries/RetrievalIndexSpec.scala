package graft.queries

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The materialized retrieval index (q144/q145): the oracle proves the
  * serve path reproduces q112's full corpus scan; this spec pins the
  * pieces the oracle can't see — the scoring against a pure-Scala BM25
  * sharing nothing with the Spark plan, the partition pruning actually
  * EXECUTED (selected-partition count), the merge's hard-link append
  * (standing files re-referenced by name), and serve-after-merge
  * parity with a rebuilt index.
  */
class RetrievalIndexSpec extends AnyFunSuite with SparkFixture {

  private val terms = TextOps.Bm25Terms
  private val (k1, b) = (1.2, 0.75)

  /** (doc_id, tokens) of the fixture corpus, plain Scala from here on. */
  private lazy val docs: Seq[(Long, Array[String])] =
    graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .toSeq

  /** Pure-Scala Okapi BM25 (rational idf) top-k over the corpus. */
  private lazy val expectedTopK: Seq[(Long, Long, Seq[Long], Double)] = {
    val n = docs.size.toLong
    val dls = docs.map { case (id, w) => id -> w.length.toLong }.toMap
    val tfs = docs.map { case (id, w) =>
      id -> terms.map(t => w.count(_ == t).toLong)
    }.toMap
    val dfs = terms.indices.map(i => docs.count(d => tfs(d._1)(i) > 0).toLong)
    val avgdl = dls.values.sum.toDouble / n
    docs.map { case (id, _) =>
      val dl = dls(id)
      val score = terms.indices.map { i =>
        val tf = tfs(id)(i).toDouble
        val idf = (n - dfs(i) + 0.5) / (dfs(i) + 0.5)
        idf * (tf * (k1 + 1)) /
          (tf + k1 * (1.0 - b + b * (dl / avgdl)))
      }.reduceLeft(_ + _)
      (id, dl, tfs(id), score)
    }.sortBy { case (id, _, _, s) => (-s, id) }
      .take(TextOps.Bm25K)
  }

  test("the driver-side bucket replica agrees with the Spark-side bucket column") {
    // bucketOf (driver, literal IN pruning) and the build's bucketCol
    // (Spark, partition layout) MUST agree on every term, or the serve
    // silently reads the wrong partitions and misses postings. Checked
    // over the fixture's real vocabulary plus adversarial strings.
    import spark.implicits._
    val vocab = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("explode(split(text, ' ')) AS term")
      .distinct().limit(2000).as[String].collect().toSeq
    val adversarial = Seq("", " ", "é", "\u0000x", "a" * 300, "naïve日本語")
    val terms = (vocab ++ adversarial).distinct
    val sparkSide = terms.toDF("term")
      .withColumn("b",
        RetrievalIndex.bucketCol(org.apache.spark.sql.functions.col("term")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(RetrievalIndex.bucketOf(t) == sparkSide(t),
        s"bucket mismatch for term '$t'")
    }
  }

  test("q144 stored-postings serve matches a pure-Scala corpus BM25") {
    val out = RetrievalIndex.bm25Serve(spark, sfDir).collect()
    assert(out.length == TextOps.Bm25K)
    out.zip(expectedTopK).foreach { case (r, (id, dl, tfv, s)) =>
      assert(r.getLong(0) == id, s"rank: got ${r.getLong(0)}, want $id")
      assert(r.getLong(1) == dl, s"doc $id dl")
      terms.indices.foreach(i =>
        assert(r.getLong(2 + i) == tfv(i), s"doc $id tf_${terms(i)}"))
      assert(math.abs(r.getDouble(2 + terms.size) - s) < 1e-6,
        s"doc $id score")
    }
  }

  test("q144's postings scan prunes to the query terms' partitions") {
    // AQE wraps the physical plan; descend into the adaptive subtree.
    def postingsScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        postingsScans(a.executedPlan)
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("postings")) => Seq(f)
    }.flatten
    val scans = postingsScans(
      RetrievalIndex.bm25Serve(spark, sfDir).queryExecution.executedPlan)
    assert(scans.nonEmpty, "no postings scan in the q144 plan")
    val queryBuckets = terms.map(RetrievalIndex.bucketOf).distinct.size
    val totalBuckets = {
      val wh = RetrievalIndex.ensure(spark, sfDir)
      val v = Warehouse.version(wh)
      Option(new java.io.File(s"$wh/v=$v/postings").listFiles())
        .getOrElse(Array()).count(_.getName.startsWith("term_bucket="))
    }
    scans.foreach { f =>
      val selected = f.selectedPartitions.partitionCount
      assert(selected <= queryBuckets,
        s"scan read $selected partitions for $queryBuckets query buckets")
      assert(selected < totalBuckets,
        s"no pruning: read all $totalBuckets partitions")
    }
  }

  test("the parameterized serve reproduces the pivot-form serve on the pinned request") {
    // One scoring algebra, two plan shapes (r14 verdict #1): the
    // sorted-term-fold request path must rank exactly like the q144
    // pivot when asked the q144 question.
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val param = RetrievalIndex.bm25Serve(spark, wh, terms, TextOps.Bm25K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pivot = RetrievalIndex.bm25ServeFrom(spark, wh).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2 + terms.size)))
    assert(param.toSeq == pivot.toSeq, "param vs pivot serve diverged")
  }

  test("bucket pruning holds for ARBITRARY term sets (r14 verdict #1)") {
    import spark.implicits._
    def postingsScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        postingsScans(a.executedPlan)
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("postings")) => Seq(f)
    }.flatten
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val vocab = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("explode(split(text, ' ')) AS term")
      .distinct().as[String].collect().sorted
    val rnd = new scala.util.Random(42)
    val requests = (1 to 8).map(_ =>
      Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.length))).distinct) :+
      Seq("zzz_not_in_vocab") :+ vocab.take(12).toSeq
    requests.foreach { ts =>
      val scans = postingsScans(RetrievalIndex
        .bm25Serve(spark, wh, ts, 10).queryExecution.executedPlan)
      assert(scans.nonEmpty, s"no postings scan for request $ts")
      val buckets = ts.map(RetrievalIndex.bucketOf).distinct.size
      scans.foreach { f =>
        val selected = f.selectedPartitions.partitionCount
        assert(selected <= buckets,
          s"request $ts read $selected partitions for $buckets buckets")
      }
    }
  }

  test("the parameterized serve honors tombstones and arbitrary k") {
    import org.apache.spark.sql.functions.col
    val allDocs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val wh = Files.createTempDirectory("graft-retr-param-del").toString
    RetrievalIndex.buildOf(spark, allDocs, wh)
    RetrievalIndex.deleteDocs(spark, wh, allDocs.filter(col("doc_id") % 4 === 1))
    val whRebuild = Files.createTempDirectory("graft-retr-param-rb").toString
    RetrievalIndex.buildOf(spark, allDocs.filter(col("doc_id") % 4 =!= 1),
      whRebuild)
    val req = Seq("merge", "hash")
    Seq(3, 11).foreach { k =>
      val served = RetrievalIndex.bm25Serve(spark, wh, req, k)
        .collect().map(_.toSeq)
      val rebuilt = RetrievalIndex.bm25Serve(spark, whRebuild, req, k)
        .collect().map(_.toSeq)
      assert(served.length == k && served.toSeq == rebuilt.toSeq,
        s"k=$k: tombstoned param serve != rebuild")
    }
  }

  test("driver-side RRF rounding is bit-identical to Spark's round(_, 6)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, round => sparkRound}
    // fuseRrf rounds the fused score on the driver with
    // BigDecimal(d).setScale(6, HALF_UP) — Spark's Round expression
    // for DoubleType evaluates the SAME Scala form, so the driver
    // fusion can never diverge from the lazy plan's display value.
    // Pin it over every score the RRF algebra can actually produce
    // (all rank pairs up to 60 — includes the 1/(60+r) + 1/(60+r')
    // sums whose decimal expansions sit near rounding boundaries)
    // plus half-ulp adversarial literals.
    val rrfVals = (for {
      a <- 0L to 60L; b <- 0L to 60L
    } yield (if (a == 0) 0.0 else 1.0 / (Similarity.RrfK + a)) +
        (if (b == 0) 0.0 else 1.0 / (Similarity.RrfK + b))).distinct
    val adversarial = Seq(0.0000005, 0.0000015, 0.1234565, 0.9999995,
      1.0000005, 0.0163934426229508, 0.032786885245901634)
    val vals = (rrfVals ++ adversarial).toVector
    val sparkSide = vals.toDF("v")
      .select(sparkRound(col("v"), 6).as("r"))
      .collect().map(_.getDouble(0))
    val driverSide = vals.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(sparkSide.toSeq == driverSide.toSeq,
      "driver-side HALF_UP rounding diverged from Spark round(_, 6)")
  }

  test("the concurrent hybrid path is value-identical to the q146 plan") {
    val lazyRows = RetrievalIndex.hybridServe(spark, sfDir)
      .collect().map(_.toSeq)
    val concRows = RetrievalIndex.hybridServeConcurrent(spark, sfDir)
      .collect().map(_.toSeq)
    assert(concRows.toSeq == lazyRows.toSeq,
      "concurrent hybrid diverged from the oracle-certified q146 fusion")
    // The serving DEFAULT (whatever it is currently routed to) must
    // also equal the oracle-certified q146 fusion — re-routing the
    // default can never change served values (r18 verdict #1).
    val defRows = RetrievalIndex.hybridServeDefault(spark, sfDir)
      .collect().map(_.toSeq)
    assert(defRows.toSeq == lazyRows.toSeq,
      "hybridServeDefault diverged from the oracle-certified q146 fusion")
  }

  test("parameterized ANN at nprobe = K equals the brute-force cosine top-k") {
    // With every cell probed the IVF serve must degrade to the exact
    // full scan — the parameterized probe's correctness anchor.
    def dotD(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qv = vecs.toMap.apply(7L)
    val qn = math.sqrt(dotD(qv, qv))
    val expected = vecs
      .map { case (id, v) =>
        val denom = math.sqrt(dotD(v, v)) * qn
        (id, if (denom == 0.0) -2.0 else dotD(v, qv) / denom)
      }
      .sortBy { case (id, c) => (-c, id) }
      .take(9).map(_._1).toSeq
    val served = Similarity
      .annServe(spark, sfDir, qv.toSeq, nprobe = Similarity.CentroidK, k = 9)
      .collect().map(_.getLong(0)).toSeq
    assert(served == expected, "nprobe=K param ANN != brute-force top-k")
  }

  test("the explicit-warehouse ANN request serves like the fixture-store form") {
    val qv = graft.core.Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 9L)
      .selectExpr("transform(embedding, x -> cast(x as double)) AS v")
      .collect()(0).getSeq[Double](0)
    val viaDir = Similarity.annServe(spark, sfDir, qv, nprobe = 2, k = 10)
      .collect().map(_.toSeq)
    val viaWh = Similarity
      .annServeFrom(spark, Warehouse.ensure(spark, sfDir), qv, nprobe = 2, k = 10)
      .collect().map(_.toSeq)
    assert(viaWh.toSeq == viaDir.toSeq,
      "explicit-warehouse serve diverged from the fixture-store serve")
    // ...and the both-stores-explicit hybrid fuses identically.
    val req = Seq("stream", "batch")
    val viaDirs = RetrievalIndex
      .hybridServe(spark, RetrievalIndex.ensure(spark, sfDir), sfDir, req, qv)
      .collect().map(_.toSeq)
    val viaWhs = RetrievalIndex
      .hybridServeFrom(spark, RetrievalIndex.ensure(spark, sfDir),
        Warehouse.ensure(spark, sfDir), req, qv)
      .collect().map(_.toSeq)
    assert(viaWhs.toSeq == viaDirs.toSeq,
      "explicit-stores hybrid diverged from the fixture-store hybrid")
  }

  test("q145 merge certificate is all-ok and matches plain-Scala counts") {
    val out = RetrievalIndex.mergeCertify(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    out.foreach { case (m, (_, ok)) => assert(ok, s"$m not ok") }
    val nPostings = docs.map { case (_, w) => w.distinct.length.toLong }.sum
    assert(out("postings_rows")._1 == nPostings)
    assert(out("postings_minus_rebuild")._1 == 0L)
    assert(out("rebuild_minus_postings")._1 == 0L)
    assert(out("stats_n_docs")._1 == docs.size.toLong)
    assert(out("stats_sum_dl")._1 == docs.map(_._2.length.toLong).sum)
  }

  test("a merged index serves the same ranking a rebuilt one does") {
    val merged = RetrievalIndex
      .bm25ServeFrom(spark, RetrievalIndex.ensureMerged(spark, sfDir))
      .collect()
    val rebuilt = RetrievalIndex.bm25Serve(spark, sfDir).collect()
    assert(merged.length == rebuilt.length)
    merged.zip(rebuilt).foreach { case (m, r) =>
      assert(m.toSeq == r.toSeq, s"merged vs rebuilt row: $m vs $r")
    }
  }

  test("q146 stored-index hybrid fusion matches a brute-force RRF") {
    // Sparse leg ranks: the pure-Scala BM25 top-20 above.
    val sparseRanks = expectedTopK.zipWithIndex
      .map { case ((id, _, _, _), i) => id -> (i + 1).toLong }.toMap
    // Dense leg ranks: pure-Scala probe + rerank (the q142 contract).
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val denom = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (denom == 0.0) -2.0 else dot(a, b) / denom
    }
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cents = vecs.filter(_._1 < Similarity.CentroidK)
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cId, cv) => (cosine(v, cv), cId) }.max._2
    }.toMap
    val qv = vecs.toMap.apply(Similarity.AnnQueryId)
    val probes = cents.map { case (cId, cv) => (cosine(qv, cv), cId) }
      .sortBy { case (c, id) => (-c, -id) }
      .take(Similarity.AnnProbeN).map(_._2).toSet
    val denseRanks = vecs
      .filter { case (id, _) => id != Similarity.AnnQueryId && probes(cellOf(id)) }
      .map { case (id, v) => (id, cosine(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(Similarity.AnnServeK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // Fusion: 1/(60 + rank) per present leg, absent = rank 0.
    val expected = (sparseRanks.keySet ++ denseRanks.keySet).toSeq
      .map { id =>
        val (rs, rd) = (sparseRanks.getOrElse(id, 0L), denseRanks.getOrElse(id, 0L))
        def term(r: Long) = if (r == 0L) 0.0 else 1.0 / (60 + r)
        (id, rs, rd, term(rs) + term(rd))
      }
      .sortBy { case (id, _, _, f) => (-f, id) }

    val out = RetrievalIndex.hybridServe(spark, sfDir).collect()
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (id, rs, rd, f)) =>
      assert(r.getLong(0) == id, s"rank order: got ${r.getLong(0)}, want $id")
      assert(r.getLong(1) == rs, s"doc $id rank_sparse")
      assert(r.getLong(2) == rd, s"doc $id rank_dense")
      assert(math.abs(r.getDouble(3) - f) < 1e-6, s"doc $id rrf")
    }
  }

  /** Data files under `base`, as base-relative path strings. */
  private def dataFiles(base: Path): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    scala.util.Using.resource(Files.walk(base)) { st =>
      st.forEach { p =>
        val n = p.getFileName.toString
        if (Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith("."))
          out += base.relativize(p).toString
      }
    }
    out.toSet
  }

  test("the merge hard-links the standing postings tree by name") {
    val wh = RetrievalIndex.ensureMerged(spark, sfDir)
    assert(Warehouse.version(wh) == 2L)
    val standing = dataFiles(Paths.get(wh, "v=1", "postings"))
    val mergedFs = dataFiles(Paths.get(wh, "v=2", "postings"))
    assert(standing.nonEmpty)
    // Every standing file is re-referenced at the same relative path,
    // and the merge ADDED batch files rather than rewriting.
    assert(standing.subsetOf(mergedFs),
      s"standing files not carried forward: ${(standing -- mergedFs).take(3)}")
    assert(mergedFs.size > standing.size, "merge appended no batch files")
  }

  test("tombstone deletes serve exactly a rebuild over the remaining corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val dead = docs.filter(col("doc_id") % 5 === 2)
    val wh = Files.createTempDirectory("graft-retr-del").toString
    RetrievalIndex.buildOf(spark, docs, wh)
    val vDel = RetrievalIndex.deleteDocs(spark, wh, dead)
    assert(vDel == 2L)
    // Postings files are untouched — the delete wrote no bucket data.
    assert(dataFiles(Paths.get(wh, "v=1", "postings"))
      .subsetOf(dataFiles(Paths.get(wh, "v=2", "postings"))))

    val whRebuild = Files.createTempDirectory("graft-retr-del-rb").toString
    RetrievalIndex.buildOf(spark,
      docs.filter(col("doc_id") % 5 =!= 2), whRebuild)
    val served = RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq)
    val rebuilt = RetrievalIndex.bm25ServeFrom(spark, whRebuild)
      .collect().map(_.toSeq)
    assert(served.toSeq == rebuilt.toSeq, "served-after-delete != rebuild")
    assert(Warehouse.read(spark, wh, "corpus_stats").collect()(0).toSeq ==
      Warehouse.read(spark, whRebuild, "corpus_stats").collect()(0).toSeq)

    // Idempotent: re-deleting the same docs bumps the version but
    // changes neither stats nor the served ranking.
    RetrievalIndex.deleteDocs(spark, wh, dead)
    assert(Warehouse.read(spark, wh, "corpus_stats").collect()(0).toSeq ==
      Warehouse.read(spark, whRebuild, "corpus_stats").collect()(0).toSeq)
    assert(RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq).toSeq
      == rebuilt.toSeq)

    // A merge after the delete carries the suppression: the batch
    // lands, the dead stay dead, stats reflect (remaining + batch).
    val batch = spark.range(5).selectExpr("id + 1000000 AS doc_id",
      "'vector stream window vector' AS text")
    RetrievalIndex.mergeBatchOf(spark, wh, batch)
    val whRebuild2 = Files.createTempDirectory("graft-retr-del-rb2").toString
    RetrievalIndex.buildOf(spark,
      docs.filter(col("doc_id") % 5 =!= 2).unionByName(batch), whRebuild2)
    assert(RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq).toSeq
      == RetrievalIndex.bm25ServeFrom(spark, whRebuild2)
        .collect().map(_.toSeq).toSeq)
    assert(Warehouse.read(spark, wh, "corpus_stats").collect()(0).toSeq ==
      Warehouse.read(spark, whRebuild2, "corpus_stats").collect()(0).toSeq)

    // Compaction drops dead rows from buckets it rewrites; the served
    // ranking is unchanged and no dead doc reappears.
    RetrievalIndex.compact(spark, wh)
    assert(RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq).toSeq
      == RetrievalIndex.bm25ServeFrom(spark, whRebuild2)
        .collect().map(_.toSeq).toSeq)
  }

  test("deleteDocs refuses unindexed ids and over-bound tombstone totals") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val wh = Files.createTempDirectory("graft-retr-guard").toString
    RetrievalIndex.buildOf(spark, docs, wh)
    val vBuilt = Warehouse.version(wh)

    // An id with no stored postings refuses loudly and commits nothing
    // (ADVICE r14: silently subtracting it would bias every served
    // idf/avgdl forever).
    val ghost = spark.range(1).selectExpr("CAST(987654321 AS BIGINT) AS doc_id")
    val exMissing = intercept[IllegalArgumentException] {
      RetrievalIndex.deleteDocs(spark, wh, ghost)
    }
    assert(exMissing.getMessage.contains("no stored postings"))
    assert(Warehouse.version(wh) == vBuilt, "failed delete must not commit")

    // A wave pushing the tombstone total past the broadcast-safe bound
    // refuses loudly and commits nothing.
    val exBound = intercept[IllegalArgumentException] {
      RetrievalIndex.deleteDocs(spark, wh,
        docs.filter(col("doc_id") % 7 === 0), maxTombstones = 3L)
    }
    assert(exBound.getMessage.contains("broadcast-safe bound"))
    assert(Warehouse.version(wh) == vBuilt)

    // The refusal's named escape hatch: full compaction physically
    // drops the dead rows from EVERY bucket and clears the tombstone
    // table, so the serve no longer pays the anti-join and the next
    // delete wave starts from zero tombstones.
    RetrievalIndex.deleteDocs(spark, wh, docs.filter(col("doc_id") % 5 === 2))
    val vFull = RetrievalIndex.compact(spark, wh, purgeTombstones = true)
    assert(!Files.isDirectory(Paths.get(wh, s"v=$vFull", "tombstones")),
      "purge compaction must clear the tombstone table")
    val whRebuild = Files.createTempDirectory("graft-retr-guard-rb").toString
    RetrievalIndex.buildOf(spark, docs.filter(col("doc_id") % 5 =!= 2), whRebuild)
    assert(RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq).toSeq
      == RetrievalIndex.bm25ServeFrom(spark, whRebuild)
        .collect().map(_.toSeq).toSeq)
    assert(Warehouse.read(spark, wh, "postings")
      .join(docs.filter(col("doc_id") % 5 === 2), Seq("doc_id"), "left_semi")
      .isEmpty, "dead postings must be physically gone after the purge pass")
    assert(Warehouse.read(spark, wh, "corpus_stats").collect()(0).toSeq ==
      Warehouse.read(spark, whRebuild, "corpus_stats").collect()(0).toSeq)
  }

  test("compaction rewrites only fragmented buckets and preserves content") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft-retr-compact").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    // Build + two merges: buckets touched by both merges fragment.
    RetrievalIndex.buildOf(spark, docs.filter(col("doc_id") % 3 === 0), wh)
    RetrievalIndex.mergeBatchOf(spark, wh, docs.filter(col("doc_id") % 3 === 1))
    RetrievalIndex.mergeBatchOf(spark, wh, docs.filter(col("doc_id") % 3 === 2))
    val vPre = Warehouse.version(wh)
    val pre = Paths.get(wh, s"v=$vPre", "postings")
    def bucketFiles(base: Path): Map[String, Set[String]] =
      dataFiles(base).groupBy(_.split('/').head)
    val preBuckets = bucketFiles(pre)
    assert(preBuckets.values.exists(_.size > 1), "fixture did not fragment")
    val preRows = Warehouse.read(spark, wh, "postings")
      .select("term", "doc_id", "tf", "dl", "term_bucket").collect()
      .map(_.toSeq).sorted(math.Ordering.by((s: Seq[Any]) => s.toString))
    val preStats = Warehouse.read(spark, wh, "corpus_stats").collect()(0)
    val preServe = RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq)

    val vPost = RetrievalIndex.compact(spark, wh)
    assert(vPost == vPre + 1 && Warehouse.version(wh) == vPost)
    val post = Paths.get(wh, s"v=$vPost", "postings")
    val postBuckets = bucketFiles(post)
    preBuckets.foreach { case (bucket, files) =>
      if (files.size <= 1)
        // Unfragmented: hard-linked forward at the SAME relative paths.
        assert(postBuckets(bucket) == files, s"$bucket not linked forward")
      else
        assert(postBuckets(bucket).size == 1,
          s"$bucket still fragmented: ${postBuckets(bucket).size} files")
    }
    // The one-row stats table links forward by name.
    assert(dataFiles(Paths.get(wh, s"v=$vPost", "corpus_stats")) ==
      dataFiles(Paths.get(wh, s"v=$vPre", "corpus_stats")))
    // Content identity + serve parity across the compaction.
    val postRows = Warehouse.read(spark, wh, "postings")
      .select("term", "doc_id", "tf", "dl", "term_bucket").collect()
      .map(_.toSeq).sorted(math.Ordering.by((s: Seq[Any]) => s.toString))
    assert(postRows.length == preRows.length)
    assert(postRows.sameElements(preRows))
    assert(Warehouse.read(spark, wh, "corpus_stats").collect()(0).toSeq
      == preStats.toSeq)
    val postServe = RetrievalIndex.bm25ServeFrom(spark, wh).collect().map(_.toSeq)
    assert(postServe.toSeq == preServe.toSeq)
  }
}
