package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.ServingStore

/** Serving point-query latency section for `graft.Bench` (round-11
  * verdict #6).
  *
  * The reference dashboard polls its serving store every second with
  * `limit 500` (reference `config.py:22`, `app.py:65`); the registry
  * benches the equivalent queries (q10–q16) only as batch jobs over
  * the raw events table. This section measures what the dashboard
  * actually experiences: REPEATED point lookups against a compacted
  * [[ServingStore]] snapshot — every poll re-resolves the store
  * pointer, re-lists the snapshot and re-plans, exactly like a fresh
  * dashboard request — reported at ms grain (p50/p95/max, post-warm)
  * against the 1 s poll budget.
  *
  * The store is event-keyed (one row per event, the reference's HBase
  * row shape, `hbase_client.py:90-99`) and compacted to a single file
  * first: the latency being certified is snapshot-read + top-k on a
  * settled store, not merge debt. All four shapes are filter + top-k
  * (TakeOrderedAndProject) — the same plans a 100 TB deployment runs,
  * just over a time-partitioned store where the `ts_ms` predicate
  * prunes partitions.
  */
object ServingLatencyBench {

  private def pctl(sorted: IndexedSeq[Double], p: Double): Double =
    sorted((math.ceil(p * sorted.size).toInt - 1).max(0).min(sorted.size - 1))

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

  /** Host/JVM attribution for one battery family (r18 verdict #2):
    * steal + GC deltas across the family's timed window and fixed-work
    * CPU sentinel probes BRACKETING it (pre + post since r20) — the
    * same triple the per-query bench rows carry, so a battery swing
    * (e.g. r18's q142_ann 222 → 437 ms with a FLAT driver wall) splits
    * into plan cost vs session/heap/host state instead of standing
    * unattributed. Family grain, not rep grain: a battery's verdict
    * is its percentile over the whole window, so the window's host
    * state is the right attribution unit (and 14 sentinels cost ~2 s
    * total vs ~700 for rep grain).
    * Sentinel GATE (r19 verdict #6, shared rule with the corpus
    * sections — `Bench.sentinelDegraded`): a window either bracketing
    * probe of which exceeds 1.5× the session calibration median is
    * DEGRADED; battery bodies are pure serves, so a degraded window
    * re-runs once and the second measurement is committed, flagged
    * `degraded` if still hot — an r18-q142-style 437 ms swing is now
    * auto-adjudicated in-artifact. Bodies must be retry-idempotent
    * (assign accumulators, never `+=` across the whole window without
    * resetting inside the body). */
  private def attributed(body: => Unit): String = {
    def once(): (String, Boolean) = {
      val pre = graft.Bench.sentinel()
      val s0 = graft.Bench.sysSnap()
      val (gcMs0, _) = graft.Bench.gcSnap()
      body
      val s1 = graft.Bench.sysSnap()
      val (gcMs1, _) = graft.Bench.gcSnap()
      val sent = graft.Bench.sentinel()
      val degraded = graft.Bench.sentinelDegraded(pre) ||
        graft.Bench.sentinelDegraded(sent)
      val stealSec = (s1.stealJiffies - s0.stealJiffies) / 100.0 // USER_HZ
      val json = s""""sentinel":${String.format(java.util.Locale.ROOT, "%.4f",
          Double.box(sent))},""" +
        s""""sentinel_pre":${String.format(java.util.Locale.ROOT, "%.4f",
          Double.box(pre))},""" +
        s""""steal_sec":${num(stealSec)},""" +
        s""""gc_sec":${num((gcMs1 - gcMs0) / 1000.0)},""" +
        s""""degraded":$degraded"""
      (json, degraded)
    }
    val first = once()
    (if (first._2) once() else first)._1
  }

  /** The shared percentile battery: warm passes, then `reps` timed
    * end-to-end executions per query (plan + execute + collect —
    * what a fresh request pays). Returns (per-query JSON, p95) pairs;
    * every row carries the attribution triple over its timed window. */
  private def perQueryJson(queries: Seq[(String, () => DataFrame)],
      reps: Int, warm: Int): Seq[(String, Double)] =
    queries.map { case (name, mk) =>
      (1 to warm).foreach(_ => mk().collect())
      var rows = 0
      var times: IndexedSeq[Double] = IndexedSeq.empty
      val attrib = attributed {
        times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          rows = mk().collect().length
          (System.nanoTime() - t0) / 1e6
        }.sorted.toIndexedSeq
      }
      val json = s""""$name":{"p50_ms":${num(pctl(times, 0.50))},""" +
        s""""p95_ms":${num(pctl(times, 0.95))},"max_ms":${num(times.last)},""" +
        s""""rows":$rows,$attrib}"""
      (json, pctl(times, 0.95))
    }

  /** Stored-INDEX serve latency (r14): the q142 (ANN), q144 (BM25) and
    * q146 (hybrid RRF) read paths as REPEATED requests — each rep
    * re-plans and re-executes against the memoized index stores, the
    * retrieval-tier analogue of the dashboard poll below, against the
    * same 1 s budget. */
  def indexSection(spark: SparkSession, sfDir: String,
      reps: Int = 30, warm: Int = 5): String = {
    import graft.queries.{RetrievalIndex, Similarity}
    // The hybrid row benches the SERVING DEFAULT
    // (RetrievalIndex.hybridServeDefault — r18 verdict #1): the
    // concurrent legs with DRIVER-side fusion. r18's 801 ms p50
    // regression on this path was its fusion running as a third
    // Spark action over two local relations; with the fusion on the
    // driver the request pays two overlapped leg jobs and measures
    // max(legs) + ε (r19: 183 ms p50 vs the lazy plan's 451). The
    // lazy single-plan form stays as an informational row
    // (`hybrid_lazy`, value-identical spec-pinned; its p50 ≈ sum of
    // legs) and is excluded from the budget verdict — the budget
    // certifies what a deployment's handler actually runs.
    val queries: Seq[(String, () => DataFrame)] = Seq(
      "q142_ann" -> (() => Similarity.annServe(spark, sfDir)),
      "q144_bm25" -> (() => RetrievalIndex.bm25Serve(spark, sfDir)),
      "q146_hybrid" -> (() => RetrievalIndex.hybridServeDefault(spark, sfDir)),
      "hybrid_lazy" -> (() => RetrievalIndex.hybridServe(spark, sfDir)))
    val perQuery = perQueryJson(queries, reps, warm)
    val budgetMs = 1000.0
    val budgeted = queries.map(_._1).zip(perQuery)
      .filter(_._1 != "hybrid_lazy").map(_._2)
    s"""{"reps":$reps,"warm":$warm,"poll_budget_ms":${num(budgetMs)},""" +
      s""""queries":{${perQuery.map(_._1).mkString(",")}},""" +
      s""""within_budget":${budgeted.forall(_._2 < budgetMs)}}"""
  }

  /** PARAMETERIZED-request battery (r14 verdict #1 done-criterion):
    * ≥ 100 DISTINCT requests against the product serve APIs — 50 BM25
    * term sets drawn from the corpus's own vocabulary, 50 ANN query
    * vectors drawn from the stored index, 25 hybrid combinations.
    * Every request is a FRESH plan (new literals: different terms,
    * different vector), so the percentiles measure latency over
    * request VARIETY, not one cached plan re-executed — each request
    * runs exactly once after a small family warm-up. Seeded draws:
    * the battery is reproducible run to run. */
  def paramSection(spark: SparkSession, sfDir: String,
      nBm25: Int = 50, nAnn: Int = 50, nHybrid: Int = 25): String =
    paramAndBatchSections(spark, sfDir, nBm25, nAnn, nHybrid)._1

  /** The seeded request populations shared by the sequential
    * ([[paramSection]]) and batched batteries — one generation, so
    * the speedup compares identical work. */
  private def paramRequests(spark: SparkSession, sfDir: String,
      nBm25: Int, nAnn: Int, nHybrid: Int): (Vector[Seq[String]],
        Vector[Seq[Double]], Vector[(Seq[String], Seq[Double])]) = {
    import graft.queries.Warehouse
    val vocab = Tables.documents(spark, sfDir)
      .selectExpr("explode(split(text, ' ')) AS term").distinct()
      .orderBy("term").collect().map(_.getString(0))
    val rnd = new scala.util.Random(20260815L)
    def termSet(): Seq[String] =
      Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.length))).distinct
    val bm25Reqs = Vector.fill(nBm25)(termSet())
    val vecPool = Warehouse.stored(spark, sfDir, "cells")
      .select("vec_id", "v").orderBy("vec_id")
      .limit(math.max(nAnn, nHybrid)).collect()
      .map(_.getSeq[Double](1))
    val annReqs = Vector.tabulate(nAnn)(i => vecPool(i % vecPool.length))
    val hybridReqs = Vector.tabulate(nHybrid)(i =>
      (termSet(), vecPool((i * 7 + 3) % vecPool.length)))
    (bm25Reqs, annReqs, hybridReqs)
  }

  /** Runs the sequential parameterized battery AND the batched replay
    * of the SAME requests (r15 verdict #1's done criterion), returning
    * (`index_serve_param` JSON, `index_serve_batch` JSON). The batch
    * side answers each family's whole population in ONE call —
    * `bm25ServeBatch` / `annServeBatch` / `hybridServeBatch` — so the
    * per-family speedup is sequential-total / batch-wall over
    * identical requests, measured in the same session. */
  def paramAndBatchSections(spark: SparkSession, sfDir: String,
      nBm25: Int = 50, nAnn: Int = 50, nHybrid: Int = 25): (String, String) = {
    import graft.queries.{RetrievalIndex, Similarity}
    val wh = RetrievalIndex.ensure(spark, sfDir)
    val (bm25Reqs, annReqs, hybridReqs) =
      paramRequests(spark, sfDir, nBm25, nAnn, nHybrid)

    def battery(name: String, reqs: Seq[() => Int]): (String, Double, Double) = {
      reqs.take(3).foreach(_.apply()) // family warm-up (store footers, codegen)
      var rows = 0
      var raw: Seq[Double] = Seq.empty
      val attrib = attributed {
        rows = 0 // reset inside the body: the gate may re-run it once
        raw = reqs.map { r =>
          val t0 = System.nanoTime()
          rows += r()
          (System.nanoTime() - t0) / 1e6
        }
      }
      val times = raw.sorted.toIndexedSeq
      val json = s""""$name":{"n_requests":${reqs.size},""" +
        s""""p50_ms":${num(pctl(times, 0.50))},""" +
        s""""p95_ms":${num(pctl(times, 0.95))},"max_ms":${num(times.last)},""" +
        s""""rows_total":$rows,$attrib}"""
      (json, pctl(times, 0.95), raw.sum)
    }
    // Keyed by family name: the batch section looks its sequential
    // baseline up by name, so inserting or reordering a battery can
    // never misattribute seq_ms / speedup_vs_sequential (ADVICE r16).
    val namedFams: Seq[(String, (String, Double, Double))] = Seq(
      "bm25" -> battery("bm25_param", bm25Reqs.map(ts =>
        () => RetrievalIndex.bm25Serve(spark, wh, ts, 10).collect().length)),
      "ann" -> battery("ann_param", annReqs.map(v =>
        () => Similarity.annServe(spark, sfDir, v, nprobe = 2, k = 10)
          .collect().length)),
      "hybrid" -> battery("hybrid_param", hybridReqs.map { case (ts, v) =>
        () => RetrievalIndex.hybridServe(spark, wh, sfDir, ts, v)
          .collect().length
      }),
      "quant" -> battery("quant_param", annReqs.map(v =>
        () => Similarity.annServeQuant(spark, sfDir, v, nprobe = 2, k = 10)
          .collect().length)),
      // The 8-byte ADC tier through the same population (r17 verdict
      // #5): per-request latency of the q179 serve path.
      "pq" -> battery("pq_param", annReqs.map(v =>
        () => Similarity.annServePq(spark, sfDir, v, nprobe = 2, k = 10)
          .collect().length)))
    val fams = namedFams.map(_._2)
    def seqTotalOf(name: String): Double = namedFams.toMap.apply(name)._3
    val budgetMs = 1000.0
    val paramJson =
      s"""{"n_requests":${nBm25 + 3 * nAnn + nHybrid},""" +
        s""""poll_budget_ms":${num(budgetMs)},""" +
        s""""families":{${fams.map(_._1).mkString(",")}},""" +
        s""""within_budget":${fams.forall(_._2 < budgetMs)}}"""

    // ---- batched replay: one job per family over the same requests --
    val bm25Batch = bm25Reqs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    val annBatch = annReqs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val hyBatch = hybridReqs.zipWithIndex
      .map { case ((ts, v), i) => (i.toLong, ts, v) }
    def timedBatch(warmup: () => Int, run: () => Int): (Double, Int, String) = {
      warmup()
      var rows = 0
      var ms = 0.0
      val attrib = attributed {
        val t0 = System.nanoTime()
        rows = run()
        ms = (System.nanoTime() - t0) / 1e6
      }
      (ms, rows, attrib)
    }
    val batchFams = Seq(
      ("bm25", bm25Batch.size, seqTotalOf("bm25"), timedBatch(
        () => RetrievalIndex.bm25ServeBatch(spark, wh, bm25Batch.take(3), 10)
          .collect().length,
        () => RetrievalIndex.bm25ServeBatch(spark, wh, bm25Batch, 10)
          .collect().length)),
      ("ann", annBatch.size, seqTotalOf("ann"), timedBatch(
        () => Similarity.annServeBatch(spark, sfDir, annBatch.take(3),
          nprobe = 2, k = 10).collect().length,
        () => Similarity.annServeBatch(spark, sfDir, annBatch,
          nprobe = 2, k = 10).collect().length)),
      ("hybrid", hyBatch.size, seqTotalOf("hybrid"), timedBatch(
        () => RetrievalIndex.hybridServeBatch(spark, wh, sfDir,
          hyBatch.take(3)).collect().length,
        () => RetrievalIndex.hybridServeBatch(spark, wh, sfDir, hyBatch)
          .collect().length)),
      ("quant", annBatch.size, seqTotalOf("quant"), timedBatch(
        () => Similarity.annServeQuantBatch(spark, sfDir, annBatch.take(3),
          nprobe = 2, k = 10).collect().length,
        () => Similarity.annServeQuantBatch(spark, sfDir, annBatch,
          nprobe = 2, k = 10).collect().length)),
      ("pq", annBatch.size, seqTotalOf("pq"), timedBatch(
        () => Similarity.serve(spark, sfDir, annBatch.take(3),
          Similarity.AnnServeOpts(nprobe = 2, k = 10, pq = true))
          .collect().length,
        () => Similarity.serve(spark, sfDir, annBatch,
          Similarity.AnnServeOpts(nprobe = 2, k = 10, pq = true))
          .collect().length)))
    val famJson = batchFams.map { case (name, n, seqMs, (batchMs, rows, attrib)) =>
      val reqPerS = n / (batchMs / 1000.0)
      s""""$name":{"n_requests":$n,"batch_ms":${num(batchMs)},""" +
        s""""batch_req_per_s":${num(reqPerS)},"seq_ms":${num(seqMs)},""" +
        s""""speedup_vs_sequential":${num(seqMs / batchMs)},""" +
        s""""rows_total":$rows,$attrib}"""
    }
    val minSpeedup = batchFams
      .map { case (_, _, seqMs, (batchMs, _, _)) => seqMs / batchMs }.min
    val batchJson =
      s"""{"n_requests":${nBm25 + 3 * nAnn + nHybrid},""" +
        s""""families":{${famJson.mkString(",")}},""" +
        s""""min_speedup_vs_sequential":${num(minSpeedup)}}"""
    (paramJson, batchJson)
  }

  /** Runs the section; returns a JSON object string for BENCH_DETAIL.
    * The temp store (a full copy of the events table) is deleted on
    * the way out — every bench/spec run otherwise strands one in /tmp
    * and repeated runs on a long-lived host accumulate unbounded disk. */
  def section(spark: SparkSession, sfDir: String,
      reps: Int = 30, warm: Int = 5): String = {
    val storeDir = Files.createTempDirectory("graft-serving-lat")
    try sectionAt(spark, sfDir, storeDir.toString, reps, warm)
    finally {
      import scala.jdk.CollectionConverters._
      Files.walk(storeDir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => Files.deleteIfExists(p))
    }
  }

  private def sectionAt(spark: SparkSession, sfDir: String, store: String,
      reps: Int, warm: Int): String = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts_ms"), col("user_id"),
        col("event_type"), col("value"))
    require(ServingStore.upsert(ev, store, "event_id", 0L),
      "seed upsert must apply")
    require(ServingStore.compact(spark, store, targetFiles = 1),
      "compaction must apply")
    def snap: DataFrame = ServingStore.read(spark, store)

    // Q1/Q2/Q5/Q8 of the serving surface (SURVEY §2.9), re-pointed at
    // the store snapshot with the registry queries' own predicates.
    val queries: Seq[(String, () => DataFrame)] = Seq(
      "q1_latest" -> (() => snap
        .orderBy(col("ts_ms").desc, col("event_id").desc).limit(100)),
      "q2_by_user" -> (() => snap.filter(col("user_id") === 13)
        .orderBy(col("ts_ms").desc, col("event_id").desc).limit(50)),
      "q5_threshold" -> (() => snap.filter(col("value") >= 300.0)
        .orderBy(col("value").desc, col("event_id").asc).limit(100)),
      "q8_facet" -> (() => snap
        .filter(lower(col("event_type")).contains("err") && col("value") >= 100.0)
        .orderBy(col("ts_ms").desc, col("event_id").desc).limit(200)))

    val storeRows = snap.count()
    val perQuery = perQueryJson(queries, reps, warm)
    val budgetMs = 1000.0
    s"""{"store_rows":$storeRows,"reps":$reps,"warm":$warm,""" +
      s""""poll_budget_ms":${num(budgetMs)},""" +
      s""""queries":{${perQuery.map(_._1).mkString(",")}},""" +
      s""""within_budget":${perQuery.forall(_._2 < budgetMs)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serving-latency")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(section(spark, sfDir))
    spark.stop()
  }
}
