package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully executed through a `noop`-format write (a bare
  * `.count()` can short-circuit parquet scans via metadata and would
  * under-report). A warm-up pass at the smallest SF amortizes JVM/codegen
  * startup out of the timings.
  *
  * Noise protocol: `reps` timed passes over the WHOLE suite
  * (round-robin), min per query across passes. Round-robin — not
  * back-to-back reps per query — so a transient co-tenant load burst
  * inflates one pass of many queries rather than every rep of a few
  * consecutive ones (the exact failure mode that made r4's q44–q49
  * look regressed).
  *
  * Output contract, hardened after r5 and re-compacted in r18 (the
  * r17 run's 185-query `"qNN":0.123` map measured ~2.4 KB and
  * front-truncated the first ~40 queries out of the driver's tail):
  * the consumer keeps only the LAST ~2000 chars of stdout and
  * truncation cuts from the FRONT, so the printed line must FIT
  * ENTIRELY inside that tail. Per-query times ride in `q_cs` — a
  * POSITIONAL array of CENTISECOND integers where index i is query
  * q(i+1) and null marks a query not run in this invocation (~4
  * chars each, ~0.8 KB at 190 queries, headroom to 400+); a query
  * whose name lacks the `qNN` prefix would land in the `q_cs_extra`
  * map (empty today). No rep arrays or plan hashes inline, and the
  * headline fields (`metric`/`value`/`n_failed`/`sf`) are emitted
  * LAST inside the object as a second line of defense.
  * build.sbt additionally disables sbt's `[success] Total time`
  * epilogue so on a clean run the JSON line is also the LAST stdout
  * line — robust to a consumer that only parses the final line.
  * (On a FAILED run — n_failed>0, exit 1 — sbt still appends
  * `[error] Nonzero exit code` lines after the JSON; the nonzero rc
  * itself signals failure then, and the failed list is in the detail
  * file.) Full fidelity — complete query names, all per-pass times,
  * the normalized physical-plan hash per query (exprIds, plan ids,
  * stats, and JVM identity hashes stripped), per-pass loadavg — goes
  * to `BENCH_DETAIL.json` next to the build instead.
  *
  * Noise ATTRIBUTION (added r8): this sandbox is a co-tenanted VM
  * (/proc/stat steal is nonzero) and past rounds recorded 50× rep
  * spikes (79 s on a ~1 s query) that loadavg could not explain. The
  * bench now proves — per query, per rep — whether an outlier was
  * environmental:
  *   - a fixed-work CPU SENTINEL (1e8-iteration xorshift loop, no
  *     I/O, no allocation) runs immediately before every query rep;
  *     its wall time is constant on an unloaded core and stretches in
  *     direct proportion to CPU unavailability. Calibration medians
  *     are emitted so any rep's sentinel can be read as a slowdown
  *     ratio.
  *   - HOST STEAL seconds (delta of /proc/stat field 8 over the rep,
  *     jiffies/USER_HZ) — CPU the hypervisor took from this VM.
  *   - CGROUP THROTTLE seconds + nr_throttled deltas (cpu.stat, v1
  *     with v2 fallback) and the quota string (cpu.cfs_quota_us /
  *     cpu.max) — CPU the container ceiling took from the JVM.
  * All three land in BENCH_DETAIL.json as per-query rep arrays
  * (`sentinel` / `steal_sec` / `throttle_sec`) parallel to `queries`,
  * so: outlier rep with inflated sentinel or steal ⇒ co-tenant;
  * outlier with flat sentinel/steal/throttle ⇒ ours. Stdout line is
  * unchanged (same size contract).
  *
  * r9 closes the sentinel's known blind spot: the CPU probe cannot
  * see JVM GC pauses (r8's q49 had a 19.4 s rep with a flat sentinel,
  * near-zero steal and zero throttle — invisible to all three
  * columns). Each rep now also records the delta of total GC time and
  * GC count across all collectors
  * (`ManagementFactory.getGarbageCollectorMXBeans`) as `gc_sec` /
  * `gc_count` arrays, so a slow rep with flat sentinel but a multi-
  * second `gc_sec` is classified as a JVM pause, not mystery noise.
  * A `task_sec` column (SparkListener task-duration deltas) further
  * splits each rep's wall into executor work vs driver scheduling:
  * wall varies while task_sec stays flat ⇒ scheduler jitter (the
  * iterative q49 profile); task_sec inflates ⇒ the data path itself
  * ran longer.
  * Queries whose best-of-3 is ≥ 2 s additionally get 2 extra reps
  * (5 total) — more samples exactly where the min estimator is
  * weakest and where round-8's verdict demanded artifact-backed
  * numbers (q34/q49).
  *
  * r11 adds a RAW-LOG SCALE section (verdict #1): after the registry
  * reps, the q61/q62 production pipeline runs against Spark-generated
  * corpora at ~150 MiB and at the reference's own production input
  * scale (~11.2M lines / ~1.6 GiB — BASELINE.md), with the same
  * sentinel/steal/GC/task attribution per rep. Summary (min secs per
  * scale) joins the stdout line as `rawlog`; full rep arrays land in
  * BENCH_DETAIL.json. Knobs: SPARK_GRAFT_RAWLOG_BLOCKS (comma list,
  * "" disables), _REPS, _DIR.
  *
  * r11 also adds a STREAMING section (verdict #5, `tools/StreamBench`):
  * the speed layer's metrics pipeline at 3 batch sizes (rows/sec,
  * per-batch state rows/bytes — the watermark-bounded plateau is the
  * evidence) and the scored enrich pipeline's messages/sec, in
  * BENCH_DETAIL.json under `streaming` (detail-only; the stdout line
  * keeps its size contract). SPARK_GRAFT_STREAMBENCH=0 disables.
  *
  * r11 registry TIERING (verdict #8): a statically pinned core-20
  * tier runs 5 round-robin passes, the long tail the historical 3 —
  * more samples where the min estimator is weakest, unchanged sample
  * size (hence unchanged min-estimator bias) everywhere else. `value`
  * REMAINS the all-queries total (comparable to BENCH_r01–r10 and
  * BASELINE.json); the core subtotal is emitted as `core20` on stdout
  * and as an object in the detail file.
  */
object Bench {

  /** The statically pinned core-20 bench tier (r11 verdict #8): the
    * heaviest / most load-bearing queries by the r10/r11 profiles.
    * Static so the set cannot drift with noise and round-over-round
    * comparisons stay apples-to-apples; ContractSpec pins membership
    * against the registry so a query rename cannot silently shrink
    * the tier. */
  val coreTier: Set[String] = Set(
    "q03_revenue_by_nation", "q30_knn_join",
    "q33_tumbling_metrics", "q34_lr_anomaly", "q46_ivf_topk",
    "q48_salted_join", "q49_dup_clusters", "q50_revenue_rollup",
    "q55_tfidf_terms", "q57_set_ops", "q61_raw_log_sessions",
    "q62_raw_log_features", "q73_class_weights", "q79_cm_heavy_hitters",
    "q83_sketch_rollup", "q85_label_index", "q86_local_supply",
    "q92_dedup_purge", "q94_bloom_decontaminate", "q99_store_replay")

  /** Full JSON string escape for error messages landing in the detail
    * file — Spark exception messages routinely span lines and carry
    * backslashes; a quote-only replace left invalid JSON (review r11). */
  private def jsonEsc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Sink for the sentinel's result so the JIT cannot dead-code the
    * loop away. `volatile` forbids hoisting the store out of line. */
  @volatile private var sentinelSink: Long = 0L

  /** Sentinel GATE (r19 verdict #2/#6), shared by the corpus/rawlog
    * stage rows and the serving batteries: a measurement window is
    * DEGRADED when a sentinel probe bracketing it exceeds
    * [[SentinelGateFactor]] × the session's calibration median. Pure
    * (read-only) measurement bodies are re-run ONCE on a degraded
    * window; every committed row carries an explicit `degraded` flag
    * either way, so a hot-host row can never again read as a plan
    * regression (r19: ~15 max-tier corpus rows at sentinel 0.46–0.91
    * vs calib 0.21 voided that round's trend claims). Side-effecting
    * stages (builds, merges, refreshes) are never re-run — replaying
    * a merge would corrupt the downstream tables — they are flagged
    * only. */
  val SentinelGateFactor = 1.5
  @volatile private var sentinelCalibMedian: Double = 0.0
  def sentinelDegraded(probe: Double): Boolean =
    sentinelCalibMedian > 0 &&
      probe > SentinelGateFactor * sentinelCalibMedian

  /** Fixed-work CPU probe: 1e8 iterations of a 64-bit xorshift mix —
    * no I/O, no allocation, no memory traffic beyond two registers.
    * Wall time ≈ constant on an idle core (~0.1–0.2 s); under CPU
    * contention or throttling it stretches in direct proportion to
    * effective CPU availability, which is exactly the quantity a
    * noisy rep needs attributed. */
  def sentinel(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 100000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    sentinelSink ^= x
    (System.nanoTime() - t0) / 1e9
  }

  /** Machine/cgroup counters sampled around each rep. Host steal is
    * /proc/stat cpu field 8 (jiffies across all CPUs — CPU the
    * hypervisor withheld from this VM); throttle counters come from
    * cgroup v1 cpu.stat (`throttled_time` ns) with a v2 fallback
    * (`throttled_usec`). Unreadable files degrade to zeros rather
    * than failing the bench. */
  final case class SysSnap(stealJiffies: Long, throttledNs: Long, nrThrottled: Long)

  private def readLines(path: String): Seq[String] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isReadable(p))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala.toSeq
      else Seq.empty
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** cpu.stat candidate paths, own-cgroup first. Under containerd /
    * systemd slices the JVM lives in a NESTED cgroup; the root
    * /sys/fs/cgroup[/cpu]/cpu.stat then holds someone else's (or
    * zero) counters and a genuinely throttled rep would read as
    * throttle_sec=0 and be mis-attributed as "ours". The process's
    * own path comes from /proc/self/cgroup (`0::/<path>` for v2,
    * `N:cpu,...:/<path>` for v1); root paths remain as fallback. */
  private lazy val cpuStatPaths: Seq[String] = {
    val self = readLines("/proc/self/cgroup")
    val v2rel = self.collectFirst { case l if l.startsWith("0::") => l.drop(3) }
    val v1rel = self.collectFirst {
      case l if l.split(":").length == 3 &&
        l.split(":")(1).split(",").contains("cpu") => l.split(":")(2)
    }
    (v1rel.map(r => s"/sys/fs/cgroup/cpu$r/cpu.stat").toSeq ++
      v2rel.map(r => s"/sys/fs/cgroup$r/cpu.stat").toSeq ++
      Seq("/sys/fs/cgroup/cpu/cpu.stat", "/sys/fs/cgroup/cpu.stat")).distinct
  }

  def sysSnap(): SysSnap = {
    val steal = readLines("/proc/stat").headOption.map { l =>
      val f = l.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L
    }.getOrElse(0L)
    def field(lines: Seq[String], key: String): Option[Long] =
      lines.collectFirst { case l if l.startsWith(key + " ") =>
        l.substring(key.length + 1).trim.toLong }
    // First candidate file that actually carries throttle counters
    // wins (own cgroup before root; v1 `throttled_time` is ns, v2
    // `throttled_usec` is µs).
    val stat = cpuStatPaths.iterator.map(readLines)
      .find(ls => field(ls, "throttled_time").isDefined ||
                  field(ls, "throttled_usec").isDefined)
      .getOrElse(Seq.empty)
    val throttledNs = field(stat, "throttled_time")
      .orElse(field(stat, "throttled_usec").map(_ * 1000L))
      .getOrElse(0L)
    val nThr = field(stat, "nr_throttled").getOrElse(0L)
    SysSnap(steal, throttledNs, nThr)
  }

  /** (total GC millis, total GC count) summed over all collectors in
    * this JVM — local-mode executors share the JVM, so a stop-the-
    * world pause during a rep lands in this delta. Beans report -1
    * when a counter is undefined; those are dropped. */
  def gcSnap(): (Long, Long) = {
    val beans = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans).asScala
    (beans.map(_.getCollectionTime).filter(_ >= 0).sum,
     beans.map(_.getCollectionCount).filter(_ >= 0).sum)
  }

  /** Accumulates executor TASK time (ms) across all jobs — the
    * counterpart of wall time that separates "the cluster worked
    * longer" from "the driver scheduled slower": a slow rep with flat
    * task_sec is driver/scheduler latency (the q49 iterative-loop
    * profile); inflated task_sec means the data path itself ran
    * longer.
    *
    * Listener events post asynchronously, and the skew crosses not
    * just REP but QUERY boundaries: query N's last task-end events
    * could land in query N+1's delta (ADVICE r9). The bus-flush API
    * (`listenerBus.waitUntilEmpty`) is private, so `drain()` gets the
    * same guarantee through the public surface: it submits an empty
    * one-partition marker job tagged via the job description and
    * waits for this listener to observe its SparkListenerJobEnd. The
    * shared listener queue is FIFO and the marker is submitted only
    * after the measured action has returned, so every task-end the
    * query produced is processed before the marker's job-end arrives.
    * Marker-job tasks themselves are excluded from the counter (their
    * stage ids are recorded at job start, which on the FIFO queue is
    * always processed before their task-ends). */
  private class TaskTimeListener extends org.apache.spark.scheduler.SparkListener {
    val millis = new java.util.concurrent.atomic.AtomicLong(0L)
    // Shuffle traffic counters (r13 corpus-dedup section): bytes the
    // measured stage wrote to / read from shuffle, the per-stage
    // attribution the 100 TB scaling argument is graded on.
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufRead = new java.util.concurrent.atomic.AtomicLong(0L)
    // Scan-input bytes (r20 rawlog attribution): with wall, this gives
    // the read-MB/s page-cache signal the r19 verdict asked for — a
    // first rep reading from disk and a second from cache differ in
    // THIS column's rate while sentinel/steal stay flat.
    val inputBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    private val markerStages =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    private val markerJobs =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Seq[Int])]()
    private val pending =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CountDownLatch]()
    private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val desc = if (e.properties == null) null
        else e.properties.getProperty("spark.job.description")
      if (desc != null && desc.startsWith("graft-bench-drain-")) {
        e.stageIds.foreach(id => markerStages.add(id))
        markerJobs.put(e.jobId, (desc, e.stageIds)); ()
      }
    }
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (e.taskInfo != null && !markerStages.contains(e.stageId)) {
        millis.addAndGet(e.taskInfo.duration)
        if (e.taskMetrics != null) {
          shufWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(e.taskMetrics.shuffleReadMetrics.totalBytesRead)
          inputBytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
        }
        ()
      }
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val entry = markerJobs.remove(e.jobId)
      if (entry != null) {
        val (desc, stageIds) = entry
        // Prune the marker's stage ids: their task-ends (FIFO) were
        // processed before this job-end, so the filter in onTaskEnd no
        // longer needs them. Keeps both sets bounded by in-flight
        // drains instead of growing one stage per drain forever
        // (ADVICE r10).
        stageIds.foreach(id => markerStages.remove(id))
        val latch = pending.remove(desc)
        if (latch != null) latch.countDown()
      }
    }

    /** Blocks (bounded) until every listener event produced so far has
      * been processed by THIS listener. Call between the measured
      * action and reading `millis`. */
    def drain(sc: org.apache.spark.SparkContext): Unit = {
      val desc = s"graft-bench-drain-${seq.incrementAndGet()}"
      val latch = new java.util.concurrent.CountDownLatch(1)
      pending.put(desc, latch)
      val prev = sc.getLocalProperty("spark.job.description")
      try {
        sc.setJobDescription(desc)
        try sc.parallelize(Seq(1), 1).foreach(_ => ())
        finally sc.setJobDescription(prev)
        // 10 s is ~3 orders above an empty local job; on timeout the
        // delta degrades to the old ± millisecond-skew behavior rather
        // than hanging the bench. (A FAILED marker job still posts its
        // JobEnd, so the latch releases either way.)
        latch.await(10, java.util.concurrent.TimeUnit.SECONDS); ()
      } catch {
        // A drain failure must degrade attribution, never abort the
        // bench — measured-query failures are caught in execute(); the
        // unmeasured marker deserves no stronger blast radius.
        case scala.util.control.NonFatal(_) => ()
      } finally {
        // Reclaim the entry on timeout/failure (countDown'd entries
        // were already removed by onJobEnd; this is a no-op then).
        pending.remove(desc); ()
      }
    }
  }

  /** Container CPU ceiling as a human-readable string — v1
    * quota/period or v2 cpu.max; "none" when unlimited/unreadable. */
  def cpuQuota(): String = {
    val q1 = readLines("/sys/fs/cgroup/cpu/cpu.cfs_quota_us").headOption
    val p1 = readLines("/sys/fs/cgroup/cpu/cpu.cfs_period_us").headOption
    val v2 = readLines("/sys/fs/cgroup/cpu.max").headOption
    (q1, p1, v2) match {
      case (Some(q), Some(p), _) if q.trim != "-1" => s"v1:${q.trim}/${p.trim}us"
      case (Some(q), _, _) if q.trim == "-1"       => "none"
      case (_, _, Some(m)) if !m.startsWith("max") => s"v2:${m.trim}"
      case _                                        => "none"
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // r20: let AQE re-coalesce the output partitioning of CACHED
      // plans (default false): persisted intermediates (q99's replay
      // batches, bounded certificate frames) otherwise pin the
      // session's static shuffle parallelism into every downstream
      // scan — 32 near-empty tasks per cache read at sf scale, the
      // right number of size-adaptive partitions at cluster scale.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskTime = new TaskTimeListener
    spark.sparkContext.addSparkListener(taskTime)
    // The four documented bounded global windows (MLOps distinct-
    // threshold ranking, Relational daily running revenue, Features
    // K-class counts, LogOps trailing minute-count stats) fire
    // WindowExec's "No Partition Defined" warning on every rep —
    // hundreds of identical lines drowning real warnings in the bench
    // tail. All four are provably bounded (distinct thresholds / days
    // / classes / minutes; shapes pinned by PlanShapeSpec), so the
    // BENCH pins that one logger to ERROR.
    // `sbt test` keeps it at WARN, so an accidentally-unbounded new
    // global window still surfaces there.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // Same treatment for DAGScheduler: its benign "Failed to update
    // accumulator" warn (an accumulator heartbeat landing after stage
    // cleanup) prints a multi-KB stack trace that burned half the
    // 2 KB stdout tail in r8. Scheduling FAILURES surface as query
    // exceptions / n_failed regardless of logger level, and `sbt
    // test` keeps the logger at WARN.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.ERROR)

    def execute(name: String, dir: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        false
      }

    /** Fingerprint of the initial physical plan, stable across runs of
      * the same code+data: exprIds / plan_ids / statistics are run- or
      * size-dependent, so they are normalized out before hashing. */
    def planHash(name: String): String =
      try {
        val raw = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val norm = raw
          .replaceAll("#\\d+", "#x")
          .replaceAll("plan_id=\\d+", "plan_id=x")
          .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
          // JVM identity hashes in default toStrings (e.g. a UDAF
          // instance rendered as TopKAggregator@1a2b3c4d) differ per
          // run and made q30's fingerprint flip with no plan change.
          // Integer.toHexString drops leading zeros, so ~0.05% of
          // identities render with 1–5 hex digits — the r8 {6,8}
          // bound let those escape and flip the fingerprint with no
          // plan change. Requiring a preceding identifier token
          // (ClassName@hex) now anchors the match instead of the
          // digit count. Tradeoff (documented): a quoted literal
          // shaped exactly like `word@hex` also normalizes, but its
          // identifier part survives in the fingerprint and no
          // current query embeds such a literal.
          .replaceAll("([A-Za-z0-9_$.]+)@[0-9a-f]{1,8}\\b", "$1@x")
          .replaceAll("\\s+", " ")
        java.security.MessageDigest.getInstance("MD5")
          .digest(norm.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
      } catch { case scala.util.control.NonFatal(_) => "plan_error" }

    def loadAvg(): Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage

    // Calibrate AFTER the JVM has run it a few times (JIT). First
    // three runs discarded; median of the next five is the baseline
    // an unloaded rep should reproduce within a few percent.
    (1 to 3).foreach(_ => sentinel())
    val calib = Vector.fill(5)(sentinel()).sorted
    sentinelCalibMedian = calib(2)

    // Registry filter (r13 verdict #8): `--only=q113,q122` argument or
    // SPARK_GRAFT_ONLY env — bare qNN prefix or full name. Default =
    // the whole registry (the driver contract).
    val selected = Verify.onlyFilter(args.toSeq)
    val names = SparkEntry.queries.keys.toSeq.filter(selected).sorted

    // Warm-up (JIT, codegen caches, parquet footer reads) on sf0.001.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) names.foreach(execute(_, warmDir))
    // Flush warm-up task-end events so rep 1 of query 1 starts clean.
    taskTime.drain(spark.sparkContext)

    // Registry tiering (r11 verdict #8): at 99 registered queries,
    // uniform reps drift the suite toward noise-floor dominance
    // (most queries <0.3 s vs ~0.1 s scheduling latency). The CORE
    // tier — the 20 heaviest/most load-bearing queries by the r10/r11
    // profiles, pinned STATICALLY so the set cannot drift with noise
    // and round-over-round comparisons stay apples-to-apples — runs
    // SPARK_GRAFT_BENCH_REPS (default 5) passes; the long tail runs
    // SPARK_GRAFT_TAIL_REPS (default 3 — the HISTORICAL rep count, so
    // every tail query's min is over the same sample size as rounds
    // 1–10 and the headline total stays statistically comparable; the
    // verdict's 1-rep tail was rejected for exactly that bias). Tail
    // is clamped to core so SPARK_GRAFT_BENCH_REPS=1 still means ONE
    // pass of everything (the knob's historical contract). Both tiers
    // land in the detail file (rep-array lengths show the tier);
    // stdout adds a `core20` subtotal. The headline `value` stays the
    // ALL-QUERIES total: BASELINE.json and BENCH_r01–r10 all report
    // that quantity, and silently re-basing it to the core tier would
    // corrupt every cross-round comparison (documented deviation from
    // the verdict's "headline = core tier").
    val coreReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt.max(1)
    val tailReps = sys.env.getOrElse("SPARK_GRAFT_TAIL_REPS", "3")
      .toInt.max(1).min(coreReps)
    val reps = coreReps
    val loads = new scala.collection.mutable.ArrayBuffer[Double]
    val times = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val sents = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val steal = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val thrtl = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val nThr  = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Long]).toMap
    val gcSec = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val gcCnt = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Long]).toMap
    val taskS = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val tailSent = new scala.collection.mutable.ArrayBuffer[Double]
    val okAll = new scala.collection.mutable.HashMap[String, Boolean]
      .withDefaultValue(true)
    val userHz = 100.0 // Linux USER_HZ for /proc/stat jiffies
    def runRep(name: String): Unit = {
      sents(name) += sentinel()
      val g0 = gcSnap()
      val s0 = sysSnap()
      val k0 = taskTime.millis.get()
      val t0 = System.nanoTime()
      val ok = execute(name, sfDir)
      times(name) += (System.nanoTime() - t0) / 1e9
      // CPU/GC snapshots close BEFORE the drain: only the task-time
      // counter needs the listener queue flushed, and reading s1/g1
      // after the marker job would fold the marker's work plus up to
      // 10 s of drain wait into this rep's steal/GC deltas (ADVICE
      // r10).
      val s1 = sysSnap()
      val g1 = gcSnap()
      // Drain the listener queue (FIFO marker job) so this rep's
      // delta contains exactly this rep's task time — no bleed into
      // the next rep OR the next query. Outside the timed window.
      taskTime.drain(spark.sparkContext)
      val k1 = taskTime.millis.get()
      steal(name) += (s1.stealJiffies - s0.stealJiffies) / userHz
      thrtl(name) += (s1.throttledNs - s0.throttledNs) / 1e9
      nThr(name)  += s1.nrThrottled - s0.nrThrottled
      gcSec(name) += (g1._1 - g0._1) / 1e3
      gcCnt(name) += g1._2 - g0._2
      taskS(name) += (k1 - k0) / 1e3
      if (!ok) okAll(name) = false
    }
    (1 to reps).foreach { pass =>
      // Round-robin within each pass; passes beyond the tail budget
      // touch only the core tier.
      val passNames = if (pass <= tailReps) names else names.filter(coreTier)
      if (passNames.nonEmpty) {
        loads += loadAvg()
        passNames.foreach(runRep)
        // Trailing probe closes each pass: the sentinel AFTER the last
        // query, so every rep is bracketed by two probe readings.
        tailSent += sentinel()
      }
    }
    // Slow-query extension (r9): best-of-3 ≥ 2 s ⇒ 2 extra reps
    // (5 total). The min estimator needs the most samples exactly
    // where reps are longest and co-tenant exposure per rep is
    // highest; r8's q34/q49 adjudication hinged on it.
    val slowNames = names.filter(n => times(n).nonEmpty && times(n).min >= 2.0)
    if (slowNames.nonEmpty) (1 to 2).foreach { _ =>
      loads += loadAvg()
      slowNames.foreach(runRep)
      tailSent += sentinel()
    }

    // ---- raw-log SCALE section (r11 verdict #1) -----------------------
    // The q61/q62 production pipeline (parse → sessionize / template →
    // features, the registry's own code via RawLog.*At) against
    // MakeBigLogFixture corpora at two scales: ~150 MiB (the 100×
    // point over the committed 1.4 MB fixture) and ~1.6 GiB / 11.2M
    // lines — the reference's actual production input scale
    // (BASELINE.md: 11,175,629 lines / 1.47 GB). Generated into /tmp
    // on first use (seconds, Spark-parallel), reused when present.
    // Reps carry the same sentinel/steal/GC/task attribution as the
    // main suite. Failures degrade to an "error" field, never abort
    // the bench.
    // Per-stage attribution row, shared by the rawlog and corpus
    // sections (hoisted in r20 — the rawlog battery now needs it too).
    // `n` is an optional per-stage cardinality; < 0 omits the field.
    // `inputMb` (r20) is scan-input bytes: with wall it yields the
    // read-MB/s page-cache signal (verdict r19 #1).
    final case class StageRow(name: String, wall: Double, sent: Double,
        stealS: Double, gcS: Double, taskS: Double,
        shufWriteMb: Double, shufReadMb: Double, n: Long = -1L,
        inputMb: Double = -1.0, sentAfter: Double = -1.0,
        degraded: Boolean = false)
    final case class RawScaleResult(blocks: Int, lines: Long, bytes: Long,
        genSec: Double,
        q61: Seq[Double], q62: Seq[Double],
        sent: Seq[Double], stealS: Seq[Double], gcS: Seq[Double],
        taskS: Seq[Double], stages: Seq[StageRow])
    // Env parsing lives INSIDE Try so a malformed knob degrades this
    // section to an "error" field like any other failure here — the
    // documented never-abort contract covers config too (review r11).
    val rawlogScales: Either[String, Seq[Int]] =
      scala.util.Try(sys.env.getOrElse(
          "SPARK_GRAFT_RAWLOG_BLOCKS", "47000,508000")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt).filter(_ > 0))
        .toEither.left.map(e => s"bad SPARK_GRAFT_RAWLOG_BLOCKS: ${e.getMessage}")
    // Default 3 since r20 (r19 verdict #1: more samples where the min
    // estimator is weakest — the 1.6 GiB tier's 5× swing was recorded
    // with only two reps and no stage split).
    val rawlogReps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_RAWLOG_REPS", "3").toInt.max(1)).getOrElse(3)
    val rawRoot = sys.env.getOrElse("SPARK_GRAFT_RAWLOG_DIR", "/tmp/graft_rawlog")
    val rawlogResults: Either[String, Seq[RawScaleResult]] =
      if (rawlogScales.isLeft) Left(rawlogScales.swap.toOption.get)
      else if (rawlogScales.toOption.get.isEmpty) Right(Nil)
      else try {
        // Default 128 MiB splits leave most of 32 cores idle on the
        // map stages of a ~1.6 GiB input (13 splits); 48 MiB ≈ one
        // split per core at the large scale. Restored after — scoped
        // tuning, the knob a real cluster sets per workload.
        val prevSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", s"${48 * 1024 * 1024}")
        try Right(rawlogScales.toOption.get.map { nb =>
          val fx = graft.tools.MakeBigLogFixture.ensure(spark, rawRoot, nb)
          val (q61s, q62s) = (new scala.collection.mutable.ArrayBuffer[Double],
            new scala.collection.mutable.ArrayBuffer[Double])
          val (ss, sts, gs, ts) = (new scala.collection.mutable.ArrayBuffer[Double],
            new scala.collection.mutable.ArrayBuffer[Double],
            new scala.collection.mutable.ArrayBuffer[Double],
            new scala.collection.mutable.ArrayBuffer[Double])
          // Per-STAGE attribution (r19 verdict #1): the committed r19
          // artifact carried only per-rep q61 totals, so its 5.7→29.3 s
          // swing at the 1.6 GiB tier could not be attributed to parse,
          // the sessionize exchange+agg, or the label-join+sort. Each
          // rep now also times the pipeline's prefixes — q61_parse
          // (scan+parse+filter, map-only: its input-MB/s is the
          // page-cache signal) and q61_sessions (parse + the sessionize
          // exchange + agg, no labels/sort) — with shuffle and input
          // bytes per row; q61_full/q62_full rows carry the same
          // columns for the headline reps. `n` = rep index.
          val stageRows = new scala.collection.mutable.ArrayBuffer[StageRow]
          def rawStage(name: String, rep: Int)(
              mk: => org.apache.spark.sql.DataFrame): StageRow = {
            def once(): StageRow = {
              val sent = sentinel()
              val g0 = gcSnap(); val s0 = sysSnap()
              val k0 = taskTime.millis.get()
              val w0 = taskTime.shufWrite.get(); val r0 = taskTime.shufRead.get()
              val i0 = taskTime.inputBytes.get()
              val t0 = System.nanoTime()
              mk.write.format("noop").mode("overwrite").save()
              val wall = (System.nanoTime() - t0) / 1e9
              val s1 = sysSnap(); val g1 = gcSnap()
              taskTime.drain(spark.sparkContext)
              val sentAfter = sentinel()
              StageRow(name, wall, sent,
                (s1.stealJiffies - s0.stealJiffies) / userHz,
                (g1._1 - g0._1) / 1e3,
                (taskTime.millis.get() - k0) / 1e3,
                (taskTime.shufWrite.get() - w0) / 1048576.0,
                (taskTime.shufRead.get() - r0) / 1048576.0,
                n = rep.toLong,
                inputMb = (taskTime.inputBytes.get() - i0) / 1048576.0,
                sentAfter = sentAfter,
                degraded = sentinelDegraded(sent) || sentinelDegraded(sentAfter))
            }
            // Sentinel gate (r19 verdict #2): these stages are PURE
            // (noop sinks), so a degraded window is re-run once; the
            // second measurement is committed, flagged if still hot.
            val first = once()
            val row = if (first.degraded) once() else first
            stageRows += row
            row
          }
          (1 to rawlogReps).foreach { rep =>
            rawStage("q61_parse", rep)(
              graft.queries.RawLog.parsedBlocksAt(spark, fx.logDir))
            rawStage("q61_sessions", rep)(
              graft.queries.RawLog.sessionsOnlyAt(spark, fx.logDir))
            val full1 = rawStage("q61_full", rep)(
              graft.queries.RawLog.rawLogSessionsAt(spark, fx.logDir, fx.labelsPath))
            val full2 = rawStage("q62_full", rep)(
              graft.queries.RawLog.rawLogFeaturesAt(spark, fx.logDir, fx.labelsPath))
            q61s += full1.wall; q62s += full2.wall
            ss += full1.sent; ss += full2.sent
            sts += full1.stealS + full2.stealS
            gs += full1.gcS + full2.gcS; ts += full1.taskS + full2.taskS
          }
          RawScaleResult(nb, fx.nLines, fx.bytes, fx.genSec,
            q61s.toSeq, q62s.toSeq, ss.toSeq, sts.toSeq, gs.toSeq, ts.toSeq,
            stageRows.toSeq)
        })
        finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] rawlog scale section FAILED: ${e.getMessage}")
        Left(String.valueOf(e.getMessage).take(200))
      }

    // ---- corpus-scale dedup chain (r13 verdict #3) --------------------
    // The warehouse doc-grain build (token_hashes → signatures → bands
    // → clusters → purge — the q27→q49→q92 chain as it actually runs
    // in production) over MakeBigCorpusFixture corpora with planted
    // 3-member near-dup clusters, at ~120 MB and ~1.2 GB of raw text.
    // Per STAGE: wall + the full attribution battery + shuffle bytes
    // written/read — the columns the at-scale scaling argument reads
    // (shuffle traffic must track the DIGEST width, not the corpus).
    // Detail-file only (the stdout line keeps its 2 KB tail contract).
    // Knobs: SPARK_GRAFT_CORPUS_DOCS (comma doc counts, "" disables),
    // SPARK_GRAFT_CORPUS_DIR.
    // `n` is an optional per-stage cardinality (e.g. a serve batch's
    // request count); < 0 means "not applicable" and the field is
    // omitted from the JSON. Kept OUT of the stage name so round-over-
    // round BENCH_DETAIL comparisons align on a fixed key even when
    // the corpus size moves the count (ADVICE r16). The StageRow class
    // itself is defined above the rawlog section (shared since r20).
    final case class CorpusResult(nDocs: Long, textBytes: Long,
        parquetBytes: Long, genSec: Double, purgeRows: Long,
        clusterRows: Long, stages: Seq[StageRow],
        incr: StageRow, incrRows: Long, incrDups: Long,
        incrFixed: StageRow, incrFixedRows: Long, incrFixedDups: Long,
        mergeStages: Seq[StageRow],
        bloom: StageRow, bloomBytes: Long,
        probe: StageRow, probeRows: Long, probeFlagged: Long,
        buildFullStages: Seq[StageRow], mergeFullStages: Seq[StageRow],
        curationStages: Seq[StageRow],
        retrStages: Seq[StageRow], retrPostings: Long,
        cellsBytes: Long, cellsQ8Bytes: Long)
    val corpusScales: Either[String, Seq[Long]] =
      scala.util.Try(sys.env.getOrElse(
          "SPARK_GRAFT_CORPUS_DOCS", "120000,1200000")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong).filter(_ > 0))
        .toEither.left.map(e => s"bad SPARK_GRAFT_CORPUS_DOCS: ${e.getMessage}")
    val corpusRoot = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DIR", "/tmp/graft_corpus")
    // The curation run + full 15-table build execute at the LARGEST
    // scale only (they dominate the section's wall); "0" disables.
    val corpusCuration = sys.env.getOrElse("SPARK_GRAFT_CORPUS_CURATION", "1") != "0"
    val corpusResults: Either[String, Seq[CorpusResult]] =
      if (corpusScales.isLeft) Left(corpusScales.swap.toOption.get)
      else if (corpusScales.toOption.get.isEmpty) Right(Nil)
      else try Right(corpusScales.toOption.get.map { n =>
        import org.apache.spark.sql.functions.{col, length, lit, pmod, sum}
        val maxScale = corpusScales.toOption.get.max
        val fx = graft.tools.MakeBigCorpusFixture.ensure(spark, corpusRoot, n)
        val wh = java.nio.file.Files
          .createTempDirectory("graft-bench-wh").toString
        def stageRow(name: String)(work: => Unit): StageRow = {
          val sent = sentinel()
          val g0 = gcSnap(); val s0 = sysSnap()
          val k0 = taskTime.millis.get()
          val w0 = taskTime.shufWrite.get(); val r0 = taskTime.shufRead.get()
          val t0 = System.nanoTime()
          work
          val wall = (System.nanoTime() - t0) / 1e9
          val s1 = sysSnap(); val g1 = gcSnap()
          taskTime.drain(spark.sparkContext)
          // Sentinel gate (r19 verdict #2): corpus stages MUTATE the
          // warehouse under measurement (builds/merges/refreshes), so
          // a degraded window cannot be re-run — it is bracketed
          // (probe before AND after) and FLAGGED, which removes it
          // from round-over-round trend claims explicitly instead of
          // silently (the r19 failure mode).
          val sentAfter = sentinel()
          StageRow(name, wall, sent,
            (s1.stealJiffies - s0.stealJiffies) / userHz,
            (g1._1 - g0._1) / 1e3,
            (taskTime.millis.get() - k0) / 1e3,
            (taskTime.shufWrite.get() - w0) / 1048576.0,
            (taskTime.shufRead.get() - r0) / 1048576.0,
            sentAfter = sentAfter,
            degraded = sentinelDegraded(sent) || sentinelDegraded(sentAfter))
        }
        // STANDING index = corpus minus src19 (production-true since
        // r14: the index never contains the incoming batch, so the
        // increments below need no fixture exclusion join). Planted
        // ground truth on the standing corpus: clusters 0.25n members
        // in 0.10n clusters, purge exactly 0.15n (the +7 dups and the
        // src9-half of the +9 dups).
        val docs = graft.core.Tables.documents(spark, fx.dir)
        val rows = new scala.collection.mutable.ArrayBuffer[StageRow]
        graft.queries.Warehouse.buildDocChainOf(spark,
          docs.filter(col("source") =!= "src19"), wh,
          (name, work) => { rows += stageRow(name)(work()) })
        def whRead(t: String) = graft.queries.Warehouse.read(spark, wh, t)
        val purgeRows = whRead("purge").count()
        val clusterRows = whRead("clusters").count()
        // The day-to-day INCREMENT against the committed warehouse:
        // src19 (5% of the corpus, all planted near-dups of stored
        // bases) plays today's crawl. The claim under test is the
        // central one — increment wall ≪ build wall (O(new batch +
        // matched buckets), never O(index)) — and the planted ground
        // truth pins correctness at scale: every new doc must verdict
        // is_dup (J ≈ 0.99 against its base).
        var incrRows = 0L; var incrDups = 0L
        val incrRow = stageRow("increment") {
          val v = graft.queries.Dedup.incrementAgainst(spark, fx.dir,
              whRead, "src19")
            .select(col("is_dup")).cache()
          incrRows = v.count()
          incrDups = v.filter(col("is_dup")).count()
          v.unpersist(); ()
        }
        // FIXED-batch increment (r13 verdict #1's "done" criterion):
        // the SAME 6,000 docs at every index scale — shuffle bytes
        // must stay ~flat as the index grows 10×, or the increment is
        // O(index) again.
        val fixedBatch = docs.filter(
          col("source") === "src19" && col("doc_id") < 120000L)
        var incrFixedRows = 0L; var incrFixedDups = 0L
        val incrFixedRow = stageRow("increment_fixed") {
          val v = graft.queries.Dedup.incrementAgainstDocs(fixedBatch, whRead)
            .select(col("is_dup")).cache()
          incrFixedRows = v.count()
          incrFixedDups = v.filter(col("is_dup")).count()
          v.unpersist(); ()
        }
        // Stream-side probe (r13 verdict #7): bloom folded from the
        // stored band table (build time = the per-index-version cost a
        // speed layer pays once), then the whole corpus probed in one
        // batch pass — rows/s is nDocs / probe wall; the baseline
        // full-text scan cost rides in the same row via task_sec.
        var bloomBits: Array[Byte] = null
        val bloomRow = stageRow("bloom_build") {
          bloomBits = graft.queries.Dedup.bandHashBloomOf(whRead("bands"))
        }
        var probeFlagged = 0L
        val probeRow = stageRow("stream_probe") {
          probeFlagged = graft.streaming.StreamOps
            .flagIndexDuplicates(docs.select(col("doc_id"), col("text")),
              "text", bloomBits)
            .agg(sum(col("dup_candidate").cast("long"))).first().getLong(0)
        }
        // Media popcount floor, MEASURED PER TIER (r18 verdict #4):
        // `n` = band-collision probes the daily media batch pays
        // against the standing index (each = one map-side codegen'd
        // xor+popcount; expected ≈ true band hits +
        // |batch|·|standing|·4/2¹⁶ random collisions). The floor is
        // the documented linear-in-standing-index CPU cost of the
        // 4×16-bit banding (TextOps.PhashBands) — committing the
        // count at every corpus scale tracks its growth round over
        // round instead of leaving it folded into task_sec.
        val isNewMediaDoc = pmod(col("doc_id"), lit(10L)) === lit(6L)
        var mediaProbes = 0L
        val mediaFloorRow = stageRow("media_probe_floor") {
          mediaProbes = graft.queries.TextOps.mediaProbeCountOf(
            graft.queries.TextOps.mediaDigestsOf(docs.filter(isNewMediaDoc)),
            graft.queries.TextOps.mediaDigestsOf(docs.filter(!isNewMediaDoc)))
        }.copy(n = mediaProbes)
        rows += mediaFloorRow
        // MERGE of the fixed batch (r13 verdict #2/#3's criterion):
        // leaf appends are O(batch) I/O and the recluster touches only
        // the batch's components, so merge wall must stay ~flat across
        // the 10× index sweep (sub-linear in index size).
        val mergeRows = new scala.collection.mutable.ArrayBuffer[StageRow]
        graft.queries.Warehouse.mergeBatch(spark, wh, fixedBatch, None,
          (name, work) => { mergeRows += stageRow(name)(work()) })
        // RETRIEVAL index (q144/q145's store) at corpus scale: standing
        // build (corpus minus src19), then the SAME fixed 6,000-doc
        // batch merged at every index size — the merge is a hard-link
        // append, so its wall AND shuffle must stay ~flat across the
        // 10× sweep (the O(batch) claim executed) — then one stored-
        // postings BM25 serve: the serve reads |query terms| of the 64
        // term buckets, so its wall tracks the query's posting lists
        // (which grow with the corpus), never the corpus scan q112 pays.
        val retrWh = java.nio.file.Files
          .createTempDirectory("graft-bench-retr").toString
        val retrRows = new scala.collection.mutable.ArrayBuffer[StageRow]
        retrRows += stageRow("retr_build") {
          graft.queries.RetrievalIndex.buildOf(spark,
            docs.filter(col("source") =!= "src19"), retrWh); ()
        }
        retrRows += stageRow("retr_merge") {
          graft.queries.RetrievalIndex.mergeBatchOf(spark, retrWh, fixedBatch); ()
        }
        retrRows += stageRow("retr_serve") {
          graft.queries.RetrievalIndex.bm25ServeFrom(spark, retrWh).collect(); ()
        }
        val retrPostings = graft.queries.Warehouse
          .read(spark, retrWh, "postings").count()
        // FULL 15-table STANDING build → all-grain spliced merge of
        // src19 + its embedding slice → the one-call curation run
        // against the MERGED warehouse (r13 verdict #4/#6), largest
        // scale only: per-stage rows prove (a) daily all-grain
        // maintenance costs a fraction of the build it replaces and
        // (b) the curation chain is warehouse-read-dominated (its
        // stages-total vs the index build total is the ledger's
        // stated ratio).
        val (buildFullRows, mergeFullRows, curationRows, cellsBytesPair) =
          if (corpusCuration && n == maxScale) {
            val whFull = java.nio.file.Files
              .createTempDirectory("graft-bench-whfull").toString
            val emb = graft.core.Tables.embeddings(spark, fx.dir)
            // Standing index = everything except the DAILY-SIZED batch
            // (the fixed 6,000 docs + the q126 vector slice), so the
            // standing build is comparable to a full build AND the
            // post-merge warehouse covers the complete corpus for the
            // curation run below. Merging the whole 5% src19 instead
            // would measure a batch where every doc touches a distinct
            // cluster — at that batch-to-index ratio a rebuild wins by
            // construction, which is the documented boundary of
            // incremental maintenance, not its daily shape.
            val isFixedDoc =
              col("source") === "src19" && col("doc_id") < 120000L
            val isNewVec = pmod(col("vec_id"), lit(10L)) === lit(9L)
            val bf = new scala.collection.mutable.ArrayBuffer[StageRow]
            graft.queries.Warehouse.buildOf(spark,
              docs.filter(!isFixedDoc), emb.filter(!isNewVec),
              whFull, (name, work) => { bf += stageRow(name)(work()) })
            // PRODUCTION-k cell assignment (r14 verdict #2's done
            // criterion): the same corpus's vectors assigned at
            // k ≈ √n — far past the literal-centroid threshold, so
            // this row measures the single-node kernel path (exactness
            // at this k is CellArgmaxSpec's planted-cluster pin).
            val bigK = math.ceil(math.sqrt(emb.count().toDouble)).toInt
            bf += stageRow(s"cell_assign_k$bigK") {
              graft.queries.Similarity.assignCellsAtK(emb, bigK)
                .agg(org.apache.spark.sql.functions
                  .countDistinct(col("cell"))).first(); ()
            }
            val mf = new scala.collection.mutable.ArrayBuffer[StageRow]
            graft.queries.Warehouse.mergeBatch(spark, whFull,
              docs.filter(isFixedDoc), Some(emb.filter(isNewVec)),
              (name, work) => { mf += stageRow(name)(work()) })
            // Quantized-tier serve at corpus scale (r15 verdict #2):
            // one probe vector through the int8-prefilter + exact-
            // rescore read path against the just-built store.
            val qvec = emb.filter(col("vec_id") === 123L)
              .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
              .collect()(0).getSeq[Double](0)
            bf += stageRow("quant_serve") {
              graft.queries.Similarity.annServeQuantFrom(spark, whFull,
                qvec, nprobe = 2, k = 10).collect(); ()
            }
            // BATCHED quantized serve at corpus scale (q162): a
            // 60-request population answered in ONE job whose only
            // corpus-scale read is the int8 tier — the row's wall is
            // the whole population (compare: quant_serve is ONE
            // request), and its shuffle bytes are the per-request
            // top-rescore partials, not candidates.
            val quantBatchReqs = emb
              .filter(pmod(col("vec_id"), lit(19L)) === lit(7L))
              .selectExpr("vec_id",
                "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
              .orderBy("vec_id").limit(60).collect()
              .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
            bf += stageRow("quant_serve_batch") {
              graft.queries.Similarity.annServeQuantBatchFrom(spark, whFull,
                quantBatchReqs, nprobe = 2, k = 10).collect(); ()
            }.copy(n = quantBatchReqs.size.toLong)
            // The PQ tier at corpus scale (q179, r17): the same
            // request population through the 8-BYTE codes — the scan
            // reads 8 bytes/vector vs the int8 row's 64, so wall and
            // shuffle here are the bandwidth story the tier exists
            // for (exact rescore bounds the full-precision reads at
            // requests × rescore rows).
            bf += stageRow("pq_serve_batch") {
              graft.queries.Similarity.annServePqBatchFrom(spark, whFull,
                quantBatchReqs, nprobe = 2, k = 10).collect(); ()
            }.copy(n = quantBatchReqs.size.toLong)
            // FILTERED × QUANTIZED × BATCH at corpus scale (q172, the
            // r17 unified kernel's production cell): same request
            // population through the int8 tier with the stored
            // doc_stats metadata gate — wall and shuffle must track
            // the quant_serve_batch row (the filter side is
            // index-sized, never broadcast, never a corpus read).
            bf += stageRow("filtered_quant_serve_batch") {
              graft.queries.Similarity.annServeQuantFilteredBatchFrom(
                spark, whFull, quantBatchReqs, nprobe = 2, k = 10,
                sources = graft.queries.Similarity.FilterSources).collect(); ()
            }.copy(n = quantBatchReqs.size.toLong)
            // IN-PLAN batch-hybrid fusion at corpus scale (q173, r16
            // verdict #2's done criterion): a ≥500-request eval-scale
            // population fused with ZERO driver-side rank collection —
            // both legs and the RRF algebra one lazy plan over the
            // stored postings + cells.
            val hybridTerms = graft.queries.Warehouse
              .read(spark, retrWh, "postings")
              .groupBy(col("term")).count()
              .orderBy(col("count").desc, col("term"))
              .limit(8).collect().map(_.getString(0)).toSeq
            val hybridVecs = emb
              .filter(pmod(col("vec_id"), lit(23L)) === lit(11L))
              .selectExpr("vec_id",
                "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
              .orderBy("vec_id").limit(520).collect()
              .map(r => r.getSeq[Double](1)).toSeq
            // 520 requests regardless of pool size (vectors cycle) —
            // always ABOVE InPlanFusionThreshold, so the row measures
            // the zero-collect in-plan path at every max scale. A
            // micro fixture whose strided pools come up empty skips
            // the stage instead of crashing the battery.
            if (hybridTerms.nonEmpty && hybridVecs.nonEmpty) {
              val hybridReqs = (0 until 520).map { i =>
                (i.toLong,
                  Seq(hybridTerms(i % hybridTerms.size),
                    hybridTerms((i / hybridTerms.size + 1) % hybridTerms.size))
                    .distinct,
                  hybridVecs(i % hybridVecs.size))
              }
              bf += stageRow("hybrid_batch_inplan") {
                graft.queries.RetrievalIndex.hybridServeBatchFrom(spark,
                  retrWh, whFull, hybridReqs, nprobe = 2).collect(); ()
              }.copy(n = hybridReqs.size.toLong)
            } else System.err.println(
              "[bench] hybrid_batch_inplan skipped: empty term/vector pool")
            // Drift-gated refresh UNTIL CONVERGED (r15 verdict #5) at
            // corpus scale: per-step cost is the q72 k·dim-group
            // shuffle + a map-only re-assignment — flat in k·dim, so
            // the row's wall divided by its step count is the per-step
            // figure the refit budget plans on.
            // The step count rides IN the committed row (`n`) so the
            // artifact distinguishes "more steps ran" from "each step
            // got slower" (r17 verdict #3 — stderr-only before).
            var refreshSteps = 0
            // Per-stage refresh attribution (r18 verdict #3): the
            // refresh's internal stages — refit+re-assign, int8
            // re-encode, the PQ carry-forward join, the purge
            // recompute — accumulate across the loop's steps into one
            // committed `refresh_<stage>` row each (`n` = stage
            // executions), so a refresh regression attributes to the
            // stage that moved instead of hiding in the loop total.
            // No per-stage sentinel probe (it would inflate the outer
            // row ~0.2 s per stage per step); stage rows inherit the
            // outer row's sentinel. Stage walls undershoot the outer
            // wall by the per-step drift-gate aggregate, by design.
            val refreshStageAgg =
              scala.collection.mutable.LinkedHashMap[String, StageRow]()
            val refreshMeasure: (String, () => Unit) => Unit =
              (name, work) => {
                val g0 = gcSnap(); val s0 = sysSnap()
                val k0 = taskTime.millis.get()
                val w0 = taskTime.shufWrite.get()
                val r0 = taskTime.shufRead.get()
                val t0 = System.nanoTime()
                work()
                val wall = (System.nanoTime() - t0) / 1e9
                val s1 = sysSnap(); val g1 = gcSnap()
                taskTime.drain(spark.sparkContext)
                val d = StageRow(s"refresh_$name", wall, 0.0,
                  (s1.stealJiffies - s0.stealJiffies) / userHz,
                  (g1._1 - g0._1) / 1e3,
                  (taskTime.millis.get() - k0) / 1e3,
                  (taskTime.shufWrite.get() - w0) / 1048576.0,
                  (taskTime.shufRead.get() - r0) / 1048576.0)
                refreshStageAgg.get(d.name) match {
                  case Some(p) => refreshStageAgg(d.name) = p.copy(
                    wall = p.wall + d.wall, stealS = p.stealS + d.stealS,
                    gcS = p.gcS + d.gcS, taskS = p.taskS + d.taskS,
                    shufWriteMb = p.shufWriteMb + d.shufWriteMb,
                    shufReadMb = p.shufReadMb + d.shufReadMb, n = p.n + 1)
                  case None => refreshStageAgg(d.name) = d.copy(n = 1L)
                }
              }
            val refreshRow = stageRow("refresh_converged") {
              refreshSteps = graft.queries.Warehouse
                .refreshSemanticUntilConverged(spark, whFull,
                  thresholdMicro = graft.queries.Similarity.LloydEpsMicro,
                  maxSteps = 4, measure = refreshMeasure)
            }.copy(n = refreshSteps.toLong)
            bf += refreshRow
            refreshStageAgg.values
              .foreach(r => bf += r.copy(sent = refreshRow.sent))
            System.err.println(
              s"[bench] refresh_converged ran $refreshSteps step(s)")
            // INCREMENTAL media dedup at corpus scale (r15 verdict
            // #4; candidate stage made scale-safe in r18): the daily
            // upload slice's digests (real container + decode path)
            // probe the stored media_digests. The standing side is a
            // map-only band projection joined with the BROADCAST
            // batch bands and the Hamming gate runs BEFORE the
            // distinct, so the stage's SHUFFLE is O(true near-dups)
            // — flat in index size (r17 measured 875 MB here with
            // the gate after the distinct; the banding's collision
            // floor |batch|·|standing|/2¹⁶ now costs only map-side
            // codegen'd popcounts, linear in the standing index for
            // a fixed batch, which is the documented contract).
            // Two rows, two contracts (r18): the PAIR form emits the
            // complete evidence set, so its exchange is O(true
            // pairs) — this fixture is dup-saturated (37.5M planted
            // cross-boundary pairs at 1.2M docs), so hundreds of MB
            // here is OUTPUT, not overhead. The VERDICT form is the
            // daily admission shape: per-new-payload best match via
            // a map-side min fold over the same gated broadcast
            // join, exchange O(|batch|) at ANY dup density — the
            // flat-shuffle claim lives on THIS row.
            val isNewMedia = pmod(col("doc_id"), lit(10L)) === lit(6L)
            def mediaBatchDigests() = graft.queries.TextOps
              .mediaDigestsOf(docs.filter(isNewMedia))
            def mediaStanding() = graft.queries.Warehouse
              .read(spark, whFull, "media_digests")
              .filter(pmod(col("media_id"), lit(10L)) =!= lit(6L))
            var mediaPairs = 0L
            bf += stageRow("media_increment") {
              mediaPairs = graft.queries.TextOps.mediaIncrementOf(
                mediaBatchDigests(), mediaStanding()).count(); ()
            }.copy(n = mediaPairs)
            var mediaVerdicts = 0L
            bf += stageRow("media_increment_verdict") {
              mediaVerdicts = graft.queries.TextOps.mediaIncrementVerdictOf(
                mediaBatchDigests(), mediaStanding()).count(); ()
            }.copy(n = mediaVerdicts)
            val cr = new scala.collection.mutable.ArrayBuffer[StageRow]
            val curOut = java.nio.file.Files
              .createTempDirectory("graft-bench-cur").toString
            graft.queries.CurationPipeline.run(spark, fx.dir, curOut,
              Some(t => graft.queries.Warehouse.read(spark, whFull, t)),
              (name, work) => { cr += stageRow(name)(work()) })
            // The verdict-#2 storage claim, measured: committed parquet
            // bytes of the full-precision tier vs the quantized tier.
            def dirBytes(table: String): Long = {
              val v = graft.queries.Warehouse.version(whFull)
              Option(new java.io.File(s"$whFull/v=$v/$table").listFiles())
                .getOrElse(Array()).filter(_.isFile).map(_.length).sum
            }
            val bytesPair = (dirBytes("cells"), dirBytes("cells_q8"))
            // HOT-CELL SPLIT at corpus scale (q163/q164): rebalance
            // the refresh-converged store at a tight ratio so the row
            // measures a REAL split (count aggregate + broadcast
            // 2-seed assignment over the hot members + one
            // k·dim-group mean — index-sized, no corpus read). Runs
            // after the tier-byte measurement so the committed byte
            // claim stays on the converged store. The balance effect
            // goes to stderr (max cell size before/after).
            def maxCell(): Long = graft.queries.Warehouse
              .read(spark, whFull, "cells")
              .groupBy("cell").count()
              .agg(org.apache.spark.sql.functions.max("count"))
              .first().getLong(0)
            val maxBefore = maxCell()
            var splitV: Option[Long] = None
            bf += stageRow("split_hot") {
              splitV = graft.queries.Warehouse
                .splitHotCells(spark, whFull, ratio = 1.02)
            }
            System.err.println(s"[bench] split_hot committed=" +
              s"${splitV.nonEmpty} max_cell $maxBefore -> ${maxCell()}")
            (bf.toSeq, mf.toSeq, cr.toSeq, bytesPair)
          } else (Seq.empty[StageRow], Seq.empty[StageRow],
            Seq.empty[StageRow], (0L, 0L))
        CorpusResult(n, fx.textBytes, fx.parquetBytes, fx.genSec,
          purgeRows, clusterRows, rows.toSeq, incrRow, incrRows, incrDups,
          incrFixedRow, incrFixedRows, incrFixedDups, mergeRows.toSeq,
          bloomRow, bloomBits.length.toLong, probeRow, n, probeFlagged,
          buildFullRows, mergeFullRows, curationRows,
          retrRows.toSeq, retrPostings,
          cellsBytesPair._1, cellsBytesPair._2)
      })
      catch { case e: Throwable =>
        System.err.println(s"[bench] corpus dedup section FAILED: ${e.getMessage}")
        Left(String.valueOf(e.getMessage).take(200))
      }

    // ---- streaming micro-bench (r11 verdict #5) -----------------------
    // The speed layer's two product pipelines (metrics1mSketched with
    // watermarked window state; the scored enrich path) measured for
    // rows/sec and state-store boundedness — see tools/StreamBench.
    // Detail-file only (stdout keeps its 2 KB tail contract). Disable
    // with SPARK_GRAFT_STREAMBENCH=0.
    val streamingDetail: String =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH", "1") == "0") "null"
      else try graft.tools.StreamBench.section(spark, probeDir = Some(sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] streaming section FAILED: ${e.getMessage}")
        "{\"error\":\"" +
          jsonEsc(String.valueOf(e.getMessage).take(200)) + "\"}"
      }

    // ---- serving point-query latency (r11 verdict #6) -----------------
    // The dashboard's 1 s poll contract: Q1/Q2/Q5/Q8 as repeated point
    // lookups against a compacted ServingStore snapshot, p50/p95 at ms
    // grain — see tools/ServingLatencyBench. Detail-file only; disable
    // with SPARK_GRAFT_SERVINGBENCH=0.
    val servingDetail: String =
      if (sys.env.getOrElse("SPARK_GRAFT_SERVINGBENCH", "1") == "0") "null"
      else try graft.tools.ServingLatencyBench.section(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] serving latency section FAILED: ${e.getMessage}")
        "{\"error\":\"" +
          jsonEsc(String.valueOf(e.getMessage).take(200)) + "\"}"
      }

    // Stored-index serve latency (r14): q142/q144/q146 as repeated
    // requests against the memoized index stores — same knob.
    val indexServeDetail: String =
      if (sys.env.getOrElse("SPARK_GRAFT_SERVINGBENCH", "1") == "0") "null"
      else try graft.tools.ServingLatencyBench.indexSection(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] index serve section FAILED: ${e.getMessage}")
        "{\"error\":\"" +
          jsonEsc(String.valueOf(e.getMessage).take(200)) + "\"}"
      }

    // Parameterized-request battery (r15) + BATCHED replay of the same
    // 125 requests (r16): the sequential battery measures per-request
    // latency over request variety; the batch rows measure throughput
    // of one-job-per-family serving with the speedup computed against
    // the sequential totals of the identical requests — same knob.
    val (paramServeDetail, batchServeDetail): (String, String) =
      if (sys.env.getOrElse("SPARK_GRAFT_SERVINGBENCH", "1") == "0")
        ("null", "null")
      else try graft.tools.ServingLatencyBench
        .paramAndBatchSections(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] param serve section FAILED: ${e.getMessage}")
        val err = "{\"error\":\"" +
          jsonEsc(String.valueOf(e.getMessage).take(200)) + "\"}"
        (err, err)
      }

    val hashes = names.map(n => n -> planHash(n)).toMap
    val results = names.map(n => (n, times(n).min, okAll(n)))
    // Locale-independent number formatting: the default-locale f
    // interpolator would emit comma decimal separators (invalid JSON)
    // on a comma-decimal JVM.
    def num(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Stdout keys: the bare qNN prefix ("q01_pricing_summary" → "q01")
    // — full names live in BENCH_DETAIL.json. Falls back to the full
    // name if one ever lacks the prefix.
    def shortKey(k: String): String = {
      val cut = k.indexOf('_')
      if (k.startsWith("q") && cut > 1) k.substring(0, cut) else k
    }
    // Compact per-query stdout encoding (r17 verdict #7, see the
    // output-contract scaladoc): positional centisecond integers.
    def qNumOf(k: String): Option[Int] = {
      val sk = shortKey(k)
      if (sk.length > 1 && sk.startsWith("q") && sk.drop(1).forall(_.isDigit))
        Some(sk.drop(1).toInt)
      else None
    }
    val byNumPairs = results.flatMap { case (k, v, _) =>
      qNumOf(k).map(_ -> math.round(v * 100).toString) }
    // A qNN prefix collision would silently last-win through .toMap
    // and drop a timing from the positional q_cs array (ADVICE r18) —
    // fail loudly instead; registry names are the fix.
    require(byNumPairs.map(_._1).distinct.size == byNumPairs.size,
      "duplicate qNN prefixes in the bench registry: " +
        byNumPairs.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
          .mkString(", "))
    val byNum = byNumPairs.toMap
    val qcs = (1 to (if (byNum.isEmpty) 0 else byNum.keys.max))
      .map(n => byNum.getOrElse(n, "null")).mkString("[", ",", "]")
    val qcsExtra = jmap(results.collect {
      case (k, v, _) if qNumOf(k).isEmpty =>
        shortKey(k) -> math.round(v * 100).toString })
    val repsJson = jmap(names.map(n =>
      n -> times(n).map(num("%.4f", _)).mkString("[", ",", "]")))
    val hashJson = jmap(names.map(n => n -> ("\"" + hashes(n) + "\"")))
    val loadJson = loads.map(num("%.2f", _)).mkString("[", ",", "]")
    def darr(vs: Seq[Double], fmt: String = "%.4f"): String =
      vs.map(num(fmt, _)).mkString("[", ",", "]")
    val sentJson  = jmap(names.map(n => n -> darr(sents(n).toSeq)))
    val stealJson = jmap(names.map(n => n -> darr(steal(n).toSeq, "%.2f")))
    val thrJson   = jmap(names.map(n => n -> darr(thrtl(n).toSeq, "%.2f")))
    val nThrJson  = jmap(names.map(n => n -> nThr(n).mkString("[", ",", "]")))
    val gcJson    = jmap(names.map(n => n -> darr(gcSec(n).toSeq, "%.3f")))
    val gcCntJson = jmap(names.map(n => n -> gcCnt(n).mkString("[", ",", "]")))
    val taskJson  = jmap(names.map(n => n -> darr(taskS(n).toSeq, "%.2f")))
    val failedNames = results.collect { case (k, _, false) => k }
    def jarr(ks: Seq[String]): String =
      ks.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Shared stage-row emitter (rawlog + corpus sections). input_mb
    // rides only on rows that measured it (rawlog, r20) — absent
    // elsewhere so corpus rows keep their r13–r19 key set.
    def stageJson(st: StageRow): String =
      s"""{"stage":"${st.name}","wall_sec":${num("%.3f", st.wall)},""" +
      s""""sentinel":${num("%.4f", st.sent)},"steal_sec":${num("%.2f", st.stealS)},""" +
      s""""gc_sec":${num("%.3f", st.gcS)},"task_sec":${num("%.2f", st.taskS)},""" +
      s""""shuffle_write_mb":${num("%.2f", st.shufWriteMb)},""" +
      s""""shuffle_read_mb":${num("%.2f", st.shufReadMb)}""" +
      (if (st.inputMb >= 0)
        s""","input_mb":${num("%.2f", st.inputMb)},""" +
        s""""read_mb_per_sec":${num("%.1f",
          st.inputMb / math.max(st.wall, 1e-9))}"""
      else "") +
      (if (st.sentAfter >= 0)
        s""","sentinel_after":${num("%.4f", st.sentAfter)},""" +
        s""""degraded":${st.degraded}"""
      else "") +
      (if (st.n >= 0) s""","n":${st.n}}""" else "}")
    def stagesJson(sts: Seq[StageRow]): String =
      sts.map(stageJson).mkString("[", ",", "]")
    // Raw-log scale JSON: full fidelity to the detail file, min-only
    // summary to stdout (the 2 KB tail contract).
    val rawlogDetail = rawlogResults match {
      case Left(err) => "{\"error\":\"" + jsonEsc(err) + "\"}"
      case Right(rs) => rs.map { r =>
        s"""{"blocks":${r.blocks},"lines":${r.lines},"bytes":${r.bytes},""" +
        s""""gen_sec":${num("%.2f", r.genSec)},"q61_sec":${darr(r.q61)},""" +
        s""""q62_sec":${darr(r.q62)},"sentinel":${darr(r.sent)},""" +
        s""""steal_sec":${darr(r.stealS, "%.2f")},"gc_sec":${darr(r.gcS, "%.3f")},""" +
        s""""task_sec":${darr(r.taskS, "%.2f")},""" +
        s""""stages":${stagesJson(r.stages)}}"""
      }.mkString("[", ",", "]")
    }
    val corpusDedupDetail = corpusResults match {
      case Left(err) => "{\"error\":\"" + jsonEsc(err) + "\"}"
      case Right(rs) => rs.map { r =>
        def incJson(inc: StageRow, rows: Long, dups: Long): String =
          s"""{"wall_sec":${num("%.3f", inc.wall)},"rows":$rows,""" +
          s""""dups":$dups,"sentinel":${num("%.4f", inc.sent)},""" +
          s""""steal_sec":${num("%.2f", inc.stealS)},"gc_sec":${num("%.3f", inc.gcS)},""" +
          s""""task_sec":${num("%.2f", inc.taskS)},""" +
          s""""shuffle_write_mb":${num("%.2f", inc.shufWriteMb)},""" +
          s""""shuffle_read_mb":${num("%.2f", inc.shufReadMb)}}"""
        s"""{"docs":${r.nDocs},"text_bytes":${r.textBytes},""" +
        s""""parquet_bytes":${r.parquetBytes},"gen_sec":${num("%.2f", r.genSec)},""" +
        s""""cluster_rows":${r.clusterRows},"purge_rows":${r.purgeRows},""" +
        s""""incr":${incJson(r.incr, r.incrRows, r.incrDups)},""" +
        s""""incr_fixed":${incJson(r.incrFixed, r.incrFixedRows, r.incrFixedDups)},""" +
        s""""merge_stages":${stagesJson(r.mergeStages)},""" +
        s""""bloom":${stageJson(r.bloom)},"bloom_bytes":${r.bloomBytes},""" +
        s""""probe":${stageJson(r.probe)},"probe_rows":${r.probeRows},""" +
        s""""probe_flagged":${r.probeFlagged},""" +
        s""""probe_rows_per_sec":${num("%.0f", r.probeRows / math.max(r.probe.wall, 1e-9))},""" +
        s""""build_full_stages":${stagesJson(r.buildFullStages)},""" +
        s""""merge_full_stages":${stagesJson(r.mergeFullStages)},""" +
        s""""curation_stages":${stagesJson(r.curationStages)},""" +
        s""""retr_stages":${stagesJson(r.retrStages)},""" +
        s""""retr_postings":${r.retrPostings},""" +
        s""""cells_bytes":${r.cellsBytes},"cells_q8_bytes":${r.cellsQ8Bytes},""" +
        s""""cells_q8_ratio":${num("%.2f",
          if (r.cellsQ8Bytes > 0) r.cellsBytes.toDouble / r.cellsQ8Bytes else 0.0)},""" +
        s""""stages":${stagesJson(r.stages)}}"""
      }.mkString("[", ",", "]")
    }

    val rawlogStdout = rawlogResults match {
      case Left(_)   => "\"error\""
      case Right(rs) =>
        s"""{"mb":${rs.map(r => num("%.0f", r.bytes / 1048576.0)).mkString("[", ",", "]")},""" +
        s""""q61":${rs.map(r => num("%.1f", r.q61.min)).mkString("[", ",", "]")},""" +
        s""""q62":${rs.map(r => num("%.1f", r.q62.min)).mkString("[", ",", "]")}}"""
    }
    val nFailed = failedNames.length
    // Failed queries' wall time (exception-path noise) is excluded from
    // the headline metric so totals stay comparable across runs.
    val total = results.collect { case (_, t, true) => t }.sum
    val coreTotal = results.collect { case (n, t, true) if coreTier(n) => t }.sum
    val detail =
      s"""{"metric":"total","value":${num("%.4f", total)},"unit":"sec","queries":$repsJson,"plan_hash":$hashJson,"loadavg":$loadJson,"sentinel":$sentJson,"sentinel_calib":${darr(calib)},"sentinel_tail":${darr(tailSent.toSeq)},"steal_sec":$stealJson,"throttle_sec":$thrJson,"nr_throttled":$nThrJson,"gc_sec":$gcJson,"gc_count":$gcCntJson,"task_sec":$taskJson,"rawlog":$rawlogDetail,"corpus_dedup":$corpusDedupDetail,"streaming":$streamingDetail,"serving":$servingDetail,"index_serve":$indexServeDetail,"index_serve_param":$paramServeDetail,"index_serve_batch":$batchServeDetail,"core20":{"n":${coreTier.size},"value":${num("%.4f", coreTotal)},"reps":$coreReps,"tail_reps":$tailReps},"cpu_quota":"${cpuQuota()}","failed":${jarr(failedNames)},"n_failed":$nFailed,"sf":"$sfDir"}"""
    val detailPath = java.nio.file.Paths.get("BENCH_DETAIL.json")
    java.nio.file.Files.write(detailPath, (detail + "\n").getBytes("UTF-8"))
    // Headline fields LAST: front-truncation of a long line must not
    // eat them (see the scaladoc's output contract).
    println(s"""{"q_cs":$qcs,"q_cs_extra":$qcsExtra,"rawlog":$rawlogStdout,"core20":${num("%.3f", coreTotal)},"failed":${jarr(failedNames.map(shortKey))},"n_failed":$nFailed,"sf":"$sfDir","detail":"${detailPath.toAbsolutePath}","unit":"sec","metric":"total","value":${num("%.3f", total)}}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
