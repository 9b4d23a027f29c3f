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
  * Output contract, hardened after r5: the consumer keeps only the
  * LAST ~2000 chars of stdout and truncation cuts from the FRONT, so
  * the printed line must FIT ENTIRELY inside that tail: per-query
  * keys are the bare `qNN` prefix at 3 decimals (~12 chars each —
  * the full-name map at 76 queries measured 2.6 KB and was clipped
  * mid-line in the r6 dry run), no rep arrays or plan hashes inline,
  * and the headline fields (`metric`/`value`/`n_failed`/`sf`) are
  * emitted LAST inside the object as a second line of defense.
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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
          .replaceAll("@[0-9a-f]+", "@x")
          .replaceAll("\\s+", " ")
        java.security.MessageDigest.getInstance("MD5")
          .digest(norm.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
      } catch { case scala.util.control.NonFatal(_) => "plan_error" }

    def loadAvg(): Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage

    val names = SparkEntry.queries.keys.toSeq.sorted

    // Warm-up (JIT, codegen caches, parquet footer reads) on sf0.001.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) names.foreach(execute(_, warmDir))

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val loads = new scala.collection.mutable.ArrayBuffer[Double]
    val times = names.map(_ -> new scala.collection.mutable.ArrayBuffer[Double]).toMap
    val okAll = new scala.collection.mutable.HashMap[String, Boolean]
      .withDefaultValue(true)
    (1 to reps).foreach { _ =>
      loads += loadAvg()
      names.foreach { name =>
        val t0 = System.nanoTime()
        val ok = execute(name, sfDir)
        times(name) += (System.nanoTime() - t0) / 1e9
        if (!ok) okAll(name) = false
      }
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
    val qs = jmap(results.map { case (k, v, _) => shortKey(k) -> num("%.3f", v) })
    val repsJson = jmap(names.map(n =>
      n -> times(n).map(num("%.4f", _)).mkString("[", ",", "]")))
    val hashJson = jmap(names.map(n => n -> ("\"" + hashes(n) + "\"")))
    val loadJson = loads.map(num("%.2f", _)).mkString("[", ",", "]")
    val failedNames = results.collect { case (k, _, false) => k }
    def jarr(ks: Seq[String]): String =
      ks.map("\"" + _ + "\"").mkString("[", ",", "]")
    val nFailed = failedNames.length
    // Failed queries' wall time (exception-path noise) is excluded from
    // the headline metric so totals stay comparable across runs.
    val total = results.collect { case (_, t, true) => t }.sum
    val detail =
      s"""{"metric":"total","value":${num("%.4f", total)},"unit":"sec","queries":$repsJson,"plan_hash":$hashJson,"loadavg":$loadJson,"failed":${jarr(failedNames)},"n_failed":$nFailed,"sf":"$sfDir"}"""
    val detailPath = java.nio.file.Paths.get("BENCH_DETAIL.json")
    java.nio.file.Files.write(detailPath, (detail + "\n").getBytes("UTF-8"))
    // Headline fields LAST: front-truncation of a long line must not
    // eat them (see the scaladoc's output contract).
    println(s"""{"queries":$qs,"failed":${jarr(failedNames.map(shortKey))},"n_failed":$nFailed,"sf":"$sfDir","detail":"${detailPath.toAbsolutePath}","unit":"sec","metric":"total","value":${num("%.3f", total)}}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
