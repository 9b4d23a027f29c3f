package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query OVERHEAD decomposition (r20 optimization round; not part
  * of the driver contract): at sf0.1 the registry runs at ~5% executor
  * utilization (BENCH_DETAIL r19: 183 task-sec against 108 wall-sec on
  * 32 cores), so wall time is dominated by DRIVER rounds — job
  * launches, AQE stage materializations, broadcast builds, planning.
  * This main counts them: for each query it reports wall, catalyst
  * phase times (parsing/analysis/optimization/planning from the
  * QueryPlanningTracker), and listener-observed jobs / stages / tasks
  * / task-seconds, so "which lever moves this query" is measured, not
  * guessed (guide §1.1).
  *
  * `sbt "runMain graft.tools.DiagOverhead /root/testdata/sf0.1 q137,q99"`
  */
object DiagOverhead {

  private class CountListener extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); ()
    }
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      ()
    }
    def snap(): (Long, Long, Long, Long) =
      (jobs.get(), stages.get(), tasks.get(), taskMs.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val wanted = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-overhead")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new CountListener
    spark.sparkContext.addSparkListener(listener)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.isEmpty || wanted.exists(n.startsWith))

    // Warm-up pass (JIT, codegen cache, parquet footers) — same
    // discipline as the bench.
    names.foreach { n =>
      try noop(graft.SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[diag] warmup $n FAILED: ${e.getMessage}") }
    }

    println(f"${"query"}%-28s ${"wall"}%7s ${"plan"}%6s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"task_s"}%7s")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val (j0, s0, t0c, m0) = listener.snap()
        val w0 = System.nanoTime()
        noop(df)
        val wall = (System.nanoTime() - w0) / 1e9
        // Phase times of THIS DataFrame's analysis (execution-side
        // planning of the noop write is not tracked here; the analysis/
        // optimization split still localizes catalyst-heavy queries).
        val phases = df.queryExecution.tracker.phases
        val planMs = phases.values.map(p => p.endTimeMs - p.startTimeMs).sum
        Thread.sleep(150) // let listener events drain (approximate)
        val (j1, s1, t1c, m1) = listener.snap()
        println(f"$n%-28s ${wall}%7.3f ${planMs / 1e3}%6.3f ${j1 - j0}%5d ${s1 - s0}%5d ${t1c - t0c}%6d ${(m1 - m0) / 1e3}%7.2f")
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
