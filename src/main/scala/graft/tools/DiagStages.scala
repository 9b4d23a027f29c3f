package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-STAGE decomposition of one or more registry queries (r20
  * optimization round; not part of the driver contract): prints every
  * completed stage's wall, executor run/cpu time, task count, I/O and
  * shuffle bytes, plus the stage's callsite name — the localizer for
  * "which operator inside this 25-stage query owns the CPU".
  *
  * `sbt "runMain graft.tools.DiagStages /root/testdata/sf0.1 q137"`
  */
object DiagStages {

  final case class Row(id: Int, name: String, tasks: Int, wallMs: Long,
      runMs: Long, cpuMs: Long, inMb: Double, swMb: Double, srMb: Double)

  private class StageListener extends org.apache.spark.scheduler.SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      val wall = (for {s <- si.submissionTime; c <- si.completionTime}
        yield c - s).getOrElse(-1L)
      rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks,
        wall, m.executorRunTime, m.executorCpuTime / 1000000L,
        m.inputMetrics.bytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0))
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val wanted = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-stages")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.isEmpty || wanted.exists(n.startsWith))
    names.foreach { n =>
      // Warm (construction side effects, JIT, codegen) — stages of the
      // warm pass are not listened to.
      try noop(graft.SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[diag] warmup $n FAILED: ${e.getMessage}") }
      val listener = new StageListener
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try noop(graft.SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"===== $n wall=${wall}%.3f s =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"wall"}%7s ${"run_s"}%7s ${"cpu_s"}%7s ${"in_mb"}%8s ${"sw_mb"}%8s ${"sr_mb"}%8s  name")
      import scala.jdk.CollectionConverters._
      listener.rows.asScala.toSeq.sortBy(_.id).foreach { r =>
        println(f"${r.id}%6d ${r.tasks}%5d ${r.wallMs / 1e3}%7.3f ${r.runMs / 1e3}%7.3f ${r.cpuMs / 1e3}%7.3f ${r.inMb}%8.2f ${r.swMb}%8.2f ${r.srMb}%8.2f  ${r.name}")
      }
      val tot = listener.rows.asScala.toSeq
      println(f"[sum] stages=${tot.size} run=${tot.map(_.runMs).sum / 1e3}%.2f s cpu=${tot.map(_.cpuMs).sum / 1e3}%.2f s")
    }
    spark.stop()
  }
}
