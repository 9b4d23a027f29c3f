package graft.tools

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.log.Templates
import graft.ml.Scorer
import graft.queries.RawLog
import graft.streaming.{ServingStore, StreamPipeline}

/** Streaming throughput micro-bench (round-11 verdict #5): BENCH covers
  * only batch, so this section measures the speed layer's two product
  * pipelines end to end and proves the state contract the scaladocs
  * claim:
  *
  *  1. **metrics path** (stateful): file stream source →
  *     `StreamPipeline.runMetricsSketched` (watermarked 1-min windows,
  *     exact metrics + KLL/HLL sketch state) → `ServingStore` upsert.
  *     Event time advances 2 minutes per micro-batch under the product
  *     default 5-minute watermark, so windows close as the stream runs
  *     — bounded state means `stateOperators.numRowsTotal` PLATEAUS
  *     (open windows only) instead of growing with batches processed.
  *     Run at ≥3 batch sizes: flat-to-falling µs/row across a 16×
  *     size range shows per-row cost is flat and per-batch overhead is
  *     the fixed term (the micro-batch scheduling floor).
  *
  *  2. **scored path** (stateless-per-batch): file stream of JSON
  *     block-session messages → `StreamPipeline.run` (from_json →
  *     dedupe → re-parse log text with the BATCH LogParser/Templates/
  *     Features code → score → keyed upsert). Rows/sec here is
  *     messages/sec with each message carrying a multi-line log body —
  *     the reference consumes these ONE AT A TIME in a Python poll
  *     loop (`kafka_consumer.py:13-40`); a micro-batch runs the same
  *     dataflow as one short Spark job per batch.
  *
  * Wall times are measured around processAllAvailable with the batch
  * file already landed — publish cost belongs to the broker side; the
  * timed span is still the full commit cycle including the store's
  * snapshot swap. State rows/
  * bytes come from `StreamingQueryProgress.stateOperators`. Everything
  * lands in BENCH_DETAIL.json's `streaming` key; per the stdout size
  * contract the one-line bench output carries no streaming numbers.
  *
  * Bench calls [[section]]; `main` runs it standalone for iteration.
  */
object StreamBench {

  /** One micro-batch's measurements. */
  final case class BatchStat(rows: Long, wallSec: Double,
      stateRows: Long, stateBytes: Long)

  final case class SizeRun(batchRows: Int, stats: Seq[BatchStat]) {
    /** Steady-state throughput: skip the first batch (query start +
      * codegen warm-up rides on it). */
    def rowsPerSec: Double = {
      val steady = if (stats.length > 1) stats.tail else stats
      steady.map(_.rows).sum / math.max(steady.map(_.wallSec).sum, 1e-9)
    }
    def usPerRow: Double = 1e6 / math.max(rowsPerSec, 1e-9)
  }

  private def num(fmt: String, v: Double): String =
    String.format(java.util.Locale.ROOT, fmt, Double.box(v))

  private def jStats(ss: Seq[BatchStat]): String = ss.map { s =>
    s"""{"rows":${s.rows},"wall_sec":${num("%.3f", s.wallSec)},""" +
      s""""state_rows":${s.stateRows},"state_bytes":${s.stateBytes}}"""
  }.mkString("[", ",", "]")

  private def jRuns(rs: Seq[SizeRun]): String = rs.map { r =>
    s"""{"batch_rows":${r.batchRows},"rows_per_sec":${num("%.0f", r.rowsPerSec)},""" +
      s""""us_per_row":${num("%.2f", r.usPerRow)},"batches":${jStats(r.stats)}}"""
  }.mkString("[", ",", "]")

  private def lastState(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) =
    Option(q.lastProgress).map { p =>
      val ops = p.stateOperators
      (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
    }.getOrElse((0L, 0L))

  // ---- metrics path ------------------------------------------------

  /** Deterministic telemetry batch `k` of `n` rows spanning event-time
    * minutes [2k, 2k+2): monotone event time drives the watermark
    * forward so the 5-minute default closes windows as the run
    * advances. Values/users/errors are seed-fixed (no wall clock). */
  private def telemetryBatch(k: Int, n: Int): Seq[(String, String, Double, Boolean)] =
    (0 until n).map { i =>
      val sec = k * 120 + i * 120 / n
      val ts = f"2024-03-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d"
      (ts, s"user_${(i * 31 + k * 7) % 997}",
        ((i * 131 + k * 17) % 1000) / 10.0, (i + k) % 13 == 0)
    }

  /** Land one batch file in a FileStreamSource-watched dir: write to a
    * dot-prefixed temp name IN the dir (hidden from the source's
    * listing), fsync-free ATOMIC_MOVE to the visible name — the source
    * sees either nothing or the complete file, never a torn batch.
    *
    * Why files and not MemoryStream: a MemoryStream batch becomes a
    * LocalTableScan whose rows ride INSIDE every task binary — the
    * "task of very large size" warnings in the r11 bench tail (2.6 MB
    * ≈ one scored batch), and at 1000 executors a per-task driver
    * broadcast of the whole batch. A file source is also the honest
    * harness: executors PULL their split like they would from a
    * broker, the driver ships only the file name. */
  private def landBatch(dir: java.nio.file.Path, name: String,
      lines: IterableOnce[String]): Unit = {
    val tmp = dir.resolve(s".$name.tmp")
    val w = Files.newBufferedWriter(tmp)
    try lines.iterator.foreach { l => w.write(l); w.write('\n') }
    finally w.close()
    Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def runMetrics(spark: SparkSession, batchRows: Int, nBatches: Int): SizeRun = {
    val store = Files.createTempDirectory("graft-sb-metrics-store").toString
    val ckpt = Files.createTempDirectory("graft-sb-metrics-ckpt").toString
    val srcDir = Files.createTempDirectory("graft-sb-metrics-src")
    val events = spark.readStream
      .schema("ts STRING, user_id STRING, value DOUBLE, is_err BOOLEAN")
      .json(srcDir.toString)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("value"), col("is_err"))
    val query = StreamPipeline.runMetricsSketched(
      events, "ts", col("is_err"), "value", "user_id", store, ckpt)
    val stats = try {
      (0 until nBatches).map { k =>
        val batch = telemetryBatch(k, batchRows)
        landBatch(srcDir, f"batch-$k%05d.json", batch.map {
          case (ts, user, value, isErr) =>
            s"""{"ts":"$ts","user_id":"$user","value":$value,"is_err":$isErr}"""
        })
        val t0 = System.nanoTime()
        query.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        val (sr, sb) = lastState(query)
        BatchStat(batch.length.toLong, wall, sr, sb)
      }
    } finally query.stop()
    SizeRun(batchRows, stats)
  }

  // ---- scored path -------------------------------------------------

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  /** Batch `k` of `n` JSON block-session messages, each with a
    * `linesPer`-line log body drawn from the production 29-template
    * dim via the fixture generators' shared `LogSynth` shapes. */
  private def messageBatch(k: Int, n: Int, linesPer: Int,
      templates: IndexedSeq[Templates.Template]): Seq[String] =
    (0 until n).map { i =>
      val rng = new Random(k * 1000003L + i)
      val id = s"blk_${k}00000$i"
      val lines = (0 until linesPer).map { j =>
        val t = templates(rng.nextInt(templates.length))
        LogSynth.rawLine(rng, LogSynth.dates(rng.nextInt(3)),
          rng.nextInt(50000) + j, (t.id, t.pattern), id)
      }
      val start = "2008-11-09 20:00:00"
      val end = f"2008-11-09 21:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d"
      s"""{"block_id":"$id","start_ts":"$start","end_ts":"$end",""" +
        s""""duration_sec":${60 + rng.nextInt(3600)},""" +
        s""""log_full":"${jsonEscape(lines.mkString("\n"))}","num_lines":$linesPer}"""
    }

  def runScored(spark: SparkSession, batchRows: Int, nBatches: Int,
      linesPer: Int = 8): SizeRun = {
    val templates = Templates.load(spark, RawLog.templatesPath)
    // Deterministic stand-in weights (the artifact-exported q59 scorer
    // is equivalent work: one codegen'd dot product per row).
    val scorer = Scorer.LinearScorer(
      templates.indices.map(i => (i % 5 - 2) * 0.1), -0.5)
    val store = Files.createTempDirectory("graft-sb-scored-store").toString
    val ckpt = Files.createTempDirectory("graft-sb-scored-ckpt").toString
    val srcDir = Files.createTempDirectory("graft-sb-scored-src")
    // One JSON message per line; `text` yields the same `value` string
    // column the Kafka source would (see landBatch for why files).
    val query = StreamPipeline.run(
      spark.readStream.text(srcDir.toString).select(col("value")),
      templates, scorer, store, ckpt)
    val stats = try {
      (0 until nBatches).map { k =>
        val batch = messageBatch(k, batchRows, linesPer, templates.toIndexedSeq)
        landBatch(srcDir, f"batch-$k%05d.jsonl", batch)
        val t0 = System.nanoTime()
        query.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        val (sr, sb) = lastState(query)
        BatchStat(batch.length.toLong, wall, sr, sb)
      }
    } finally query.stop()
    SizeRun(batchRows, stats)
  }

  // ---- stream-side index-dedup probe path (r13 verdict #7) ---------

  /** The `StreamOps.flagIndexDuplicates` speed-layer probe measured as
    * a stream: documents land as JSONL batch files, each micro-batch
    * runs the codegen'd signature→band→bloom expression (probe ON) or
    * a pass-through projection of the same columns (probe OFF — the
    * baseline isolating the probe's marginal per-row cost). Stateless
    * by construction, so `state_rows` stays 0 at any stream length.
    *
    * Bloom sizing at index scale (the documented tradeoff): bits/key ≈
    * 1.44·log₂(1/fpp) — the default fpp=1e-6 costs ~28.8 bits per
    * stored band bucket, i.e. ~6.9 MB of literal riding the plan at
    * the 1.2M-doc corpus index (measured in the corpus section's
    * `bloom_bytes`). The literal form is right up to a few MB; past
    * that, raise fpp (1e-3 ⇒ ~2.4 MB at 10× the buckets — over-flags
    * route to the exact confirmer anyway) or move the probe to the
    * q94 broadcast-join batch path. */
  def runDupProbe(spark: SparkSession, sfDir: String, batchRows: Int,
      nBatches: Int, probeOn: Boolean,
      bloomBits: Array[Byte]): SizeRun = {
    val srcDir = Files.createTempDirectory("graft-sb-probe-src")
    val base = spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(srcDir.toString)
    val flagged =
      if (probeOn)
        graft.streaming.StreamOps.flagIndexDuplicates(base, "text", bloomBits)
      else base.withColumn("dup_candidate", lit(false))
    val query = flagged.writeStream.format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sb-probe-ckpt").toString)
      .start()
    val all = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .limit(batchRows * nBatches).collect()
    // Small fixtures wrap around so every micro-batch carries rows
    // (re-delivery is exactly what the stateless probe must tolerate).
    val docs = Array.tabulate(batchRows * nBatches)(i => all(i % all.length))
    val stats = try {
      (0 until nBatches).map { k =>
        val slice = docs.slice(k * batchRows, (k + 1) * batchRows)
        landBatch(srcDir, f"batch-$k%05d.jsonl", slice.iterator.map { r =>
          s"""{"doc_id":${r.getLong(0)},"text":"${jsonEscape(r.getString(1))}"}"""
        })
        val t0 = System.nanoTime()
        query.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        val (sr, sb) = lastState(query)
        BatchStat(slice.length.toLong, wall, sr, sb)
      }
    } finally query.stop()
    SizeRun(batchRows, stats)
  }

  /** The BENCH_DETAIL `streaming` JSON: metrics path at 3 batch sizes
    * (16× range) + scored path at one production-shaped size + the
    * index-dedup probe path (probe on vs off over the same stream;
    * `probeDir` supplies the corpus whose stored band index feeds the
    * bloom — the bench passes its SF dir, whose fixture warehouse the
    * query reps already built). The boundedness evidence is in the
    * per-batch `state_rows` arrays — they plateau at the open-window
    * count once the event-time span passes the watermark (and stay 0
    * on the stateless probe path). */
  def section(spark: SparkSession,
      metricSizes: Seq[Int] = Seq(10000, 40000, 160000),
      metricBatches: Int = 8,
      scoredRows: Int = 2000, scoredBatches: Int = 4,
      probeDir: Option[String] = None,
      probeRows: Int = 1000, probeBatches: Int = 4): String = {
    val metrics = metricSizes.map(runMetrics(spark, _, metricBatches))
    val scored = runScored(spark, scoredRows, scoredBatches)
    // A 5× batch size beside the production-shaped one (r18 verdict
    // #5): the scored path's per-batch cost is dominated by fixed
    // per-batch work (stage scheduling, store snapshot rewrite), so
    // rows/s must rise near-linearly with batch size — the evidence
    // that the path is overhead-bound at 2 k, not compute-bound.
    val scoredBig = runScored(spark, scoredRows * 5, 3)
    val probe = probeDir.map { d =>
      val t0 = System.nanoTime()
      val bloom = graft.queries.Dedup.bandHashBloom(spark, d)
      val bloomSec = (System.nanoTime() - t0) / 1e9
      val on = runDupProbe(spark, d, probeRows, probeBatches,
        probeOn = true, bloom)
      val off = runDupProbe(spark, d, probeRows, probeBatches,
        probeOn = false, bloom)
      s"""{"bloom_build_sec":${num("%.2f", bloomSec)},""" +
        s""""bloom_bytes":${bloom.length},"fpp":1e-6,""" +
        s""""probe_on":${jRuns(Seq(on))},"probe_off":${jRuns(Seq(off))}}"""
    }.getOrElse("null")
    s"""{"metrics_path":${jRuns(metrics)},"scored_path":${jRuns(Seq(scored, scoredBig))},""" +
      s""""scored_profile":${scoredProfile(spark, scoredRows)},""" +
      s""""dup_probe":$probe,""" +
      s""""watermark":"5 minutes","event_minutes_per_batch":2}"""
  }

  /** Stage attribution of the scored path's per-batch wall (r18
    * verdict #5), measured in batch mode at the scored_path's exact
    * shape: JSON decode, the batch-formulated enrich (explode →
    * keyed agg → join — the q62 shape the pipeline served through
    * r18), the map-only per-message `enrichLocal` the pipeline serves
    * now, and the serving-store upsert isolated over a checkpointed
    * enriched frame (cold store, min of 3 reps each). The residual
    * between these stages and the streamed per-batch wall is the
    * harness itself (file-source listing, offset/commit log). */
  def scoredProfile(spark: SparkSession, batchRows: Int = 2000,
      linesPer: Int = 8): String = {
    import spark.implicits._
    val templates = Templates.load(spark, RawLog.templatesPath)
    val scorer = Scorer.LinearScorer(
      templates.indices.map(i => (i % 5 - 2) * 0.1), -0.5)
    val raw = messageBatch(7, batchRows, linesPer, templates.toIndexedSeq)
      .toDF("value")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def min3(work: () => Unit): Double =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); work(); (System.nanoTime() - t0) / 1e9
      }.min
    val decodeSec = min3(() => noop(graft.streaming.StreamMessages.parse(raw)))
    val parsed = graft.streaming.StreamMessages.parse(raw)
      .localCheckpoint(false)
    val globalSec = min3(() =>
      noop(graft.streaming.StreamTransform.enrich(parsed, templates, scorer)))
    val localSec = min3(() =>
      noop(graft.streaming.StreamTransform.enrichLocal(parsed, templates, scorer)))
    val enriched = graft.streaming.StreamTransform
      .enrichLocal(parsed, templates, scorer).localCheckpoint(false)
    val store = Files.createTempDirectory("graft-sb-profile-store").toString
    var id = 0L
    val upsertSec = min3(() => {
      id += 1
      ServingStore.upsert(enriched, store, "block_id", id); ()
    })
    s"""{"batch_rows":$batchRows,"lines_per":$linesPer,""" +
      s""""decode_sec":${num("%.3f", decodeSec)},""" +
      s""""enrich_global_sec":${num("%.3f", globalSec)},""" +
      s""""enrich_local_sec":${num("%.3f", localSec)},""" +
      s""""upsert_sec":${num("%.3f", upsertSec)},""" +
      s""""local_vs_global_speedup":${num("%.2f", globalSec / localSec)}}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(section(spark))
    spark.stop()
  }
}
