package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.log.Templates
import graft.ml.Scorer
import graft.queries.RawLog
import graft.streaming.{ServingStore, StreamMessages, StreamTransform}

/** Dev diagnostic (not part of the driver contract): attribute the
  * scored stream path's per-batch wall to its stages — JSON decode,
  * enrich (parse → native template tag → keyed agg → join → score),
  * serving-store upsert, and the streaming harness overhead that
  * remains (offset/commit log, file-source listing) — at the
  * StreamBench scored_path's exact batch shape (2000 messages × 8
  * lines). `sbt "runMain graft.tools.DiagScored"`. */
object DiagScored {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val linesPer = 8
    val templates = Templates.load(spark, RawLog.templatesPath)
    val scorer = Scorer.LinearScorer(
      templates.indices.map(i => (i % 5 - 2) * 0.1), -0.5)

    // The StreamBench messageBatch shape, inlined.
    def batchJson(k: Int): Seq[String] = (0 until n).map { i =>
      val rng = new scala.util.Random(k * 1000003L + i)
      val id = s"blk_${k}00000$i"
      val lines = (0 until linesPer).map { j =>
        val t = templates(rng.nextInt(templates.length))
        LogSynth.rawLine(rng, LogSynth.dates(rng.nextInt(3)),
          rng.nextInt(50000) + j, (t.id, t.pattern), id)
      }
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      s"""{"block_id":"$id","start_ts":"2008-11-09 20:00:00",""" +
        s""""end_ts":"2008-11-09 21:01:02","duration_sec":600,""" +
        s""""log_full":"${esc(lines.mkString("\n"))}","num_lines":$linesPer}"""
    }

    val store = Files.createTempDirectory("graft-diag-scored").toString
    def time(label: String)(work: => Unit): Unit = {
      val walls = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $label%-18s min ${walls.min}%.3f s  " +
        walls.map(w => f"$w%.3f").mkString("[", ", ", "]"))
    }

    (0 until 3).foreach { k =>
      val raw = batchJson(k).toDF("value")
      time(s"b$k decode") {
        StreamMessages.parse(raw).write.format("noop").mode("overwrite").save()
      }
      val parsed = StreamMessages.parse(raw)
      time(s"b$k enrich") {
        StreamTransform.enrich(parsed, templates, scorer)
          .write.format("noop").mode("overwrite").save()
      }
      // Sub-stage attribution of the enrich wall.
      locally {
        import graft.log.{Features, LogParser}
        val deduped = StreamTransform.dedupeLatest(parsed)
        time(s"b$k  dedupe") {
          deduped.write.format("noop").mode("overwrite").save()
        }
        val lines = deduped
          .select(explode(split(col("log_full"), "\n")).as("value"))
        val parsedLines = LogParser.withBlock(LogParser.parse(lines, "value"))
        time(s"b$k  parse") {
          parsedLines.write.format("noop").mode("overwrite").save()
        }
        val tagged = Templates.tagNative(parsedLines, templates)
        time(s"b$k  tag") {
          tagged.write.format("noop").mode("overwrite").save()
        }
        val counts = Features.eventCounts(tagged, templates.map(_.id))
        time(s"b$k  counts") {
          counts.write.format("noop").mode("overwrite").save()
        }
        val joined = deduped.join(counts, Seq("block_id"), "left")
        time(s"b$k  join") {
          joined.write.format("noop").mode("overwrite").save()
        }
      }
      time(s"b$k enrichLocal") {
        StreamTransform.enrichLocal(parsed, templates, scorer)
          .write.format("noop").mode("overwrite").save()
      }
      // Materialized BEFORE the timed upsert (ADVICE r19): without the
      // checkpoint the upsert wall re-runs enrichLocal and this tool
      // misattributes the very split it exists to produce (StreamBench.
      // scoredProfile already does this; the count() forces the lazy
      // checkpoint outside the timed window).
      val enriched = StreamTransform.enrichLocal(parsed, templates, scorer)
        .localCheckpoint(false)
      enriched.count()
      // Fresh batch id per rep: the store's replay guard would skip a
      // re-delivered id and time nothing.
      var id = k * 100
      time(s"b$k upsert") {
        id += 1
        ServingStore.upsert(enriched, store, "block_id", batchId = id)
      }
    }
    spark.stop()
  }
}
