package graft.tools

import java.nio.file.{Files, Paths}

import scala.util.Random

/** Deterministic generator for the committed raw-log fixture
  * (`data/hdfs_synth.log` + `data/hdfs_labels.csv`) that puts the
  * production batch pipeline (S1 + F1–F8 + A2/A3 + J1/J2) under the
  * driver's DuckDB oracle — q61/q62.
  *
  * The real Loghub HDFS_v1 dataset is not redistributed with the
  * reference, so the fixture is SYNTHESIZED from the reference's own
  * 29-template dimension (`HDFS.log_templates.csv`, public metadata):
  * every line instantiates one template's `[*]` holes with realistic
  * values, one hole carrying the `blk_<id>` token (GoldenBatchSpec's
  * approach, widened to all 29 templates). Ambiguous messages (one
  * message matching several templates) are fine: both engines run the
  * identical first-match-in-file-order semantics, so they agree by
  * construction. Seeded RNG → re-running reproduces the same bytes
  * (the line shapes live in `LogSynth`, shared with the scale
  * generator `MakeBigLogFixture`; the extraction preserved this
  * file's exact draw sequence — regen-diffed against the committed
  * bytes).
  *
  * Run once: `sbt "runMain graft.tools.MakeLogFixture"`; the outputs
  * are committed so the driver never depends on this tool.
  */
object MakeLogFixture {

  private val Seedy = 20261L

  def main(args: Array[String]): Unit = {
    val dataDir = Paths.get(if (args.nonEmpty) args(0) else "/root/repo/data")
    Files.createDirectories(dataDir)
    val templates = Files.readAllLines(
        dataDir.resolve("HDFS.log_templates.csv")).size() match {
      case 0 => sys.error("templates CSV missing")
      case _ => LogSynth.readTemplates(
        dataDir.resolve("HDFS.log_templates.csv").toString)
    }
    val rng = new Random(Seedy)

    val lines = Vector.newBuilder[String]
    val blockIds = Vector.newBuilder[String]
    val usedIds = scala.collection.mutable.HashSet.empty[String]
    val nBlocks = 400
    (0 until nBlocks).foreach { b =>
      // floorMod (not math.abs) so Long.MinValue can't produce a
      // malformed "blk_--" id; the used-id set keeps independent draws
      // from silently merging two synthetic sessions.
      var blockId = ""
      do {
        blockId = s"blk_${if (rng.nextBoolean()) "-" else ""}${java.lang.Math.floorMod(rng.nextLong(), 9000000000000000000L)}"
      } while (!usedIds.add(blockId))
      blockIds += blockId
      val date = LogSynth.dates(rng.nextInt(LogSynth.dates.length))
      var sec = rng.nextInt(50000)
      // Block 0..28 leads with template b so every template occurs.
      val nLines = 3 + rng.nextInt(38)
      (0 until nLines).foreach { j =>
        val tmpl =
          if (b < templates.length && j == 0) templates(b)
          else templates(rng.nextInt(templates.length))
        lines += LogSynth.rawLine(rng, date, sec, tmpl, blockId)
        sec += rng.nextInt(1200)
      }
    }
    // Blockless-but-parseable noise (dropped by the P4 filter) and
    // unparseable garbage (NULL datetime, also blockless).
    (0 until 180).foreach { _ =>
      val date = LogSynth.dates(rng.nextInt(LogSynth.dates.length))
      lines += LogSynth.noiseLine(rng, date)
    }
    (0 until 20).foreach { _ =>
      lines += LogSynth.garbageLine(rng)
    }

    // The notebook-documented golden block rides along in the driver
    // fixture (shared definition with GoldenBatchSpec — see
    // GoldenBlock's scaladoc): its 31 lines put the reference's
    // published numbers (E3=8/E4=4/E5=3, duration 33395 s) under the
    // driver's DuckDB oracle through q61/q62, so a parse/sessionize/
    // feature semantics drift fails the oracle, not just the spec.
    lines ++= GoldenBlock.Lines

    val all = rng.shuffle(lines.result())
    Files.write(dataDir.resolve("hdfs_synth.log"),
      all.mkString("\n").getBytes("UTF-8"))

    // ~85% labeled, 80/20 Normal/Anomaly — reference anomaly_label.csv shape.
    val labelRows = blockIds.result().flatMap { b =>
      if (rng.nextInt(100) < 85)
        Some(s"$b,${if (rng.nextInt(100) < 20) "Anomaly" else "Normal"}")
      else None
    } :+ s"${GoldenBlock.BlockId},${GoldenBlock.Label}"
    Files.write(dataDir.resolve("hdfs_labels.csv"),
      ("BlockId,Label" +: labelRows).mkString("\n").getBytes("UTF-8"))
    println(s"[fixture] ${all.length} lines, ${labelRows.length} labels -> $dataDir")
  }
}
