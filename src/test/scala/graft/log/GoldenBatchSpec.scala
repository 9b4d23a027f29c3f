package graft.log

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.sources.Sinks

/** Golden end-to-end batch test on the REAL log format (SURVEY §2.1 S1,
  * §7.2): the production `spark.read.text` entry, the real 29-template
  * dimension (bundled `HDFS.log_templates.csv`, public Loghub HDFS_v1
  * metadata, same file as reference `jobs/stream_layer/
  * HDFS.log_templates.csv:1-30`), and the notebook's stored golden
  * numbers for block `blk_-1001138135617662562`
  * (`prepare_data_batch.ipynb:317,373,882`):
  *
  *   - event sequence [E22, E5,E5,E5, E11,E9,E11,E9, E26,E26,E26,
  *     E11,E9, E3,E3,E4,E3,E3,E4, E23,E23,E23, E3,E3,E4,E3,E3,E4,
  *     E21,E21,E21]  (31 lines)
  *   - feature row E3=8 E4=4 E5=3 E9=3 E11=3 E21=3 E22=1 E23=3 E26=3
  *   - session start 2008-11-10 01:19:42, end 2008-11-10 10:36:17,
  *     duration_sec 33395, num_lines 31, label Normal
  *
  * The raw dataset itself is not redistributed with the reference, so
  * the 31 lines are *synthesized* from the real templates: each line's
  * message instantiates its template's `[*]` holes with realistic
  * values, and a guard test asserts every synthesized message matches
  * EXACTLY its intended template among all 29 — so the expected counts
  * hold under first-match, last-match, or any other tie order.
  */
class GoldenBatchSpec extends AnyFunSuite with Matchers with SparkFixture {

  import graft.tools.GoldenBlock

  private val B = GoldenBlock.BlockId
  private val goldenSeq = GoldenBlock.EventSeq

  // The golden construction itself (messages, components, timestamps)
  // is the SHARED definition in graft.tools.GoldenBlock — the same
  // lines MakeLogFixture embeds in the committed driver fixture, so
  // these assertions and the q61/q62 oracle path cannot drift apart.
  private val goldenLines = GoldenBlock.Lines
  private val otherLines = Seq(
    GoldenBlock.rawLine("E5", "blk_999", 50000),
    GoldenBlock.rawLine("E9", "blk_999", 50060),
    "081110 140000 999 INFO dfs.Scheduler: heartbeat with no block mentioned")

  private lazy val templatesPath =
    getClass.getResource("/HDFS.log_templates.csv").getPath

  private lazy val logPath = {
    val f = Files.createTempFile("hdfs-golden", ".log")
    Files.writeString(f, (goldenLines ++ otherLines).mkString("\n"))
    f.toString
  }

  private lazy val labels = {
    import spark.implicits._
    Seq((B, "Normal")).toDF("block_id", "label")
  }

  private lazy val (features, sessions) =
    BatchPipeline.run(spark, logPath, templatesPath, labels)

  test("every synthesized message matches exactly its intended template") {
    val templates = Templates.load(spark, templatesPath)
    templates should have size 29
    val used = goldenSeq.distinct
    for (eid <- used) {
      val msg = GoldenBlock.message(eid, B)
      val matches = templates.filter(t =>
        Templates.toRegex(t.pattern).r.findFirstIn(msg).isDefined).map(_.id)
      withClue(s"$eid message '$msg' matched $matches: ") {
        matches shouldBe Seq(eid)
      }
    }
  }

  test("golden feature row reproduces the notebook output") {
    val row = features.filter(col("block_id") === B).head()
    val expected = Map("E3" -> 8, "E4" -> 4, "E5" -> 3, "E9" -> 3,
      "E11" -> 3, "E21" -> 3, "E22" -> 1, "E23" -> 3, "E26" -> 3)
    for (i <- 1 to 29) {
      val eid = s"E$i"
      withClue(s"$eid: ") {
        row.getAs[Int](eid) shouldBe expected.getOrElse(eid, 0)
      }
    }
    row.getAs[String]("label") shouldBe "Normal"
    // Second block: features counted, label NULL (unlabeled).
    val other = features.filter(col("block_id") === "blk_999").head()
    other.getAs[Int]("E5") shouldBe 1
    other.getAs[Int]("E9") shouldBe 1
    other.getAs[String]("label") shouldBe null
  }

  test("golden session row reproduces the notebook output") {
    val row = sessions.filter(col("block_id") === B).head()
    row.getAs[java.sql.Timestamp]("start_ts").toString shouldBe "2008-11-10 01:19:42.0"
    row.getAs[java.sql.Timestamp]("end_ts").toString shouldBe "2008-11-10 10:36:17.0"
    row.getAs[Long]("duration_sec") shouldBe 33395L
    row.getAs[Long]("num_lines") shouldBe 31L
    row.getAs[String]("label") shouldBe "Normal"
    val lines = row.getAs[String]("log_full").split("\n")
    lines should have length 31
    lines.head should startWith("2008-11-10 01:19:42")
    lines.last should startWith("2008-11-10 10:36:17")
  }

  test("negative control: perturbing one template regex breaks the golden numbers") {
    // The standing claim behind q61/q62 is that template drift FAILS
    // the oracle comparison. Mutation-test the claim itself: corrupt
    // a single literal in E5's pattern and re-run the exact pipeline —
    // if the golden feature row still reproduced, the golden block
    // would be asserting nothing.
    val orig = Files.readString(java.nio.file.Paths.get(templatesPath))
    orig should include("Receiving block")
    val mutPath = Files.createTempFile("hdfs-templates-mut", ".csv")
    Files.writeString(mutPath, orig.replace("Receiving block", "Receivinx block"))
    val (mutFeatures, _) =
      BatchPipeline.run(spark, logPath, mutPath.toString, labels)
    val row = mutFeatures.filter(col("block_id") === B).head()
    withClue("mutated E5 template still reproduced the golden count — " +
      "the oracle would NOT catch this drift: ") {
      row.getAs[Int]("E5") should not be GoldenBlock.FeatureCounts("E5")
    }
    // And the un-mutated path still holds (the control's control).
    features.filter(col("block_id") === B).head()
      .getAs[Int]("E5") shouldBe GoldenBlock.FeatureCounts("E5")
  }

  test("event trace reproduces the notebook sequence in time order") {
    val parsed = LogParser.withBlock(LogParser.parse(spark.read.text(logPath)))
    val tagged = Templates.tag(parsed, Templates.load(spark, templatesPath))
    val trace = Features.eventTraces(tagged)
      .filter(col("block_id") === B).head().getSeq[String](1)
    trace shouldBe goldenSeq
  }

  test("committed driver fixture embeds the golden block with identical numbers") {
    // The fixture the DRIVER oracles through q61/q62 — if this test
    // fails, either MakeLogFixture wasn't re-run after a GoldenBlock
    // change, or the pipeline semantics drifted from the
    // reference-observed behavior the notebook documents.
    import graft.queries.RawLog
    assume(new java.io.File(RawLog.logPath).isFile,
      s"committed fixture ${RawLog.logPath} not present")
    val sess = RawLog.rawLogSessions(spark, "")
      .filter(col("block_id") === B).head()
    sess.getAs[String]("start_ts") shouldBe "2008-11-10 01:19:42"
    sess.getAs[String]("end_ts") shouldBe "2008-11-10 10:36:17"
    sess.getAs[Long]("duration_sec") shouldBe GoldenBlock.DurationSec
    sess.getAs[Long]("num_lines") shouldBe 31L
    sess.getAs[String]("label") shouldBe GoldenBlock.Label
    val feat = RawLog.rawLogFeatures(spark, "")
      .filter(col("block_id") === B).head()
    for (i <- 1 to 29) {
      val eid = s"E$i"
      withClue(s"$eid: ") {
        feat.getAs[Int](eid) shouldBe GoldenBlock.FeatureCounts.getOrElse(eid, 0)
      }
    }
  }

  test("coalesce(1) CSV sink round-trips with header and stringified values") {
    val out = Files.createTempDirectory("graft-csv").toString
    Sinks.writeCsvSingle(sessions, out)
    val parts = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    parts should have length 1 // single-file export, as the reference
    // multiLine: log_full embeds quoted newlines (the reference's CSV
    // export has the same shape).
    val back = spark.read.option("header", "true")
      .option("multiLine", "true").csv(out)
    back.count() shouldBe 2
    back.columns shouldBe sessions.columns
    back.filter(col("block_id") === B).head()
      .getAs[String]("duration_sec") shouldBe "33395"
  }
}
