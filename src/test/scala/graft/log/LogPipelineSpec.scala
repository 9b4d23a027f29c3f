package graft.log

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** End-to-end spec for the log pipeline (parse → template match →
  * sessionize → features) over a synthetic fixture in the reference's
  * raw-log format (FIXTURES.md §1). Expected values are derived by hand
  * from the fixture below, not from any external dataset.
  */
class LogPipelineSpec extends AnyFunSuite with Matchers with SparkFixture {

  // 3 blocks: A = 3 lines (2 receiving + 1 allocate, 60s span),
  // B = 2 lines (1 receiving + 1 served, 3600s span),
  // C = 1 unmatched-template line; plus 1 line without any block id.
  private val rawLines = Seq(
    "081109 203518 143 INFO dfs.DataNode$DataXceiver: Receiving block blk_100 src: /10.0.0.1:50010 dest: /10.0.0.2:50010",
    "081109 203530 144 INFO dfs.FSNamesystem: BLOCK* NameSystem.allocateBlock: /user/job1/file.jar. blk_100",
    "081109 203618 143 INFO dfs.DataNode$DataXceiver: Receiving block blk_100 src: /10.0.0.3:50010 dest: /10.0.0.2:50010",
    "081109 210000 201 WARN dfs.DataNode$DataXceiver: Receiving block blk_-200 src: /10.0.0.9:50010 dest: /10.0.0.2:50010",
    "081109 220000 202 INFO dfs.DataNode$BlockSender: Served block blk_-200 to /10.0.0.4",
    "081110 000001 300 ERROR dfs.DataNode: Unexpected frobnication of blk_300",
    "081109 235959 999 INFO dfs.Scheduler: heartbeat with no block mentioned")

  private val templates = Seq(
    Templates.Template("E1", "Receiving block[*]src:[*]dest:[*]"),
    Templates.Template("E2", "BLOCK* NameSystem[*]allocateBlock:[*]"),
    Templates.Template("E3", "Served block[*]to[*]"),
    // Overlaps E1 on purpose — first-match-wins must pick E1.
    Templates.Template("E4", "Receiving block[*]"))

  private lazy val raw = {
    import spark.implicits._
    rawLines.toDF("value")
  }
  private lazy val parsed = LogParser.parse(raw)
  private lazy val tagged =
    Templates.tag(LogParser.withBlock(parsed), templates)

  test("parse extracts all fields") {
    val r = parsed.filter(col("pid") === "143").orderBy("datetime").head()
    r.getAs[java.sql.Timestamp]("datetime").toString shouldBe "2008-11-09 20:35:18.0"
    r.getAs[String]("level") shouldBe "INFO"
    r.getAs[String]("component") shouldBe "dfs.DataNode$DataXceiver"
    r.getAs[String]("message") should startWith("Receiving block blk_100")
    r.getAs[String]("block_id") shouldBe "blk_100"
    r.getAs[String]("clean_line") should startWith("2008-11-09 20:35:18 143 INFO")
  }

  test("lines without a block id are dropped by withBlock") {
    LogParser.withBlock(parsed).count() shouldBe 6
  }

  test("template compile quotes literals and expands [*]") {
    // Unanchored: atomic lazy gaps (backtracking-safe first-occurrence
    // chain); trailing hole stays a plain greedy tail.
    Templates.toRegex("a[*]b.c[*]") shouldBe "\\Qa\\E(?>.*?\\Qb.c\\E).*"
    // Anchored (stream parity mode): plain greedy gaps — `$` needs the
    // LAST occurrence, which an atomic chain would wrongly commit past.
    Templates.toRegex("x[*]", anchored = true) shouldBe "^\\Qx\\E.*$"
    // Same match set either way; the atomic form just can't blow up.
    val msg = "a zz b.c tail"
    msg.matches(".*" + Templates.toRegex("a[*]b.c[*]") + ".*") shouldBe true
    Templates.toRegex("a[*]b.c[*]").r.findFirstIn("a zz b_c").isDefined shouldBe false
  }

  test("first-match-wins template semantics") {
    val byBlock = tagged.groupBy("block_id")
      .agg(sort_array(collect_list("event_id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    byBlock("blk_100") shouldBe Seq("E1", "E1", "E2")
    byBlock("blk_-200") shouldBe Seq("E1", "E3")
    // E4 never wins despite matching every Receiving line.
    tagged.filter(col("event_id") === "E4").count() shouldBe 0
    // Unmatched message → NULL event id.
    tagged.filter(col("block_id") === "blk_300")
      .filter(col("event_id").isNull).count() shouldBe 1
  }

  test("last-match mode picks the later template") {
    val lm = Templates.tag(LogParser.withBlock(parsed), templates,
      Templates.MatchMode.LastMatch)
    lm.filter(col("event_id") === "E4").count() shouldBe 3
  }

  test("sessionize produces correct spans, counts and ordered log_full") {
    val sess = Sessionize.sessions(LogParser.withBlock(parsed))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = sess("blk_100")
    a.getAs[Long]("num_lines") shouldBe 3
    a.getAs[Long]("duration_sec") shouldBe 60L
    val lines = a.getAs[String]("log_full").split("\n")
    lines should have length 3
    lines.head should startWith("2008-11-09 20:35:18")
    lines.last should startWith("2008-11-09 20:36:18")
    val b = sess("blk_-200")
    b.getAs[Long]("duration_sec") shouldBe 3600L
    sess("blk_300").getAs[Long]("num_lines") shouldBe 1
  }

  test("label join keeps unlabeled sessions with NULL label") {
    import spark.implicits._
    val labels = Seq(("blk_100", "Normal"), ("blk_-200", "Anomaly"))
      .toDF("block_id", "label")
    val out = Sessionize.labeled(
      Sessionize.sessions(LogParser.withBlock(parsed)), labels)
    out.count() shouldBe 3
    out.filter(col("block_id") === "blk_300")
      .filter(col("label").isNull).count() shouldBe 1
  }

  test("feature matrix counts per template id") {
    val feats = Features.eventCounts(tagged, templates.map(_.id))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = feats("blk_100")
    a.getAs[Int]("E1") shouldBe 2
    a.getAs[Int]("E2") shouldBe 1
    a.getAs[Int]("E3") shouldBe 0
    a.getAs[Int]("E4") shouldBe 0
    feats("blk_-200").getAs[Int]("E3") shouldBe 1
    // blk_300 has zero matched lines → no row at all (reference drops it).
    feats.contains("blk_300") shouldBe false
  }

  test("event traces are deterministic and time-ordered") {
    val tr = Features.eventTraces(tagged)
      .filter(col("block_id") === "blk_100").head()
    tr.getSeq[String](1) shouldBe Seq("E1", "E2", "E1")
  }

  test("class weights follow N/(K*n)") {
    import spark.implicits._
    val df = Seq(("a", 0), ("b", 0), ("c", 0), ("d", 1))
      .toDF("block_id", "label_index")
    val w = Features.withClassWeights(df, "label_index")
      .select("label_index", "weight").distinct()
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    w(0) shouldBe (4.0 / (2 * 3)) +- 1e-12
    w(1) shouldBe (4.0 / (2 * 1)) +- 1e-12
  }

  test("stratified split partitions the table") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"blk_$i", i % 2)).toDF("block_id", "label_index")
    val (train, test) = Features.stratifiedSplit(df, "label_index", "block_id", 0.2, 42L)
    train.count() + test.count() shouldBe 200
    // Complement property: no overlap.
    train.join(test, Seq("block_id"), "inner").count() shouldBe 0
  }
}
