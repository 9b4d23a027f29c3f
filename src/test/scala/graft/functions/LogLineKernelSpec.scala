package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.log.LogParser

/** Equivalence pins for the r20 byte-scan log-line kernels
  * (`functions.LogLineExprs`) against the exact regexes they replace:
  * the kernels sit on the q61/q62/q189 production parse path, so any
  * divergence from `regexp_extract`/`regexp_replace` semantics is an
  * oracle failure. Three layers:
  *
  *  1. adversarial literals through BOTH evaluation paths — the
  *     interpreted `nullSafeEval` and the codegen'd DataFrame path —
  *     compared cell-for-cell to the regex twins;
  *  2. the COMMITTED production fixture (every line of
  *     data/hdfs_synth.log) kernel-vs-regex, zero mismatches;
  *  3. seeded random byte-noise lines (printable + whitespace +
  *     multibyte), same comparison — the fuzz net for scan-order and
  *     boundary bugs the handpicked cases miss.
  */
class LogLineKernelSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val adversarial: Seq[String] = Seq(
    "",
    " ",
    "blk_",
    "blk_x",
    "blk_-",
    "blk_-5x7",
    "abcblk_12",
    "blk_blk_-3",
    "blkblk_-3",
    "xblk_123blk_456",
    "BLK_123",
    "blk_9",
    "081109 203518 INFO dfs.DataNode$PacketResponder: Received block blk_-160899 of size 671 from /10.251.42.84",
    "081109  203518 double-space rest",
    "081109\t203518\ttab ws rest",
    "081109 \t 203518 mixed ws",
    "08110 203518 five-digit first",
    "0811091203518 no ws",
    "081109 20351 five-digit second",
    "081109 203518",
    "081109 203518 ",
    "081109 2035189 seven-digit second",
    "1234567 654321 seven-digit first",
    "081109 203518\u00a0nbsp-is-not-java-ws",
    "081109 203518\u000bvertical-tab",
    "081109 203518\rcarriage",
    "081109 203518\nnewline rest",
    "αβγblk_7δ multibyte context",
    "日本語 081109 203518 not anchored",
    "081109 203518 日本語 blk_-42 ünïcode",
    "-123456 654321 sign prefix",
    "081109 203518  blk_ no body",
    "blk_--9 double dash",
    "blk_0",
    "a" * 300 + "blk_-77" + "b" * 5)

  private def regexTriple(s: String): (String, String, String) = {
    import java.util.regex.Pattern
    val ts = {
      val m = Pattern.compile(LogParser.tsRe).matcher(s)
      if (m.find()) m.group(1) else ""
    }
    val blk = {
      val m = Pattern.compile(LogParser.blockRe).matcher(s)
      if (m.find()) m.group(1) else ""
    }
    val rest = s.replaceAll(LogParser.restRe, "")
    (ts, blk, rest)
  }

  private def kernelTriple(s: String): (String, String, String) = {
    val u = UTF8String.fromString(s)
    val scan = LogLineScan.Instance
    (scan.tsRaw(u).toString, scan.blockId(u).toString,
      scan.restAfterTs(u).toString)
  }

  test("interpreted kernels match the regex twins on adversarial lines") {
    adversarial.foreach { s =>
      withClue(s"line=<$s>") { kernelTriple(s) shouldBe regexTriple(s) }
    }
  }

  test("codegen path matches the regex twins on adversarial lines") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      adversarial.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(
        col("value"),
        call_function("graft_log_ts_raw", col("value")).as("k_ts"),
        call_function("graft_log_block_id", col("value")).as("k_blk"),
        call_function("graft_log_rest", col("value")).as("k_rest"),
        regexp_extract(col("value"), LogParser.tsRe, 1).as("r_ts"),
        regexp_extract(col("value"), LogParser.blockRe, 1).as("r_blk"),
        regexp_replace(col("value"), LogParser.restRe, "").as("r_rest"))
      .collect()
    got.foreach { r =>
      withClue(s"line=<${r.getString(0)}>") {
        r.getString(1) shouldBe r.getString(4)
        r.getString(2) shouldBe r.getString(5)
        r.getString(3) shouldBe r.getString(6)
      }
    }
  }

  test("every committed production fixture line agrees kernel-vs-regex") {
    val mismatches = spark.read.text(graft.queries.RawLog.logPath)
      .select(
        (call_function("graft_log_ts_raw", col("value")) =!=
          regexp_extract(col("value"), LogParser.tsRe, 1)).as("d1"),
        (call_function("graft_log_block_id", col("value")) =!=
          regexp_extract(col("value"), LogParser.blockRe, 1)).as("d2"),
        (call_function("graft_log_rest", col("value")) =!=
          regexp_replace(col("value"), LogParser.restRe, "")).as("d3"))
      .filter(col("d1") || col("d2") || col("d3"))
      .count()
    mismatches shouldBe 0L
  }

  test("seeded byte-noise fuzz agrees kernel-vs-regex") {
    val rng = new scala.util.Random(20261L)
    val alphabet = "0123456789 \t\n\u000b\f\rblk_-_abXZ日α"
    val fuzz = (1 to 3000).map { _ =>
      val n = rng.nextInt(40)
      (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    fuzz.foreach { s =>
      withClue(s"line=<${s.replace("\n", "\\n").replace("\r", "\\r")}>") {
        kernelTriple(s) shouldBe regexTriple(s)
      }
    }
  }
}
