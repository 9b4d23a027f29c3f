package graft.log

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Parity spec for the native codegen'd TemplateMatch expression
  * (graft.functions.TemplateMatch via GraftExtensions) against the
  * built-in chained-CASE form, including on the real 29-template
  * dimension and NULL/no-match handling.
  */
class TemplateMatchNativeSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val templates = Templates.load(spark,
    getClass.getResource("/HDFS.log_templates.csv").getPath)

  private lazy val messages = {
    import spark.implicits._
    Seq(
      "Receiving block blk_1 src: /10.0.0.1:50010 dest: /10.0.0.2:50010",
      "BLOCK* NameSystem.allocateBlock: /user/x/f. blk_1",
      "Served block blk_2 to /10.0.0.9",
      "PacketResponder 1 for block blk_2 terminating",
      "Deleting block blk_3 file /data/current/blk_3",
      "Verification succeeded for blk_4",
      "totally unmatched line",
      "Received block blk_5 of size 67108864 from /10.0.0.3"
    ).toDF("message")
  }

  test("native expression matches the CASE chain on all 29 templates") {
    val builtin = messages.withColumn("id",
      Templates.eventIdColumn(templates, col("message")))
    val native = messages.withColumn("id",
      Templates.eventIdColumnNative(templates, col("message")))
    builtin.collect().map(_.toSeq) shouldBe native.collect().map(_.toSeq)
    // Sanity: known tags, including the NULL no-match.
    val ids = native.collect().map(r => Option(r.getString(1)))
    ids shouldBe Array(Some("E5"), Some("E22"), Some("E3"), Some("E11"),
      Some("E21"), Some("E2"), None, Some("E9"))
  }

  test("indexOf fast path (r20) agrees with the regex on multi-line and adversarial inputs") {
    import spark.implicits._
    // The r20 TemplateMatcher matches decomposable patterns via ordered
    // indexOf, but ONLY on terminator-free strings — `.` does not cross
    // \n \r U+0085 U+2028 U+2029, so e.g. "Served block\nblk to x"
    // must NOT match E3 even though plain containment would. These rows
    // force both the fallback (terminators present) and the fast path
    // (segment-order traps, repeated segments, empty-adjacent holes).
    val rows = Seq(
      "Served block\nblk_9 to /x",               // newline splits the chain
      "Served block blk_9\nto /x",               // ditto, later gap
      "Served block blk_9\rto /x",               // carriage return
      "Served block blk_9\u0085to /x",           // NEL
      "Served block blk_9\u2028to /x",           // line separator
      "to Served block blk_9",                    // segments out of order
      "Served blockto",                           // adjacent, no gap chars
      "Served block to",                          // zero-width hole match
      "xxServed block yy to zz Served block",     // repeats, first-occurrence
      "Receiving block b src: dest: src: dest:",  // repeated later segments
      "",                                          // empty message
      "to to to",                                  // only later segments
      "Served block 日本語 to ünïcode"             // multibyte in the holes
    ).toDF("message")
    val builtin = rows.withColumn("id",
      Templates.eventIdColumn(templates, col("message"))).collect().map(_.toSeq)
    val native = rows.withColumn("id",
      Templates.eventIdColumnNative(templates, col("message"))).collect().map(_.toSeq)
    native shouldBe builtin
  }

  test("decompose accepts exactly the toRegex chain grammar") {
    import graft.functions.TemplateMatcher
    TemplateMatcher.decompose(Templates.toRegex("A[*]B[*]C")).map(_.toSeq) shouldBe
      Some(Seq("A", "B", "C"))
    TemplateMatcher.decompose(Templates.toRegex("[*]only middle[*]")).map(_.toSeq) shouldBe
      Some(Seq("only middle"))
    TemplateMatcher.decompose(Templates.toRegex("lit.with+specials[*](tail)"))
      .map(_.toSeq) shouldBe Some(Seq("lit.with+specials", "(tail)"))
    // Anchored form is NOT decomposable: it must keep the regex engine
    // (the $ anchor makes last-occurrence semantics matter).
    TemplateMatcher.decompose(Templates.toRegex("A[*]B", anchored = true)) shouldBe None
    TemplateMatcher.decompose("a.*b") shouldBe None // unquoted literal
  }

  test("native expression survives NULL input rows") {
    import spark.implicits._
    val withNull = Seq(Some("Served block blk_9 to /1.2.3.4"), None)
      .toDF("message")
    val out = withNull.select(
      Templates.eventIdColumnNative(templates, col("message")).as("id"))
      .collect().map(r => Option(r.getString(0)))
    out shouldBe Array(Some("E3"), None)
  }

  test("whole dataset tag through tag() paths agree on the golden fixture") {
    import spark.implicits._
    val lines = (1 to 200).map { i =>
      if (i % 3 == 0) s"Receiving block blk_$i src: /a dest: /b"
      else if (i % 3 == 1) s"Served block blk_$i to /c"
      else s"no template here $i"
    }.toDF("message")
    val a = lines.withColumn("id", Templates.eventIdColumn(templates, col("message")))
      .groupBy("id").count().collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val b = lines.withColumn("id", Templates.eventIdColumnNative(templates, col("message")))
      .groupBy("id").count().collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    a shouldBe b
    a(Some("E5")) shouldBe 66
    a(Some("E3")) shouldBe 67
    a(None) shouldBe 67
  }
}
