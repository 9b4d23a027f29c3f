package graft.log

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkFixture

/** Property tests (SURVEY §5): invariants of the parse → template →
  * sessionize → features chain over GENERATED logs, not fixtures:
  *
  *  - Σ event counts per block ≤ its line count (unmatched lines drop);
  *  - duration_sec ≥ 0 and num_lines == lines written for the block;
  *  - template→regex compilation matches any instantiation of its own
  *    template (holes filled with arbitrary hole-free text).
  */
class LogPropertiesSpec extends AnyFunSuite with Matchers with SparkFixture {

  /** Deterministic property loop (the scalatest-scalacheck bridge is
    * not on the offline classpath; raw Gen + fixed seeds is enough). */
  private def forAllSeeded[T](gen: Gen[T], trials: Int)(check: T => Unit): Unit =
    (0 until trials).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val templates = Seq(
    Templates.Template("E1", "Receiving block[*]src:[*]dest:[*]"),
    Templates.Template("E2", "Served block[*]to[*]"),
    Templates.Template("E3", "Deleting block[*]file[*]"))

  private val genFiller: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(s => s" $s ")

  test("compiled template regex matches any instantiation of itself") {
    val gen = Gen.zip(Gen.oneOf(templates), genFiller)
    forAllSeeded(gen, trials = 50) { case (t, filler) =>
      val msg = t.pattern.split("\\[\\*\\]", -1).mkString(filler)
      withClue(s"${t.id} with filler '$filler': ") {
        Templates.toRegex(t.pattern).r.findFirstIn(msg).isDefined shouldBe true
      }
    }
  }

  // One generated "log": n blocks, each with 1..5 lines drawn from the
  // three templates plus possibly an unmatched line.
  private case class BlockLines(blockId: String, lines: Seq[String], nMatched: Int)

  private val genBlock: Gen[(Int, Seq[Int])] = for {
    id <- Gen.choose(1, 30)
    kinds <- Gen.nonEmptyListOf(Gen.choose(0, 3)).map(_.take(5)) // 3 = unmatched
  } yield (id, kinds)

  private def mkBlock(id: Int, kinds: Seq[Int]): BlockLines = {
    val blk = s"blk_$id"
    val lines = kinds.zipWithIndex.map { case (k, i) =>
      val ts = f"081109 ${id % 24}%02d${i % 60}%02d00"
      val msg = k match {
        case 0 => s"Receiving block $blk src: /a dest: /b"
        case 1 => s"Served block $blk to /c"
        case 2 => s"Deleting block $blk file /d/$blk"
        case _ => s"heartbeat for $blk with no template"
      }
      s"$ts $i INFO dfs.X: $msg"
    }
    BlockLines(blk, lines, kinds.count(_ < 3))
  }

  test("atomic-gap regex == plain greedy-gap regex on random templates/messages") {
    // The backtracking-safe unanchored form (atomic lazy gaps) must
    // have the identical match SET as the naive `seg1.*seg2` form it
    // replaced — existence of segments-in-order is decided by the
    // greedy first-occurrence chain (see Templates.toRegex scaladoc).
    val word: Gen[String] = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', '.', '*', ' ')).map(_.mkString))
    val genTemplate: Gen[String] = Gen.choose(1, 4).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString("[*]")))
    val genMsg: Gen[String] = Gen.choose(0, 14)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', '.', '*', ' ')).map(_.mkString))
    forAllSeeded(Gen.zip(genTemplate, genMsg), trials = 400) { case (tpl, msg) =>
      val naive = tpl.split("\\[\\*\\]", -1)
        .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
        .mkString(".*")
      withClue(s"template '$tpl' vs message '$msg': ") {
        Templates.toRegex(tpl).r.findFirstIn(msg).isDefined shouldBe
          naive.r.findFirstIn(msg).isDefined
      }
    }
  }

  test("malformed timestamps yield NULL datetime, never an exception") {
    import spark.implicits._
    val bad = Seq(
      "081109 246199 1 INFO dfs.X: Served block blk_7 to /a", // hour 24
      "999999 999999 2 INFO dfs.X: Served block blk_8 to /a", // nonsense
      "081109 120000 3 INFO dfs.X: Served block blk_9 to /a"  // valid
    ).toDF("value")
    val parsed = LogParser.parse(bad).select("block_id", "datetime").collect()
      .map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    parsed("blk_7") shouldBe None
    parsed("blk_8") shouldBe None
    parsed("blk_9").map(_.toString) shouldBe Some("2008-11-09 12:00:00.0")
  }

  test("feature counts and session invariants hold on generated logs") {
    forAllSeeded(Gen.nonEmptyListOf(genBlock).map(_.take(8)), trials = 10) { raw =>
      import spark.implicits._
      // Distinct block ids (duplicates merge lines — fold them first).
      val blocks = raw.groupBy(_._1).map { case (id, xs) =>
        mkBlock(id, xs.flatMap(_._2))
      }.toSeq
      val df = blocks.flatMap(_.lines).toDF("value")
      val parsed = LogParser.withBlock(LogParser.parse(df))
      val tagged = Templates.tag(parsed, templates)

      val counts = Features.eventCounts(tagged, templates.map(_.id))
        .collect().map(r => r.getString(0) ->
          templates.indices.map(i => r.getInt(i + 1)).sum).toMap
      val sessions = Sessionize.sessions(parsed)
        .collect().map(r => r.getAs[String]("block_id") -> r).toMap

      blocks.foreach { b =>
        withClue(s"${b.blockId}: ") {
          // Σ counts == matched lines (≤ total lines).
          counts.getOrElse(b.blockId, 0) shouldBe b.nMatched
          val s = sessions(b.blockId)
          s.getAs[Long]("num_lines") shouldBe b.lines.length.toLong
          s.getAs[Long]("duration_sec") should be >= 0L
          s.getAs[String]("log_full").split("\n") should have length b.lines.length
        }
      }
    }
  }
}
