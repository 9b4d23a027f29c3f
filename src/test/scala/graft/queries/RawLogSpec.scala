package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.log.Templates

/** The q61/q62 oracle rests on `RawLog.toRegexRe2` (backslash-escaped
  * literals for DuckDB's RE2) matching EXACTLY like `Templates.toRegex`
  * (`\Q…\E`-quoted for the JVM). Both escaped forms are valid JVM
  * regexes, so the equivalence is testable here: for every bundled
  * template, both forms must agree on match/no-match across realistic
  * and adversarial messages. */
class RawLogSpec extends AnyFunSuite with Matchers {

  private lazy val templates: Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(RawLog.templatesPath)
    try src.getLines().drop(1).map { l =>
      val i = l.indexOf(','); (l.substring(0, i), l.substring(i + 1))
    }.toList
    finally src.close()
  }

  test("bundled template dimension is intact") {
    templates should have size 29
    templates.head._1 shouldBe "E1"
  }

  test("RE2-quoted regex == Pattern.quote regex on all 29 templates") {
    // Messages: one faithful instantiation per template (holes → " x "),
    // plus near-misses and metachar bait.
    val instantiations = templates.map(_._2.replace("[*]", " x "))
    val probes = instantiations ++ Seq(
      "BLOCK* NameSystem.addStoredBlock: blockMap updated: 1.2.3.4:50010 is added to blk_1 size 1",
      "Served block blk_2 to /10.0.0.1",
      "Receiving block blk_3 src: /a dest: /b",
      "no match at all", "BLOCK+ NameSystem", "PacketResponder . for block",
      "[*]literal holes left in[*]", "a.b*c+d(e)f[g]h{i}j|k^l$m\\n")
    for ((id, pattern) <- templates) {
      val jvm = Templates.toRegex(pattern).r
      val re2AsJvm = RawLog.toRegexRe2(pattern).r
      for (msg <- probes) {
        withClue(s"$id on '$msg': ") {
          re2AsJvm.findFirstIn(msg).isDefined shouldBe
            jvm.findFirstIn(msg).isDefined
        }
      }
    }
  }

  test("re2 quoting escapes every RE2 metachar") {
    val quoted = RawLog.toRegexRe2("[*]a.b*c+d(e)f[g]h{i}j|k^l$m[*]")
    quoted shouldBe ".*a\\.b\\*c\\+d\\(e\\)f\\[g\\]h\\{i\\}j\\|k\\^l\\$m.*"
  }
}
