package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Properties of the corpus-scale dedup fixture generator the bench's
  * ground-truth arithmetic relies on — pure Scala, no Spark session. */
class BigCorpusFixtureSpec extends AnyFunSuite with Matchers {

  private val seed = 20263L

  test("generation is deterministic per (seed, id)") {
    (0L until 200L).foreach { id =>
      MakeBigCorpusFixture.docText(seed, id) shouldBe
        MakeBigCorpusFixture.docText(seed, id)
    }
    MakeBigCorpusFixture.docText(seed, 3L) should not be
      MakeBigCorpusFixture.docText(seed + 1, 3L)
  }

  test("planted near-dups share their base's tokens plus ONE perturbation token") {
    (0L until 500L).filter(id => id % 10 == 7 || id % 10 == 9).foreach { id =>
      val base = MakeBigCorpusFixture.docText(seed, id - (id % 10))
        .split(" ").toSeq
      val dup = MakeBigCorpusFixture.docText(seed, id).split(" ").toSeq
      dup.init shouldBe base
      dup.last shouldBe s"dupmark${id % 97}"
      // Distinct-token Jaccard ≥ (n)/(n+1) — the band-detection regime.
      val (bs, ds) = (base.toSet, dup.toSet)
      val j = (bs & ds).size.toDouble / (bs | ds).size
      assert(j >= bs.size.toDouble / (bs.size + 1), s"doc $id jaccard $j")
    }
  }

  test("cluster structure: every base at id % 10 == 0 anchors {base, +7, +9}") {
    // Non-dup docs never collide with a base's text (independent RNG
    // streams) — spot-check a window.
    val texts = (0L until 100L)
      .map(id => id -> MakeBigCorpusFixture.docText(seed, id)).toMap
    (0L until 100L).foreach { id =>
      val mod = id % 10
      if (mod != 7 && mod != 9)
        (0L until 100L).filter(o => o != id && o % 10 != 7 && o % 10 != 9)
          .foreach(o => texts(id) should not be texts(o))
    }
  }
}
