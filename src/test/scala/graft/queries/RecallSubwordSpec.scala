package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** q103 (int8 recall@k) and q104 (subword token budget): independent
  * plain-Scala recomputes over the collected fixture, so both queries
  * are checked against an implementation that shares no code with the
  * Spark expression trees (the DuckDB oracle is the third opinion).
  */
class RecallSubwordSpec extends AnyFunSuite with SparkFixture {

  test("q103 overlap counts match a brute-force float-vs-int8 recompute") {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def quant(v: Array[Double]): Array[Double] = {
      val scale = v.map(math.abs).max
      if (scale == 0d) v.map(_ => 0d)
      else v.map(x => math.round(x * 127 / scale).toDouble)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0d; var daa = 0d; var dbb = 0d
      for (i <- a.indices) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i) }
      val den = math.sqrt(daa) * math.sqrt(dbb)
      if (den == 0d) -2d else dab / den
    }
    def top10(qid: Long, of: Long => Array[Double]): Seq[Long] =
      vecs.filter(_._1 != qid)
        .map { case (id, _) => (id, cos(of(id), of(qid))) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val float = vecs.toMap
    val int8 = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val expected = (0L until 5L).map { qid =>
      val f = top10(qid, float); val q = top10(qid, int8)
      (qid, f.toSet.intersect(q.toSet).size.toLong,
        f.zip(q).count { case (a, b) => a == b }.toLong)
    }
    val rows = Similarity.int8Recall(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == expected)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "rank matches are a subset of overlap")
      assert(r.getAs[Boolean]("certified"), s"query ${r.getLong(0)} below bound")
    }
  }

  test("q128 composed IVF x int8 certificate matches a brute-force chain") {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def quant(v: Array[Double]): Array[Double] = {
      val scale = v.map(math.abs).max
      if (scale == 0d) v.map(_ => 0d)
      else v.map(x => math.round(x * 127 / scale).toDouble)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0d; var daa = 0d; var dbb = 0d
      for (i <- a.indices) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i) }
      val den = math.sqrt(daa) * math.sqrt(dbb)
      if (den == 0d) -2d else dab / den
    }
    val float = vecs.toMap
    val int8 = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val cents = vecs.filter(_._1 < 8)
    // Cell = argmax centroid cosine, ties to the LARGER c_id (the
    // rn-over-(cos DESC, c_id DESC) contract).
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cId, cv) => (cos(v, cv), cId) }.max._2
    }.toMap
    val expected = (40L to 44L).map { qid =>
      val probeCells = cents
        .map { case (cId, cv) => (cos(cv, float(qid)), cId) }
        .sortBy { case (c, id) => (-c, -id) }.take(2).map(_._2).toSet
      val cands = vecs.map(_._1).filter(_ != qid)
      val probed = cands.filter(id => probeCells(cellOf(id)))
      val exact = cands.map(id => (id, cos(float(id), float(qid))))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val ivf = probed.map(id => (id, cos(int8(id), int8(qid))))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      (qid, exact.intersect(ivf).size.toLong, probed.length.toLong,
        cands.length.toLong)
    }
    val rows = Similarity.ivfInt8Recall(spark, sfDir).collect()
    assert(rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq == expected)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("beats_random") ==
        (r.getLong(1) * r.getLong(3) >= 10L * r.getLong(2)))
      // The composed path still prunes: never a full scan.
      assert(r.getLong(2) < r.getLong(3))
    }
  }

  test("native graft_subwords kernel is bit-identical to the HOF spec form") {
    import org.apache.spark.sql.functions._
    // Edge shapes the fixture may not cover: empty text, space runs,
    // leading/trailing spaces, words truncating mid-piece, a word that
    // is exactly one piece, unknown-only words, mixed case.
    val edges = Seq("", " ", "   ", "the", " the ", "tion", "ti", "t",
      "xqzw", "THE InGest", "a  b   c", "testing the estimation",
      "abcdefghijklmnopqrstuvwxyz", "ing ing ing", "x" * 500,
      // Non-BMP: a surrogate pair must count as ONE unknown token
      // (code-point semantics), not two code units.
      "a😀b", "😀 the 😀😀",
      "ing😀tion")
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir).select($"text")
      .unionByName(edges.toDF("text"))
    val vocabCsv = PipelineOps.SubwordVocab.mkString(",")
    val mismatches = docs.select(
        PipelineOps.docSubwordsHof($"text").as("hof"),
        call_function("graft_subwords", lower($"text"), lit(vocabCsv)).as("native"))
      .filter($"hof" =!= $"native").count()
    assert(mismatches == 0L)
  }

  test("q104 subword totals match an independent greedy tokenizer") {
    val vocab = PipelineOps.SubwordVocab.toSet
    def tokenize(word: String): Int = {
      var pos = 0; var cnt = 0
      while (pos < word.length) {
        val step = (4 to 2 by -1).find(l =>
          pos + l <= word.length && vocab(word.substring(pos, pos + l)))
          .getOrElse(1)
        pos += step; cnt += 1
      }
      cnt
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expectedTotal = docs.map { case (_, t) =>
      t.toLowerCase.split(" ", -1).filter(_.nonEmpty).map(tokenize).map(_.toLong).sum
    }.sum
    val out = PipelineOps.subwordBudget(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_subwords")).sum == expectedTotal)
    // Subwords can never be fewer than words: every word is ≥ 1 token,
    // and whitespace tokens count empties that subwords skip only when
    // the text has runs of spaces — the fixture has none.
    out.foreach { r =>
      assert(r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_ws_tokens"),
        s"${r.getString(0)}/${r.getString(1)} inflation < 1")
      val ratio = r.getAs[Double]("subwords_per_token")
      assert(ratio >= 1.0 && ratio < 4.0, s"implausible inflation $ratio")
    }
  }
}
