package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{ScoredCand, TopKAggregator}

/** q137 — retrieval QUALITY evaluation (round-13 verdict #5): q118
  * fuses a sparse and a dense leg, but nothing measured whether the
  * fusion actually retrieves better. This query builds a pinned
  * relevance fixture and scores all three systems on it with exact
  * integer metrics.
  *
  * Fixture (deterministic, scale-factor-independent): every doc with
  * `doc_id ≡ 3 (mod 25)` that also has an embedding is a QUERY; its
  * known-relevant answer is ITSELF, retrieved from two DEGRADED views
  * — the sparse query sees only every 3rd token of the doc (a
  * "partial recall of the wording" paraphrase stand-in), the dense
  * query keeps only every 3rd embedding dimension (rest zeroed).
  * Self-retrieval against perturbed queries is the standard
  * zero-annotation relevance protocol for corpus-only eval, and BOTH
  * legs must be partial: an undegraded leg retrieves self trivially
  * and fusion could only dilute it — with two partial views the legs
  * err on different queries and RRF has complementary signal to
  * combine.
  *
  * Systems:
  *  - SPARSE: per-query Okapi BM25 over an inverted-index join —
  *    (q_id, term-hash) query rows meet (doc_id, term-hash, tf)
  *    posting rows on the 60-bit term hash; the q112 rational idf (no
  *    transcendental near the oracle boundary). Per-term contributions
  *    are floored to MICRO-UNITS and summed as int64 — double
  *    summation over a variable row set would be reassociation-
  *    dependent, so ranking happens on order-free exact integers (the
  *    q72/q116 fixed-point discipline).
  *  - DENSE: brute-force cosine of each query embedding against the
  *    embedded corpus (the q30 broadcast-probe shape), ranked on the
  *    shared portable cosine.
  *  - RRF: full-rank reciprocal-rank fusion 1/(k+r) with k = 60 (the
  *    q118 contract), docs absent from the sparse scored set
  *    contributing 0.
  *
  * Output: one row per system — n_queries, recall@1 / recall@10 in
  * exact ppm, MRR in exact ppm (Σ(10⁶ div rank) div n), plus the
  * `rrf_ge_legs` certification flag: fused recall@10 ≥ both single
  * legs' recall@10 on this fixture (measured, then pinned by the
  * oracle hash). Recall@k — not MRR — is the claim rank fusion
  * actually makes: with one leg much stronger, equal-weight RRF can
  * trail that leg's MRR (the weak leg's votes demote some rank-1
  * hits) while still widening depth-k coverage; at sf0.1 the fixture
  * shows exactly that trade — dense misses 1 in 80 queries at k=10
  * and the fusion recovers it.
  *
  * Scale shape: the posting build is one explode + map-side-combined
  * count keyed on 8-byte hashes (never term text); query terms are
  * O(|Q|·terms/3); the contribution join touches only postings whose
  * term a query mentions. The dense leg broadcasts |Q| vectors. The
  * per-query rank windows shuffle O(|Q|·corpus) scored rows — at
  * 100 TB the eval would rank top-k per query with heaps
  * (TakeOrdered per key) instead of full row_number; metrics at
  * k ≤ 10 are unchanged by that swap because recall@k and MRR beyond
  * the top ranks contribute ≤ 10⁶/k ppm. |Q| is the knob (mod 25). */
object RetrievalEval {

  /** Session flag (r13 verdict #4's discipline applied here): a
    * positive integer K plans each leg's per-query ranking as the
    * bounded [[TopKAggregator]] (O(K) state per query, map-side
    * partials — no per-query sort of the corpus, the documented
    * at-scale form) instead of the exact full `row_number` window.
    * recall@1/recall@10 are UNCHANGED for K ≥ 10 (a doc at exact rank
    * ≤ 10 is in any top-K list at the same rank); MRR truncates to
    * MRR@K — per query the lost tail term is < 10⁶/K ppm.
    * `RetrievalTopKSpec` certifies both. Default/0 = the exact oracle
    * form. */
  val TopKConf = "spark.graft.retrieval.topk"

  /** Per-query ranks of `scored` on (`score` DESC, id ASC): the exact
    * window, or the bounded top-K aggregation under [[TopKConf]]. */
  private def legRanks(s: SparkSession, scored: DataFrame, qCol: String,
      idCol: String, score: Column, rankName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topK = s.conf.getOption(TopKConf).map(_.trim.toInt).getOrElse(0)
    if (topK > 0) {
      val agg = udaf(new TopKAggregator(topK), Encoders.product[ScoredCand])
      scored.groupBy(col(qCol))
        .agg(agg((-score).cast("double"), col(idCol).cast("long"), lit(0.0))
          .as("tk"))
        .select(col(qCol), posexplode(col("tk.cands")).as(Seq("pos", "x")))
        .select(col(qCol), col("x.id").as("doc_id"),
          (col("pos") + 1).cast("long").as(rankName))
    } else
      scored
        .withColumn(rankName, row_number().over(
          Window.partitionBy(col(qCol))
            .orderBy(score.desc, col(idCol).asc)).cast("long"))
        .select(col(qCol), col(idCol).as("doc_id"), col(rankName))
  }

  private[queries] val QueryMod = 25L
  private[queries] val QueryRes = 3L
  private[queries] val Stride = 3L
  private val K1 = 1.2
  private val B = 0.75

  def retrievalEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val dl = docs.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    // Queries: docs with an embedding, id ≡ 3 (mod 25); the sparse
    // query is every 3rd token (1-based positions 1, 4, 7, …).
    val embIds = Tables.embeddings(s, dir).select(col("vec_id").as("doc_id"))
    val qterms = docs
      .filter(pmod(col("doc_id"), lit(QueryMod)) === lit(QueryRes))
      .join(embIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("w")), lit(Stride.toInt)),
          i => element_at(col("w"), i)))).as("term"))
      .select(col("q_id"), PipelineOps.hash60(col("term")).as("th"))
      .distinct()

    // Only postings for terms SOME query mentions ever reach a shuffle:
    // the explode still scans every token map-side, but the broadcast
    // semi-join drops non-query terms before the (doc_id, th) combine —
    // at corpus scale that's the difference between shuffling the whole
    // inverted index and shuffling the queried slice of it. tf and df
    // are unchanged for the surviving terms (per-term counts don't
    // depend on other terms), so scores and ranks are identical.
    val queriedTerms = qterms.select("th").distinct()
    val posting = docs
      .select(col("doc_id"), explode(col("w")).as("term"))
      .select(col("doc_id"), PipelineOps.hash60(col("term")).as("th"))
      .join(broadcast(queriedTerms), Seq("th"), "left_semi")
      .groupBy("doc_id", "th").agg(count(lit(1)).as("tf"))
    // dfq as a WINDOW over posting, not a second aggregate of it
    // (r20, guide §2.4 / the q99 no-duplicated-subplan discipline):
    // `posting.groupBy(th).count` as a separate frame re-executes the
    // whole token-explode + md5 subtree — the registry's hottest
    // single-task stage — once more per reference; the window computes
    // the identical per-term posting count (partition = th over the
    // full posting frame) inside ONE evaluation for one narrow
    // exchange on the 8-byte hash.
    val postingDfq = posting.withColumn("dfq",
      count(lit(1)).over(Window.partitionBy(col("th"))))

    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5))
    val tfd = col("tf").cast("double")
    val contrib = qterms
      .join(postingDfq, "th")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("cm", floor(
        idf * (tfd * lit(K1 + 1)) /
          (tfd + lit(K1) * (lit(1.0) - lit(B) + lit(B) * (col("dl") / avgdl)))
          * 1e6).cast("long"))
    val srk = legRanks(s,
      contrib.groupBy("q_id", "doc_id").agg(sum(col("cm")).as("s_micro")),
      "q_id", "doc_id", col("s_micro"), "rs")

    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.doubled(col("embedding")).as("v"))
    // The dense query is the SAME degraded-view protocol as the sparse
    // leg: only every 3rd dimension survives (rest zeroed) — a full
    // self-embedding would make dense retrieval trivially perfect and
    // fusion could only dilute it; with both legs partial, RRF has
    // complementary signal to combine (the standard two-degraded-views
    // eval design).
    val qv = e.filter(pmod(col("vec_id"), lit(QueryMod)) === lit(QueryRes))
      .select(col("vec_id").as("q_id"),
        transform(sequence(lit(1), size(col("v"))),
          i => when((i - 1) % lit(Stride) === 0,
            element_at(col("v"), i)).otherwise(lit(0.0))).as("qv"))
    val drk = legRanks(s,
      e.crossJoin(broadcast(qv))
        .withColumn("cos", Similarity.cosine(col("v"), col("qv"))),
      "q_id", "vec_id", col("cos"), "rd")

    val rrfK = Similarity.RrfK
    val fused = drk.join(srk, Seq("q_id", "doc_id"), "left")
      .withColumn("rrf", lit(1.0) / (lit(rrfK) + col("rd")) +
        when(col("rs").isNull, lit(0.0))
          .otherwise(lit(1.0) / (lit(rrfK) + col("rs"))))
      .withColumn("rf", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))

    // Metrics basis = the QUERY set (not the fused rows): under the
    // top-K flag a query's self row can fall out of every list — that
    // is a miss (null ranks → zero contributions), never a shrunken
    // denominator.
    def selfOf(ranks: DataFrame, rank: String): DataFrame =
      ranks.filter(col("doc_id") === col("q_id")).select(col("q_id"), col(rank))
    // All self-ranks ride on ONE filter of `fused` instead of separate
    // selfOf(srk)/selfOf(drk)/selfOf(fused) joins (r20, guide §2.4 /
    // the q99 no-duplicated-subplan discipline): Catalyst re-executes
    // every extra DataFrame reference — each a full leg (dense cosine
    // cross-join + rank window, or the BM25 contrib chain + window).
    // `fused` is drk LEFT-joined with srk, so a (q, q) row exists in
    // `fused` iff it exists in `drk`, carrying identical rd/rf in both
    // modes and identical rs whenever the row exists. In the EXACT
    // default the dense leg scores every (q, doc) pair, so the (q, q)
    // row always exists and fused-rs ≡ selfOf(srk)-rs; under the
    // top-K flag a self row can be in the sparse top-K but out of the
    // dense top-K (no fused row at all), so THAT mode keeps the
    // separate selfOf(srk) join — semantics preserved exactly, and
    // the flag mode was never the benched default.
    val topKOn = s.conf.getOption(TopKConf).exists(_.trim.toInt > 0)
    val self =
      if (!topKOn)
        qv.select(col("q_id"))
          .join(fused.filter(col("doc_id") === col("q_id"))
            .select(col("q_id"), col("rs"), col("rd"), col("rf")),
            Seq("q_id"), "left")
      else
        qv.select(col("q_id"))
          .join(selfOf(srk, "rs"), Seq("q_id"), "left")
          .join(fused.filter(col("doc_id") === col("q_id"))
            .select(col("q_id"), col("rd"), col("rf")), Seq("q_id"), "left")
    def m(r: String) = Seq(
      sum(when(col(r) === 1, 1L).otherwise(0L)).as(s"${r}1"),
      sum(when(col(r) <= 10, 1L).otherwise(0L)).as(s"${r}10"),
      sum(coalesce(expr(s"1000000 div $r"), lit(0L))).as(s"${r}mrr"))
    val a = self.agg(count(lit(1)).as("n"),
      (m("rs") ++ m("rd") ++ m("rf")): _*)
    def legRow(name: String, p: String) = struct(
      lit(name).as("leg"), col("n").as("n_queries"),
      expr(s"(${p}1 * 1000000) div n").as("recall1_ppm"),
      expr(s"(${p}10 * 1000000) div n").as("recall10_ppm"),
      expr(s"${p}mrr div n").as("mrr_ppm"))
    a.select(
        explode(array(
          legRow("dense", "rd"), legRow("rrf", "rf"), legRow("sparse", "rs")))
          .as("r"),
        (col("rf10") >= greatest(col("rs10"), col("rd10")))
          .as("rrf_ge_legs"))
      .select(col("r.leg").as("leg"), col("r.n_queries").as("n_queries"),
        col("r.recall1_ppm").as("recall1_ppm"),
        col("r.recall10_ppm").as("recall10_ppm"),
        col("r.mrr_ppm").as("mrr_ppm"), col("rrf_ge_legs"))
      .orderBy("leg")
  }

  val retrievalEvalSql: String = {
    val cos = Similarity.cosineSqlFor("e2.v", "qv.qv")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
       |pst AS (
       |  SELECT doc_id, ('0x' || substr(md5(x), 1, 15))::BIGINT AS th,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM d, LATERAL (SELECT unnest(w) AS x) u
       |  GROUP BY doc_id, th),
       |dfq AS (SELECT th, CAST(count(*) AS BIGINT) AS dfq FROM pst GROUP BY th),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |qt AS (
       |  SELECT DISTINCT doc_id AS q_id,
       |    ('0x' || substr(md5(w[i]), 1, 15))::BIGINT AS th
       |  FROM d, LATERAL (SELECT unnest(range(1, len(w) + 1, $Stride)) AS i) r2
       |  WHERE doc_id % $QueryMod = $QueryRes
       |    AND doc_id IN (SELECT vec_id FROM embeddings)),
       |ctr AS (
       |  SELECT q.q_id, p.doc_id,
       |    CAST(floor(
       |      ((st.n_docs - f.dfq + 0.5) / (f.dfq + 0.5))
       |      * (CAST(p.tf AS DOUBLE) * ${K1 + 1})
       |      / (CAST(p.tf AS DOUBLE) + $K1 * (1.0 - $B + $B
       |         * (l.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))
       |      * 1e6) AS BIGINT) AS cm
       |  FROM qt q
       |    JOIN pst p ON p.th = q.th
       |    JOIN dfq f ON f.th = q.th
       |    JOIN dl l ON l.doc_id = p.doc_id, st),
       |ssc AS (SELECT q_id, doc_id, CAST(sum(cm) AS BIGINT) AS s_micro
       |        FROM ctr GROUP BY q_id, doc_id),
       |srk AS (SELECT q_id, doc_id,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY s_micro DESC, doc_id ASC) AS BIGINT) AS rs FROM ssc),
       |ev2 AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |qvv AS (SELECT vec_id AS q_id,
       |  list_transform(range(1, len(v) + 1),
       |    i -> CASE WHEN (i - 1) % $Stride = 0 THEN v[i] ELSE 0.0 END) AS qv
       |  FROM ev2 WHERE vec_id % $QueryMod = $QueryRes),
       |drk AS (
       |  SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS rd
       |  FROM (SELECT qv.q_id, e2.vec_id AS doc_id, $cos AS cos
       |        FROM ev2 e2, qvv qv)),
       |fus AS (
       |  SELECT dr.q_id, dr.doc_id, dr.rd, sr.rs,
       |    1.0 / (${Similarity.RrfK} + dr.rd)
       |      + COALESCE(1.0 / (${Similarity.RrfK} + sr.rs), 0.0) AS rrf
       |  FROM drk dr LEFT JOIN srk sr
       |    ON sr.q_id = dr.q_id AND sr.doc_id = dr.doc_id),
       |frk AS (
       |  SELECT q_id, doc_id, rd, rs,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rf
       |  FROM fus),
       |slf AS (SELECT q_id, rs, rd, rf FROM frk WHERE doc_id = q_id),
       |ag AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN rs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN rs <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS s10,
       |    CAST(sum(COALESCE(1000000 // rs, 0)) AS BIGINT) AS smrr,
       |    CAST(sum(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN rd <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS d10,
       |    CAST(sum(COALESCE(1000000 // rd, 0)) AS BIGINT) AS dmrr,
       |    CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |    CAST(sum(CASE WHEN rf <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS f10,
       |    CAST(sum(COALESCE(1000000 // rf, 0)) AS BIGINT) AS fmrr
       |  FROM slf)
       |SELECT leg, n_queries, recall1_ppm, recall10_ppm, mrr_ppm,
       |  rrf_ge_legs FROM (
       |  SELECT 'dense' AS leg, n AS n_queries,
       |    (d1 * 1000000) // n AS recall1_ppm,
       |    (d10 * 1000000) // n AS recall10_ppm,
       |    dmrr // n AS mrr_ppm,
       |    (f10 >= greatest(s10, d10)) AS rrf_ge_legs
       |  FROM ag
       |  UNION ALL
       |  SELECT 'rrf', n, (f1 * 1000000) // n, (f10 * 1000000) // n,
       |    fmrr // n, (f10 >= greatest(s10, d10)) FROM ag
       |  UNION ALL
       |  SELECT 'sparse', n, (s1 * 1000000) // n, (s10 * 1000000) // n,
       |    smrr // n, (f10 >= greatest(s10, d10)) FROM ag)
       |ORDER BY leg""".stripMargin
  }
}
