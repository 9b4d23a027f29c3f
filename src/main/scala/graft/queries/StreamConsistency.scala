package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** CROSS-STORE stream consistency (r15 verdict #7).
  *
  * Hybrid serving (q146/q151/q156) fuses two independently-versioned
  * index stores — the dedup/ANN warehouse and the retrieval index —
  * and implicitly assumes both saw the same stream batches: a fused
  * ranking over a warehouse at batch 7 and a postings store at batch
  * 4 silently mixes two corpus states. Each store already records its
  * own exactly-once high-water mark + stream identity in its pointer
  * (`Warehouse.lastMergedBatch` / `streamIdOf`); this object closes
  * the PAIR-level gap:
  *
  *  - [[audit]] certifies mark/identity agreement across the two
  *    stores and REFUSES loudly on divergence (the q140 refusal
  *    discipline extended to the pair) — the gate a serving tier
  *    runs before switching hybrid traffic to a new snapshot pair;
  *  - `StreamIndexMaintainer.dualSink`/`runDual` (the write side)
  *    deliver each micro-batch to BOTH stores from one checkpoint,
  *    so divergence can only arise from a crash BETWEEN the two
  *    store commits of one batch — and that window SELF-HEALS: the
  *    restarted stream re-delivers the batch, the store that already
  *    committed treats it as a certified replay (no-op), the one
  *    that crashed first applies it, and the marks reconverge
  *    (StreamConsistencySpec drives exactly this).
  *
  * The audit is meaningful at quiescence (between micro-batches —
  * where foreachBatch leaves the pair after every batch), which is
  * when a snapshot-pair switch happens; mid-batch it may observe the
  * transient one-store-ahead state, which is precisely what it
  * refuses until redelivery heals it.
  */
object StreamConsistency {

  /** Certify the (mark, identity) agreement of a warehouse/retrieval
    * store pair. Refuses loudly when the high-water marks differ
    * (one store missed or double-saw a batch), when the recorded
    * stream identities differ (two maintainers or a recreated
    * checkpoint fed them), or when exactly one store carries an
    * identity (unknown-vs-identified — undecidable, the `isReplay`
    * rule at pair grain). Both-unidentified with equal marks passes:
    * the documented one-stream-per-store invariant covers direct
    * sink pipelines. Returns one row per store. */
  def audit(s: SparkSession, whDir: String, retrDir: String): DataFrame = {
    import s.implicits._
    val wMark = Warehouse.lastMergedBatch(whDir)
    val rMark = Warehouse.lastMergedBatch(retrDir)
    require(wMark >= 0 && rMark >= 0,
      s"cross-store audit needs stream-maintained stores; marks are " +
        s"$wMark (warehouse) / $rMark (retrieval)")
    val wId = Warehouse.streamIdOf(whDir)
    val rId = Warehouse.streamIdOf(retrDir)
    if (wMark != rMark)
      throw new IllegalStateException(
        s"cross-store divergence: warehouse $whDir is at stream batch " +
          s"$wMark but retrieval index $retrDir is at $rMark — a crash " +
          "between the pair's commits (redeliver the batch to heal) or " +
          "two independent maintainers; refusing to certify (hybrid " +
          "serving over this pair would fuse two corpus states)")
    if (wId != rId)
      throw new IllegalStateException(
        s"cross-store divergence: warehouse mark recorded by " +
          s"${wId.getOrElse("<unidentified>")} but retrieval mark by " +
          s"${rId.getOrElse("<unidentified>")} — equal batch ids from " +
          "different streams do not mean equal batches; refusing")
    Seq(
      ("dedup_warehouse", wMark, wId.nonEmpty, true),
      ("retrieval_index", rMark, rId.nonEmpty, true))
      .toDF("store", "high_water_mark", "stream_identified", "in_agreement")
      .orderBy("store")
  }

  // ---- q159 fixture: one stream maintaining BOTH stores --------------

  private val pairFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Standing warehouse + retrieval index (corpus minus
    * [[Dedup.NewSource]] / the q126 vector slice), then THREE
    * micro-batches of the held-out source delivered to BOTH stores
    * through the real `dualSink` body under one stream identity, then
    * a crash-recovery re-delivery of the final batch (both stores
    * no-op) — the q140 protocol at pair grain. */
  private[queries] def ensurePair(s: SparkSession,
      dir: String): (String, String) =
    pairFixtures.computeIfAbsent(dir, _ => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-pair-wh").toString
      val retr = java.nio.file.Files
        .createTempDirectory("graft-pair-retr").toString
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val isNewVec = pmod(col("vec_id"), lit(Similarity.IncrSemMod)) ===
        lit(Similarity.IncrSemMod - 1)
      Warehouse.buildOf(s, docs.filter(col("source") =!= Dedup.NewSource),
        emb.filter(!isNewVec), wh)
      // Both standing stores cover the SAME population — one corpus,
      // two index families.
      RetrievalIndex.buildOf(s,
        docs.filter(col("source") =!= Dedup.NewSource), retr)
      val nB = 3L
      def docBatch(k: Long): DataFrame = docs.filter(
        col("source") === Dedup.NewSource &&
          pmod(col("doc_id"), lit(nB)) === lit(k))
      def embBatch(k: Long): DataFrame = emb.filter(isNewVec &&
        pmod((col("vec_id") / lit(Similarity.IncrSemMod)).cast("long"),
          lit(nB)) === lit(k))
      val sink = graft.streaming.StreamIndexMaintainer.dualSink(
        s, wh, retr, (_, id) => Some(embBatch(id)),
        () => Some("q159-pair-maintainer")) _
      (0L until nB).foreach(k => sink(docBatch(k), k))
      val (vW, vR) = (Warehouse.version(wh), Warehouse.version(retr))
      sink(docBatch(nB - 1), nB - 1) // crash-recovery re-delivery
      require(Warehouse.version(wh) == vW && Warehouse.version(retr) == vR,
        "pair re-delivery must be a no-op on both stores")
      (wh, retr)
    })

  /** q159 — the cross-store certificate over the pair fixture: both
    * stores drained to the same mark under one identity, re-delivery
    * a pair-wide no-op, audit green. All values pinned (the stream
    * protocol is deterministic), so the oracle is the literal
    * expected table — the q140 pinned-flag idiom. */
  def pairCertify(s: SparkSession, dir: String): DataFrame = {
    val (wh, retr) = ensurePair(s, dir)
    audit(s, wh, retr)
  }

  val pairCertifySql: String =
    """SELECT * FROM (VALUES
      |  ('dedup_warehouse', CAST(2 AS BIGINT), TRUE, TRUE),
      |  ('retrieval_index', CAST(2 AS BIGINT), TRUE, TRUE))
      |  t(store, high_water_mark, stream_identified, in_agreement)
      |ORDER BY store""".stripMargin
}
