package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The MATERIALIZED retrieval index — the third serving leg of the
  * warehouse family.
  *
  * The round-13/14 warehouse made dedup (q113) and ANN (q142) read
  * the stored index instead of the corpus; lexical retrieval (q112)
  * still BM25-scored the raw corpus per query. This store closes that
  * gap: `build` persists the classic inverted-index pair —
  *
  *  - `postings`      term, doc_id, tf, dl — one row per (doc,
  *                    distinct term), the document length DENORMALIZED
  *                    into the posting row (the standard trick that
  *                    makes scoring join-free), PARTITIONED BY
  *                    `term_bucket` = hash(term) mod [[NBuckets]] so a
  *                    query's terms prune to their buckets at PLAN
  *                    time — the executed form of the partition-
  *                    pruning posture the ANN `cells` table documents;
  *  - `corpus_stats`  n_docs, sum_dl — the one-row global the Okapi
  *                    weights need.
  *
  * It is a SEPARATE snapshot store (same `_CURRENT` pointer protocol,
  * reusing [[Warehouse.freshVersionDir]]/[[Warehouse.commitSnapshot]])
  * rather than two more tables in the dedup/ANN warehouse: a retrieval
  * index versions on a different cadence (a tokenizer change rebuilds
  * postings and nothing else; a dedup-parameter change never touches
  * them), and blue/green serving wants independently swappable
  * pointers per index family.
  *
  * Scale: postings is corpus-sized — that is what an inverted index
  * IS — but a query reads |terms| buckets of [[NBuckets]] (static
  * partition pruning, pinned by PlanShapeSpec and the selected-
  * partition count in `RetrievalIndexSpec`), so serve cost is
  * O(posting lists of the query's terms), independent of corpus size.
  * Maintenance is the cheapest in the family: postings rows are
  * per-doc deterministic, so a merge hard-links the standing partition
  * tree and appends O(batch) rows into the touched buckets, and the
  * stats row is one add — no derived tables to splice at all (df is
  * derived per-query from the pruned read, so it is never stale).
  */
object RetrievalIndex {

  /** Postings partition count. At fixture scale 64 keeps partitions
    * non-trivial; at 100 TB the same layout holds with more buckets —
    * the serve plan shape (prune to |query terms| buckets) is
    * unchanged by the constant. */
  val NBuckets = 64

  private[queries] def bucketCol(term: Column): Column =
    pmod(PipelineOps.hash60(term), lit(NBuckets.toLong)).cast("int")

  /** Driver-side replica of [[bucketCol]] for PINNED literal terms, so
    * the serve filter is literal `IN` predicates the planner prunes
    * statically (no runtime subquery, no collect): first 15 hex chars
    * of md5 as a long (`PipelineOps.hash60`), mod [[NBuckets]]. */
  private[queries] def bucketOf(term: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % NBuckets).toInt
  }

  /** The postings frame of a docs population — the SAME `split` /
    * length / term-frequency algebra as `TextOps.bm25Scored`, shaped
    * as one row per (doc, distinct term). Shared by build and merge,
    * so a batch's posting rows are bit-identical to what a full
    * rebuild would produce for those docs (the append-only merge
    * argument). */
  private def postingsOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
      explode(col("w")).as("term"))
    .groupBy(col("doc_id"), col("dl"), col("term"))
    .agg(count(lit(1)).as("tf"))
    .withColumn("term_bucket", bucketCol(col("term")))

  private def statsOf(docs: DataFrame): DataFrame = docs
    .select(size(split(col("text"), " ")).cast("long").as("dl"))
    .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** Build and commit one snapshot version over an explicit docs
    * frame. Returns the committed version. */
  def buildOf(s: SparkSession, docs: DataFrame, whDir: String): Long = {
    Files.createDirectories(Paths.get(whDir))
    val cur = Warehouse.version(whDir)
    val next = cur + 1
    val base = Warehouse.freshVersionDir(whDir, next)
    postingsOf(docs).write.mode("overwrite")
      .partitionBy("term_bucket").parquet(s"$base/postings")
    statsOf(docs).write.mode("overwrite").parquet(s"$base/corpus_stats")
    Warehouse.commitSnapshot(whDir, cur, next)
    next
  }

  /** Hard-link `src`'s tree (partition subdirectories included) into
    * `dst` — the partition-aware form of the warehouse leaf append's
    * re-reference step. */
  private def linkTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    scala.util.Using.resource(Files.list(src)) { st =>
      st.forEach { f =>
        val name = f.getFileName.toString
        if (Files.isDirectory(f)) linkTree(f, dst.resolve(name))
        else if (!name.startsWith(".") && !name.startsWith("_")) {
          try Files.createLink(dst.resolve(name), f)
          catch { case _: Exception =>
            Files.copy(f, dst.resolve(name), StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
    }
  }

  /** INCREMENTAL maintenance: merge a batch of new documents into the
    * standing retrieval index. Postings rows are per-doc
    * deterministic, so the merge is a REAL append — the standing
    * partition tree hard-links into the new version and only the
    * batch's O(batch) rows are written (into the ≤|batch vocabulary|
    * buckets they land in); the stats row is one two-row sum. No
    * derived state exists to go stale: df is computed per-query from
    * the pruned posting read, so it reflects every merge by
    * construction. I/O is O(batch); commit is the same atomic
    * pointer swap ([[Warehouse.commitSnapshot]]), so a reader sees
    * the pre-merge or post-merge index, never a half-appended one.
    * Equivalence contract (q145): buildOf(standing) then
    * mergeBatchOf(batch) ≡ buildOf(standing ∪ batch), content
    * (not just counts) certified. */
  def mergeBatchOf(s: SparkSession, whDir: String, batch: DataFrame,
      streamBatchId: Option[Long] = None,
      streamId: Option[String] = None): Long = {
    val cur = Warehouse.version(whDir)
    require(cur > 0, s"mergeBatchOf needs a standing retrieval index in $whDir")
    // Exactly-once over at-least-once delivery (the q140 discipline):
    // a re-delivered stream batch at/below the pointer's high-water
    // mark FROM THE RECORDING STREAM is a no-op; a foreign stream's
    // delivery refuses loudly (Warehouse.isReplay, ADVICE r14).
    if (Warehouse.isReplay(whDir, streamBatchId, streamId)) return cur
    val next = cur + 1
    val base = Warehouse.freshVersionDir(whDir, next)
    linkTree(Paths.get(whDir, s"v=$cur", "postings"),
      Paths.get(base, "postings"))
    linkTombstones(whDir, cur, base)
    postingsOf(batch).write.mode("append")
      .partitionBy("term_bucket").parquet(s"$base/postings")
    val merged = Warehouse.read(s, whDir, "corpus_stats")
      .unionByName(statsOf(batch))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    merged.write.mode("overwrite").parquet(s"$base/corpus_stats")
    Warehouse.commitSnapshot(whDir, cur, next, streamBatchId, streamId)
    next
  }

  private def tombstoneDir(whDir: String, ver: Long): Path =
    Paths.get(whDir, s"v=$ver", "tombstones")

  /** Carry the tombstone table forward into a new version (no-op if
    * the snapshot has none). Every non-delete writer calls this —
    * tombstoned rows may survive in hard-linked buckets, so the
    * suppression list must outlive any number of merges/compactions. */
  private def linkTombstones(whDir: String, cur: Long, base: String): Unit =
    if (Files.isDirectory(tombstoneDir(whDir, cur)))
      linkTree(tombstoneDir(whDir, cur), Paths.get(base, "tombstones"))

  /** The tombstone table must stay BROADCAST-SIZED — every serve
    * anti-joins it before scoring, so its rows ship to every executor
    * on every request. 1M (doc_id, dl) rows ≈ 16 MB broadcast — the
    * ceiling [[deleteDocs]] enforces (ADVICE r14: the contract
    * existed, nothing enforced it; a purge wave tombstoning a large
    * index fraction would silently degrade every serve). */
  val DefaultMaxTombstones = 1000000L

  /** The current snapshot's tombstoned doc_ids, if any. */
  private def tombstonesOf(s: SparkSession, whDir: String): Option[DataFrame] =
    if (Files.isDirectory(tombstoneDir(whDir, Warehouse.version(whDir))))
      Some(Warehouse.read(s, whDir, "tombstones"))
    else None

  /** DELETE documents from the retrieval index WITHOUT touching the
    * postings files — the deletion-vector discipline (what Lucene's
    * delete bitmaps and lakehouse deletion vectors do): the postings
    * tree hard-links forward untouched, a tiny `tombstones` table
    * (doc_id, dl — O(total deletes), rewritten whole each time because
    * it is broadcast-sized by contract) records the suppressed docs,
    * and `corpus_stats` subtracts the newly-dead docs so the Okapi
    * weights immediately reflect the remaining population. The serve
    * path anti-joins the broadcast tombstones before scoring, so a
    * served ranking equals a rebuild over the remaining corpus EXACTLY
    * (q147 certifies it) — at O(deletes) write cost instead of the
    * O(index) rewrite a physical delete would pay (a purged doc's
    * postings are scattered across every bucket its terms hash to).
    *
    * `docs` carries the doc_ids to delete (extra columns ignored);
    * `dl` is derived from the STORED postings — the denormalized
    * per-doc constant the build wrote — so the stats subtraction
    * matches what the build added by construction, trusting no
    * caller-supplied text (ADVICE r14). An input id with NO stored
    * postings refuses loudly (subtracting an unindexed doc would
    * permanently bias every served idf/avgdl); the lookup semi-joins
    * the broadcast delete list against the postings scan — O(index)
    * READ per purge wave (column-pruned to doc_id/dl), O(deletes)
    * everything else. Idempotent: already-tombstoned doc_ids are
    * ignored (stats subtract once). Doc ids are immutable identities —
    * re-ingesting a deleted id is not supported (merge does not clear
    * tombstones). Refuses when the post-delete tombstone total would
    * exceed `maxTombstones` ([[DefaultMaxTombstones]]) — the operator
    * escape hatches are `compact(purgeTombstones = true)` or a
    * rebuild over the remaining corpus. */
  def deleteDocs(s: SparkSession, whDir: String, docs: DataFrame,
      maxTombstones: Long = DefaultMaxTombstones): Long = {
    import s.implicits._
    val cur = Warehouse.version(whDir)
    require(cur > 0, s"deleteDocs needs a standing retrieval index in $whDir")
    val prior = tombstonesOf(s, whDir)
    val ids = docs.select("doc_id").dropDuplicates("doc_id")
    // Cached for the session's duration of THIS call only (ADVICE
    // r15: a long-lived driver runs many delete waves — leaked cached
    // blocks accumulate): freshIds feeds three actions (the fresh
    // lookup, the count, the refusal's diagnostic anti-join), fresh
    // feeds three more; both unpersist on every exit path.
    val freshIds = prior.fold(ids)(p =>
      ids.join(p.select("doc_id"), Seq("doc_id"), "left_anti")).cache()
    // dl from the stored postings: denormalized per-doc constant, so
    // any per-doc aggregate of it IS the value the build added.
    val fresh = Warehouse.read(s, whDir, "postings")
      .join(broadcast(freshIds), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .cache()
    try {
      val nFresh = fresh.count()
      val nIn = freshIds.count()
      if (nFresh != nIn) {
        val missing = freshIds.join(fresh.select("doc_id"),
            Seq("doc_id"), "left_anti")
          .limit(5).collect().map(_.getLong(0))
        throw new IllegalArgumentException(
          s"deleteDocs: ${nIn - nFresh} doc_id(s) have no stored postings " +
            s"in $whDir (e.g. ${missing.mkString(", ")}) — deleting an " +
            "unindexed doc would permanently bias corpus_stats; refusing")
      }
      val nPrior = prior.fold(0L)(_.count())
      require(nPrior + nFresh <= maxTombstones,
        s"deleteDocs: ${nPrior + nFresh} total tombstones would exceed the " +
          s"broadcast-safe bound $maxTombstones — run compact(" +
          "purgeTombstones = true) (O(index) rewrite, clears the list) or " +
          "rebuild over the remaining corpus")
      val next = cur + 1
      val base = Warehouse.freshVersionDir(whDir, next)
      linkTree(Paths.get(whDir, s"v=$cur", "postings"),
        Paths.get(base, "postings"))
      prior.fold(fresh.select("doc_id", "dl"))(p =>
          p.unionByName(fresh.select("doc_id", "dl")))
        .coalesce(1).write.mode("overwrite").parquet(s"$base/tombstones")
      val delta = fresh
        .agg(count(lit(1)).as("nd"), coalesce(sum(col("dl")), lit(0L)).as("sd"))
        .collect()(0)
      val st = Warehouse.read(s, whDir, "corpus_stats").collect()(0)
      Seq((st.getLong(0) - delta.getLong(0), st.getLong(1) - delta.getLong(1)))
        .toDF("n_docs", "sum_dl")
        .write.mode("overwrite").parquet(s"$base/corpus_stats")
      Warehouse.commitSnapshot(whDir, cur, next)
      next
    } finally {
      fresh.unpersist()
      freshIds.unpersist()
    }
  }

  /** Compact the postings store — the partition-aware form of
    * [[Warehouse.compact]]'s O(fragmented) discipline. Daily merges
    * append one small file per touched bucket per batch, so
    * fragmentation accumulates bucket-by-bucket; this rewrites ONLY
    * buckets whose data-file count exceeds `targetFiles` and
    * hard-links every other bucket (and the one-row stats table)
    * forward — compaction I/O is O(fragmented buckets), not O(index).
    * A rewritten bucket is read AS its directory (the partition value
    * lives in the dir name, not the files), so the layout — and the
    * q144 serve plan's static pruning — is unchanged. Same atomic
    * pointer swap; readers see the old or the new snapshot, never a
    * half-compacted one.
    *
    * `purgeTombstones = true` is the FULL compaction the tombstone
    * bound's refusal message names: EVERY bucket is rewritten (dead
    * rows could hide in any linked one), the dead rows drop out, and
    * the tombstone table is NOT carried forward — O(index) I/O, the
    * physical-delete cost deferred from every [[deleteDocs]] wave to
    * the one maintenance pass that resets the deletion-vector size to
    * zero. corpus_stats is already delete-adjusted, so it links
    * forward unchanged either way. */
  def compact(s: SparkSession, whDir: String, targetFiles: Int = 1,
      purgeTombstones: Boolean = false): Long = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val cur = Warehouse.version(whDir)
    require(cur > 0, s"compact needs a committed snapshot in $whDir")
    val next = cur + 1
    val base = Warehouse.freshVersionDir(whDir, next)
    linkTree(Paths.get(whDir, s"v=$cur", "corpus_stats"),
      Paths.get(base, "corpus_stats"))
    if (!purgeTombstones) linkTombstones(whDir, cur, base)
    // Dead rows ride out of any bucket being rewritten anyway — free
    // while the bytes are in hand; linked buckets keep theirs (the
    // tombstone table stays authoritative either way — unless this is
    // the purge pass, which rewrites every bucket and clears it).
    val dead = tombstonesOf(s, whDir).map(_.select("doc_id"))
    val src = Paths.get(whDir, s"v=$cur", "postings")
    val dst = Paths.get(base, "postings")
    Files.createDirectories(dst)
    scala.util.Using.resource(Files.list(src)) { st =>
      st.forEach { bucket =>
        val name = bucket.getFileName.toString
        if (Files.isDirectory(bucket)) {
          val nFiles = Option(bucket.toFile.listFiles()).getOrElse(Array())
            .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          if (nFiles <= targetFiles && !(purgeTombstones && dead.nonEmpty))
            linkTree(bucket, dst.resolve(name))
          else {
            val rows = s.read.parquet(bucket.toString)
            dead.fold(rows)(d =>
                rows.join(broadcast(d), Seq("doc_id"), "left_anti"))
              .coalesce(targetFiles)
              .write.mode("overwrite").parquet(dst.resolve(name).toString)
          }
        }
      }
    }
    Warehouse.commitSnapshot(whDir, cur, next)
    next
  }

  // ---- fixture stores (memoized per corpus dir per JVM) --------------

  private val fixtureRetr =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized full-corpus retrieval index for `corpusDir`. */
  def ensure(s: SparkSession, corpusDir: String): String =
    fixtureRetr.computeIfAbsent(corpusDir, _ => {
      val wh = Files.createTempDirectory("graft-retr-wh").toString
      buildOf(s, Tables.documents(s, corpusDir), wh)
      wh
    })

  private val mergedRetr =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized MERGED fixture: standing index built from the corpus
    * minus [[Dedup.NewSource]], then one [[mergeBatchOf]] of that
    * source — the q138 fixture protocol at the retrieval grain. */
  private[queries] def ensureMerged(s: SparkSession, corpusDir: String): String =
    mergedRetr.computeIfAbsent(corpusDir, _ => {
      val wh = Files.createTempDirectory("graft-retr-merge").toString
      val docs = Tables.documents(s, corpusDir)
      buildOf(s, docs.filter(col("source") =!= lit(Dedup.NewSource)), wh)
      mergeBatchOf(s, wh, docs.filter(col("source") === lit(Dedup.NewSource)))
      wh
    })

  private val purgedRetr =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized PURGED fixture: full-corpus index, then the q92
    * dedup purge list tombstoned out — the curation flow's "apply the
    * purge to the serving index" step, executed through the real
    * [[deleteDocs]]. */
  private[queries] def ensurePurged(s: SparkSession, corpusDir: String): String =
    purgedRetr.computeIfAbsent(corpusDir, _ => {
      val wh = Files.createTempDirectory("graft-retr-purged").toString
      buildOf(s, Tables.documents(s, corpusDir), wh)
      deleteDocs(s, wh, Dedup.dedupPurge(s, corpusDir).select("doc_id"))
      wh
    })

  // ---- q144: BM25 top-k SERVED from the stored postings --------------

  /** q144 — q112's BM25 retrieval served from the materialized
    * inverted index, zero corpus scans: the plan reads the pinned
    * query terms' PARTITIONS of the stored `postings` (literal
    * `term_bucket IN (...)` → static partition pruning, PlanShapeSpec-
    * pinned) plus the one-row `corpus_stats`; df comes from the pruned
    * read itself (posting-list length per term), so every weight input
    * is index-resident. Scoring algebra is IDENTICAL to q112 —
    * rational idf, k1 = 1.2, b = 0.75 — over the candidate docs (docs
    * holding ≥1 query term; every candidate outscores every
    * non-candidate, whose score is exactly 0, and candidates ≫ k at
    * every fixture SF, so candidate top-k ≡ corpus top-k). The oracle
    * is q112's own full-scan recompute from the raw corpus — the
    * serving path's certificate IS that it reproduces the full scan
    * from posting lists alone. */
  def bm25Serve(s: SparkSession, dir: String): DataFrame =
    bm25ServeFrom(s, ensure(s, dir))

  /** [[bm25Serve]] against an explicit store — the seam the
    * serve-after-merge spec uses (a merged index must serve the same
    * ranking a rebuilt one does). */
  private[graft] def bm25ServeFrom(s: SparkSession, wh: String): DataFrame = {
    val terms = TextOps.Bm25Terms
    bm25ServeScoredFrom(s, wh)
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(TextOps.Bm25K)
      .select(col("doc_id") +: col("dl") +:
        (terms.map(t => col(s"tf_$t")) :+ round(col("s"), 6).as("bm25")): _*)
  }

  /** The q144 candidate frame BEFORE top-k/rounding — every doc
    * holding ≥1 query term with its UNROUNDED BM25 score `s`. Factored
    * so the q146 hybrid fusion ranks on the identical scores the
    * standalone serve ranks on (the q118 discipline: ranking on
    * display-rounded values could flip near-equal neighbours). */
  /** The ONE Okapi BM25 per-term weight (k1 = 1.2, b = 0.75, rational
    * idf — q112's transcendental-free portability discipline), shared
    * by the pinned pivot serve (q144) and the parameterized request
    * path so the two scoring algebras cannot drift. */
  private def okapiW(tf: Column, df: Column, nDocs: Column, dl: Column,
      avgdl: Column): Column = {
    val (k1, b) = (1.2, 0.75)
    val tfd = tf.cast("double")
    val idf = (nDocs - df + lit(0.5)) / (df + lit(0.5))
    idf * (tfd * lit(k1 + 1)) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (dl / avgdl)))
  }

  private[queries] def bm25ServeScoredFrom(s: SparkSession, wh: String): DataFrame = {
    val terms = TextOps.Bm25Terms
    val p0 = Warehouse.read(s, wh, "postings")
      .filter(col("term_bucket").isin(terms.map(bucketOf): _*) &&
        col("term").isin(terms: _*))
    // Tombstoned docs never score: anti-join the broadcast-sized
    // deletion list before df/tf aggregation, so every weight input
    // (df, n_docs, avgdl via the delete-adjusted stats) reflects the
    // remaining population exactly.
    val p = tombstonesOf(s, wh).fold(p0)(t =>
      p0.join(broadcast(t.select("doc_id")), Seq("doc_id"), "left_anti"))
    val dfCols = terms.map(t =>
      sum(when(col("term") === lit(t), 1L).otherwise(0L)).as(s"df_$t"))
    val dfs = p.groupBy().agg(dfCols.head, dfCols.tail: _*)
    val tfCols = terms.map(t =>
      sum(when(col("term") === lit(t), col("tf")).otherwise(0L)).as(s"tf_$t"))
    val cand = p.groupBy(col("doc_id"), col("dl"))
      .agg(tfCols.head, tfCols.tail: _*)
    val stats = Warehouse.read(s, wh, "corpus_stats")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = terms.map(t =>
      okapiW(col(s"tf_$t"), col(s"df_$t"), col("n_docs"), col("dl"), avgdl))
      .reduceLeft(_ + _)
    cand.join(broadcast(stats)).join(broadcast(dfs))
      .withColumn("s", score)
  }

  /** Oracle: the q112 full-scan chain — serving from postings must
    * reproduce the corpus scan exactly. */
  val bm25ServeSql: String = TextOps.bm25TopKSql

  // ---- q145: retrieval-index merge ≡ rebuild certification -----------

  /** q145 — the retrieval grain's q138: certify that the O(batch)
    * merge composes to the full rebuild. Over the merged fixture
    * (standing = corpus minus [[Dedup.NewSource]], one merged batch of
    * that source), emits per metric:
    *
    *  - `postings_minus_rebuild` / `rebuild_minus_postings` — LIVE
    *    multiset differences (exceptAll both ways) between the merged
    *    store's postings and a from-scratch recompute over the full
    *    corpus: content equivalence, not count coincidence;
    *  - `postings_rows`, `stats_n_docs`, `stats_sum_dl` — the merged
    *    store's committed values, hash-checked against DuckDB
    *    recomputing them from the raw corpus.
    *
    * `ok` is live-computed (diffs empty; stored values equal the
    * recompute) and oracle-pinned TRUE. */
  def mergeCertify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wh = ensureMerged(s, dir)
    val stored = Warehouse.read(s, wh, "postings")
      .select("term", "doc_id", "tf", "dl", "term_bucket")
    val rebuild = postingsOf(Tables.documents(s, dir))
      .select("term", "doc_id", "tf", "dl", "term_bucket")
    val extra = stored.exceptAll(rebuild).count()
    val missing = rebuild.exceptAll(stored).count()
    val nPostings = stored.count()
    val st = Warehouse.read(s, wh, "corpus_stats").collect()(0)
    val (nDocs, sumDl) = (st.getLong(0), st.getLong(1))
    val expSt = statsOf(Tables.documents(s, dir)).collect()(0)
    Seq(
      ("postings_minus_rebuild", extra, extra == 0L),
      ("postings_rows", nPostings, missing == 0L && extra == 0L),
      ("rebuild_minus_postings", missing, missing == 0L),
      ("stats_n_docs", nDocs, nDocs == expSt.getLong(0)),
      ("stats_sum_dl", sumDl, sumDl == expSt.getLong(1)))
      .toDF("metric", "value", "ok")
      .orderBy("metric")
  }

  // ---- q147: serving after the dedup purge (tombstone deletes) -------

  /** q147 — the dedup purge list APPLIED to the serving index: q92's
    * purge tombstoned out of the full-corpus postings store through
    * [[deleteDocs]] (O(deletes) write — postings hard-link forward
    * untouched, the deletion-vector discipline), then q144's serve.
    * The certificate is the strongest one available: the served
    * ranking must equal a from-scratch BM25 over the corpus MINUS the
    * purge — df, n_docs, and avgdl all reflecting the remaining
    * population — with the oracle recomputing the ENTIRE chain
    * (bands → components → quality-ranked purge → BM25 over the
    * complement) from raw text in one statement. This is the missing
    * curation-loop edge: dedup decides, the serving index forgets,
    * and nobody rewrites an index-sized file set to make it so. */
  def purgeServe(s: SparkSession, dir: String): DataFrame =
    bm25ServeFrom(s, ensurePurged(s, dir))

  /** Oracle: the q92 purge rule texts + the prefix-parameterized BM25
    * rule text over the complement population (`bm25CteSqlFor("x", …)`
    * — prefixed clear of the purge chain's `t`/`sc`). Restricted to
    * CANDIDATES (≥ 1 query term): a zero-overlap doc is not a
    * retrieval result, and on the purged fixture the remaining
    * population is small enough (500-doc corpus, 481 purged at
    * sf0.01) that candidates < k — exactly where "pad with
    * zero-score rows" and "return the retrieved set" diverge. The
    * serve returns the retrieved set; the oracle says the same. */
  val purgeServeSql: String =
    s"""WITH RECURSIVE ${Dedup.bandsCteSql},
       |${Dedup.ccCompCteSql},
       |${Dedup.qualityScCteSql},
       |${Dedup.purgeRankCteSql("comp")},
       |${TextOps.bm25CteSqlFor("x",
            " WHERE doc_id NOT IN (SELECT doc_id FROM pg)")}
       |SELECT doc_id, dl, ${TextOps.Bm25Terms.map(t => s"tf_$t").mkString(", ")},
       |  round(s, 6) AS bm25
       |FROM xsc
       |WHERE ${TextOps.Bm25Terms.map(t => s"tf_$t > 0").mkString(" OR ")}
       |ORDER BY s DESC, doc_id ASC
       |LIMIT ${TextOps.Bm25K}""".stripMargin

  // ---- q146: hybrid RRF retrieval SERVED from the stored indexes -----

  /** q146 — the q118 hybrid fusion with BOTH legs served from
    * materialized indexes and ZERO corpus scans (PlanShapeSpec pins
    * neither `documents.parquet` nor `embeddings.parquet` in the
    * plan): the sparse leg is q144's stored-postings BM25 (pruned to
    * the query terms' partitions), the dense leg is q142's stored
    * IVF probe (centroids broadcast, candidates from the nprobe
    * probed cells) — each leg ranked on its UNROUNDED serving score
    * (the shared [[Similarity.annServeScored]] /
    * [[bm25ServeScoredFrom]] frames, the q118 discipline), fused by
    * reciprocal rank fusion at the q118 constant. This is the
    * production RAG read path end to end: a query hits two
    * independently-versioned index stores and never touches the
    * corpus; each leg keeps its own scale contract (posting-list
    * pruning / cell pruning), and the fusion itself touches
    * ≤ Bm25K + AnnServeK = 30 rows regardless of corpus size.
    *
    * The dense leg is the APPROXIMATE production search (nprobe
    * cells, not a full scan) — so the oracle splices the q142 probe
    * rule text, not q118's exact-scan leg: the certificate is that
    * the fused SERVED ranking reproduces a from-scratch re-derivation
    * of both indexes + both serves + the fusion. Absent legs
    * contribute rank 0 ("not retrieved"), exactly q118's contract. */
  def hybridServe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = bm25ServeScoredFrom(s, ensure(s, dir))
      .orderBy(col("s").desc, col("doc_id").asc).limit(TextOps.Bm25K)
      .withColumn("rank_sparse",
        row_number().over(Window.orderBy(col("s").desc, col("doc_id").asc))
          .cast("long"))
      .select(col("doc_id"), col("rank_sparse"))
    val dn = Similarity.annServeScored(s, dir)
      .orderBy(col("cos").desc, col("vec_id").asc).limit(Similarity.AnnServeK)
      .withColumn("rank_dense",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_dense"))
    def term(r: Column): Column =
      when(r.isNull, lit(0.0))
        .otherwise(lit(1.0) / (lit(Similarity.RrfK) + r))
    sp.join(dn, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
        round(term(col("rank_sparse")) + term(col("rank_dense")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** Oracle: both index derivations from the raw tables (the shared
    * bm25 + cellAssign/probe rule texts) + both serves + the q118
    * fusion algebra — one statement, zero shared engine code. */
  val hybridServeSql: String =
    s"""WITH ${TextOps.bm25CteSql},
       |${Similarity.cellAssignCteSql},
       |${Similarity.annProbeCteSql},
       |spr AS (
       |  SELECT doc_id, rank_sparse FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank_sparse
       |    FROM sc WHERE ${TextOps.Bm25Terms.map(t => s"tf_$t > 0").mkString(" OR ")})
       |  WHERE rank_sparse <= ${TextOps.Bm25K}),
       |den AS (
       |  SELECT doc_id, rank_dense FROM (
       |    SELECT vec_id AS doc_id,
       |      row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank_dense
       |    FROM cand) WHERE rank_dense <= ${Similarity.AnnServeK})
       |SELECT COALESCE(spr.doc_id, den.doc_id) AS doc_id,
       |  CAST(COALESCE(rank_sparse, 0) AS BIGINT) AS rank_sparse,
       |  CAST(COALESCE(rank_dense, 0) AS BIGINT) AS rank_dense,
       |  round(COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_sparse), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_dense), 0), 6) AS rrf
       |FROM spr FULL OUTER JOIN den ON spr.doc_id = den.doc_id
       |ORDER BY rrf DESC, doc_id""".stripMargin

  // ---- parameterized serving (r14 verdict #1): arbitrary requests ----

  /** PARAMETERIZED BM25 serving — the product API the pinned q144
    * fixture serve generalizes to (the reference's serving layer
    * answers arbitrary requests, `hbase_client.py:263-307`): score an
    * ARBITRARY term set against the stored postings and return the
    * top-`k` candidates (docs holding ≥ 1 query term — the q147
    * candidates-not-padding contract). Same read path as q144: the
    * literal `term_bucket IN (...)` prunes to ≤ |terms| partitions at
    * PLAN time, df/tf/dl all come from the pruned read, tombstones
    * anti-join before any weight input. The request's scale contract
    * is BETTER than the pivot form's: per-term weights are one column
    * (`w`) summed per doc in SORTED-TERM fold order (deterministic
    * float sum — never an arbitrary-order SUM over doubles, the house
    * float discipline), so the plan carries ZERO per-term expression
    * nodes and a 100-term query plans exactly like a 2-term one (the
    * same seam the literal-centroid fix closes for ANN). */
  def bm25Serve(s: SparkSession, wh: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    bm25ServeScoredRequest(s, wh, terms)
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("dl"), round(col("s"), 6).as("bm25"))
  }

  /** The unrounded parameterized candidate frame (doc_id, dl, s) —
    * shared by [[bm25Serve]] and the parameterized hybrid fusion. */
  private[queries] def bm25ServeScoredRequest(s: SparkSession, wh: String,
      terms: Seq[String]): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "bm25Serve needs at least one query term")
    val p0 = Warehouse.read(s, wh, "postings")
      .filter(col("term_bucket").isin(ts.map(bucketOf): _*) &&
        col("term").isin(ts: _*))
    val p = tombstonesOf(s, wh).fold(p0)(t =>
      p0.join(broadcast(t.select("doc_id")), Seq("doc_id"), "left_anti"))
    // df per term from the pruned read (posting-list length); |terms|
    // rows, broadcast back with the one-row stats.
    val dft = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = Warehouse.read(s, wh, "corpus_stats")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    p.join(broadcast(dft), Seq("term"))
      .join(broadcast(stats))
      .withColumn("w",
        okapiW(col("tf"), col("df"), col("n_docs"), col("dl"), avgdl))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("tw"))
      .withColumn("s", aggregate(col("tw"), lit(0.0),
        (acc, x) => acc + x.getField("w")))
      .select(col("doc_id"), col("dl"), col("s"))
  }

  /** Oracle CTE rule text for a LITERAL parameterized request (chain
    * ending in `rqsc(doc_id, dl, tf_*, s)`) — the terms pivot in
    * SORTED order with left-associated summation, mirroring the Spark
    * side's sorted-term fold exactly (absent terms add an IEEE-exact
    * +0.0). CTE names prefixed `rq` — disjoint from every other
    * chain. Shared by the q149 standalone and q151 hybrid oracles;
    * `docWhere` (e.g. a NOT IN delete predicate) restricts the corpus
    * the whole chain derives from — stats, df and candidates all
    * recompute over the surviving population, which is exactly what
    * [[deleteDocs]]'s stats subtraction + tombstone anti-join serve
    * (the q147-certified equivalence), so the q175 cross-delete
    * oracle reuses this text verbatim over the survivors. */
  private[queries] def bm25RequestCteSql(terms: Seq[String],
      docWhere: String = ""): String = {
    val ts = terms.distinct.sorted
    val tfCols = ts.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n    ")
    val dfCols = ts.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n    ")
    val score = ts.map(okapiTermSql).mkString(" + ")
    s"""rqd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents$docWhere),
       |rqt AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM rqd),
       |rqst AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfCols
       |  FROM rqt),
       |rqsc AS (
       |  SELECT doc_id, dl, ${ts.map(t => s"tf_$t").mkString(", ")},
       |    $score AS s
       |  FROM rqt, rqst)""".stripMargin
  }

  /** Full oracle statement of the parameterized BM25 serve —
    * candidate-restricted top-k (q147 discipline). */
  private[queries] def bm25RequestSql(terms: Seq[String], k: Int): String = {
    val ts = terms.distinct.sorted
    s"""WITH ${bm25RequestCteSql(ts)}
       |SELECT doc_id, dl, round(s, 6) AS bm25
       |FROM rqsc
       |WHERE ${ts.map(t => s"tf_$t > 0").mkString(" OR ")}
       |ORDER BY s DESC, doc_id ASC
       |LIMIT $k""".stripMargin
  }

  /** The q149 pinned request — a DIFFERENT term set and k than the
    * q144 fixture, so the certificate exercises the PARAMETERIZED
    * path end to end (request → bucket pruning → sorted-term fold →
    * candidate top-k), not the pivot constants. */
  private[queries] val ParamTerms = Seq("merge", "spark", "filter", "sort")
  private[queries] val ParamK = 15

  /** q149 — the parameterized BM25 serve certified against a
    * from-scratch DuckDB recompute of the same request over raw text:
    * the product `serve(query)` API (r14 verdict #1) answering an
    * arbitrary request from the stored index, zero corpus scans. */
  def bm25ServeParam(s: SparkSession, dir: String): DataFrame =
    bm25Serve(s, ensure(s, dir), ParamTerms, ParamK)

  val bm25ServeParamSql: String = bm25RequestSql(ParamTerms, ParamK)

  // ---- q151: parameterized hybrid serve (concurrent legs) ------------

  /** Collect two ≤k-row serving legs CONCURRENTLY (r14 verdict #6:
    * the lazy q146 plan runs them sequentially — p50 ≈ sum of legs)
    * and fuse by reciprocal rank fusion. Value-identical to the q146
    * fusion (spec-pinned): collect order of an orderBy+limit IS the
    * leg's rank order, and the fusion algebra runs ON THE DRIVER over
    * the ≤ kSparse + kDense collected ids with the identical
    * arithmetic — same IEEE double term `1.0 / (RrfK + rank)`, absent
    * legs contributing exactly 0.0, and Spark's own HALF_UP
    * `round(_, 6)` semantics (`BigDecimal(d)` is Spark Round's
    * valueOf-style decimal form). r18 measured the old Spark-side
    * fusion (two local relations full-outer joined) costing a THIRD
    * driver action per request — planning + AQE on ≤30 rows dominated
    * the serve once the legs rode the literal fast path — so the
    * fusion is now plain Scala and the result a LocalRelation: the
    * request pays exactly two overlapped leg jobs and nothing else.
    * The legs are independent Spark actions on a shared session — a
    * bounded daemon pool overlaps them. */
  private lazy val legPool = scala.concurrent.ExecutionContext
    .fromExecutorService(java.util.concurrent.Executors.newFixedThreadPool(
      4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-hybrid-leg")
        t.setDaemon(true)
        t
      }))

  private[queries] def fuseRrf(s: SparkSession,
      sparseIds: () => Array[Long],
      denseIds: () => Array[Long]): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val spF = Future(sparseIds())(legPool)
    val dnF = Future(denseIds())(legPool)
    val sp = Await.result(spF, Duration(600, "s"))
    val dn = Await.result(dnF, Duration(600, "s"))
    import s.implicits._
    val spRank = sp.zipWithIndex.map { case (id, i) => (id, i + 1L) }.toMap
    val dnRank = dn.zipWithIndex.map { case (id, i) => (id, i + 1L) }.toMap
    def term(r: Long): Double =
      if (r == 0L) 0.0 else 1.0 / (Similarity.RrfK + r)
    val fused = (sp ++ dn).distinct.toSeq.map { id =>
      val rs = spRank.getOrElse(id, 0L)
      val rd = dnRank.getOrElse(id, 0L)
      val rrf = BigDecimal(term(rs) + term(rd))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, rs, rd, rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }
    fused.toDF("doc_id", "rank_sparse", "rank_dense", "rrf")
  }

  /** PARAMETERIZED hybrid serving: an arbitrary (terms, query vector)
    * request, sparse leg from the stored postings, dense leg from the
    * stored IVF cells, legs collected concurrently, RRF fusion. */
  def hybridServe(s: SparkSession, retrWh: String, corpusDir: String,
      terms: Seq[String], queryVec: Seq[Double],
      nprobe: Int = Similarity.AnnProbeN,
      kSparse: Int = TextOps.Bm25K,
      kDense: Int = Similarity.AnnServeK): DataFrame =
    fuseRrf(s,
      () => bm25ServeScoredRequest(s, retrWh, terms)
        .orderBy(col("s").desc, col("doc_id").asc).limit(kSparse)
        .select("doc_id").collect().map(_.getLong(0)),
      () => Similarity.annServeScoredRequest(s, corpusDir, queryVec, nprobe)
        .orderBy(col("cos").desc, col("vec_id").asc).limit(kDense)
        .select("vec_id").collect().map(_.getLong(0)))

  /** [[hybridServe]] with BOTH stores explicit (retrieval + ANN
    * warehouse directories) — the product form for callers owning
    * their own index builds; the corpus-dir overload resolves the
    * memoized fixture stores. */
  def hybridServeFrom(s: SparkSession, retrWh: String, annWh: String,
      terms: Seq[String], queryVec: Seq[Double],
      nprobe: Int = Similarity.AnnProbeN,
      kSparse: Int = TextOps.Bm25K,
      kDense: Int = Similarity.AnnServeK): DataFrame =
    fuseRrf(s,
      () => bm25ServeScoredRequest(s, retrWh, terms)
        .orderBy(col("s").desc, col("doc_id").asc).limit(kSparse)
        .select("doc_id").collect().map(_.getLong(0)),
      () => Similarity.annServeFrom(s, annWh, queryVec, nprobe, kDense)
        .select("vec_id").collect().map(_.getLong(0)))

  /** The q146 search through the CONCURRENT path — same legs, same
    * fusion values (a spec pins value-identity to q146). Routing
    * history (r18 verdict #1): in r18 this path regressed to 801 ms
    * p50 — past the lazy plan's 433 — because its fusion ran as a
    * THIRD Spark action (two local relations full-outer joined, AQE
    * planning dominating a ≤30-row join) after the literal fast path
    * had made each leg cheap. With [[fuseRrf]]'s fusion moved to the
    * driver the request pays exactly two overlapped leg jobs, and
    * this path measures max(legs) + ε ≈ 183 ms p50 vs the lazy
    * plan's 451 (sum of legs) at sf0.1 — the serving default again
    * ([[hybridServeDefault]]), benched as the budgeted `q146_hybrid`
    * row in the index_serve section. */
  def hybridServeConcurrent(s: SparkSession, dir: String): DataFrame =
    fuseRrf(s,
      () => bm25ServeScoredFrom(s, ensure(s, dir))
        .orderBy(col("s").desc, col("doc_id").asc).limit(TextOps.Bm25K)
        .select("doc_id").collect().map(_.getLong(0)),
      () => Similarity.annServeScored(s, dir)
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(Similarity.AnnServeK)
        .select("vec_id").collect().map(_.getLong(0)))

  /** The SERVING DEFAULT for a single fixture hybrid request — the
    * path a deployment's request handler runs, routed to the
    * measured-faster form (r18 verdict #1): the concurrent legs with
    * DRIVER-side fusion (r19: 183 ms p50 / 222 ms p95 vs the lazy
    * single plan's 451/554 at sf0.1 — overlap wins again once the
    * fusion stopped being a third Spark action). The `index_serve`
    * budget verdict benches THIS symbol; the value-identity spec pins
    * it ≡ q146 ≡ the lazy twin, so re-routing is a one-line flip if
    * the economics change again. */
  def hybridServeDefault(s: SparkSession, dir: String): DataFrame =
    hybridServeConcurrent(s, dir)

  /** The q151 pinned request: different terms than q144/q149 and a
    * different probe vector than q142 — the parameterized hybrid
    * exercised end to end. */
  private[queries] val HybridParamTerms = Seq("group", "order")
  private[queries] val HybridParamVecId = 77L

  /** q151 — parameterized hybrid RRF serve (concurrent legs), both
    * legs answered from their stored indexes for an arbitrary
    * request; oracle re-derives both index chains, both serves and
    * the fusion from raw tables in one statement. */
  def hybridServeParam(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(HybridParamVecId))
      .select(graft.queries.Similarity.doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    hybridServe(s, ensure(s, dir), dir, HybridParamTerms, qv)
  }

  val hybridServeParamSql: String = {
    val ts = HybridParamTerms.distinct.sorted
    s"""WITH ${Similarity.cellAssignCteSql},
       |${Similarity.annRequestProbeCteSql(HybridParamVecId,
           Similarity.AnnProbeN)},
       |${bm25RequestCteSql(ts)},
       |spr AS (
       |  SELECT doc_id, rank_sparse FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank_sparse
       |    FROM rqsc WHERE ${ts.map(t => s"tf_$t > 0").mkString(" OR ")})
       |  WHERE rank_sparse <= ${TextOps.Bm25K}),
       |den AS (
       |  SELECT doc_id, rank_dense FROM (
       |    SELECT vec_id AS doc_id,
       |      row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank_dense
       |    FROM aqcand) WHERE rank_dense <= ${Similarity.AnnServeK})
       |SELECT COALESCE(spr.doc_id, den.doc_id) AS doc_id,
       |  CAST(COALESCE(rank_sparse, 0) AS BIGINT) AS rank_sparse,
       |  CAST(COALESCE(rank_dense, 0) AS BIGINT) AS rank_dense,
       |  round(COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_sparse), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_dense), 0), 6) AS rrf
       |FROM spr FULL OUTER JOIN den ON spr.doc_id = den.doc_id
       |ORDER BY rrf DESC, doc_id""".stripMargin
  }

  // ---- q168/q169: FILTERED retrieval (metadata pre-filter) -----------

  /** FILTERED BM25 serving — the sparse twin of the q167 filtered ANN
    * serve: the top-k restricted to documents whose source is allowed,
    * with the SCORES untouched (global df / corpus stats — a filter
    * must not re-weight terms, it narrows the candidate set). The
    * filter side is the stored `doc_stats` table of the corpus
    * warehouse (index-sized, deliberately not broadcast), the
    * candidate side the bucket-pruned postings serve — the plan
    * touches no corpus file. */
  def bm25ServeFiltered(s: SparkSession, retrWh: String, corpusDir: String,
      terms: Seq[String], k: Int, sources: Seq[String]): DataFrame =
    bm25ServeFilteredWith(s, retrWh,
      Warehouse.stored(s, corpusDir, "doc_stats"), terms, k, sources)

  /** [[bm25ServeFiltered]] with BOTH stores explicit. */
  def bm25ServeFilteredFrom(s: SparkSession, retrWh: String,
      corpusWh: String, terms: Seq[String], k: Int,
      sources: Seq[String]): DataFrame =
    bm25ServeFilteredWith(s, retrWh,
      Warehouse.read(s, corpusWh, "doc_stats"), terms, k, sources)

  private def bm25ServeFilteredWith(s: SparkSession, retrWh: String,
      docStats: DataFrame, terms: Seq[String], k: Int,
      sources: Seq[String]): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(sources.nonEmpty,
      "bm25ServeFiltered needs at least one allowed source — an empty " +
        "filter serves nothing by definition; use bm25Serve for unfiltered")
    val allowed = docStats
      .filter(col("source").isin(sources: _*))
      .select(col("doc_id"), col("source"))
    bm25ServeScoredRequest(s, retrWh, terms)
      .join(allowed, Seq("doc_id"))
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("dl"), col("source"),
        round(col("s"), 6).as("bm25"))
  }

  /** q168 — the filtered BM25 serve certified against a from-raw
    * recompute of the request AND the source filter. */
  def filteredBm25Serve(s: SparkSession, dir: String): DataFrame =
    bm25ServeFiltered(s, ensure(s, dir), dir, ParamTerms, ParamK,
      Similarity.FilterSources)

  val filteredBm25ServeSql: String = {
    val ts = ParamTerms.distinct.sorted
    s"""WITH ${bm25RequestCteSql(ts)},
       |fsrc AS (
       |  SELECT doc_id, source FROM documents
       |  WHERE source IN (${Similarity.FilterSources
            .map(x => s"'$x'").mkString(", ")}))
       |SELECT rqsc.doc_id, rqsc.dl, fsrc.source, round(s, 6) AS bm25
       |FROM rqsc JOIN fsrc ON fsrc.doc_id = rqsc.doc_id
       |WHERE ${ts.map(t => s"tf_$t > 0").mkString(" OR ")}
       |ORDER BY s DESC, rqsc.doc_id ASC
       |LIMIT $ParamK""".stripMargin
  }

  /** FILTERED hybrid serving — RRF fusion of the two FILTERED legs
    * (q167's dense filter + q168's sparse filter), concurrent on the
    * leg pool. Leg ranks are computed WITHIN the allowed population
    * (the rank a filtered deployment would serve), so fusion rewards
    * agreement among allowed documents rather than positions in a
    * ranking the caller is not allowed to see. */
  def hybridServeFiltered(s: SparkSession, retrWh: String,
      corpusDir: String, terms: Seq[String], queryVec: Seq[Double],
      sources: Seq[String],
      nprobe: Int = Similarity.AnnProbeN,
      kSparse: Int = TextOps.Bm25K,
      kDense: Int = Similarity.AnnServeK): DataFrame = {
    require(sources.nonEmpty,
      "hybridServeFiltered needs at least one allowed source")
    def allowed() = Warehouse.stored(s, corpusDir, "doc_stats")
      .filter(col("source").isin(sources: _*))
      .select("doc_id")
    fuseRrf(s,
      () => bm25ServeScoredRequest(s, retrWh, terms)
        .join(allowed(), Seq("doc_id"))
        .orderBy(col("s").desc, col("doc_id").asc).limit(kSparse)
        .select("doc_id").collect().map(_.getLong(0)),
      () => Similarity.annServeScoredRequest(s, corpusDir, queryVec, nprobe)
        .join(allowed().select(col("doc_id").as("vec_id")), Seq("vec_id"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(kDense)
        .select("vec_id").collect().map(_.getLong(0)))
  }

  /** q169 — the filtered hybrid fusion certified against a from-raw
    * recompute of both legs, both filters, both within-filter ranks
    * and the fusion algebra in one statement. */
  def filteredHybridServe(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(HybridParamVecId))
      .select(graft.queries.Similarity.doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    hybridServeFiltered(s, ensure(s, dir), dir, HybridParamTerms, qv,
      Similarity.FilterSources)
  }

  val filteredHybridServeSql: String = {
    val ts = HybridParamTerms.distinct.sorted
    s"""WITH ${Similarity.cellAssignCteSql},
       |${Similarity.annRequestProbeCteSql(HybridParamVecId,
           Similarity.AnnProbeN)},
       |${bm25RequestCteSql(ts)},
       |fsrc AS (
       |  SELECT doc_id, source FROM documents
       |  WHERE source IN (${Similarity.FilterSources
            .map(x => s"'$x'").mkString(", ")})),
       |spr AS (
       |  SELECT doc_id, rank_sparse FROM (
       |    SELECT rqsc.doc_id,
       |      row_number() OVER (ORDER BY s DESC, rqsc.doc_id ASC) AS rank_sparse
       |    FROM rqsc JOIN fsrc ON fsrc.doc_id = rqsc.doc_id
       |    WHERE ${ts.map(t => s"tf_$t > 0").mkString(" OR ")})
       |  WHERE rank_sparse <= ${TextOps.Bm25K}),
       |den AS (
       |  SELECT doc_id, rank_dense FROM (
       |    SELECT aqcand.vec_id AS doc_id,
       |      row_number() OVER (ORDER BY cos DESC, aqcand.vec_id ASC) AS rank_dense
       |    FROM aqcand JOIN fsrc ON fsrc.doc_id = aqcand.vec_id)
       |  WHERE rank_dense <= ${Similarity.AnnServeK})
       |SELECT COALESCE(spr.doc_id, den.doc_id) AS doc_id,
       |  CAST(COALESCE(rank_sparse, 0) AS BIGINT) AS rank_sparse,
       |  CAST(COALESCE(rank_dense, 0) AS BIGINT) AS rank_dense,
       |  round(COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_sparse), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_dense), 0), 6) AS rrf
       |FROM spr FULL OUTER JOIN den ON spr.doc_id = den.doc_id
       |ORDER BY rrf DESC, doc_id""".stripMargin
  }

  // ---- q154/q156: BATCHED multi-request serving (r15 verdict #1) -----

  /** BATCHED BM25 serving — N requests answered by ONE Spark job
    * (r15 verdict #1: the parameterized APIs are correct but serve
    * one request per ~200–386 ms driver-side job, a 3–5 req/s
    * throughput ceiling; an eval replay runs thousands). The batch
    * form keeps every per-request contract of [[bm25Serve]] —
    * bucket-pruned postings read, tombstone anti-join before any
    * weight input, global df from the pruned read, sorted-term fold
    * (deterministic float sum), candidate-restricted top-k — and
    * shares the work across requests:
    *
    *  - the postings scan prunes to the UNION of the batch's term
    *    buckets (one literal `term_bucket IN` — still static partition
    *    pruning, PlanShapeSpec-pinned) and is read ONCE for all
    *    requests;
    *  - df/stats/okapi weights are computed once per (doc, term) —
    *    requests sharing a term share its weight rows;
    *  - the request set broadcasts as a tiny (req_id, term) frame
    *    (requests are driver-originated and small by premise), so the
    *    fan-out to requests is a broadcast hash join, never a shuffle
    *    of the postings;
    *  - per-request top-k runs as the house [[graft.functions.
    *    TopKAggregator]] — O(k) state per request, map-side partials,
    *    so the exchange carries ≤ partitions·|requests|·k structs.
    *
    * Per request the result rows are IDENTICAL to the sequential
    * [[bm25Serve]] (BatchServeSpec pins it): same candidates, same
    * sorted-term float sum, same (s DESC, doc_id ASC) tie rule via
    * the aggregator's (neg_s, id) ordering. Output one row per
    * (req_id, rank ≤ k): req_id, rank, doc_id, dl, bm25. */
  def bm25ServeBatch(s: SparkSession, wh: String,
      requests: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.Encoders
    import graft.functions.{ScoredCand, TopKAggregator}
    require(k > 0, s"k must be positive, got $k")
    require(requests.nonEmpty, "bm25ServeBatch needs at least one request")
    require(requests.map(_._1).distinct.size == requests.size,
      "request ids must be unique")
    val reqPairs = requests.flatMap { case (rid, terms) =>
      require(terms.nonEmpty, s"request $rid needs at least one term")
      terms.distinct.map(t => (rid, t))
    }
    val ts = reqPairs.map(_._2).distinct.sorted
    val p0 = Warehouse.read(s, wh, "postings")
      .filter(col("term_bucket").isin(ts.map(bucketOf).distinct: _*) &&
        col("term").isin(ts: _*))
    val p = tombstonesOf(s, wh).fold(p0)(t =>
      p0.join(broadcast(t.select("doc_id")), Seq("doc_id"), "left_anti"))
    // df per term = posting-list length from the pruned read — the
    // same value the sequential serve derives (df of a term does not
    // depend on which other terms share the batch).
    val dft = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = Warehouse.read(s, wh, "corpus_stats")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val reqDf = reqPairs.toDF("req_id", "term")
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
    p.join(broadcast(dft), Seq("term"))
      .join(broadcast(stats))
      .withColumn("w",
        okapiW(col("tf"), col("df"), col("n_docs"), col("dl"), avgdl))
      .join(broadcast(reqDf), Seq("term"))
      .groupBy(col("req_id"), col("doc_id"), col("dl"))
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("tw"))
      .withColumn("sc", aggregate(col("tw"), lit(0.0),
        (acc, x) => acc + x.getField("w")))
      .groupBy(col("req_id"))
      .agg(topk(-col("sc"), col("doc_id"), col("dl").cast("double")).as("top"))
      .select(col("req_id"), posexplode(col("top.cands")).as(Seq("pos", "x")))
      .select(col("req_id"), (col("pos") + 1).cast("long").as("rank"),
        col("x.id").as("doc_id"), col("x.c").cast("long").as("dl"),
        round(-col("x.neg_cos"), 6).as("bm25"))
      .orderBy("req_id", "rank")
  }

  /** The q154 pinned request battery: 60 distinct requests (1–4 terms
    * each) generated arithmetically from the corpus's own vocabulary —
    * no RNG, so the Spark battery and the generated oracle SQL agree
    * by construction at every SF. */
  private[queries] val BatchVocab: Vector[String] = Vector(
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window")
  private[queries] def batchBm25Requests: Seq[(Long, Seq[String])] =
    (0L until 60L).map { i =>
      val n = 1 + (i % 4).toInt
      val terms = (0 until n)
        .map(j => BatchVocab(((i * 7 + j * 11 + 3) % BatchVocab.length).toInt))
        .distinct
      (i, terms)
    }
  private[queries] val BatchBm25K = 5

  /** q154 — the batched BM25 serve certified per request against a
    * from-scratch DuckDB recompute: 60 requests, one Spark job, each
    * request's top-k identical to its sequential serve. */
  def bm25ServeBatchQ(s: SparkSession, dir: String): DataFrame =
    bm25ServeBatch(s, ensure(s, dir), batchBm25Requests, BatchBm25K)

  /** One Okapi BM25 term of the generated oracle score chain —
    * references `tf_<t>`/`df_<t>`/`n_docs`/`dl`/`sum_dl` in scope;
    * shared by the single-request ([[bm25RequestCteSql]]) and batch
    * oracle generators so the scoring rule text cannot drift. */
  private def okapiTermSql(t: String): String = {
    val (k1, b) = (1.2, 0.75)
    s"""((n_docs - df_$t + 0.5) / (df_$t + 0.5))
       | * (CAST(tf_$t AS DOUBLE) * ${k1 + 1})
       | / (CAST(tf_$t AS DOUBLE) + $k1 * (1.0 - $b + $b * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))"""
      .stripMargin.replaceAll("\n", "")
  }

  /** Shared tokenization/stats CTEs of the batch oracle: tf per
    * DISTINCT battery term (computed once, every request block reads
    * its columns), corpus stats + df per term. CTE names `<pfx>t`,
    * `<pfx>st`. */
  private[queries] def batchBm25CteSql(pfx: String,
      requests: Seq[(Long, Seq[String])]): String = {
    val allTs = requests.flatMap(_._2).distinct.sorted
    val tfCols = allTs.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n    ")
    val dfCols = allTs.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n    ")
    s"""${pfx}d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |${pfx}t AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM ${pfx}d),
       |${pfx}st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfCols
       |  FROM ${pfx}t)""".stripMargin
  }

  /** Per-request ranked blocks (UNION ALL), each mirroring the
    * sequential request oracle: sorted-term left-associated score
    * chain (absent terms add IEEE-exact +0.0), candidate restriction,
    * (s DESC, doc_id ASC) row_number ≤ k. Emits rows
    * (req_id, rank, doc_id, dl, s). */
  private[queries] def batchBm25RankedSql(pfx: String,
      requests: Seq[(Long, Seq[String])], k: Int): String =
    requests.map { case (rid, terms) =>
      val ts = terms.distinct.sorted
      val score = ts.map(okapiTermSql).mkString(" + ")
      val cand = ts.map(t => s"tf_$t > 0").mkString(" OR ")
      s"""SELECT req_id, rank, doc_id, dl, s FROM (
         |  SELECT CAST($rid AS BIGINT) AS req_id,
         |    row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank,
         |    doc_id, dl, s
         |  FROM (SELECT doc_id, dl, $score AS s,
         |          ${ts.map(t => s"tf_$t").mkString(", ")}
         |        FROM ${pfx}t, ${pfx}st)
         |  WHERE $cand) WHERE rank <= $k""".stripMargin
    }.mkString("\nUNION ALL\n")

  val bm25ServeBatchSql: String =
    s"""WITH ${batchBm25CteSql("bb", batchBm25Requests)}
       |SELECT req_id, rank, doc_id, dl, round(s, 6) AS bm25 FROM (
       |${batchBm25RankedSql("bb", batchBm25Requests, BatchBm25K)}
       |)
       |ORDER BY req_id, rank""".stripMargin

  /** BATCHED hybrid serving: N (terms, query-vector) requests, the
    * sparse leg answered by ONE [[bm25ServeBatch]] job over the stored
    * postings, the dense leg by ONE [[Similarity.annServeBatch]] job
    * over the stored cells, fused per request by reciprocal rank
    * fusion — one job per family (r15 verdict #1) instead of two
    * driver jobs per request, and unlike the sequential hybrid there
    * is no driver-side collect between the legs at all: both leg
    * frames and the fusion compose into one lazy plan. Per request
    * the fused ranking is identical to the sequential
    * [[hybridServe]] (BatchServeSpec pins it); absent legs contribute
    * rank 0, the q118 contract. */
  /** Request count above which [[hybridServeBatch]] fuses IN-PLAN
    * (r16 verdict item: the driver fusion's collect is bounded by
    * (kSparse + kDense)·|requests| rank rows — fine for the 25–60
    * request SERVING populations where overlapping the two family
    * jobs wins, but an offline eval-scale population (10⁵ requests ⇒
    * ~5 M driver rows) must fuse without touching the driver). */
  private[queries] val InPlanFusionThreshold = 100

  def hybridServeBatch(s: SparkSession, retrWh: String, corpusDir: String,
      requests: Seq[(Long, Seq[String], Seq[Double])],
      nprobe: Int = Similarity.AnnProbeN,
      kSparse: Int = TextOps.Bm25K,
      kDense: Int = Similarity.AnnServeK): DataFrame = {
    def sparse() = bm25ServeBatch(s, retrWh,
      requests.map(r => (r._1, r._2)), kSparse)
    def dense() = Similarity.annServeBatch(s, corpusDir,
      requests.map(r => (r._1, r._3)), nprobe, kDense)
    if (requests.size > InPlanFusionThreshold)
      fuseBatchInPlan(sparse(), dense())
    else fuseBatch(s, () => sparse(), () => dense())
  }

  /** [[hybridServeBatch]] with BOTH stores explicit. */
  def hybridServeBatchFrom(s: SparkSession, retrWh: String, annWh: String,
      requests: Seq[(Long, Seq[String], Seq[Double])],
      nprobe: Int = Similarity.AnnProbeN,
      kSparse: Int = TextOps.Bm25K,
      kDense: Int = Similarity.AnnServeK): DataFrame = {
    def sparse() = bm25ServeBatch(s, retrWh,
      requests.map(r => (r._1, r._2)), kSparse)
    def dense() = Similarity.annServeBatchFrom(s, annWh,
      requests.map(r => (r._1, r._3)), nprobe, kDense)
    if (requests.size > InPlanFusionThreshold)
      fuseBatchInPlan(sparse(), dense())
    else fuseBatch(s, () => sparse(), () => dense())
  }

  /** Per-request RRF fusion of the two batch legs — the q118 algebra
    * keyed by (req_id, doc_id). The legs are independent single-job
    * frames; collecting their ≤ (kSparse + kDense)·|requests| rank
    * rows on the shared daemon pool OVERLAPS the two family jobs (the
    * [[fuseRrf]] discipline at batch grain — a lazily fused plan runs
    * the leg stages back to back), and the fusion itself is the same
    * Spark expressions over the tiny fused frame, so values are
    * identical to an in-plan full-outer fusion. */
  private def fuseBatch(s: SparkSession, sparse: () => DataFrame,
      dense: () => DataFrame): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val spF = Future(sparse().select("req_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))(legPool)
    val dnF = Future(dense().select("req_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))(legPool)
    val sp = Await.result(spF, Duration(600, "s"))
    val dn = Await.result(dnF, Duration(600, "s"))
    import s.implicits._
    val spDf = sp.toSeq.toDF("req_id", "doc_id", "rank_sparse")
    val dnDf = dn.toSeq.toDF("req_id", "doc_id", "rank_dense")
    def term(r: Column): Column =
      when(r.isNull, lit(0.0))
        .otherwise(lit(1.0) / (lit(Similarity.RrfK) + r))
    spDf.join(dnDf, Seq("req_id", "doc_id"), "full_outer")
      .select(col("req_id"), col("doc_id"),
        coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
        round(term(col("rank_sparse")) + term(col("rank_dense")), 6).as("rrf"))
      .orderBy(col("req_id"), col("rrf").desc, col("doc_id"))
  }

  /** IN-PLAN fusion of the two batch legs — the q118 RRF algebra as
    * one lazy plan, zero driver-side rank collection: the leg frames
    * (each ≤ k rows per request, already per-request-top-k'd on the
    * executors) full-outer join on (req_id, doc_id) and the fusion
    * expressions are IDENTICAL to [[fuseBatch]]'s, so the two forms
    * are row-identical on any population (HybridFusionSpec pins the
    * overlap). Selected above [[InPlanFusionThreshold]], where the
    * fused frame outgrows what a driver should hold; below it the
    * collected form wins by overlapping the two family jobs. */
  private[queries] def fuseBatchInPlan(sparse: DataFrame,
      dense: DataFrame): DataFrame = {
    def term(r: Column): Column =
      when(r.isNull, lit(0.0))
        .otherwise(lit(1.0) / (lit(Similarity.RrfK) + r))
    val spDf = sparse.select(col("req_id"), col("doc_id"),
      col("rank").as("rank_sparse"))
    val dnDf = dense.select(col("req_id"), col("vec_id").as("doc_id"),
      col("rank").as("rank_dense"))
    spDf.join(dnDf, Seq("req_id", "doc_id"), "full_outer")
      .select(col("req_id"), col("doc_id"),
        coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
        round(term(col("rank_sparse")) + term(col("rank_dense")), 6).as("rrf"))
      .orderBy(col("req_id"), col("rrf").desc, col("doc_id"))
  }

  /** The q156 pinned battery: 25 hybrid requests — term sets from the
    * corpus vocabulary, query vectors replayed from stored embeddings
    * (both arithmetic, RNG-free, so the oracle pins the same battery). */
  private[queries] def batchHybridTermReqs: Seq[(Long, Seq[String])] =
    (0L until 25L).map { i =>
      val n = 1 + (i % 3).toInt
      val terms = (0 until n)
        .map(j => BatchVocab(((i * 5 + j * 13 + 1) % BatchVocab.length).toInt))
        .distinct
      (i, terms)
    }
  private[queries] val BatchHybridVecIds: Seq[Long] =
    (0 until 25).map(i => ((i * 17 + 11) % 480).toLong)

  /** q156 — the batched hybrid serve: both legs from their stored
    * indexes in one job each, RRF fusion per request; oracle
    * re-derives both index chains, all 25 sparse blocks, all 25
    * dense probes and the fusion from raw tables in one statement. */
  def hybridServeBatchQ(s: SparkSession, dir: String): DataFrame = {
    val byId = Tables.embeddings(s, dir)
      .filter(col("vec_id").isin(BatchHybridVecIds: _*))
      .select(col("vec_id"), graft.queries.Similarity.doubled(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val reqs = batchHybridTermReqs.zip(BatchHybridVecIds).map {
      case ((rid, ts), vid) => (rid, ts, byId(vid))
    }
    hybridServeBatch(s, ensure(s, dir), dir, reqs)
  }

  /** ONE oracle rule text for ANY hybrid batch battery — the q156
    * pinned battery and the q173 in-plan battery instantiate it, so
    * the two certificates can never drift on the fusion algebra. */
  private def hybridBatchSqlFor(termReqs: Seq[(Long, Seq[String])],
      vecIds: Seq[Long]): String = {
    val reqVals = termReqs.zip(vecIds)
      .map { case ((rid, _), vid) => s"($rid, $vid)" }.mkString(", ")
    s"""WITH ${Similarity.cellAssignCteSql},
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |${batchBm25CteSql("hb", termReqs)},
       |hspr AS (
       |  SELECT req_id, doc_id, rank AS rank_sparse FROM (
       |${batchBm25RankedSql("hb", termReqs, TextOps.Bm25K)}
       |)),
       |hmap(req_id, qvid) AS (VALUES $reqVals),
       |hq AS (
       |  SELECT hmap.req_id, e.v AS quv,
       |    sqrt(list_inner_product(e.v, e.v)) AS qn
       |  FROM hmap JOIN e ON e.vec_id = hmap.qvid),
       |hpc AS (
       |  SELECT req_id, probe_cell, quv, qn FROM (
       |    SELECT hq.req_id, c.c_id AS probe_cell, hq.quv, hq.qn,
       |      row_number() OVER (PARTITION BY hq.req_id
       |        ORDER BY ${Similarity.cosineSqlFor("c.qv", "hq.quv")} DESC, c.c_id DESC) AS rn
       |    FROM c, hq) WHERE rn <= ${Similarity.AnnProbeN}),
       |hcand AS (
       |  SELECT hpc.req_id, sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * hpc.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, hpc.quv) / (sig.norm * hpc.qn)
       |      END AS cos
       |  FROM sig JOIN hpc ON sig.cell = hpc.probe_cell),
       |hden AS (
       |  SELECT req_id, vec_id AS doc_id, rank AS rank_dense FROM (
       |    SELECT req_id,
       |      row_number() OVER (PARTITION BY req_id
       |        ORDER BY cos DESC, vec_id ASC) AS rank,
       |      vec_id
       |    FROM hcand)
       |  WHERE rank <= ${Similarity.AnnServeK})
       |SELECT COALESCE(sp.req_id, dn.req_id) AS req_id,
       |  COALESCE(sp.doc_id, dn.doc_id) AS doc_id,
       |  CAST(COALESCE(rank_sparse, 0) AS BIGINT) AS rank_sparse,
       |  CAST(COALESCE(rank_dense, 0) AS BIGINT) AS rank_dense,
       |  round(COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_sparse), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / (${Similarity.RrfK} + rank_dense), 0), 6) AS rrf
       |FROM hspr sp FULL OUTER JOIN hden dn
       |  ON sp.req_id = dn.req_id AND sp.doc_id = dn.doc_id
       |ORDER BY req_id, rrf DESC, doc_id""".stripMargin
  }

  val hybridServeBatchSql: String =
    hybridBatchSqlFor(batchHybridTermReqs, BatchHybridVecIds)

  // ---- q173: IN-PLAN batch-hybrid fusion (r16 verdict #2) -------------

  /** The q173 pinned battery: 30 hybrid requests, term stride and
    * vector stride disjoint from the q156 battery. */
  private[queries] def inPlanHybridTermReqs: Seq[(Long, Seq[String])] =
    (0L until 30L).map { i =>
      val n = 1 + (i % 3).toInt
      val terms = (0 until n)
        .map(j => BatchVocab(((i * 7 + j * 11 + 2) % BatchVocab.length).toInt))
        .distinct
      (i, terms)
    }
  private[queries] val InPlanHybridVecIds: Seq[Long] =
    (0 until 30).map(i => ((i * 23 + 9) % 480).toLong)

  /** q173 — the IN-PLAN batch-hybrid fusion certified: the pinned
    * battery forced through [[fuseBatchInPlan]] (the ≥ threshold
    * path — zero driver-side rank collection; both legs and the RRF
    * algebra compose into ONE lazy plan) against the same from-raw
    * re-derivation idiom as q156. Values are leg-rank algebra, so
    * in-plan ≡ collected fusion by construction (HybridFusionSpec
    * additionally pins row-identity of the two forms). */
  def hybridServeBatchInPlanQ(s: SparkSession, dir: String): DataFrame = {
    val byId = Tables.embeddings(s, dir)
      .filter(col("vec_id").isin(InPlanHybridVecIds: _*))
      .select(col("vec_id"),
        graft.queries.Similarity.doubled(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val reqs = inPlanHybridTermReqs.zip(InPlanHybridVecIds).map {
      case ((rid, ts), vid) => (rid, ts, byId(vid))
    }
    fuseBatchInPlan(
      bm25ServeBatch(s, ensure(s, dir),
        reqs.map(r => (r._1, r._2)), TextOps.Bm25K),
      Similarity.annServeBatch(s, dir,
        reqs.map(r => (r._1, r._3)), Similarity.AnnProbeN,
        Similarity.AnnServeK))
  }

  val hybridServeBatchInPlanSql: String =
    hybridBatchSqlFor(inPlanHybridTermReqs, InPlanHybridVecIds)

  val mergeCertifySql: String =
    s"""WITH p AS (
       |  SELECT DISTINCT doc_id, t.term
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents) t),
       |d AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
       |  FROM documents)
       |SELECT * FROM (
       |  SELECT 'postings_minus_rebuild' AS metric, CAST(0 AS BIGINT) AS value, TRUE AS ok
       |  UNION ALL
       |  SELECT 'postings_rows', (SELECT CAST(count(*) AS BIGINT) FROM p), TRUE
       |  UNION ALL
       |  SELECT 'rebuild_minus_postings', CAST(0 AS BIGINT), TRUE
       |  UNION ALL
       |  SELECT 'stats_n_docs', (SELECT n_docs FROM d), TRUE
       |  UNION ALL
       |  SELECT 'stats_sum_dl', (SELECT sum_dl FROM d), TRUE)
       |ORDER BY metric""".stripMargin
}
