package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The ONE production curation entry point (round-13 verdict #2): the
  * stages that exist as ~30 independent registry queries, chained the
  * way a data lead actually runs them — the analogue of the
  * reference's single batch job (`prepare_data_batch.ipynb`
  * end-to-end), re-expressed over this engine's materialized index
  * [[Warehouse]].
  *
  * `run(spark, corpusDir, outDir)` executes, PERSISTING each stage as
  * a versioned parquet table under `outDir` (the warehouse snapshot
  * protocol — one atomic pointer for the whole run, so a consumer
  * never reads the flags of run N next to the pack layout of run N−1):
  *
  *  1. `cur_flags`    — one row per training doc (the benchmark slice
  *     `src0` is excluded by definition: it is eval data, not training
  *     data) with every gate verdict: quality pass (q37 score ≥ the
  *     q71 [[PipelineOps.QualityMin]]), n-gram contamination (q66),
  *     doc-grain dedup purge (q92, stored), chunk-grain purge (q108,
  *     stored), semantic purge (q109, stored), and the combined
  *     `retained` bit. Flags are INDEPENDENT — a doc can be both
  *     contaminated and purged; the audit value is seeing each gate's
  *     verdict, not just the first one that fired.
  *  2. `cur_mixture`  — the q127 capped-proportional token plan over
  *     the RETAINED corpus (weights = the pinned src<N> rule).
  *  3. `cur_pack`     — the q65 concat-and-chunk layout over the
  *     retained docs (shard / start_offset / bin).
  *  4. `cur_summary`  — the per-source sign-off table (q136): every
  *     gate's count, retained docs/tokens, the mixture take, and the
  *     pack-bin footprint.
  *
  * Scale shape: every stage is a standing-contract plan — the dedup
  * verdicts are O(purged) STORED tables left-joined on doc_id, the
  * contamination check is the broadcast-gram q66 shape, quality is one
  * `doc_stats` column, the mixture plan aggregates to |sources| rows,
  * and the pack window is the q65 per-shard running sum. Nothing
  * re-derives an index from the corpus: the pipeline consumes the
  * warehouse the daily build job maintains.
  */
object CurationPipeline {

  val StageNames: Seq[String] =
    Seq("cur_flags", "cur_mixture", "cur_pack", "cur_summary")

  /** Per-doc gate verdicts over the training slice (stage 1). */
  private def flagFrame(s: SparkSession, corpusDir: String,
      table: String => DataFrame): DataFrame = {
    val stats = table("doc_stats")
      .filter(col("source") =!= PipelineOps.EvalSource)
    val docs = Tables.documents(s, corpusDir)
    val evalGrams = PipelineOps
      .docGrams(docs.filter(col("source") === PipelineOps.EvalSource), 5)
      .select(col("g")).distinct()
    val contaminated = PipelineOps
      .docGrams(docs.filter(col("source") =!= PipelineOps.EvalSource), 5)
      .join(broadcast(evalGrams), "g")
      .select("doc_id").distinct()
      .withColumn("ctm", lit(true))
    def flagOf(tbl: String, name: String, key: String = "doc_id"): DataFrame =
      table(tbl)
        .select(col(key).as("doc_id")).distinct()
        .withColumn(name, lit(true))
    stats
      .join(contaminated, Seq("doc_id"), "left")
      .join(flagOf("purge", "dpu"), Seq("doc_id"), "left")
      .join(flagOf("chunk_purge", "cpu"), Seq("doc_id"), "left")
      .join(flagOf("sem_purge", "spu", key = "vec_id"), Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        (col("quality_score") >= PipelineOps.QualityMin).as("quality_pass"),
        coalesce(col("ctm"), lit(false)).as("contaminated"),
        coalesce(col("dpu"), lit(false)).as("doc_purged"),
        coalesce(col("cpu"), lit(false)).as("chunk_purged"),
        coalesce(col("spu"), lit(false)).as("sem_purged"))
      .withColumn("retained",
        col("quality_pass") && !col("contaminated") && !col("doc_purged") &&
          !col("chunk_purged") && !col("sem_purged"))
  }

  /** The q127 capped-proportional plan over the retained corpus. */
  private def mixtureFrame(retained: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
    retained.groupBy("source")
      .agg(sum(col("n_tokens")).as("avail_tokens"))
      .withColumn("w", PipelineOps.srcWeightCol)
      .withColumn("den", sum(col("w")).over(wAll))
      .withColumn("b", expr("(avail_tokens * den) div w"))
      .withColumn("b_star", min(col("b")).over(wAll))
      .select(col("source"), col("w"), col("avail_tokens"),
        expr("(b_star * w) div den").as("take_tokens"))
  }

  /** The q65 pack layout over the retained docs. */
  private def packFrame(retained: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    retained
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .withColumn("shard", pmod(
        PipelineOps.hash60(concat(lit("shard"), col("doc_id"))),
        lit(PipelineOps.PackShards)))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", expr(s"start_offset div ${PipelineOps.PackBudget}"))
  }

  /** The per-source sign-off table (stage 4 / q136's content). */
  private def summaryFrame(flags: DataFrame, mixture: DataFrame,
      pack: DataFrame): DataFrame = {
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val bins = pack.groupBy("source")
      .agg(countDistinct(col("shard") * lit(1000000000L) + col("bin"))
        .as("n_pack_bins"))
    flags.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        cnt(!col("quality_pass")).as("n_quality_fail"),
        cnt(col("contaminated")).as("n_contaminated"),
        cnt(col("doc_purged")).as("n_doc_purged"),
        cnt(col("chunk_purged")).as("n_chunk_purged"),
        cnt(col("sem_purged")).as("n_sem_purged"),
        cnt(col("retained")).as("n_retained"),
        sum(when(col("retained"), col("n_tokens")).otherwise(0L))
          .as("tokens_retained"))
      .join(mixture.select(col("source"), col("take_tokens")), Seq("source"), "left")
      .join(bins, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_quality_fail"),
        col("n_contaminated"), col("n_doc_purged"), col("n_chunk_purged"),
        col("n_sem_purged"), col("n_retained"), col("tokens_retained"),
        coalesce(col("take_tokens"), lit(0L)).as("take_tokens"),
        coalesce(col("n_pack_bins"), lit(0L)).as("n_pack_bins"))
      .orderBy("source")
  }

  /** Execute the full curation run against `corpusDir`, persisting
    * every stage under `outDir` (versioned, atomic pointer). Each
    * stage reads the PREVIOUS stage's stored table — the warehouse
    * build's proven-lineage discipline. `table` is the index reader
    * (defaults to the memoized fixture warehouse; the corpus bench
    * passes the warehouse it just built and measured) and `measure`
    * the per-stage attribution hook (the `buildOf` contract). Returns
    * the new version. */
  def run(s: SparkSession, corpusDir: String, outDir: String,
      table: Option[String => DataFrame] = None,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Long = {
    val tbl = table.getOrElse(Warehouse.stored(s, corpusDir, _))
    Files.createDirectories(java.nio.file.Paths.get(outDir))
    val cur = Warehouse.version(outDir)
    val next = cur + 1
    val base = Warehouse.freshVersionDir(outDir, next)
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$base/$name")
    def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")

    measure("cur_flags", () => write("cur_flags", flagFrame(s, corpusDir, tbl)))
    def retained = readBack("cur_flags").filter(col("retained"))
    measure("cur_mixture", () => write("cur_mixture", mixtureFrame(retained)))
    measure("cur_pack", () => write("cur_pack", packFrame(retained)))
    measure("cur_summary", () => write("cur_summary", summaryFrame(
      readBack("cur_flags"), readBack("cur_mixture"), readBack("cur_pack"))))
    Warehouse.commitSnapshot(outDir, cur, next)
    next
  }

  // ---- fixture run (one per corpus dir per JVM, the q99 discipline) --

  private val fixtureRuns =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensure(s: SparkSession, corpusDir: String): String =
    fixtureRuns.computeIfAbsent(corpusDir, _ => {
      val out = Files.createTempDirectory("graft-curation").toString
      run(s, corpusDir, out)
      out
    })

  /** A stored stage table of the fixture run for `corpusDir`. */
  def stored(s: SparkSession, corpusDir: String, table: String): DataFrame =
    Warehouse.read(s, ensure(s, corpusDir), table)

  /** q136 — the curation run certified end-to-end: the STORED
    * `cur_summary` table (the plan is one parquet scan of the run's
    * committed output — PlanShapeSpec pins zero corpus scans), hash-
    * checked against DuckDB recomputing the ENTIRE chain — quality
    * gate, 5-gram contamination, doc/chunk purge ranks (both grains
    * instantiated from the one shared rule text), semantic purge,
    * mixture plan, pack layout — from the raw corpus in one statement.
    * Construction is EAGER on first use per corpus dir (the pipeline
    * run — the q99 discipline). */
  def curationRun(s: SparkSession, dir: String): DataFrame =
    stored(s, dir, "cur_summary").orderBy("source")

  /** The oracle chain through the RETAINED set (`ret`) — quality
    * gate, contamination, all three purge grains — factored (r17) so
    * the q185 curated-shard manifest re-derives retention through the
    * SAME rule text as the q136 summary. Splice after
    * `WITH RECURSIVE `. */
  private[queries] val curationRetainedCteSql: String = {
    val eval = PipelineOps.EvalSource
    s"""${Dedup.bandsCteSql},
       |${Dedup.ccCompCteSql},
       |${Dedup.chunkPairCteSql},
       |${Dedup.chunkCcCteSql},
       |${Dedup.qualityScCteSql},
       |${Dedup.purgeRankCteSql("comp")},
       |${Dedup.purgeRankCteSql("ccomp", "ck")},
       |${Similarity.cellAssignCteSql},
       |${Similarity.semPairCteSql},
       |sem AS (SELECT DISTINCT j AS doc_id FROM p
       |        WHERE cos >= ${Similarity.SemDedupTau}),
       |gt AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |gg AS (
       |  SELECT DISTINCT doc_id, source,
       |    ('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT AS g
       |  FROM gt, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) rr),
       |ev AS (SELECT DISTINCT g FROM gg WHERE source = '$eval'),
       |ctm AS (SELECT DISTINCT gg.doc_id FROM gg JOIN ev USING (g)
       |        WHERE gg.source != '$eval'),
       |fl AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    (sc.quality_score >= ${PipelineOps.QualityMin}) AS quality_pass,
       |    (ctm.doc_id IS NOT NULL) AS contaminated,
       |    (pg.doc_id IS NOT NULL) AS doc_purged,
       |    (ckpg.doc_id IS NOT NULL) AS chunk_purged,
       |    (sem.doc_id IS NOT NULL) AS sem_purged
       |  FROM documents d
       |    JOIN sc ON sc.doc_id = d.doc_id
       |    LEFT JOIN ctm ON ctm.doc_id = d.doc_id
       |    LEFT JOIN (SELECT DISTINCT doc_id FROM pg) pg ON pg.doc_id = d.doc_id
       |    LEFT JOIN (SELECT DISTINCT doc_id FROM ckpg) ckpg ON ckpg.doc_id = d.doc_id
       |    LEFT JOIN sem ON sem.doc_id = d.doc_id
       |  WHERE d.source != '$eval'),
       |ret AS (
       |  SELECT * FROM fl
       |  WHERE quality_pass AND NOT contaminated AND NOT doc_purged
       |    AND NOT chunk_purged AND NOT sem_purged)""".stripMargin
  }

  val curationRunSql: String =
    s"""WITH RECURSIVE $curationRetainedCteSql,
       |mx AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail_tokens,
       |    CAST(substr(source, 4) AS BIGINT) + 1 AS w
       |  FROM ret GROUP BY source),
       |mx2 AS (
       |  SELECT source, avail_tokens, w,
       |    CAST(sum(w) OVER () AS BIGINT) AS den,
       |    (avail_tokens * CAST(sum(w) OVER () AS BIGINT)) // w AS b
       |  FROM mx),
       |mx3 AS (
       |  SELECT source, ((SELECT min(b) FROM mx2) * w) // den AS take_tokens
       |  FROM mx2),
       |pk AS (
       |  SELECT doc_id, source, n_tokens,
       |    ('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 15))::BIGINT
       |      % ${PipelineOps.PackShards} AS shard
       |  FROM ret),
       |pk2 AS (
       |  SELECT source, shard,
       |    CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens)
       |      // ${PipelineOps.PackBudget} AS BIGINT) AS bin
       |  FROM pk),
       |pb AS (
       |  SELECT source,
       |    CAST(count(DISTINCT shard * 1000000000 + bin) AS BIGINT) AS n_pack_bins
       |  FROM pk2 GROUP BY source)
       |SELECT fl.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN NOT quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_fail,
       |  CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(sum(CASE WHEN doc_purged THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_purged,
       |  CAST(sum(CASE WHEN chunk_purged THEN 1 ELSE 0 END) AS BIGINT) AS n_chunk_purged,
       |  CAST(sum(CASE WHEN sem_purged THEN 1 ELSE 0 END) AS BIGINT) AS n_sem_purged,
       |  CAST(sum(CASE WHEN quality_pass AND NOT contaminated AND NOT doc_purged
       |    AND NOT chunk_purged AND NOT sem_purged THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       |  CAST(sum(CASE WHEN quality_pass AND NOT contaminated AND NOT doc_purged
       |    AND NOT chunk_purged AND NOT sem_purged THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_retained,
       |  CAST(coalesce(any_value(mx3.take_tokens), 0) AS BIGINT) AS take_tokens,
       |  CAST(coalesce(any_value(pb.n_pack_bins), 0) AS BIGINT) AS n_pack_bins
       |FROM fl
       |  LEFT JOIN mx3 ON mx3.source = fl.source
       |  LEFT JOIN pb ON pb.source = fl.source
       |GROUP BY fl.source
       |ORDER BY fl.source""".stripMargin

  /** q185 — the CURATED shard manifest: the q182 integrity record
    * over the pipeline's retained set — per (shard, bin) of the
    * STORED `cur_pack` stage: row count, exact token sum, id range,
    * md5 over the ordered doc ids. The oracle re-derives RETENTION
    * (quality gate, contamination, all three purge grains — the q136
    * chain verbatim via the factored rule text) and then the pack
    * layout and digests from the raw corpus in one statement, so a
    * shard that smuggled one purged or contaminated document to the
    * trainer is a hash mismatch. [[graft.sources.Sinks.writeCuratedShards]]
    * writes the physical tree this manifest describes. */
  def curatedShardManifest(s: SparkSession, dir: String): DataFrame =
    PipelineOps.manifestOf(stored(s, dir, "cur_pack"))

  val curatedShardManifestSql: String =
    s"""WITH RECURSIVE $curationRetainedCteSql,
       |pk AS (
       |  SELECT doc_id, n_tokens,
       |    ('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 15))::BIGINT
       |      % ${PipelineOps.PackShards} AS shard
       |  FROM ret),
       |pk3 AS (
       |  SELECT doc_id, n_tokens, shard,
       |    CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens)
       |      // ${PipelineOps.PackBudget} AS BIGINT) AS bin
       |  FROM pk)
       |SELECT shard, bin,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_md5
       |FROM pk3
       |GROUP BY shard, bin
       |ORDER BY shard, bin""".stripMargin
}
