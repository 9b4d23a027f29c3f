package graft.sources

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write paths (SURVEY.md §2.1 S4/S9, §2.7 F19).
  *
  * The reference has exactly three: a coalesce(1) header CSV to HDFS
  * (`prepare_data_batch.ipynb:913-930`), a pandas `to_sql(replace)`
  * into Postgres (`load_data_to_sql.py:6-17`), and the HBase put that
  * `graft.streaming.ServingStore` covers. Every HBase value is
  * stringified on write (`insert_data_to_HBase.py:30-40`) — F19 keeps
  * that cast-to-string at the sink boundary only; types stay real
  * everywhere upstream.
  */
object Sinks {

  /** F19: every column cast to string — the reference's export
    * convention at its sink boundaries. Array/struct columns render as
    * their SQL string form. */
  def stringified(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)

  /** S4: single-file header CSV, overwrite — byte-compatible with the
    * reference's export. `coalesce(1)` serializes the final write
    * stage by design (one output file); callers wanting scan-parallel
    * output use `writeParquet`. */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    stringified(df)
      .coalesce(1)
      .write.mode("overwrite")
      .option("header", "true")
      .csv(path)

  /** S9: JDBC overwrite — the reference's `to_sql(if_exists='replace')`
    * shape. The driver jar for `url` must be on the classpath at
    * runtime. This container bundles Derby (embedded, in
    * `/opt/spark/jars`), which the integration gate uses for a live
    * in-process round-trip; external databases (the reference targets
    * Postgres) need their driver jar dropped in. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** True when a JDBC driver able to accept `url` is registered or
    * present on the classpath. Gates the live-database integration
    * spec the same way `KafkaIO.connectorAvailable` gates the broker
    * spec: drop a driver jar in the jars dir + set the env URL, and
    * the round-trip test enables itself. */
  def jdbcDriverAvailable(url: String): Boolean =
    try { java.sql.DriverManager.getDriver(url); true }
    catch { case _: java.sql.SQLException => false }

  /** The default at-rest form for engine outputs: partitioned parquet
    * (columnar, prunable — SURVEY §1.3), scan-parallel on write. */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC interchange — the other columnar at-rest format Spark ships
    * a native vectorized reader for; same pushdown/pruning posture as
    * parquet (SourceFormatsSpec proves round-trip identity and
    * predicate pushdown). For Hive-ecosystem consumers that expect
    * ORC, this is the drop-in counterpart of `writeParquet`. */
  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** JSON-lines interchange — the lingua franca of ingestion hand-offs
    * (one JSON object per line, scan-parallel, splittable when
    * uncompressed). Schema-on-read: pair with an explicit schema at
    * the consumer (`spark.read.schema(...).json`) — schema inference
    * costs an extra full scan at 100 TB and is disabled-by-contract
    * in SourceFormatsSpec's read-back. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  // Bucketed+sorted table writes live in `graft.operators.Bucketing`
  // (single-file-per-bucket contract + co-located join; OperatorsSpec
  // pins zero-Exchange, zero-Sort, and the shuffling negative control).

  /** Retire the PREVIOUS export's commit mark before a rewrite: the
    * manifest-last crash guarantee only holds if no stale manifest
    * can pair with a half-rewritten shard tree. On a fresh output
    * directory this is a no-op; on re-export it deletes `manifest/`
    * FIRST, so every interruption window leaves either (old manifest
    * + old tree), (no manifest + any tree) or (new manifest + new
    * tree) — never a complete-looking manifest beside files it does
    * not describe (ADVICE r17). */
  private def retireManifest(outDir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    val m = new java.io.File(outDir, "manifest")
    if (m.exists()) rm(m)
  }

  /** Write the q65/q182 training shards as a partitioned parquet tree
    * (`shards/shard=S/bin=B/…`) with the q182 manifest beside it
    * (`manifest/`) — the physical delivery a trainer consumes. The
    * manifest is written LAST and any previous manifest is deleted
    * FIRST ([[retireManifest]]): its presence is the commit mark, so
    * an interrupted export — fresh or re-export — never leaves a
    * manifest beside a tree it does not describe. Layout is the
    * pack assignment verbatim (one rule text), so the oracle-certified
    * manifest describes these files exactly; ShardExportSpec pins the
    * round trip (partition membership, counts, token sums, digests)
    * and re-export determinism. Scale: one corpus scan + the pack's
    * per-shard window exchange; partitioned write, no coalesce. */
  def writeTrainingShards(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, outDir: String): Unit = {
    retireManifest(outDir)
    val pack = graft.queries.PipelineOps.packSequences(s, corpusDir)
    val docs = graft.core.Tables.documents(s, corpusDir)
    pack.join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("start_offset"), col("n_tokens"),
        col("source"), col("text"), col("shard"), col("bin"))
      .write.mode("overwrite").partitionBy("shard", "bin")
      .parquet(s"$outDir/shards")
    graft.queries.PipelineOps.manifestOf(pack)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
  }

  /** [[writeTrainingShards]] over the CURATION RUN's retained set —
    * the tree ships exactly the documents that survived the quality
    * gate, decontamination and all three dedup grains (the stored
    * `cur_pack` stage; q185 certifies its manifest against a full
    * from-raw re-derivation of retention + layout). */
  def writeCuratedShards(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, outDir: String): Unit = {
    retireManifest(outDir)
    val pack = graft.queries.CurationPipeline.stored(s, corpusDir, "cur_pack")
    val docs = graft.core.Tables.documents(s, corpusDir)
    pack.select(col("doc_id"), col("start_offset"), col("n_tokens"),
        col("shard"), col("bin"))
      .join(docs.select(col("doc_id"), col("source"), col("text")),
        Seq("doc_id"))
      .select(col("doc_id"), col("start_offset"), col("n_tokens"),
        col("source"), col("text"), col("shard"), col("bin"))
      .write.mode("overwrite").partitionBy("shard", "bin")
      .parquet(s"$outDir/shards")
    graft.queries.PipelineOps.manifestOf(pack)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
  }
}
