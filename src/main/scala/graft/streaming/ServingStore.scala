package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed, idempotent serving store over parquet (SURVEY.md §2.1 S7/S8,
  * §2.8 "Delivery"; reference `insert_data_to_HBase.py:6-46` — rowkey =
  * BlockId, put = overwrite).
  *
  * The reference gets effective exactly-once by accident: at-least-once
  * Kafka delivery + HBase put keyed on BlockId. This store makes the
  * same contract explicit for a `foreachBatch` sink:
  *
  *  - **Upsert** = anti-join the current snapshot against the batch's
  *    keys, union the batch (last write wins per key).
  *  - **Versioned snapshots + atomic pointer**: each upsert writes a
  *    fresh `v=N` directory, then atomically moves a `_CURRENT` pointer
  *    file (version + high-water batch id). Readers never observe a
  *    half-written snapshot; a crash mid-write leaves the pointer on
  *    the old version.
  *  - **Replay protection**: `foreachBatch` may re-deliver a batch
  *    after recovery; upserts with `batchId <=` the recorded high-water
  *    mark are skipped, making the sink idempotent (ST2).
  *
  * Scale note: full-snapshot rewrite is correct but O(store) per batch;
  * at 100 TB the same pointer-swap protocol applies per key-range
  * partition (only partitions containing batch keys are rewritten),
  * which is exactly the compaction model of Delta/Hudi-style keyed
  * tables. The query surface (`read`) is unchanged by that swap.
  */
object ServingStore {

  private def pointerPath(store: String): Path = Paths.get(store, "_CURRENT")

  /** Target snapshot file size (guide §6: aim for output files in the
    * 128 MB–1 GB range). Conf-overridable so a cluster deployment can
    * size for its object store; the LOCAL effect is the r19 verdict-#3
    * fix: a 2 k-row micro-batch snapshot no longer inherits the
    * session's 32-way shuffle parallelism (32 near-empty parquet
    * files + 32 write tasks per batch, then 32 file opens on the next
    * batch's anti-join — ~20 task-seconds of pure fixed cost per q99
    * rep), it writes the one file its bytes call for. */
  val TargetFileBytesConf = "spark.graft.serving.targetFileBytes"
  private val DefaultTargetFileBytes = 128L * 1024 * 1024

  private def snapshotBytes(store: String, ver: Long): Long =
    Option(new java.io.File(s"$store/v=$ver").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_"))
      .map(_.length).sum

  /** Scale-adaptive file count for the NEXT snapshot, or None to keep
    * the frame's natural partitioning. With a committed previous
    * snapshot, its on-disk bytes (read from the filesystem — no extra
    * Spark job) are the honest size estimate for the merge: catalyst
    * stats over the anti-join + union OVERSHOOT wildly (join
    * estimates multiply) and in the first cut of this sizing pushed
    * every micro-batch write back to 32 near-empty tasks — each
    * paying ~150 ms of parquet-writer setup (measured on q99, the
    * exact cost this function exists to remove). For the FIRST
    * snapshot the plan estimate is all there is: it is used when
    * known, and an unknown estimate (catalyst's Long.MaxValue-ish
    * default) keeps the frame's own partitioning — a bulk first load
    * must not collapse to one partition. Capped at the session's
    * default parallelism either way; a store below one target file
    * writes exactly one file, a 100 TB store keeps full write
    * parallelism. */
  private def writeFiles(frame: DataFrame, store: String,
      curVer: Long): Option[Int] = {
    val spark = frame.sparkSession
    val target = spark.conf.getOption(TargetFileBytesConf)
      .map(_.toLong).getOrElse(DefaultTargetFileBytes).max(1L)
    val cap = BigInt(spark.sparkContext.defaultParallelism)
    val est: BigInt =
      if (curVer > 0) BigInt(snapshotBytes(store, curVer))
      else {
        val s = frame.queryExecution.optimizedPlan.stats.sizeInBytes
        if (s >= BigInt(Long.MaxValue) / 4) return None // unknown size
        s
      }
    Some(((est + target - 1) / target).max(1).min(cap).toInt)
  }

  private def sized(frame: DataFrame, store: String, curVer: Long): DataFrame =
    writeFiles(frame, store, curVer) match {
      case Some(n) => frame.coalesce(n)
      case None => frame
    }

  /** (current version, highest applied batch id); (0, -1) = empty. */
  def pointer(store: String): (Long, Long) = {
    val p = pointerPath(store)
    if (!Files.exists(p)) (0L, -1L)
    else {
      val Array(v, b) = Files.readString(p).trim.split(",")
      (v.toLong, b.toLong)
    }
  }

  /** Current snapshot as a DataFrame (empty-schema error if never
    * written — callers create the store via `upsert` first). */
  def read(spark: SparkSession, store: String): DataFrame = {
    val (v, _) = pointer(store)
    require(v > 0, s"serving store $store has no committed snapshot")
    spark.read.parquet(s"$store/v=$v")
  }

  /** Apply one micro-batch as a keyed upsert. Returns false (no-op) when
    * `batchId` was already applied — the foreachBatch replay path. */
  def upsert(batch: DataFrame, store: String, keyCol: String, batchId: Long): Boolean = {
    Files.createDirectories(Paths.get(store))
    val (curVer, lastBatch) = pointer(store)
    if (batchId <= lastBatch) return false
    val spark = batch.sparkSession
    val merged =
      if (curVer == 0) batch
      else read(spark, store)
        .join(batch.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        .unionByName(batch)
    val newVer = curVer + 1
    sized(merged, store, curVer)
      .write.mode("overwrite").parquet(s"$store/v=$newVer")
    commit(store, curVer, newVer, batchId)
    true
  }

  /** Atomic pointer swap (write-temp + ATOMIC_MOVE — readers see either
    * the old or the new version, never a torn pointer), then reap
    * snapshots older than the one just superseded (kept for in-flight
    * readers). */
  private def commit(store: String, curVer: Long, newVer: Long, batchId: Long): Unit = {
    val tmp = Paths.get(store, s"_CURRENT.tmp.$newVer")
    Files.writeString(tmp, s"$newVer,$batchId")
    Files.move(tmp, pointerPath(store), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    (1L until curVer).foreach { old =>
      val dir = Paths.get(store, s"v=$old")
      if (Files.exists(dir)) Try {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
  }

  /** Compact the current snapshot to `targetFiles` parquet files —
    * the small-files maintenance pass every streaming-upsert table
    * needs: each micro-batch snapshot inherits the session's shuffle
    * parallelism, so a low-rate stream accumulates far more files
    * than bytes, and scan planning cost grows with file count, not
    * data. Runs under the same snapshot-swap protocol as upsert (a
    * new version + atomic pointer move, concurrent readers never see
    * a half-compacted store) and preserves the batch-id high-water
    * mark, so replay protection is unaffected. At 100 TB the same
    * pass runs per key-range partition and sizes `targetFiles` from
    * partition bytes / target file size. */
  def compact(spark: SparkSession, store: String, targetFiles: Int = 1): Boolean = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val (curVer, lastBatch) = pointer(store)
    if (curVer == 0) return false
    val newVer = curVer + 1
    read(spark, store).coalesce(targetFiles)
      .write.mode("overwrite").parquet(s"$store/v=$newVer")
    commit(store, curVer, newVer, lastBatch)
    true
  }

  /** Point/key delete (SURVEY Q7): rewrite minus the key set, same
    * snapshot-swap protocol. `batchId` guards replays like upsert. */
  def delete(spark: SparkSession, store: String, keyCol: String,
      keys: Seq[String], batchId: Long): Boolean = {
    val (curVer, lastBatch) = pointer(store)
    if (batchId <= lastBatch || curVer == 0) return false
    val remaining = sized(
      read(spark, store).filter(!col(keyCol).isin(keys: _*)), store, curVer)
    val newVer = curVer + 1
    remaining.write.mode("overwrite").parquet(s"$store/v=$newVer")
    commit(store, curVer, newVer, batchId)
    true
  }
}
