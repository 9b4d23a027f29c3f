package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The MATERIALIZED dedup/ANN index warehouse (round-13 verdict #1).
  *
  * Rounds 1–12 built every index artifact — MinHash signatures, LSH
  * band tables, duplicate clusters, purge lists, IVF cell assignments
  * — inside each consuming query, so the engine's central 100 TB claim
  * ("the increment is O(new batch); audits read the index, not the
  * corpus") was argued in Scaladoc but never executed. This object
  * makes it executable: `build` persists the whole index family as
  * versioned parquet tables, and the incremental/audit queries
  * (q113/q120/q122/q123/q126/q133) READ the stored tables —
  * `PlanShapeSpec` pins that their plans scan warehouse parquet, not
  * `documents.parquet`.
  *
  * Protocol — the `ServingStore` snapshot-pointer discipline lifted to
  * a MULTI-TABLE snapshot:
  *  - each build writes a fresh `v=N/<table>/` directory per table,
  *    then atomically moves ONE `_CURRENT` pointer for the whole
  *    warehouse. Cross-table consistency is the point: a reader can
  *    never observe bands from build N next to clusters from build
  *    N−1 (exactly the torn-index bug a per-table pointer invites);
  *  - a crash mid-build leaves the pointer on the old version — the
  *    half-written v=N+1 is garbage-collected by the next successful
  *    commit;
  *  - builds are INCREMENTAL-DATAFLOW: each stage reads the previous
  *    stage's just-written table (token_hashes → signatures → bands →
  *    clusters → purge), so the persisted chain is the proven lineage,
  *    not N independent recomputes that merely happen to agree.
  *
  * Stored tables (all derived by the SAME `private[queries]` builders
  * the registry's index-build queries q24–q28/q49/q92/q100–q109 run,
  * so definitions cannot drift):
  *  - `doc_stats`      doc_id, source, n_tokens, quality_score
  *  - `token_hashes`   doc_id, hs (distinct token-hash set)
  *  - `signatures`     doc_id, sig_0..sig_7 (q27)
  *  - `bands`          doc_id, band, band_hash (q28's index)
  *  - `clusters`       doc_id, cluster_id (q49)
  *  - `purge`          doc_id, cluster_id, kept_doc (q92)
  *  - `chunk_digests`  doc_id, chunk_md5 (q100's digest set)
  *  - `chunk_heavy`    chunk_md5 (global df > MaxChunkDf deny list —
  *                     the only global state the chunk grain's
  *                     incremental recluster needs)
  *  - `chunk_clusters` doc_id, cluster_id (q105)
  *  - `chunk_purge`    doc_id, cluster_id, kept_doc (q108)
  *  - `centroids`      c_id, v (the literal centroids of the build)
  *  - `cells`          vec_id, cell, norm, v (the IVF-style index —
  *                     vectors bucketed by cell, norms precomputed)
  *  - `sem_purge`      vec_id, cell, n_covering, kept_by, max_cos (q109)
  *
  * Scale: at 100 TB the warehouse is the SMALL data — signatures are
  * 8 longs/doc, bands 2 rows of (16-byte hash)/doc, clusters/purge
  * O(duplicated docs) ≪ corpus; `cells` is the one corpus-sized table
  * and is exactly what an IVF index materializes anyway. Every stage
  * write is one pass of the already-shuffle-shaped builder; the
  * pointer swap is O(1).
  *
  * Fixture plumbing: registry queries can't thread a warehouse path
  * through the driver's `(spark, sfDir)` contract, so `stored` lazily
  * builds ONE warehouse per corpus dir into an OS-reaped temp
  * directory and memoizes it for the JVM's lifetime (the q99 eager-
  * builder discipline: first construction pays the build, every later
  * consumer reads parquet — exactly the production cost model where
  * the index build is a standing daily job and increments/audits read
  * its output).
  */
object Warehouse {

  val TableNames: Seq[String] = Seq(
    "doc_stats", "token_hashes", "signatures", "bands", "clusters", "purge",
    "chunk_digests", "chunk_heavy", "chunk_clusters", "chunk_purge",
    "centroids", "cells", "cells_q8", "pq_books", "cells_pq", "sem_purge",
    "media_digests")

  private def pointerPath(whDir: String): Path = Paths.get(whDir, "_CURRENT")

  /** Pointer fields: `version`, `version,streamBatchId` or
    * `version,streamBatchId,streamId` — the second field is the
    * exactly-once high-water mark a streaming maintainer's
    * [[mergeBatch]] records (the `ServingStore.upsert` pointer
    * discipline lifted to the warehouse); the third (ADVICE r14) is
    * the IDENTITY of the stream that recorded it (the Structured
    * Streaming query id, stable across restarts of one checkpoint,
    * fresh when a checkpoint is recreated). One atomic file carries
    * all three, so the mark can never refer to a version — or a
    * stream — other than the one it was committed with. */
  private def pointerFields(whDir: String): Array[String] = {
    val p = pointerPath(whDir)
    if (!Files.exists(p)) Array("0") else Files.readString(p).trim.split(",")
  }

  /** Current committed version; 0 = never built. */
  def version(whDir: String): Long = pointerFields(whDir)(0).toLong

  /** High-water stream batch id of the current snapshot; -1 = no
    * streaming merge recorded. A foreachBatch re-delivery with
    * `batchId <=` this mark must be (and is — see [[mergeBatch]]) a
    * no-op: Structured Streaming batch ids are monotone per
    * checkpoint, so the guard gives the sink exactly-once warehouse
    * maintenance over at-least-once batch delivery. */
  def lastMergedBatch(whDir: String): Long = {
    val f = pointerFields(whDir)
    if (f.length > 1) f(1).toLong else -1L
  }

  /** Identity of the stream that recorded the high-water mark; None
    * for a never-streamed store or a mark recorded by an unidentified
    * (pre-r15 / direct-sink) caller. */
  def streamIdOf(whDir: String): Option[String] = {
    val f = pointerFields(whDir)
    if (f.length > 2 && f(2).nonEmpty) Some(f(2)) else None
  }

  /** The ONE replay rule (ADVICE r14), shared by [[mergeBatch]] and
    * `RetrievalIndex.mergeBatchOf`: `batchId <= mark` is a certified
    * replay ONLY when the delivering stream is the one that recorded
    * the mark. Batch ids are monotone PER CHECKPOINT — a recreated
    * checkpoint restarts them at 0, so treating a foreign stream's
    * low batch id as a replay would silently DROP new data (and
    * merging it could double-apply what the recorded stream already
    * merged). When both identities are known and differ, nothing is
    * safe: refuse loudly and make the operator decide (rebuild, or
    * resume the original checkpoint). When either side is
    * unidentified, the mark alone decides ONLY in the direction that
    * cannot lose data: an identified delivery to an unidentified mark
    * (a pre-identity store adopted by a new maintainer — the commit
    * records the identity going forward). The converse — an
    * UNIDENTIFIED delivery to an identity-marked store — refuses
    * loudly (ADVICE r15): `run`/`runRetrieval` always attach the
    * checkpoint's query id, so a None delivery against an identified
    * mark is a recreated checkpoint whose metadata file is gone (its
    * restarted-at-0 batch ids would silently drop as replays — the
    * r14 data-loss hole on its last open path) or a direct sink call
    * mixed into a stream-maintained store (a second-maintainer
    * misuse). Fully-unidentified stores (certificates, direct sink
    * pipelines) keep the documented one-stream-per-store invariant
    * and the pre-r15 mark-decides behavior.
    * Returns true = skip this delivery (already merged). */
  private[queries] def isReplay(whDir: String, streamBatchId: Option[Long],
      streamId: Option[String]): Boolean =
    streamBatchId match {
      case None => false
      case Some(b) =>
        val mark = lastMergedBatch(whDir)
        if (mark < 0) false
        else {
          val recorded = streamIdOf(whDir)
          if (recorded.nonEmpty && streamId.nonEmpty && recorded != streamId)
            throw new IllegalStateException(
              s"stream ${streamId.get} delivered batch $b to $whDir, but " +
                s"its high-water mark $mark was recorded by stream " +
                s"${recorded.get} — a recreated checkpoint or second " +
                "maintainer; refusing (replay status is undecidable: " +
                "skipping could drop data, merging could double-apply)")
          if (recorded.nonEmpty && streamId.isEmpty)
            throw new IllegalStateException(
              s"an UNIDENTIFIED delivery of batch $b reached $whDir, but " +
                s"its high-water mark $mark was recorded by stream " +
                s"${recorded.get} — a recreated checkpoint with missing " +
                "metadata, or a direct sink call against a stream-" +
                "maintained store; refusing (treating it as a replay " +
                "could silently drop new data, merging could double-apply)")
          b <= mark
        }
    }

  /** Analyzed-frame cache keyed by the RESOLVED snapshot path
    * (store, version, table) + session + the table directory's
    * MTIME. `s.read.parquet` builds a fresh InMemoryFileIndex (a
    * listing + footer read) and re-derives the relation per call —
    * ~tens of ms that an interactive serve pays 2–3× per request
    * (r18). A snapshot directory is IMMUTABLE once committed (the
    * whole point of the versioned protocol), so the frame for a
    * (version, table) can never go stale through the protocol: a
    * commit changes the resolved path, which is in the key. The
    * mtime component covers the one case outside the protocol
    * (ADVICE r18): a warehouse directory dropped and REBUILT at the
    * same path within one session — the rebuilt table dir carries a
    * new mtime, so the stale cached file index is never served. LRU
    * bound ([[FrameCacheMax]], access-ordered) keeps a long-running
    * maintainer that commits many versions from growing without
    * bound — dead slots for reaped versions age out.
    * Known edges (ADVICE r19, accepted): directory mtime is
    * MILLISECOND-grained, so a drop-and-rebuild at the same path
    * whose rebuild lands in the same millisecond as the original
    * would still serve the stale index (a full parquet write +
    * pointer commit inside 1 ms does not occur in practice); and a
    * path where `getLastModifiedTime` throws (a non-local URI)
    * degrades to mtime = -1 — rebuild detection lost for that path —
    * now logged once per path so the degradation is visible. */
  private val FrameCacheMax = 256
  private val mtimeFallbackLogged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val frameCache =
    new java.util.LinkedHashMap[(SparkSession, String, Long), DataFrame](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, Long), DataFrame])
        : Boolean = size() > FrameCacheMax
    }

  private def cachedParquet(s: SparkSession, path: String): DataFrame = {
    val mtime =
      try java.nio.file.Files
        .getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
      catch { case scala.util.control.NonFatal(_) =>
        if (mtimeFallbackLogged.add(path))
          System.err.println(s"[warehouse] frame-cache mtime unreadable for " +
            s"$path — rebuild-at-same-path detection degraded to path-only")
        -1L
      }
    val key = (s, path, mtime)
    val hit = frameCache.synchronized(Option(frameCache.get(key)))
    hit.getOrElse {
      // Build OUTSIDE the lock: a cold read is tens of ms and the
      // concurrent hybrid legs resolve their stores in parallel — a
      // racing double-build is harmless (last put wins).
      val df = s.read.parquet(path)
      frameCache.synchronized {
        Option(frameCache.get(key)).getOrElse { frameCache.put(key, df); df }
      }
    }
  }

  /** Read one table of the CURRENT committed snapshot. */
  def read(s: SparkSession, whDir: String, table: String): DataFrame = {
    val v = version(whDir)
    require(v > 0, s"warehouse $whDir has no committed snapshot")
    cachedParquet(s, s"$whDir/v=$v/$table")
  }

  /** The snapshot versions still on disk, ascending. The commit
    * protocol retains the last [[retention]] (default two: current +
    * superseded-before-last, kept for in-flight readers until the
    * next commit), so this is {v-1, v} in steady state — the
    * time-travel window, widenable per store via [[setRetention]]. */
  def versions(whDir: String): Seq[Long] =
    Option(new java.io.File(whDir).listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ <= version(whDir)) // a writer's in-flight v=next is not readable
      .sorted.toSeq

  /** TIME-TRAVEL read: one table at an explicit retained version —
    * "what did the index say before today's merge" for audit diffs
    * and blue/green readers. Refuses versions outside the retained
    * window rather than returning a half-reaped directory. */
  def readAt(s: SparkSession, whDir: String, table: String,
      ver: Long): DataFrame = {
    require(versions(whDir).contains(ver),
      s"version $ver not retained in $whDir (have ${versions(whDir)})")
    cachedParquet(s, s"$whDir/v=$ver/$table")
  }

  /** The per-doc stats row (doc_id, source, n_tokens, quality_score)
    * of a docs frame — shared by the full chain and the merge path's
    * batch side (quality is a pure per-doc function, so a slice
    * scores identically to its rows inside the full corpus). */
  private def docStatsOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    .join(TextOps.qualityScoreOf(docs)
      .select(col("doc_id"), col("quality_score")), Seq("doc_id"))

  /** The DOC-GRAIN chain (doc_stats → token_hashes → signatures →
    * bands → clusters → purge) written under `base`, each stage
    * reading the previous stage's just-written table, each wrapped in
    * `measure(stageName, work)` so the corpus-scale bench (r13
    * verdict #3) attributes wall / steal / GC / shuffle bytes PER
    * STAGE. The full [[build]] passes a pass-through hook. */
  private def writeDocChain(s: SparkSession, docs: DataFrame, base: String,
      measure: (String, () => Unit) => Unit): Unit = {
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$base/$name")
    def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")
    measure("doc_stats", () => write("doc_stats", docStatsOf(docs)))
    measure("token_hashes", () =>
      write("token_hashes", Dedup.tokenHashSetOf(docs)))
    measure("signatures", () =>
      write("signatures", Dedup.sigsFromHs(readBack("token_hashes"))))
    measure("bands", () =>
      write("bands", Dedup.bandFrameOfSigs(readBack("signatures"))))
    measure("clusters", () =>
      write("clusters", graft.operators.ConnectedComponents
        .run(Dedup.candidateEdgesFrom(readBack("bands")))
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))))
    measure("purge", () =>
      write("purge", Dedup.purgeFromWith(readBack("clusters"),
        readBack("doc_stats").select(col("doc_id"), col("quality_score")))))
  }

  /** Build and commit ONLY the doc-grain chain — the corpus-scale
    * bench's instrument (a documents-only fixture has no embeddings
    * for the semantic tables). Returns the new version. */
  def buildDocChain(s: SparkSession, corpusDir: String, whDir: String,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Long =
    buildDocChainOf(s, Tables.documents(s, corpusDir), whDir, measure)

  /** [[buildDocChain]] over an explicit docs frame — the merge
    * certification builds its standing index from the corpus MINUS the
    * incoming batch through this seam. */
  def buildDocChainOf(s: SparkSession, docs: DataFrame, whDir: String,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Long = {
    Files.createDirectories(Paths.get(whDir))
    val cur = version(whDir)
    val next = cur + 1
    writeDocChain(s, docs, freshVersionDir(whDir, next), measure)
    commit(whDir, cur, next)
    next
  }

  /** Hard-link every data file of v=cur's `tableName` into v=next and
    * append ONLY the batch's rows as new files — the real O(batch)
    * leaf append (r13 verdict #3: the old union-rewrite read and
    * rewrote every leaf table per merge, O(index) I/O per daily
    * batch). The snapshot protocol is unchanged — the new version
    * re-REFERENCES the standing files (link count, not copies), so
    * reaping an old version never destroys data a newer snapshot
    * links, and a crashed merge leaves v=cur untouched. Batch rows
    * are aligned to the stored column order, so every file in the
    * merged directory carries one schema layout. On a filesystem
    * without hard links the fallback is a copy (same contract, the
    * at-scale object-store form is a manifest re-reference). */
  private def appendTable(s: SparkSession, whDir: String, cur: Long,
      next: Long, tableName: String, batchRows: DataFrame): Unit = {
    val src = Paths.get(whDir, s"v=$cur", tableName)
    val dst = Paths.get(whDir, s"v=$next", tableName)
    Files.createDirectories(dst)
    scala.util.Using.resource(Files.list(src)) { st =>
      st.forEach { f =>
        val name = f.getFileName.toString
        if (!name.startsWith("_") && !name.startsWith(".")) {
          try Files.createLink(dst.resolve(name), f)
          catch { case _: Exception =>
            Files.copy(f, dst.resolve(name), StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
    }
    val cols = s.read.parquet(src.toString).columns.toSeq
    batchRows.select(cols.map(col): _*).write.mode("append").parquet(dst.toString)
  }

  /** Hard-link an entire unchanged table forward into v=next (the
    * carry-forward for tables a merge does not modify — centroids;
    * ADVICE r13: a merge that silently DROPPED unmaintained tables
    * would commit a snapshot missing them and the reaper would then
    * delete the last version that had them). */
  private def linkTableForward(whDir: String, cur: Long, next: Long,
      tableName: String): Unit = {
    val src = Paths.get(whDir, s"v=$cur", tableName)
    val dst = Paths.get(whDir, s"v=$next", tableName)
    Files.createDirectories(dst)
    scala.util.Using.resource(Files.list(src)) { st =>
      st.forEach { f =>
        val name = f.getFileName.toString
        if (!name.startsWith(".")) {
          try Files.createLink(dst.resolve(name), f)
          catch { case _: Exception =>
            Files.copy(f, dst.resolve(name), StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
    }
  }

  /** INCREMENTAL index maintenance — the daily-job write path q113's
    * read path presumes: merge a new batch of documents (and, for a
    * full 15-table warehouse, their embeddings) into the standing
    * index WITHOUT recomputing the standing corpus. Three cost
    * classes, each the cheapest executable form (r13 verdict #2/#3/#4):
    *
    *  - LEAF tables (doc_stats, token_hashes, signatures, bands,
    *    chunk_digests, cells) are per-doc/per-vector deterministic, so
    *    the merge is a REAL append: standing files hard-linked into
    *    the new version, only the batch's O(batch) rows written
    *    ([[appendTable]] — I/O is O(batch), never O(index)). Batch
    *    cell assignments use the STORED centroids, which carry forward
    *    untouched, so an increment assigns exactly the cells the
    *    standing build used.
    *  - DOC-GRAIN derived tables (clusters, purge) re-derive ONLY the
    *    components the batch's band buckets touch: batch band hashes →
    *    touched buckets → touched stored docs → their old clusters →
    *    all members of those clusters; connected components run over
    *    that subgraph's stored band rows UNION the batch's, and the
    *    result splices into the stored tables (untouched clusters pass
    *    through an anti-join verbatim). The subgraph is CLOSED under
    *    co-bucketing — any doc sharing a bucket with a cluster member
    *    was already in that cluster (the full build's CC put it
    *    there) — so the restricted CC computes exactly the merged
    *    components the full rebuild would, min-ids included. Work is
    *    O(batch + touched-cluster members), bounded by q130's bucket
    *    histogram, never O(bands).
    *  - CHUNK/SEMANTIC derived tables (chunk_clusters, chunk_purge,
    *    sem_purge) splice too: the chunk grain re-clusters only the
    *    components whose digests the batch shares (with the df gate
    *    read from the GLOBAL merged digest table, so cap-crossing
    *    digests drop edges — and split components — exactly as a full
    *    rebuild would), and sem_purge recomputes only the CELLS the
    *    batch's vectors land in (the purge rule never crosses cells).
    *    Nothing re-reads the standing corpus's text or embeddings.
    *
    * Commits as one new atomic version: readers see the pre-merge or
    * post-merge index, never a half-merged one. A full warehouse
    * REQUIRES `batchEmb` — refusing loudly beats committing a snapshot
    * whose semantic tables silently miss the batch (ADVICE r13).
    *
    * Equivalence CONTRACT (q138 doc-grain, q139 all-grain):
    * build(standing) then mergeBatch(batch) ≡ build(standing ∪ batch),
    * table for table. */
  def mergeBatch(s: SparkSession, whDir: String, batch: DataFrame,
      batchEmb: Option[DataFrame] = None,
      measure: (String, () => Unit) => Unit = (_, f) => f(),
      streamBatchId: Option[Long] = None,
      streamId: Option[String] = None): Long = {
    val cur = version(whDir)
    require(cur > 0, s"mergeBatch needs a standing index in $whDir")
    // Exactly-once over at-least-once delivery: a foreachBatch
    // re-delivery at or below the snapshot's recorded high-water mark
    // FROM THE RECORDING STREAM is a committed-already batch — return
    // the standing version untouched (the `ServingStore.upsert` replay
    // guard); a foreign stream's delivery refuses loudly ([[isReplay]]).
    if (isReplay(whDir, streamBatchId, streamId)) return cur
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    val chunkGrain = present.contains("chunk_digests")
    val semGrain = present.contains("cells")
    require(DocChainTables.forall(present.contains),
      s"mergeBatch needs the doc-grain tables; snapshot has $present")
    require(!semGrain || batchEmb.nonEmpty,
      "mergeBatch on a warehouse with semantic tables requires the " +
        "batch's embeddings — refusing to commit a snapshot whose " +
        "cells/sem_purge silently miss the batch")
    val next = cur + 1
    val base = freshVersionDir(whDir, next)
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$base/$name")
    def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")

    // -- leaves: link standing files, append O(batch) rows ------------
    val batchHs = Dedup.tokenHashSetOf(batch).localCheckpoint(false)
    val batchBands = Dedup.bandFrameOfSigs(Dedup.sigsFromHs(batchHs))
      .localCheckpoint(false)
    measure("leaf_append", () => {
      appendTable(s, whDir, cur, next, "doc_stats", docStatsOf(batch))
      appendTable(s, whDir, cur, next, "token_hashes", batchHs)
      appendTable(s, whDir, cur, next, "signatures", Dedup.sigsFromHs(batchHs))
      appendTable(s, whDir, cur, next, "bands", batchBands)
      // Media digests are per-doc deterministic — a pure leaf append,
      // nothing derived to recluster (the q153 candidate join derives
      // its buckets per query from the digests).
      if (present.contains("media_digests"))
        appendTable(s, whDir, cur, next, "media_digests",
          TextOps.mediaDigestsOf(batch))
    })

    // -- doc grain: incremental clustering over touched components ----
    measure("recluster", () => {
      val touchedBuckets = batchBands.select("band", "band_hash").distinct()
      val storedBands = read(s, whDir, "bands")
      val oldClusters = read(s, whDir, "clusters")
      val directDocs = storedBands
        .join(broadcast(touchedBuckets), Seq("band", "band_hash"), "left_semi")
        .select("doc_id").distinct()
      val touchedClusterIds = oldClusters
        .join(broadcast(directDocs), Seq("doc_id"), "left_semi")
        .select("cluster_id").distinct()
      val members = oldClusters
        .join(broadcast(touchedClusterIds), Seq("cluster_id"), "left_semi")
        .select("doc_id")
        .union(directDocs).distinct()
      val subBands = storedBands
        .join(broadcast(members), Seq("doc_id"), "left_semi")
        .unionByName(batchBands)
      val newComp = graft.operators.ConnectedComponents
        .run(Dedup.candidateEdgesFrom(subBands))
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
      // The anti-join hoists its key first; re-select the stored
      // column order so every snapshot carries one schema layout.
      write("clusters", oldClusters
        .join(broadcast(touchedClusterIds), Seq("cluster_id"), "left_anti")
        .unionByName(newComp)
        .select(col("doc_id"), col("cluster_id")))
      val subQuality = readBack("doc_stats")
        .select(col("doc_id"), col("quality_score"))
        .join(broadcast(newComp.select("doc_id")), Seq("doc_id"), "left_semi")
      write("purge", read(s, whDir, "purge")
        .join(broadcast(touchedClusterIds), Seq("cluster_id"), "left_anti")
        .unionByName(Dedup.purgeFromWith(newComp, subQuality))
        .select(col("doc_id"), col("cluster_id"), col("kept_doc")))
    })

    // -- chunk grain: append digests, recluster touched components ----
    // Same splice pattern as the doc grain, with TWO chunk-specific
    // twists the full rebuild's semantics force: (a) the touched set
    // must include every doc sharing a digest with the batch even when
    // no edge forms — the batch can push a digest's df past MaxChunkDf
    // and DROP old edges (components can split on merge); (b) the df
    // gate inside the subgraph is supplied as the stored GLOBAL
    // `chunk_heavy` deny list ([[Dedup.chunkComponentFrameWithout]]),
    // maintained O(batch) below.
    if (chunkGrain) measure("chunk_grain", () => {
      val batchDigests = Dedup.chunkDigestsOf(batch).localCheckpoint(false)
      appendTable(s, whDir, cur, next, "chunk_digests", batchDigests)
      val storedDigests = read(s, whDir, "chunk_digests")
      val oldCC = read(s, whDir, "chunk_clusters")
      val batchKeys = batchDigests.select("chunk_md5").distinct()
      val t0docs = storedDigests
        .join(broadcast(batchKeys), Seq("chunk_md5"), "left_semi")
        .select("doc_id").distinct()
      val touchedIds = oldCC
        .join(broadcast(t0docs), Seq("doc_id"), "left_semi")
        .select("cluster_id").distinct()
      val members = oldCC
        .join(broadcast(touchedIds), Seq("cluster_id"), "left_semi")
        .select("doc_id").union(t0docs).distinct()
      val memberDigests = storedDigests
        .join(broadcast(members), Seq("doc_id"), "left_semi")
        .unionByName(batchDigests)
      // Maintain the heavy-digest deny list O(batch): a digest's df
      // changes only if the batch holds it, so merged heaviness =
      // stored heavy ∪ batch-held digests whose MERGED df crossed the
      // cap (counted over just the holders of batch digests — a
      // pushed semi-join, never a full-df recount).
      val crossed = readBack("chunk_digests")
        .join(broadcast(batchKeys), Seq("chunk_md5"), "left_semi")
        .groupBy("chunk_md5").agg(count(lit(1)).as("df"))
        .filter(col("df") > Dedup.MaxChunkDf)
        .select("chunk_md5")
      write("chunk_heavy", read(s, whDir, "chunk_heavy")
        .unionByName(crossed).distinct())
      val newCC = Dedup.chunkComponentFrameWithout(memberDigests,
        readBack("chunk_heavy"))
      write("chunk_clusters", oldCC
        .join(broadcast(touchedIds), Seq("cluster_id"), "left_anti")
        .unionByName(newCC)
        .select(col("doc_id"), col("cluster_id")))
      val subQuality = readBack("doc_stats")
        .select(col("doc_id"), col("quality_score"))
        .join(broadcast(newCC.select("doc_id")), Seq("doc_id"), "left_semi")
      write("chunk_purge", read(s, whDir, "chunk_purge")
        .join(broadcast(touchedIds), Seq("cluster_id"), "left_anti")
        .unionByName(Dedup.purgeFromWith(newCC, subQuality))
        .select(col("doc_id"), col("cluster_id"), col("kept_doc")))
    })

    // -- semantic grain: stored centroids forward, append cells, ------
    // recompute sem_purge for the TOUCHED CELLS only. Cells partition
    // vectors and the purge rule never crosses cells, so splicing by
    // cell is exact: a new vector can change old vectors' covering
    // counts (or purge them — smaller-id coverage) only within its own
    // cell. At the fixture k=8 every cell is usually touched; at
    // production k ~ √n the batch touches O(batch) of them.
    if (semGrain) measure("sem_grain", () => {
      val cents = read(s, whDir, "centroids")
        .orderBy("c_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      linkTableForward(whDir, cur, next, "centroids")
      val batchCells = Similarity.cellRowsWith(batchEmb.get, cents)
        .localCheckpoint(false)
      appendTable(s, whDir, cur, next, "cells", batchCells)
      appendTable(s, whDir, cur, next, "cells_q8",
        Similarity.cellsQ8Of(batchCells))
      // PQ tier: codebooks are build artifacts (seeds; refreshPq is
      // the refit) — link forward and encode ONLY the batch against
      // them, the [[cellRowsWith]] stored-centroid discipline one
      // tier down.
      if (present.contains("pq_books")) {
        linkTableForward(whDir, cur, next, "pq_books")
        appendTable(s, whDir, cur, next, "cells_pq",
          Similarity.cellsPqOf(batchCells,
            Similarity.collectPqBooks(read(s, whDir, "pq_books"))))
      }
      val touchedCells = batchCells.select("cell").distinct()
      val recomputed = Similarity.semanticPurgeFromCells(
        readBack("cells")
          .join(broadcast(touchedCells), Seq("cell"), "left_semi"))
      val spCols = read(s, whDir, "sem_purge").columns.toSeq
      write("sem_purge", read(s, whDir, "sem_purge")
        .join(broadcast(touchedCells), Seq("cell"), "left_anti")
        .unionByName(recomputed)
        .select(spCols.map(col): _*))
    })

    linkVecTombstones(whDir, cur, next)
    commit(whDir, cur, next, streamBatchId.getOrElse(-1L), streamId)
    next
  }

  // ---- vector-grain deletes of the dense family (r15 verdict #6) ----

  /** The broadcast-safe tombstone ceiling — every dense serve
    * anti-joins the list, so it ships to every executor per request
    * (the `RetrievalIndex.DefaultMaxTombstones` contract at the
    * vector grain). */
  val MaxVecTombstones = 1000000L

  private def vecTombstoneDir(whDir: String, ver: Long): Path =
    Paths.get(whDir, s"v=$ver", "vec_tombstones")

  /** The current snapshot's tombstoned vec_ids, if any — what every
    * dense serve path (param, quantized, batch; fixture or explicit
    * store) folds into its candidate read. Absent on never-deleted
    * stores, so committed fixture plans are unchanged. */
  private[queries] def vecTombstones(s: SparkSession,
      whDir: String): Option[DataFrame] =
    if (Files.isDirectory(vecTombstoneDir(whDir, version(whDir))))
      Some(s.read.parquet(vecTombstoneDir(whDir, version(whDir)).toString))
    else None

  /** [[vecTombstones]] at an EXPLICIT retained version — the
    * time-travel serve's suppression list (absent on never-deleted
    * stores and on versions committed before any delete, so a
    * pre-delete snapshot replays WITH the later-deleted vectors — the
    * reproducibility contract). */
  private[queries] def vecTombstonesAt(s: SparkSession, whDir: String,
      ver: Long): Option[DataFrame] =
    if (Files.isDirectory(vecTombstoneDir(whDir, ver)))
      Some(s.read.parquet(vecTombstoneDir(whDir, ver).toString))
    else None

  /** Carry the vector tombstone table into a new version — every
    * writer that hard-links `cells` forward calls this (tombstoned
    * rows survive in the linked files, so the suppression list must
    * outlive merges and compactions). The SEMANTIC REFRESH is the
    * deliberate exception: it rewrites the whole semantic family, so
    * it drops dead rows physically and does NOT carry the list. */
  private def linkVecTombstones(whDir: String, cur: Long,
      next: Long): Unit =
    if (Files.isDirectory(vecTombstoneDir(whDir, cur)))
      linkTableForward(whDir, cur, next, "vec_tombstones")

  /** DELETE vectors from the dense index WITHOUT touching the cells
    * files — the `RetrievalIndex.deleteDocs` deletion-vector
    * discipline at the vector grain: cells/cells_q8 hard-link
    * forward, a broadcast-sized `vec_tombstones` table (vec_id)
    * records the suppressed rows, and every dense serve path
    * anti-joins it before scoring, so a served ranking equals one
    * over the remaining vectors exactly (q158 certifies it) at
    * O(deletes) write cost. Centroids are deliberately NOT refit —
    * they are build-time artifacts (deleting a seed vector does not
    * un-seed its centroid); [[refreshSemantic]] is the refit path,
    * and doubles as the physical purge: its semantic-family rewrite
    * drops dead rows and clears the list. `compact(purgeVecTombstones
    * = true)` is the purge without the refit. Refuses vec_ids with no
    * stored cell row (nothing honest to suppress), is idempotent on
    * already-deleted ids, and bounds the total at `maxTombstones`.
    * The doc-grain and chunk-grain tables are untouched: a vector
    * delete is an index decision, not a document purge (pair with
    * `RetrievalIndex.deleteDocs` for the full-document flow). */
  def deleteVectors(s: SparkSession, whDir: String, vecs: DataFrame,
      maxTombstones: Long = MaxVecTombstones): Long = {
    import s.implicits._
    val cur = version(whDir)
    require(cur > 0, s"deleteVectors needs a committed snapshot in $whDir")
    require(Files.isDirectory(Paths.get(whDir, s"v=$cur", "cells")),
      s"deleteVectors needs the semantic grain; $whDir has no cells table")
    val prior = vecTombstones(s, whDir)
    val ids = vecs.select("vec_id").dropDuplicates("vec_id")
    val freshIds = prior.fold(ids)(p =>
      ids.join(p.select("vec_id"), Seq("vec_id"), "left_anti")).cache()
    val fresh = read(s, whDir, "cells").select("vec_id")
      .join(broadcast(freshIds), Seq("vec_id"), "left_semi")
      .cache()
    try {
      val nFresh = fresh.count()
      val nIn = freshIds.count()
      if (nFresh != nIn) {
        val missing = freshIds.join(fresh, Seq("vec_id"), "left_anti")
          .limit(5).collect().map(_.getLong(0))
        throw new IllegalArgumentException(
          s"deleteVectors: ${nIn - nFresh} vec_id(s) have no stored cell " +
            s"row in $whDir (e.g. ${missing.mkString(", ")}); refusing")
      }
      val nPrior = prior.fold(0L)(_.count())
      require(nPrior + nFresh <= maxTombstones,
        s"deleteVectors: ${nPrior + nFresh} total tombstones would exceed " +
          s"the broadcast-safe bound $maxTombstones — run compact(" +
          "purgeVecTombstones = true) or refreshSemantic (both clear the " +
          "list physically)")
      val next = cur + 1
      freshVersionDir(whDir, next)
      val present = TableNames.filter(t =>
        Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
      present.foreach(t => linkTableForward(whDir, cur, next, t))
      prior.fold(fresh.toDF("vec_id"))(p => p.unionByName(fresh))
        .coalesce(1).write.mode("overwrite")
        .parquet(vecTombstoneDir(whDir, next).toString)
      commit(whDir, cur, next)
      next
    } finally {
      fresh.unpersist()
      freshIds.unpersist()
    }
  }

  /** DELETE media digests for the given media_ids — the PHYSICAL
    * form, deliberately unlike the postings/cells deletion vectors:
    * `media_digests` is the smallest index family (one 8-byte hash +
    * id per payload), so rewriting it minus the dead rows costs less
    * than a tombstone list's carry-forward/anti-join machinery would,
    * and every media read path (q153 purge, q161 increment probe)
    * excludes deleted rows automatically because they are GONE —
    * zero probe-path changes, plans byte-identical. All other tables
    * hard-link forward (vector tombstones included), one atomic
    * version. No tombstone memory means no idempotence ledger:
    * re-deleting an already-absent media_id is a silent no-op by
    * construction (the anti-join removes nothing), and unknown ids
    * are tolerated — a doc without media rows is the common case in
    * a mixed corpus. Returns the new version. */
  def deleteMedia(s: SparkSession, whDir: String, media: DataFrame): Long = {
    val cur = version(whDir)
    require(cur > 0, s"deleteMedia needs a committed snapshot in $whDir")
    require(Files.isDirectory(Paths.get(whDir, s"v=$cur", "media_digests")),
      s"deleteMedia needs the media grain; $whDir has no media_digests table")
    val ids = media.select("media_id").dropDuplicates("media_id")
    val next = cur + 1
    val base = freshVersionDir(whDir, next)
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    present.filterNot(_ == "media_digests")
      .foreach(t => linkTableForward(whDir, cur, next, t))
    linkVecTombstones(whDir, cur, next)
    read(s, whDir, "media_digests")
      .join(broadcast(ids), Seq("media_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$base/media_digests")
    commit(whDir, cur, next)
    next
  }

  /** The semantic-grain family [[refreshSemantic]] rewrites;
    * everything else hard-links forward through a refresh. The PQ
    * tier (`cells_pq`) is handled separately — rewritten WHEN PRESENT
    * by [[carryPqForward]], skipped on a pre-PQ store (ADVICE r17:
    * maintenance must not strand a store committed before the PQ
    * family existed; the mergeBatch presence guard, mirrored). */
  private val SemTables =
    Seq("centroids", "cells", "cells_q8", "sem_purge")

  /** Every table a semantic maintenance pass REWRITES (vs links
    * forward): the core family plus the PQ tier when present — the
    * set the q141 non-semantic-preservation check must exclude. */
  private val SemRewritten = SemTables :+ "cells_pq"

  /** Rewrite `cells_pq` for a NEW cells table by carrying the stored
    * codes FORWARD (r17 verdict #3): a PQ code is a function of the
    * vector and the BOOKS alone — cell re-assignment changes the
    * `cell` column, never the code — so semantic maintenance
    * (refresh/split/merge) joins the old codes onto the new
    * (vec_id, cell, norm) rows instead of re-running the argmax
    * encode over every vector. Re-encoding belongs to [[refreshPq]]
    * alone (the only path that changes books). The inner join also
    * executes the tombstone purge for free: a vector absent from the
    * new cells drops its code row. Index-sized, one keyed exchange,
    * zero argmax work. No-op (skip) when the snapshot predates the
    * PQ family. */
  private def carryPqForward(s: SparkSession, whDir: String,
      present: Seq[String], newCells: DataFrame,
      write: (String, DataFrame) => Unit): Unit =
    if (present.contains("cells_pq")) {
      val oldCodes = read(s, whDir, "cells_pq")
        .select(col("vec_id"), col("code"))
      write("cells_pq", newCells
        .select(col("vec_id"), col("cell"), col("norm"))
        .join(oldCodes, Seq("vec_id"))
        .select(col("vec_id"), col("cell"), col("code"), col("norm")))
    }

  /** One Lloyd step of the SEMANTIC grain from STORED state only
    * (r14): new centroids = the micro-unit means of each stored
    * cell's vectors (the exact q72 arithmetic — one rule text, two
    * instantiations), every stored vector re-assigned against them,
    * sem_purge recomputed. NOTHING re-reads the corpus: the cells
    * table already carries the vectors (it is what an IVF index
    * materializes), so the refresh is one k·dim-group aggregate + one
    * map-only re-assignment + the within-cell purge — the same
    * shuffle shapes as the build's semantic stages, index-sized, at
    * any corpus scale. All non-semantic tables hard-link forward; one
    * atomic version; the stream high-water mark carries forward, so a
    * refresh between streamed merges cannot reopen the replay window.
    * The PQ tier, when present, carries its CODES forward by join
    * ([[carryPqForward]] — codes are a function of the books alone,
    * so a refresh never re-encodes; [[refreshPq]] owns that) and a
    * pre-PQ store refreshes fine without it.
    *
    * Production cadence: merges keep assigning new vectors against
    * the STORED centroids (q139/q140) — correct but slowly staling as
    * the corpus drifts from the build-time seeds; when
    * [[semanticDriftMicro]] warrants, this re-centers without a
    * rebuild, and subsequent merges assign against the REFRESHED
    * centroids automatically (they read the stored table). A cell
    * with no members keeps no centroid (its vectors re-home to the
    * surviving cells). Returns the new version. */
  def refreshSemantic(s: SparkSession, whDir: String,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Long = {
    val cur = version(whDir)
    require(cur > 0, s"refreshSemantic needs a committed snapshot in $whDir")
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    require(SemTables.forall(present.contains),
      s"refreshSemantic needs the semantic tables; snapshot has $present")
    val next = cur + 1
    val base = freshVersionDir(whDir, next)
    present.filterNot(SemRewritten.contains)
      .foreach(t => linkTableForward(whDir, cur, next, t))
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$base/$name")
    def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")
    // Tombstoned vectors drop out HERE, physically: the refresh
    // rewrites the whole semantic family anyway, so the refit both
    // excludes dead vectors from the new means/assignment and purges
    // their rows — the tombstone list is NOT carried forward (the
    // deferred physical-delete the deletion-vector discipline owes).
    val cells = liveCells(s, whDir)
    import s.implicits._
    // Stage hook (r18 verdict #3): the per-stage walls — refit,
    // re-assignment, int8 re-encode, the PQ carry-forward join, the
    // purge recompute — are measurable individually, so a maintenance
    // bench can attribute a refresh regression to the stage that
    // moved (the mergeBatch `measure` discipline, mirrored).
    measure("refit_assign", () => {
      val cents = refreshedCentroids(s, whDir)
      write("centroids", cents.toSeq.toDF("c_id", "v"))
      write("cells", Similarity.assignCellsWith(
          cells.select(col("vec_id"), col("v")), cents)
        .select(col("vec_id"), col("cell"), col("nv").as("norm"), col("v")))
    })
    measure("q8_encode", () =>
      write("cells_q8", Similarity.cellsQ8Of(readBack("cells"))))
    measure("pq_carry", () =>
      carryPqForward(s, whDir, present, readBack("cells"), write))
    measure("sem_purge", () =>
      write("sem_purge", Similarity.semanticPurgeFromCells(readBack("cells"))))
    commit(whDir, cur, next)
    next
  }

  /** The refreshed centroid literals (c_id = cell, element =
    * mean_micro / 1e6) — k·dim rows, ALWAYS driver-small (the q72
    * contract: k grows with the corpus, k·dim stays kilobytes). */
  /** The stored cells MINUS any tombstoned vectors — the frame every
    * refit statistic (means, drift) and the refresh itself operate
    * on: a deleted vector must not pull a centroid. */
  private def liveCells(s: SparkSession, whDir: String): DataFrame = {
    val cells0 = read(s, whDir, "cells")
    vecTombstones(s, whDir).fold(cells0)(t =>
      cells0.join(broadcast(t), Seq("vec_id"), "left_anti"))
  }

  private def refreshedCentroids(s: SparkSession,
      whDir: String): Array[(Long, Seq[Double])] =
    Similarity.lloydMeansOf(liveCells(s, whDir))
      .collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cell, rows) =>
        (cell, rows.sortBy(_.getInt(1))
          .map(_.getLong(3).toDouble / 1e6).toSeq)
      }.toArray

  /** Refit the PQ codebooks from STORED state only (r17) — the
    * [[refreshSemantic]] discipline at the quantizer grain: new entry
    * (sub, c) = the micro-unit mean of the subvectors its STORED
    * codes assigned (the stored `cells_pq` IS the Lloyd assignment —
    * no re-assignment job), entries with no members carry their
    * current value forward (a codebook is a fixed-shape artifact; an
    * unused entry keeps its seed); every stored vector then
    * re-encodes against the refit books. Everything non-PQ hard-links
    * forward — the quantizer refits independently of the IVF geometry
    * (and conversely [[refreshSemantic]]/split/merge rewrite
    * `cells_pq`'s cell column against the books unchanged).
    * Tombstoned vectors are excluded from the means (a deleted vector
    * must not pull an entry) but their rows re-encode in place — the
    * serve's tombstone gate owns exclusion; compact/refreshSemantic
    * own the physical purge. Index-sized at any corpus scale; the
    * corpus is never re-read. Returns the new version. */
  def refreshPq(s: SparkSession, whDir: String): Long = {
    val cur = version(whDir)
    require(cur > 0, s"refreshPq needs a committed snapshot in $whDir")
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    require(Seq("cells", "pq_books", "cells_pq").forall(present.contains),
      s"refreshPq needs the PQ tables; snapshot has $present")
    val next = cur + 1
    val base = freshVersionDir(whDir, next)
    present.filterNot(Seq("pq_books", "cells_pq").contains)
      .foreach(t => linkTableForward(whDir, cur, next, t))
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$base/$name")
    val books = Similarity.collectPqBooks(read(s, whDir, "pq_books"))
    val livePq = {
      val pq0 = read(s, whDir, "cells_pq")
      vecTombstones(s, whDir).fold(pq0)(t =>
        pq0.join(broadcast(t), Seq("vec_id"), "left_anti"))
    }
    val refit = Similarity.pqRefitBooks(liveCells(s, whDir), livePq, books)
    write("pq_books", Similarity.pqBookFrameOf(s, refit))
    write("cells_pq", Similarity.cellsPqOf(read(s, whDir, "cells"), refit))
    linkVecTombstones(whDir, cur, next)
    commit(whDir, cur, next)
    next
  }

  /** Max |refreshed mean − stored centroid| over (cell, pos), in
    * micro units — the drift statistic gating a refresh (q116's
    * centroid-drift idea specialized to the stored index). A cell
    * absent from the stored centroids contributes its full mean. */
  def semanticDriftMicro(s: SparkSession, whDir: String): Long = {
    val storedCents = read(s, whDir, "centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    Similarity.lloydMeansOf(liveCells(s, whDir)).collect()
      .foldLeft(0L) { (acc, r) =>
        val cm = storedCents.get(r.getLong(0))
          .map(v => math.floor(v(r.getInt(1)) * 1e6 + 0.5).toLong)
          .getOrElse(0L)
        math.max(acc, math.abs(r.getLong(3) - cm))
      }
  }

  /** Refresh iff the drift statistic exceeds `thresholdMicro`; None
    * when the stored centroids are still within tolerance (the
    * maintenance job's one-call policy entry). */
  def refreshSemanticIfDrifted(s: SparkSession, whDir: String,
      thresholdMicro: Long,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Option[Long] =
    if (semanticDriftMicro(s, whDir) > thresholdMicro)
      Some(refreshSemantic(s, whDir, measure))
    else None

  /** Drift-gated refresh UNTIL CONVERGED (r15 verdict #5): iterate
    * [[refreshSemanticIfDrifted]] until the drift statistic falls to
    * `thresholdMicro` or the step bound cuts the loop — the
    * production refit job in one call (q160 certifies the identical
    * step/gate control flow against a from-raw re-derivation;
    * `Similarity.LloydEpsMicro` documents the ε choice: micro-unit
    * Lloyd dithers around its fixed point, so the gate closes at the
    * dither band, not at zero). Each executed step is one committed
    * snapshot version — a crash between steps leaves a valid,
    * partially-refitted store the next run resumes gating on.
    * Returns the number of refresh steps committed. */
  def refreshSemanticUntilConverged(s: SparkSession, whDir: String,
      thresholdMicro: Long, maxSteps: Int = 8,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Int = {
    require(maxSteps > 0, s"maxSteps must be positive, got $maxSteps")
    var n = 0
    while (n < maxSteps &&
        refreshSemanticIfDrifted(s, whDir, thresholdMicro, measure).nonEmpty)
      n += 1
    n
  }

  /** Production split bound: a cell holding more than `ratio` × the
    * uniform share (total / k) is HOT. */
  val DefaultHotCellRatio = 1.5

  /** Split every HOT cell of the stored dense index into two
    * sub-cells — IVF list balancing. At 100 TB the per-probe serve
    * cost is bounded by the LARGEST probed cell: a skewed cell makes
    * every request that probes it scan a corpus-fraction candidate
    * list (latency tail + executor memory), and Lloyd refreshes
    * re-center but do not re-partition a dense region that simply
    * outgrew its list. The split is deterministic and
    * oracle-derivable end to end:
    *
    *  - a cell is hot when its LIVE member count exceeds
    *    `ratio · total / k` (k = stored centroid count);
    *  - each hot cell splits against two member seeds — its min and
    *    max vec_id vectors — every member joining the better-cosine
    *    seed (the house −2.0 zero-norm convention; ties to the NEW
    *    sub-cell, whose id is larger — the cos DESC, c_id DESC rule);
    *  - the min-seed group keeps the original cell id; the max-seed
    *    group gets `max(c_id) + 1 + rank(hot cell)` — collision-free
    *    and reproducible from the store alone;
    *  - both sub-cells get micro-unit MEAN centroids (the exact q72
    *    arithmetic), so the split is a LOCAL refit: untouched cells
    *    keep their stored centroids bit for bit.
    *
    * Work: one count aggregate (k groups), one broadcast 2-seed
    * assignment over the hot members only, one k·dim-group mean —
    * index-sized, no corpus read. Rewrites the semantic family under
    * the snapshot protocol (the [[refreshSemantic]] discipline:
    * tombstoned rows drop physically, the list is not carried).
    * Returns Some(new version) after a committed split, None when no
    * cell exceeds the bound — no version churn on balanced stores. */
  def splitHotCells(s: SparkSession, whDir: String,
      ratio: Double = DefaultHotCellRatio): Option[Long] = {
    require(ratio > 1.0, s"split ratio must exceed 1, got $ratio")
    val cur = version(whDir)
    require(cur > 0, s"splitHotCells needs a committed snapshot in $whDir")
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    require(SemTables.forall(present.contains),
      s"splitHotCells needs the semantic tables; snapshot has $present")
    val cells = liveCells(s, whDir)
    val storedCents = read(s, whDir, "centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val k = storedCents.length
    val counts = cells.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val bound = ratio * total / k
    val hot = counts.filter(_._2 > bound).map(_._1).sorted.toSeq
    if (hot.isEmpty) None
    else {
      val maxCid = storedCents.map(_._1).max
      val hotMembers = cells.filter(col("cell").isin(hot: _*))
      val seedIds = hotMembers.groupBy("cell")
        .agg(min("vec_id").as("a_id"), max("vec_id").as("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val seedVecIds = seedIds.flatMap(t => Seq(t._2, t._3)).distinct.toSeq
      val seedVecs = cells.filter(col("vec_id").isin(seedVecIds: _*))
        .select("vec_id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      import s.implicits._
      val seedFrame = seedIds.map { case (cell, aId, bId) =>
        (cell, seedVecs(aId),
          maxCid + 1 + hot.indexOf(cell).toLong, seedVecs(bId))
      }.toSeq.toDF("cell", "av", "b_id", "bv")
      val re = hotMembers.join(broadcast(seedFrame), Seq("cell"))
        .withColumn("cos_a", Similarity.cosine(col("v"), col("av")))
        .withColumn("cos_b", Similarity.cosine(col("v"), col("bv")))
        .select(col("vec_id"),
          when(col("cos_b") >= col("cos_a"), col("b_id"))
            .otherwise(col("cell")).as("cell"),
          col("norm"), col("v"))
      val splitCents = Similarity.lloydMeansOf(re.select("cell", "v"))
        .collect()
        .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1))
            .map(_.getLong(3).toDouble / 1e6).toSeq)
        }
      val cents = (storedCents.filterNot(c => hot.contains(c._1)) ++
        splitCents).sortBy(_._1)
      val next = cur + 1
      val base = freshVersionDir(whDir, next)
      present.filterNot(SemRewritten.contains)
        .foreach(t => linkTableForward(whDir, cur, next, t))
      def write(name: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$base/$name")
      def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")
      write("centroids", cents.toSeq.toDF("c_id", "v"))
      write("cells", cells.filter(!col("cell").isin(hot: _*))
        .select("vec_id", "cell", "norm", "v").unionByName(re))
      write("cells_q8", Similarity.cellsQ8Of(readBack("cells")))
      carryPqForward(s, whDir, present, readBack("cells"), write)
      write("sem_purge", Similarity.semanticPurgeFromCells(readBack("cells")))
      commit(whDir, cur, next)
      Some(next)
    }
  }

  /** Production merge bound: a cell holding less than `ratio` × the
    * uniform share (total / k) is COLD. */
  val DefaultColdCellRatio = 0.5

  /** Merge every COLD cell of the stored dense index into the
    * surviving cells — the dual of [[splitHotCells]]. Fragmented tiny
    * cells (heavy deletes, a drifted corpus, over-eager splits) push
    * the centroid count past the √n the probe budget was sized for:
    * every request scores every centroid, so dead-weight cells buy
    * recall on almost no candidates while inflating the one
    * per-request k-row scan. The merge is deterministic and
    * oracle-derivable:
    *
    *  - a cell is cold when its LIVE member count (0 for a memberless
    *    centroid) is strictly below `ratio · total / k`;
    *  - cold members re-home via the house argmax over the SURVIVING
    *    centroids only ([[Similarity.assignCellsWith]] — the exact
    *    assignment rule every build/merge uses, cos DESC, c_id DESC
    *    ties), so a member whose winner survives cannot move;
    *  - survivors keep their stored centroids bit for bit (absorbed
    *    members shift a centroid only at the next Lloyd refresh —
    *    deliberately, so a merge is never a hidden refit).
    *
    * Work: one count aggregate + a map-only argmax over the cold
    * members — index-sized, no corpus read. Rewrites the semantic
    * family under the snapshot protocol (the [[refreshSemantic]]
    * tombstone purge-and-drop discipline). Returns Some(new version)
    * after a committed merge, None when no cell is cold. */
  def mergeColdCells(s: SparkSession, whDir: String,
      ratio: Double = DefaultColdCellRatio): Option[Long] = {
    require(ratio > 0.0 && ratio < 1.0,
      s"merge ratio must be in (0, 1), got $ratio")
    val cur = version(whDir)
    require(cur > 0, s"mergeColdCells needs a committed snapshot in $whDir")
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    require(SemTables.forall(present.contains),
      s"mergeColdCells needs the semantic tables; snapshot has $present")
    val cells = liveCells(s, whDir)
    val storedCents = read(s, whDir, "centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val k = storedCents.length
    val counts = cells.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = counts.values.sum
    val bound = ratio * total / k
    val cold = storedCents.map(_._1)
      .filter(cid => counts.getOrElse(cid, 0L) < bound).sorted.toSeq
    if (cold.isEmpty) None
    else {
      val survivors = storedCents.filterNot(c => cold.contains(c._1))
      require(survivors.nonEmpty,
        s"mergeColdCells: every cell is cold at ratio $ratio — rebuild " +
          "or refresh instead of merging")
      val re = Similarity.assignCellsWith(
          cells.filter(col("cell").isin(cold: _*)).select("vec_id", "v"),
          survivors)
        .select(col("vec_id"), col("cell"), col("nv").as("norm"), col("v"))
      val next = cur + 1
      val base = freshVersionDir(whDir, next)
      present.filterNot(SemRewritten.contains)
        .foreach(t => linkTableForward(whDir, cur, next, t))
      def write(name: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$base/$name")
      def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")
      import s.implicits._
      write("centroids", survivors.toSeq.toDF("c_id", "v"))
      write("cells", cells.filter(!col("cell").isin(cold: _*))
        .select("vec_id", "cell", "norm", "v").unionByName(re))
      write("cells_q8", Similarity.cellsQ8Of(readBack("cells")))
      carryPqForward(s, whDir, present, readBack("cells"), write)
      write("sem_purge", Similarity.semanticPurgeFromCells(readBack("cells")))
      commit(whDir, cur, next)
      Some(next)
    }
  }

  /** Rebalance the dense index UNTIL QUIET: alternate
    * [[splitHotCells]] and [[mergeColdCells]] waves until neither
    * finds work or the wave bound cuts the loop — the one-call
    * maintenance job (the [[refreshSemanticUntilConverged]]
    * discipline applied to balance). The two bounds move with k (the
    * uniform share total/k shrinks as splits add cells), so a NARROW
    * quiet band thrashes: a split's slivers go cold, the merge
    * re-fattens a survivor past hot, and the pair oscillates.
    * Requiring `hotRatio ≥ 2 · coldRatio` keeps the band wide enough
    * that an even split of a just-hot cell lands INSIDE it — the
    * same-k fixed point exists — and `maxWaves` bounds the k-drift
    * tail honestly (every committed wave is a consistent, servable
    * snapshot, so stopping on the bound is safe, not torn). A wave is
    * one FULL split+merge iteration — both legs always run before the
    * counter moves, so the bound can never skip the merge half of an
    * iteration and a hot-then-cold oscillation costs one wave, not
    * two. Returns the number of committed waves; `< maxWaves` means
    * quiet (the last iteration found no work on either leg). */
  def rebalance(s: SparkSession, whDir: String,
      hotRatio: Double = DefaultHotCellRatio,
      coldRatio: Double = DefaultColdCellRatio,
      maxWaves: Int = 8): Int = {
    require(maxWaves > 0, s"maxWaves must be positive, got $maxWaves")
    require(hotRatio > 1.0 && coldRatio < 1.0 && coldRatio > 0.0,
      s"need coldRatio in (0,1) < 1 < hotRatio; got $coldRatio / $hotRatio")
    require(hotRatio >= 2 * coldRatio,
      s"quiet band too narrow (thrash risk): need hotRatio >= " +
        s"2 * coldRatio, got $hotRatio < ${2 * coldRatio}")
    var waves = 0
    var worked = true
    while (waves < maxWaves && worked) {
      val split = splitHotCells(s, whDir, hotRatio).nonEmpty
      val merged = mergeColdCells(s, whDir, coldRatio).nonEmpty
      worked = split || merged
      if (worked) waves += 1
    }
    waves
  }

  /** Compact every table of the current snapshot to `targetFiles`
    * parquet files — the small-files maintenance pass a merge-driven
    * warehouse needs (each [[mergeBatch]] union-write inherits the
    * session's parallelism, so a low-rate merge cadence accumulates
    * files faster than bytes and scan planning cost grows with file
    * count, not data). Runs under the same snapshot protocol as every
    * other writer: a fresh version, one atomic pointer move, readers
    * never see a half-compacted warehouse — the `ServingStore.compact`
    * discipline lifted to the multi-table snapshot. At 100 TB the
    * same pass sizes `targetFiles` per table from bytes / target file
    * size and runs per partition range. */
  def compact(s: SparkSession, whDir: String, targetFiles: Int = 1,
      purgeVecTombstones: Boolean = false): Long = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val cur = version(whDir)
    require(cur > 0, s"compact needs a committed snapshot in $whDir")
    val next = cur + 1
    freshVersionDir(whDir, next)
    // Only tables present in THIS snapshot are considered (a doc-chain
    // warehouse has six; a full build fifteen) — and of those, only
    // the FRAGMENTED ones are rewritten (r14): a table already at or
    // under the target file count hard-links forward, so compaction
    // I/O is O(what fragmented), not O(index). Merge-driven
    // fragmentation concentrates in the append-leaf tables; the
    // derived tables a merge rewrites whole arrive already coalesced.
    // `purgeVecTombstones` forces the two dense-index tables through
    // the rewrite with the dead rows dropped (the deferred physical
    // delete, r15 verdict #6) and clears the tombstone list.
    val dead =
      if (purgeVecTombstones) vecTombstones(s, whDir).map(broadcast(_))
      else None
    val present = TableNames.filter(t =>
      Files.isDirectory(Paths.get(whDir, s"v=$cur", t)))
    present.foreach { t =>
      val isDense = t == "cells" || t == "cells_q8" || t == "cells_pq"
      val dataFiles = Option(
          new java.io.File(s"$whDir/v=$cur/$t").listFiles()).getOrElse(Array())
        .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      if (dataFiles <= targetFiles && !(isDense && dead.nonEmpty))
        linkTableForward(whDir, cur, next, t)
      else {
        val rows = read(s, whDir, t)
        (if (isDense) dead.fold(rows)(d =>
            rows.join(d, Seq("vec_id"), "left_anti"))
          else rows)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(s"$whDir/v=$next/$t")
      }
    }
    if (dead.isEmpty) linkVecTombstones(whDir, cur, next)
    commit(whDir, cur, next)
    next
  }

  /** Build a full index snapshot from the corpus at `corpusDir` into
    * `whDir` and commit it atomically. Returns the new version. */
  def build(s: SparkSession, corpusDir: String, whDir: String): Long =
    buildOf(s, Tables.documents(s, corpusDir), Tables.embeddings(s, corpusDir),
      whDir)

  /** [[build]] over explicit docs/embeddings frames with per-stage
    * measurement — the seam the all-grain merge certification (q139)
    * uses to build a STANDING index from the corpus minus today's
    * batch, and the corpus-scale bench uses for full-build stage
    * attribution. */
  def buildOf(s: SparkSession, docs: DataFrame, emb: DataFrame,
      whDir: String,
      measure: (String, () => Unit) => Unit = (_, f) => f()): Long = {
    Files.createDirectories(Paths.get(whDir))
    val cur = version(whDir)
    val next = cur + 1
    val base = freshVersionDir(whDir, next)
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$base/$name")
    def readBack(name: String): DataFrame = s.read.parquet(s"$base/$name")

    writeDocChain(s, docs, base, measure)

    // The chunk-grain and semantic families (fixture corpora with
    // embeddings), each stage reading stored inputs like the doc chain.
    measure("chunk_digests", () =>
      write("chunk_digests", Dedup.chunkDigestsOf(docs)))
    // Global heavy-digest deny list (df > MaxChunkDf) — tiny by the
    // q130 df distribution, and the ONLY global state the chunk
    // grain's incremental recluster needs (see mergeBatch): the df
    // gate's sole effect is excluding these digests.
    measure("chunk_heavy", () =>
      write("chunk_heavy", readBack("chunk_digests")
        .groupBy("chunk_md5").agg(count(lit(1)).as("df"))
        .filter(col("df") > Dedup.MaxChunkDf)
        .select("chunk_md5")))
    measure("centroids", () =>
      write("centroids", Similarity.centroidFrameOf(emb)))
    measure("cells", () => write("cells", Similarity.cellIndexOf(emb)))
    // The quantized serving tier beside the full-precision rescore
    // tier (r15 verdict #2): a pure per-row map of the just-written
    // cells, so the two can never skew.
    measure("cells_q8", () =>
      write("cells_q8", Similarity.cellsQ8Of(readBack("cells"))))
    // The PQ tier beside it (r17): codebooks are PURE SEEDS (the
    // first-k discipline — merge/rebuild-stable by construction;
    // refreshPq is the refit path), codes a per-row map of the
    // just-written cells, so none of the three tiers can skew.
    measure("pq_books", () =>
      write("pq_books", Similarity.pqBookFrameOf(s,
        Similarity.pqSeedBooksOf(emb))))
    measure("cells_pq", () =>
      write("cells_pq", Similarity.cellsPqOf(readBack("cells"),
        Similarity.collectPqBooks(readBack("pq_books")))))
    measure("chunk_clusters", () => write("chunk_clusters",
      Dedup.chunkComponentFrameFrom(readBack("chunk_digests"))))
    measure("chunk_purge", () => {
      val quality = readBack("doc_stats")
        .select(col("doc_id"), col("quality_score"))
      write("chunk_purge",
        Dedup.purgeFromWith(readBack("chunk_clusters"), quality))
    })
    measure("sem_purge", () =>
      write("sem_purge", Similarity.semanticPurgeFromCells(readBack("cells"))))
    measure("media_digests", () =>
      write("media_digests", TextOps.mediaDigestsOf(docs)))

    commit(whDir, cur, next)
    next
  }

  /** [[commit]] for sibling stage stores that reuse this snapshot
    * protocol (the curation run's `outDir`). */
  private[queries] def commitSnapshot(whDir: String, curVer: Long,
      newVer: Long): Unit = commit(whDir, curVer, newVer)

  /** [[commitSnapshot]] carrying a streaming high-water mark and the
    * recording stream's identity — the seam the retrieval store's
    * exactly-once stream maintenance uses (same pointer-file
    * discipline as [[mergeBatch]]'s). */
  private[queries] def commitSnapshot(whDir: String, curVer: Long,
      newVer: Long, streamBatchId: Option[Long],
      streamId: Option[String] = None): Unit =
    commit(whDir, curVer, newVer, streamBatchId.getOrElse(-1L), streamId)

  /** Recursively delete a directory tree (best-effort), closing the
    * walk stream (ADVICE r13: a leaked `Files.walk` stream holds a
    * directory fd per reaping commit in a long-lived driver). */
  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) scala.util.Try {
      scala.util.Using.resource(Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Files.deleteIfExists(f); () })
      }
    }

  /** The version directory a writer is about to populate, GUARANTEED
    * empty (ADVICE r13): a crashed build can leave a half-written
    * v=next behind (the pointer never moved, so nothing reaped it);
    * the next writer lands on the SAME version number, and if it
    * writes fewer tables than the crash did (a doc-chain build after
    * a crashed full build), the torn leftover tables would silently
    * join its committed snapshot. Deleting v=next first makes every
    * snapshot contain exactly the tables its committing writer wrote. */
  private[queries] def freshVersionDir(whDir: String, next: Long): String = {
    val base = Paths.get(whDir, s"v=$next")
    deleteTree(base)
    Files.createDirectories(base)
    base.toString
  }

  /** Snapshot versions each commit retains (current + the superseded
    * ones in-flight readers may still hold — the time-travel window).
    * Default 2 = {v−1, v}, the pre-r15 behavior. */
  val DefaultRetention = 2

  /** Set the store's retention to the last `nVersions` snapshots
    * (r14 verdict #7): a durable per-store `_RETENTION` file every
    * subsequent commit honors, so q143-style `readAt` audit diffs can
    * span more than one merge. ≥ 2 — the committing writer's previous
    * version must survive its own commit for in-flight readers. */
  def setRetention(whDir: String, nVersions: Int): Unit = {
    require(nVersions >= 2, s"retention must be >= 2, got $nVersions")
    Files.createDirectories(Paths.get(whDir))
    Files.writeString(Paths.get(whDir, "_RETENTION"), nVersions.toString)
  }

  /** The store's retention window ([[DefaultRetention]] when unset). */
  def retention(whDir: String): Int = {
    val p = Paths.get(whDir, "_RETENTION")
    if (Files.exists(p)) Files.readString(p).trim.toInt else DefaultRetention
  }

  /** Atomic pointer swap (write-temp + ATOMIC_MOVE), then reap
    * snapshots outside the retention window — the ServingStore
    * commit discipline. Also sweeps stale `_CURRENT.tmp.*` files a
    * crash between write and move could leave (ADVICE r13).
    * `streamBatch` < 0 CARRIES FORWARD the existing high-water mark
    * and its recorded stream identity (so a compact or rebuild
    * between streaming merges cannot reopen the replay window); a
    * streaming merge passes its batch id and identity. */
  private def commit(whDir: String, curVer: Long, newVer: Long,
      streamBatch: Long = -1L, streamId: Option[String] = None): Unit = {
    val (mark, id) =
      if (streamBatch >= 0) (streamBatch, streamId)
      else (lastMergedBatch(whDir), streamIdOf(whDir))
    val tmp = Paths.get(whDir, s"_CURRENT.tmp.$newVer")
    Files.writeString(tmp,
      if (mark >= 0) s"$newVer,$mark${id.fold("")("," + _)}"
      else newVer.toString)
    Files.move(tmp, pointerPath(whDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    (1L to newVer - retention(whDir)).foreach { old =>
      deleteTree(Paths.get(whDir, s"v=$old"))
    }
    scala.util.Try {
      scala.util.Using.resource(Files.list(Paths.get(whDir))) { st =>
        st.filter(p => p.getFileName.toString.startsWith("_CURRENT.tmp."))
          .forEach(f => { Files.deleteIfExists(f); () })
      }
    }
  }

  // ---- fixture warehouse (one build per corpus dir per JVM) ----------

  private val fixtureWh =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized fixture warehouse for `corpusDir` — built on first
    * use (EAGER: runs the build's Spark jobs), then read-only. */
  def ensure(s: SparkSession, corpusDir: String): String =
    fixtureWh.computeIfAbsent(corpusDir, _ => {
      val wh = Files.createTempDirectory("graft-warehouse").toString
      build(s, corpusDir, wh)
      wh
    })

  /** A stored table of the fixture warehouse for `corpusDir`. */
  def stored(s: SparkSession, corpusDir: String, table: String): DataFrame =
    read(s, ensure(s, corpusDir), table)

  /** The stored centroids collected to the driver — (c_id, v) rows in
    * the exact shape [[Similarity.assignCellsWith]] consumes. */
  private[queries] def storedCentroids(
      s: SparkSession, corpusDir: String): Array[(Long, Seq[Double])] =
    stored(s, corpusDir, "centroids")
      .orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  // ---- q134: warehouse build certification (per-table row counts) ----

  /** q134 — the warehouse BUILD certified: one row per stored table
    * with its committed row count, hash-checked against DuckDB
    * recomputing every count from the raw corpus through the shared
    * CTE chains. A build that dropped rows anywhere in the lineage
    * (token_hashes → signatures → bands → clusters → purge; chunk and
    * semantic chains likewise) diverges here. Content identity on top
    * of the counts is certified by q135 (increment row-identity) and
    * `WarehouseSpec` (stored ≡ recompute, frame by frame).
    *
    * The purge counts use the survivor identity |purge| = |clustered
    * docs| − |clusters| (exactly one survivor per cluster — the q92
    * keeper rule), so the oracle does not need a second instantiation
    * of the quality-ranked purge CTE per grain.
    *
    * Scale: counting parquet footers' row groups — the audit a
    * production build job emits as its completion record. */
  def warehouseStats(s: SparkSession, dir: String): DataFrame =
    TableNames.sorted.map { t =>
      stored(s, dir, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"))
    }.reduce(_ unionByName _).orderBy("table_name")

  /** The shared q134/q139 oracle scaffolding: the full recompute CTE
    * chain and the per-table count body — factored so the all-grain
    * merge certificate's oracle (q139) is the SAME text as the build
    * certificate's (q134) plus its pinned flag (the house
    * one-rule-text discipline). */
  private val statsCtePrefixSql: String =
    s"""WITH RECURSIVE ${Dedup.bandsCteSql},
       |${Dedup.ccCompCteSql},
       |${Dedup.chunkPairCteSql},
       |${Dedup.chunkCcCteSql},
       |${Similarity.cellAssignCteSql},
       |${Similarity.semPairCteSql},
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)""".stripMargin

  private val tableCountsBodySql: String =
    s"""  SELECT 'bands' AS table_name, 2 * n AS n_rows FROM nd
       |  UNION ALL
       |  SELECT 'cells', CAST(count(*) AS BIGINT) FROM embeddings
       |  UNION ALL
       |  SELECT 'cells_q8', CAST(count(*) AS BIGINT) FROM embeddings
       |  UNION ALL
       |  SELECT 'cells_pq', CAST(count(*) AS BIGINT) FROM embeddings
       |  UNION ALL
       |  SELECT 'pq_books', ${Similarity.PqM} * (
       |    SELECT CAST(count(*) AS BIGINT) FROM embeddings
       |    WHERE vec_id < ${Similarity.PqK})
       |  UNION ALL
       |  SELECT 'centroids', CAST(count(*) AS BIGINT) FROM embeddings
       |  WHERE vec_id < ${Similarity.CentroidK}
       |  UNION ALL
       |  SELECT 'chunk_clusters', CAST(count(*) AS BIGINT) FROM ccomp
       |  UNION ALL
       |  SELECT 'chunk_digests', CAST(count(*) AS BIGINT) FROM dd
       |  UNION ALL
       |  SELECT 'chunk_heavy', CAST(count(*) AS BIGINT) FROM (
       |    SELECT chunk_md5 FROM dd GROUP BY chunk_md5
       |    HAVING count(*) > ${Dedup.MaxChunkDf})
       |  UNION ALL
       |  SELECT 'chunk_purge',
       |    (SELECT CAST(count(*) AS BIGINT) FROM ccomp)
       |      - (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM ccomp)
       |  UNION ALL
       |  SELECT 'clusters', CAST(count(*) AS BIGINT) FROM comp
       |  UNION ALL
       |  SELECT 'doc_stats', n FROM nd
       |  UNION ALL
       |  SELECT 'purge',
       |    (SELECT CAST(count(*) AS BIGINT) FROM comp)
       |      - (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM comp)
       |  UNION ALL
       |  SELECT 'media_digests', n FROM nd
       |  UNION ALL
       |  SELECT 'sem_purge', CAST(count(DISTINCT j) AS BIGINT) FROM p
       |  WHERE cos >= ${Similarity.SemDedupTau}
       |  UNION ALL
       |  SELECT 'signatures', n FROM nd
       |  UNION ALL
       |  SELECT 'token_hashes', n FROM nd""".stripMargin

  val warehouseStatsSql: String =
    s"""$statsCtePrefixSql
       |SELECT table_name, n_rows FROM (
       |$tableCountsBodySql)
       |ORDER BY table_name""".stripMargin

  // ---- q135: stored-path increment ≡ recompute certification ---------

  /** q135 — the claim round 12's verdict asked to make EXECUTABLE:
    * q113's increment run against the STORED band/token-hash tables
    * produces row-for-row the same verdicts as the full recompute
    * form. The output is the stored-path increment plus a
    * `matches_recompute` flag computed LIVE by a symmetric exceptAll
    * comparison (the q34 pinned-flag idiom: the oracle pins TRUE, so
    * a divergence between the warehouse lineage and the from-scratch
    * chain fails the hash gate, not just a spec).
    *
    * EAGER by design (q99 discipline): constructing the frame runs
    * both forms and their comparison. */
  private val incrVerdicts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def warehouseIncrCertify(s: SparkSession, dir: String): DataFrame = {
    val storedPath = Dedup.incrementalDedup(s, dir)
    // The comparison is memoized per corpus dir: the warehouse is
    // immutable once built (this JVM built it) and the recompute is
    // deterministic, so the verdict cannot change within a session —
    // re-running the full recompute on every plan/rep would only bench
    // the certification, not the query.
    val identical: Boolean = incrVerdicts.computeIfAbsent(dir, _ => {
      val recompute = Dedup.incrementalDedupRecompute(s, dir)
      storedPath.exceptAll(recompute).isEmpty &&
        recompute.exceptAll(storedPath).isEmpty
    })
    storedPath.withColumn("matches_recompute", lit(identical))
  }

  val warehouseIncrCertifySql: String =
    Dedup.incrementalDedupSqlWith(",\n  TRUE AS matches_recompute")

  // ---- q138: merge-path ≡ rebuild certification -----------------------

  /** The doc-grain tables the merge path maintains (sorted — q138's
    * output order). */
  val DocChainTables: Seq[String] = Seq(
    "bands", "clusters", "doc_stats", "purge", "signatures", "token_hashes")

  private val mergedFixtures = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, Boolean])]()

  /** Standing index (corpus minus [[Dedup.NewSource]]) + one
    * [[mergeBatch]] of that source, compared table-for-table against
    * the full fixture warehouse. Memoized per corpus dir (eager —
    * the q99/q135 discipline). */
  private def ensureMerged(s: SparkSession,
      dir: String): (String, Map[String, Boolean]) =
    mergedFixtures.computeIfAbsent(dir, _ => {
      val wh = Files.createTempDirectory("graft-merge-wh").toString
      val docs = Tables.documents(s, dir)
      buildDocChainOf(s, docs.filter(col("source") =!= Dedup.NewSource), wh)
      mergeBatch(s, wh, docs.filter(col("source") === Dedup.NewSource))
      val verdicts = DocChainTables.map { t =>
        val cols = stored(s, dir, t).columns.sorted
          .map(col).toSeq
        val full = stored(s, dir, t).select(cols: _*)
        val merged = read(s, wh, t).select(cols: _*)
        t -> (full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
      }.toMap
      (wh, verdicts)
    })

  /** q138 — the INCREMENTAL MAINTENANCE certification: a standing
    * index built WITHOUT today's batch, then [[mergeBatch]]'ed with
    * it, must equal the from-scratch full build table for table.
    * Output: one row per doc-grain table with the merged row count
    * (hash-checked against DuckDB recomputing the counts from the raw
    * corpus) and the live `matches_full_build` flag (the q34/q135
    * pinned-flag idiom — the oracle pins TRUE, so ANY divergence
    * between the append-and-rederive path and the full rebuild fails
    * the hash gate). This is the write-side complement of q135: q135
    * proves the increment READS the index correctly; this proves the
    * daily job can MAINTAIN it without rebuilding. EAGER + memoized
    * per corpus dir. */
  def warehouseMergeCertify(s: SparkSession, dir: String): DataFrame = {
    val (wh, verdicts) = ensureMerged(s, dir)
    DocChainTables.map { t =>
      read(s, wh, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"),
          lit(verdicts(t)).as("matches_full_build"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  val warehouseMergeCertifySql: String =
    s"""WITH RECURSIVE ${Dedup.bandsCteSql},
       |${Dedup.ccCompCteSql},
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
       |SELECT table_name, n_rows, matches_full_build FROM (
       |  SELECT 'bands' AS table_name, 2 * n AS n_rows,
       |    TRUE AS matches_full_build FROM nd
       |  UNION ALL
       |  SELECT 'clusters', (SELECT CAST(count(*) AS BIGINT) FROM comp), TRUE
       |  UNION ALL
       |  SELECT 'doc_stats', n, TRUE FROM nd
       |  UNION ALL
       |  SELECT 'purge',
       |    (SELECT CAST(count(*) AS BIGINT) FROM comp)
       |      - (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM comp),
       |    TRUE
       |  UNION ALL
       |  SELECT 'signatures', n, TRUE FROM nd
       |  UNION ALL
       |  SELECT 'token_hashes', n, TRUE FROM nd)
       |ORDER BY table_name""".stripMargin

  // ---- q143: TIME-TRAVEL merge diff (newly purged by the merge) -------

  /** q143 — time travel made QUERYABLE: "what did today's merge newly
    * purge" — the daily sign-off diff a curation team reads after each
    * index maintenance run. Runs over the q138 merged fixture (standing
    * index = corpus minus [[Dedup.NewSource]], one [[mergeBatch]] of
    * that source) and diffs the purge table ACROSS THE MERGE via the
    * snapshot protocol's retention window: the merged version read with
    * [[read]], the pre-merge version with [[readAt]] — both already
    * materialized, so the diff is an anti-join of two index-sized
    * parquet scans plus a doc_stats lookup for provenance. Nothing
    * recomputes and nothing reads the corpus (PlanShapeSpec pins zero
    * `documents.parquet` scans).
    *
    * Output per newly-purged doc: its source, merged cluster, the
    * keeper that shadows it, and `is_batch_doc` — FALSE rows are the
    * interesting audits (a STANDING doc demoted because the batch
    * delivered a higher-quality duplicate; purge membership is
    * monotone under merge — a non-keeper stays a non-keeper when its
    * cluster grows — so demoted keepers and batch-arrived dups are
    * exactly the delta).
    *
    * The oracle recomputes BOTH chains from the raw corpus — the full
    * purge and the standing purge over `documents WHERE source <>
    * '${Dedup.NewSource}'` — through the same prefixed rule texts
    * (bands → components → purge rank) and anti-joins them, so the
    * time-travel read path is content-certified against a from-scratch
    * derivation of both snapshots. */
  def mergePurgeDelta(s: SparkSession, dir: String): DataFrame = {
    val (wh, _) = ensureMerged(s, dir)
    val vNow = version(wh)
    val vPre = versions(wh).filter(_ < vNow).max
    read(s, wh, "purge")
      .join(readAt(s, wh, "purge", vPre).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .join(read(s, wh, "doc_stats").select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("cluster_id"), col("kept_doc"),
        (col("source") === lit(Dedup.NewSource)).as("is_batch_doc"))
      .orderBy("doc_id")
  }

  val mergePurgeDeltaSql: String =
    s"""WITH RECURSIVE ${Dedup.bandsCteSql},
       |${Dedup.ccCompCteSql},
       |${Dedup.bandsCteSqlFor("n", s" WHERE source <> '${Dedup.NewSource}'")},
       |${Dedup.ccCompCteSqlFor("n")},
       |${Dedup.qualityScCteSql},
       |${Dedup.purgeRankCteSql("comp")},
       |${Dedup.purgeRankCteSql("ncomp", "n")}
       |SELECT p.doc_id, d.source, p.cluster_id, p.kept_doc,
       |  (d.source = '${Dedup.NewSource}') AS is_batch_doc
       |FROM pg p
       |JOIN documents d USING (doc_id)
       |WHERE p.doc_id NOT IN (SELECT doc_id FROM npg)
       |ORDER BY p.doc_id""".stripMargin

  // ---- q139: ALL-GRAIN merge ≡ rebuild certification ------------------

  private val fullMergedFixtures = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, Boolean])]()

  /** Standing FULL index (corpus minus [[Dedup.NewSource]] docs,
    * embeddings minus the q126 new-vector slice) + one all-grain
    * [[mergeBatch]] of those batches, compared table-for-table against
    * the full fixture warehouse. Memoized per corpus dir (eager — the
    * q99/q135/q138 discipline). */
  private def ensureFullMerged(s: SparkSession,
      dir: String): (String, Map[String, Boolean]) =
    fullMergedFixtures.computeIfAbsent(dir, _ => {
      val wh = Files.createTempDirectory("graft-fullmerge-wh").toString
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val isNewVec = pmod(col("vec_id"), lit(Similarity.IncrSemMod)) ===
        lit(Similarity.IncrSemMod - 1)
      buildOf(s, docs.filter(col("source") =!= Dedup.NewSource),
        emb.filter(!isNewVec), wh)
      mergeBatch(s, wh, docs.filter(col("source") === Dedup.NewSource),
        Some(emb.filter(isNewVec)))
      val verdicts = TableNames.map { t =>
        val cols = stored(s, dir, t).columns.sorted.map(col).toSeq
        val full = stored(s, dir, t).select(cols: _*)
        val merged = read(s, wh, t).select(cols: _*)
        t -> (full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
      }.toMap
      (wh, verdicts)
    })

  /** The q139 fixture's store directory (standing build = v1, merged
    * = v2) — the q183 snapshot-serve certificate reads BOTH versions
    * of this store, so the time-travel claim rides on the same
    * fixture whose merge ≡ rebuild is already certified. */
  private[queries] def fullMergedFixture(s: SparkSession,
      dir: String): String = ensureFullMerged(s, dir)._1

  /** q139 — the ALL-GRAIN maintenance certification (r13 verdict #4):
    * a standing 15-table index built WITHOUT today's batches (docs AND
    * embeddings), then [[mergeBatch]]'ed with them, must equal the
    * from-scratch full build table for table — the leaf appends
    * (including batch cell assignment against the STORED centroids),
    * the touched-component doc reclustering, and the chunk/semantic
    * re-derivations all certified at once. Output: one row per stored
    * table with the merged row count (hash-checked against DuckDB
    * recomputing all fifteen counts from the raw corpus — the q134
    * chains) and the live `matches_full_build` flag (the pinned-flag
    * idiom: the oracle pins TRUE, so ANY divergence fails the hash
    * gate). EAGER + memoized per corpus dir. */
  def warehouseFullMergeCertify(s: SparkSession, dir: String): DataFrame = {
    val (wh, verdicts) = ensureFullMerged(s, dir)
    TableNames.sorted.map { t =>
      read(s, wh, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"),
          lit(verdicts(t)).as("matches_full_build"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  val warehouseFullMergeCertifySql: String =
    s"""$statsCtePrefixSql
       |SELECT table_name, n_rows, TRUE AS matches_full_build FROM (
       |$tableCountsBodySql)
       |ORDER BY table_name""".stripMargin

  // ---- q140: STREAMING maintenance ≡ rebuild certification ------------

  private val streamMaintainedFixtures =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, Map[String, Boolean], Boolean)]()

  /** Standing full index (the q139 split), then the [[Dedup.NewSource]]
    * docs + the q126 vector slice arrive as THREE micro-batches
    * through the REAL `StreamIndexMaintainer.sink` (the q99
    * through-the-real-sink idiom), followed by a re-delivery of the
    * final batch which the pointer's high-water mark must turn into a
    * no-op (version unchanged). Sub-batch k of the day: docs with
    * doc_id ≡ k (mod 3), vectors with ⌊vec_id/IncrSemMod⌋ ≡ k (mod 3)
    * — deterministic, so the drained stream state is the q139 merged
    * corpus and must equal the full fixture rebuild table for table.
    * Memoized per corpus dir (eager — the q99/q135/q138 discipline). */
  private def ensureStreamMaintained(s: SparkSession,
      dir: String): (String, Map[String, Boolean], Boolean) =
    streamMaintainedFixtures.computeIfAbsent(dir, _ => {
      val wh = Files.createTempDirectory("graft-streamwh").toString
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val isNewVec = pmod(col("vec_id"), lit(Similarity.IncrSemMod)) ===
        lit(Similarity.IncrSemMod - 1)
      buildOf(s, docs.filter(col("source") =!= Dedup.NewSource),
        emb.filter(!isNewVec), wh)
      val nB = 3L
      def docBatch(k: Long): DataFrame = docs.filter(
        col("source") === Dedup.NewSource &&
          pmod(col("doc_id"), lit(nB)) === lit(k))
      def embBatch(k: Long): DataFrame = emb.filter(isNewVec &&
        pmod((col("vec_id") / lit(Similarity.IncrSemMod)).cast("long"),
          lit(nB)) === lit(k))
      val sink = graft.streaming.StreamIndexMaintainer
        .sink(s, wh, (_, id) => Some(embBatch(id))) _
      (0L until nB).foreach(k => sink(docBatch(k), k))
      val vDrained = version(wh)
      sink(docBatch(nB - 1), nB - 1) // crash-recovery re-delivery
      val replayNoop = version(wh) == vDrained
      val verdicts = TableNames.map { t =>
        val cols = stored(s, dir, t).columns.sorted.map(col).toSeq
        val full = stored(s, dir, t).select(cols: _*)
        val merged = read(s, wh, t).select(cols: _*)
        t -> (full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
      }.toMap
      (wh, verdicts, replayNoop)
    })

  /** q140 — the STREAMING index-maintenance certification: the r14
    * merge write path driven by the speed layer. One row per stored
    * table with the drained-stream row count (hash-checked against
    * the q134 DuckDB chains over the full corpus) plus two live
    * pinned flags: `matches_full_build` (three sequential exactly-once
    * merges ≡ one from-scratch rebuild — the maintenance contract
    * composed) and `replay_noop` (a re-delivered final batch left the
    * version untouched — exactly-once over at-least-once delivery,
    * certified through the real foreachBatch sink body). */
  def warehouseStreamCertify(s: SparkSession, dir: String): DataFrame = {
    val (wh, verdicts, replayNoop) = ensureStreamMaintained(s, dir)
    TableNames.sorted.map { t =>
      read(s, wh, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"),
          lit(verdicts(t)).as("matches_full_build"),
          lit(replayNoop).as("replay_noop"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }
  val warehouseStreamCertifySql: String =
    s"""$statsCtePrefixSql
       |SELECT table_name, n_rows, TRUE AS matches_full_build,
       |  TRUE AS replay_noop FROM (
       |$tableCountsBodySql)
       |ORDER BY table_name""".stripMargin

  // ---- q176: STREAMED media maintenance certification (r16 #7) --------

  /** q176 — the q140 idiom at MEDIA grain, content level: the
    * streamed-maintenance fixture (standing build + three exactly-once
    * micro-batches through the REAL foreachBatch sink body + one
    * re-delivered batch) must leave a `media_digests` table whose
    * EVERY ROW equals the from-raw digest derivation over the full
    * corpus — q161's standing side is stream-fed, and this certifies
    * the feed row-for-row (q140's per-table flag says "equal to the
    * batch rebuild"; this one hash-checks the digests themselves
    * against DuckDB's independent decode-and-blockhash chain). The
    * two live flags carry q140's media verdict and the replay no-op. */
  def streamMediaCertify(s: SparkSession, dir: String): DataFrame = {
    val (wh, verdicts, replayNoop) = ensureStreamMaintained(s, dir)
    read(s, wh, "media_digests")
      .select(col("media_id"), col("phash"),
        lit(verdicts("media_digests")).as("matches_full_build"),
        lit(replayNoop).as("replay_noop"))
      .orderBy("media_id")
  }
  val streamMediaCertifySql: String =
    s"""WITH ${TextOps.mediaPhashCteSql}
       |SELECT media_id, phash, TRUE AS matches_full_build,
       |  TRUE AS replay_noop
       |FROM mph
       |ORDER BY media_id""".stripMargin

  // ---- q141: stored-path semantic refresh certification ---------------

  private val semRefreshFixtures = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[Long, Long], Boolean)]()

  /** Full fixture build → [[refreshSemantic]], capturing the
    * pre-refresh per-cell member counts (the mean basis) and the live
    * non-semantic-preservation verdict (every linked-forward table
    * content-identical to its pre-refresh self). Memoized per corpus
    * dir (eager — the q99/q135/q138 discipline). */
  private def ensureSemRefreshed(s: SparkSession,
      dir: String): (String, Map[Long, Long], Boolean) =
    semRefreshFixtures.computeIfAbsent(dir, _ => {
      val wh = Files.createTempDirectory("graft-semrefresh-wh").toString
      buildOf(s, Tables.documents(s, dir), Tables.embeddings(s, dir), wh)
      val preCounts = read(s, wh, "cells").groupBy("cell").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      refreshSemantic(s, wh)
      val preserved = TableNames
        .filter(t => !SemRewritten.contains(t) &&
          Files.isDirectory(Paths.get(wh, "v=2", t)))
        .forall { t =>
          // v=1 is still on disk: superseded-before-last survives
          // until the NEXT commit, and the refresh was the last one.
          val pre = s.read.parquet(s"$wh/v=1/$t")
          val post = read(s, wh, t)
          pre.exceptAll(post).isEmpty && post.exceptAll(pre).isEmpty
        }
      (wh, preCounts, preserved)
    })

  /** q141 — the SEMANTIC REFRESH certification: the one-Lloyd-step
    * re-centering executed purely from stored tables. One row per
    * (cell, dimension) of the refreshed centroids with the micro-unit
    * coordinate, the pre-refresh member count the mean averaged over,
    * and the post-refresh per-cell purge count — all content-level
    * (not just counts) against DuckDB recomputing the full chain
    * (build-time assignment → micro means → re-assignment → within-
    * cell purge rule) from the raw embeddings. `non_sem_preserved`
    * pins that the refresh touched NOTHING outside the semantic
    * family (hard-linked tables content-identical, live-checked). */
  def warehouseSemRefreshCertify(s: SparkSession, dir: String): DataFrame = {
    val (wh, preCounts, preserved) = ensureSemRefreshed(s, dir)
    import s.implicits._
    val nm = preCounts.toSeq.toDF("cell", "n_members")
    val purge = read(s, wh, "sem_purge")
      .groupBy("cell").agg(count(lit(1)).as("n_purged"))
    read(s, wh, "centroids")
      .select(col("c_id").as("cell"),
        posexplode(col("v")).as(Seq("pos", "cv")))
      .select(col("cell"), col("pos"),
        floor(col("cv") * 1e6 + 0.5).cast("long").as("mean_micro"))
      .join(broadcast(nm), Seq("cell"))
      .join(purge, Seq("cell"), "left")
      .select(col("cell"), col("pos"), col("n_members"), col("mean_micro"),
        coalesce(col("n_purged"), lit(0L)).as("n_purged"),
        lit(preserved).as("non_sem_preserved"))
      .orderBy("cell", "pos")
  }
  val warehouseSemRefreshCertifySql: String =
    s"""WITH ${Similarity.cellAssignCteSql},
       |${Similarity.lloydMeansCteSql},
       |c2 AS (
       |  SELECT cell AS c_id, list(mean_micro / 1000000.0 ORDER BY pos) AS qv
       |  FROM m GROUP BY cell),
       |v1 AS (SELECT vec_id, v FROM a WHERE rn = 1),
       |s2 AS (
       |  SELECT v1.vec_id, v1.v, c2.c_id,
       |    ${Similarity.cosineSqlFor("v1.v", "c2.qv")} AS cos
       |  FROM v1, c2),
       |a2 AS (
       |  SELECT vec_id, v, c_id AS cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, c_id DESC) AS rn
       |  FROM s2),
       |sig2 AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a2 WHERE rn = 1),
       |p2 AS (
       |  SELECT pa.vec_id AS i, pb.vec_id AS j, pb.cell AS cell,
       |    CASE WHEN pa.norm * pb.norm = 0 THEN -2.0
       |      ELSE list_inner_product(pa.v, pb.v) / (pa.norm * pb.norm)
       |      END AS cos
       |  FROM sig2 pa JOIN sig2 pb
       |    ON pa.cell = pb.cell AND pa.vec_id < pb.vec_id),
       |pc AS (
       |  SELECT cell, CAST(count(DISTINCT j) AS BIGINT) AS n_purged
       |  FROM p2 WHERE cos >= ${Similarity.SemDedupTau} GROUP BY cell)
       |SELECT m.cell, m.pos, CAST(m.n_members AS BIGINT) AS n_members,
       |  m.mean_micro, COALESCE(pc.n_purged, 0) AS n_purged,
       |  TRUE AS non_sem_preserved
       |FROM m LEFT JOIN pc ON m.cell = pc.cell
       |ORDER BY m.cell, m.pos""".stripMargin
}
