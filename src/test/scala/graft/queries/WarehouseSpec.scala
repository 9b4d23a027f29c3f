package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The materialized index warehouse (round-13 verdict #1): snapshot
  * protocol, stored-vs-recompute content identity, and the increment
  * certification the registry's q135 relies on. */
class WarehouseSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
    a.count() shouldBe b.count()
  }

  test("build commits an atomic versioned snapshot and reaps old ones") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-spec").toString
    Warehouse.version(wh) shouldBe 0L
    intercept[IllegalArgumentException](Warehouse.read(spark, wh, "bands"))
    Warehouse.build(spark, sfDir, wh) shouldBe 1L
    Warehouse.version(wh) shouldBe 1L
    Warehouse.TableNames.foreach { t =>
      // chunk_heavy is a deny list — legitimately EMPTY at fixture df
      // distributions; every other table must be populated.
      if (t == "chunk_heavy")
        Warehouse.read(spark, wh, t).count() should be >= 0L
      else Warehouse.read(spark, wh, t).count() should be > 0L
    }
    // Second build: version 2 commits, v=1 (superseded-before-last) is
    // kept for in-flight readers until the NEXT commit reaps it —
    // the ServingStore reap discipline (1L until curVer).
    Warehouse.build(spark, sfDir, wh) shouldBe 2L
    Warehouse.build(spark, sfDir, wh) shouldBe 3L
    Warehouse.version(wh) shouldBe 3L
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "v=1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "v=3")))
  }

  test("a warehouse dropped and rebuilt at the same path never serves a stale frame (ADVICE r18)") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-rebuild").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    Warehouse.buildDocChainOf(spark, docs.filter(col("doc_id") % 2 === 0), wh)
    val evenCount = Warehouse.read(spark, wh, "doc_stats").count()
    // Drop the whole store and rebuild AT THE SAME PATH with a
    // different slice — outside the snapshot protocol (the resolved
    // v=1 path repeats), so only the frame cache's mtime key stands
    // between the second read and the first build's deleted
    // part-files.
    val root = java.nio.file.Paths.get(wh)
    java.nio.file.Files.walk(root)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    // Directory mtime is millisecond-grained on this filesystem; the
    // rebuild lands well past the original's stamp either way, but
    // keep the ordering explicit rather than racy.
    Thread.sleep(5)
    Warehouse.buildDocChainOf(spark, docs.filter(col("doc_id") % 4 === 1), wh)
    val quarterCount = Warehouse.read(spark, wh, "doc_stats").count()
    quarterCount should not be evenCount
    quarterCount shouldBe docs.filter(col("doc_id") % 4 === 1).count()
  }

  test("a configured retention widens the time-travel window (r14 verdict #7)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-ret").toString
    intercept[IllegalArgumentException](Warehouse.setRetention(wh, 1))
    Warehouse.setRetention(wh, 3)
    Warehouse.retention(wh) shouldBe 3
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 1L
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 2L
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 3L
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 4L
    // Retention 3 keeps {2,3,4} after the v=4 commit — readAt can span
    // TWO merges back, not just one.
    Warehouse.versions(wh) shouldBe Seq(2L, 3L, 4L)
    val atV2 = Warehouse.readAt(spark, wh, "bands", 2L).count()
    atV2 should be > 0L
    intercept[IllegalArgumentException](
      Warehouse.readAt(spark, wh, "bands", 1L))
    // Unset stores keep the default two-version window.
    val whD = java.nio.file.Files.createTempDirectory("graft-wh-retd").toString
    Warehouse.retention(whD) shouldBe Warehouse.DefaultRetention
  }

  test("a crash mid-build leaves readers on the old version; the next build recovers") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-crash").toString
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 1L
    val v1Bands = Warehouse.read(spark, wh, "bands").count()
    // Simulate a crash: a half-written v=2 exists but the pointer was
    // never moved.
    val torn = java.nio.file.Paths.get(wh, "v=2", "bands")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.writeString(torn.resolve("garbage"), "not parquet")
    Warehouse.version(wh) shouldBe 1L
    Warehouse.read(spark, wh, "bands").count() shouldBe v1Bands
    // The next successful build claims v=2 (overwrite mode clobbers the
    // torn directory) and commits atomically.
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 2L
    Warehouse.read(spark, wh, "bands").count() shouldBe v1Bands
  }

  test("stored tables are content-identical to the recompute builders") {
    // The memoized fixture warehouse the registry queries read.
    sameRows(Warehouse.stored(spark, sfDir, "token_hashes"),
      Dedup.tokenHashSet(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "signatures"),
      Dedup.signatures(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "bands"),
      Dedup.bandFrame(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "clusters"),
      Dedup.componentFrame(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "purge"),
      Dedup.purgeFrom(spark, sfDir, Dedup.componentFrame(spark, sfDir)))
    sameRows(Warehouse.stored(spark, sfDir, "chunk_digests"),
      Dedup.chunkDigests(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "chunk_purge"),
      Dedup.purgeFrom(spark, sfDir, Dedup.chunkComponentFrame(spark, sfDir)))
    sameRows(Warehouse.stored(spark, sfDir, "cells"),
      Similarity.cellIndex(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "sem_purge"),
      Similarity.semanticDedup(spark, sfDir))
    sameRows(Warehouse.stored(spark, sfDir, "media_digests"),
      TextOps.mediaDigestsOf(graft.core.Tables.documents(spark, sfDir)))
  }

  test("q113 stored-path increment is row-identical to the recompute form") {
    sameRows(Dedup.incrementalDedup(spark, sfDir),
      Dedup.incrementalDedupRecompute(spark, sfDir))
    // …and therefore q135's live flag pins true.
    val flags = Warehouse.warehouseIncrCertify(spark, sfDir)
      .select("matches_recompute").distinct().collect().map(_.getBoolean(0))
    flags.toSeq shouldBe Seq(true)
  }

  test("compact preserves every table's content in targetFiles files") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-compact").toString
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 1L
    val before = Warehouse.DocChainTables
      .map(t => t -> Warehouse.read(spark, wh, t).count()).toMap
    Warehouse.compact(spark, wh) shouldBe 2L
    Warehouse.version(wh) shouldBe 2L
    Warehouse.DocChainTables.foreach { t =>
      Warehouse.read(spark, wh, t).count() shouldBe before(t)
      val files = Option(new java.io.File(s"$wh/v=2/$t").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      withClue(s"$t data files after compact:") { files.length shouldBe 1 }
    }
    // Content identity, not just counts, on the widest table.
    sameRows(Warehouse.read(spark, wh, "token_hashes"),
      Dedup.tokenHashSet(spark, sfDir))
  }

  test("time travel reads the pre-merge snapshot; compact skips unfragmented tables") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-tt").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    Warehouse.buildDocChainOf(spark,
      docs.filter(col("source") =!= "src19"), wh) shouldBe 1L
    val standingCount = Warehouse.read(spark, wh, "doc_stats").count()
    Warehouse.mergeBatch(spark, wh,
      docs.filter(col("source") === "src19")) shouldBe 2L
    // Both snapshots retained: the audit diff "what did today's merge
    // change" reads them side by side.
    Warehouse.versions(wh) shouldBe Seq(1L, 2L)
    Warehouse.readAt(spark, wh, "doc_stats", 1L).count() shouldBe standingCount
    Warehouse.readAt(spark, wh, "doc_stats", 2L).count() should
      be > standingCount
    intercept[IllegalArgumentException](
      Warehouse.readAt(spark, wh, "doc_stats", 99L))
    def files(v: Long, t: String): Set[String] =
      Option(new java.io.File(s"$wh/v=$v/$t").listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
        .toSet
    // A compact at a generous target rewrites NOTHING: every table is
    // already under the bound, so its files hard-link forward by name.
    Warehouse.compact(spark, wh, targetFiles = 10000) shouldBe 3L
    Warehouse.DocChainTables.foreach { t =>
      withClue(s"unfragmented $t after compact:") {
        files(3L, t) shouldBe files(2L, t)
      }
    }
    // The retention window slid: v=1 reaped, the last two remain.
    Warehouse.versions(wh) shouldBe Seq(2L, 3L)
  }

  test("mergeBatch commits a new version whose tables equal a full rebuild") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files.createTempDirectory("graft-merge-spec").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    // Standing index without src19, then the batch merged in.
    Warehouse.buildDocChainOf(spark,
      docs.filter(col("source") =!= "src19"), wh) shouldBe 1L
    Warehouse.mergeBatch(spark, wh,
      docs.filter(col("source") === "src19")) shouldBe 2L
    Warehouse.version(wh) shouldBe 2L
    // Every maintained table equals the from-scratch fixture build.
    Warehouse.DocChainTables.foreach { t =>
      withClue(s"table $t after merge:") {
        sameRows(Warehouse.read(spark, wh, t), Warehouse.stored(spark, sfDir, t))
      }
    }
    // …and q138's live flags pin true.
    Warehouse.warehouseMergeCertify(spark, sfDir)
      .select("matches_full_build").distinct().collect()
      .map(_.getBoolean(0)).toSeq shouldBe Seq(true)
  }

  test("a crashed FULL build cannot leak torn tables into a later doc-chain snapshot") {
    // ADVICE r13: the crash spec above covers a same-table-set writer;
    // this one covers the cross-writer case — a full 14-table build
    // crashes at v=2, then a DOC-CHAIN build claims v=2. The committed
    // snapshot must contain exactly the committing writer's 6 tables;
    // the crash's torn chunk/semantic leftovers must be gone, not
    // silently adopted.
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-xcrash").toString
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 1L
    val torn = java.nio.file.Paths.get(wh, "v=2", "chunk_digests")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.writeString(torn.resolve("garbage"), "not parquet")
    Warehouse.buildDocChain(spark, sfDir, wh) shouldBe 2L
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(wh, "v=2", "chunk_digests")),
      "torn table from the crashed full build survived into the snapshot")
    Warehouse.DocChainTables.foreach { t =>
      Warehouse.read(spark, wh, t).count() should be > 0L
    }
  }

  test("mergeBatch refuses a full warehouse without the batch's embeddings") {
    import org.apache.spark.sql.functions.col
    // ADVICE r13: a doc-only merge on a 14-table warehouse would commit
    // a snapshot whose semantic tables silently miss the batch (and the
    // reaper would then delete the last version that had it right).
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-refuse").toString
    Warehouse.build(spark, sfDir, wh) shouldBe 1L
    val batch = graft.core.Tables.documents(spark, sfDir)
      .filter(col("source") === "src19")
    val e = intercept[IllegalArgumentException](
      Warehouse.mergeBatch(spark, wh, batch))
    e.getMessage should include("embeddings")
    Warehouse.version(wh) shouldBe 1L
  }

  test("merge leaf append re-references the standing files instead of rewriting them") {
    import org.apache.spark.sql.functions.col
    // r13 verdict #3: the leaf merge must be O(batch) I/O — the
    // standing version's parquet files appear in the merged version
    // BY NAME (hard links), with only the batch's rows in new files.
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-link").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    Warehouse.buildDocChainOf(spark,
      docs.filter(col("source") =!= "src19"), wh) shouldBe 1L
    def parts(v: Long, t: String): Set[String] =
      Option(new java.io.File(s"$wh/v=$v/$t").listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
        .toSet
    val standing = Warehouse.DocChainTables.map(t => t -> parts(1L, t)).toMap
    Warehouse.mergeBatch(spark, wh,
      docs.filter(col("source") === "src19")) shouldBe 2L
    Seq("doc_stats", "token_hashes", "signatures", "bands").foreach { t =>
      withClue(s"leaf $t:") {
        // Every standing file re-referenced, plus ≥1 new batch file.
        (standing(t) -- parts(2L, t)) shouldBe empty
        (parts(2L, t) -- standing(t)).size should be > 0
      }
    }
  }

  test("a merge that pushes a digest past MaxChunkDf splits the cluster like a rebuild") {
    // The one chunk-grain path no fixture exercises (dfs stay tiny):
    // 64 standing docs share one chunk digest (df = cap → one
    // 64-member cluster); the 65th copy arrives in a batch, df
    // crosses the cap, the digest lands in the stored `chunk_heavy`
    // deny list, and the whole cluster must DISSOLVE — exactly what a
    // full rebuild of the merged corpus produces. Certifies the
    // deny-list maintenance (`crossed`) and the subgraph recluster's
    // edge-REMOVAL semantics, table for table.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ") // 1 chunk
    def docsOf(n: Int) = (0 until n)
      .map(i => (i.toLong, s"src${i % 3}", shared))
      .toDF("doc_id", "source", "text")
    val emb = (0L until 10L)
      .map(i => (i, Array.fill(4)((i + 1) * 0.1f), 0)).toDF("vec_id", "embedding", "label")
    val emptyBatchEmb = emb.filter(col("vec_id") < 0L)
    val whStanding = java.nio.file.Files
      .createTempDirectory("graft-wh-cap-standing").toString
    val whFull = java.nio.file.Files
      .createTempDirectory("graft-wh-cap-full").toString
    Warehouse.buildOf(spark, docsOf(64), emb, whStanding) shouldBe 1L
    // Sanity: the standing index has ONE 64-member chunk cluster and
    // an empty deny list.
    Warehouse.read(spark, whStanding, "chunk_clusters").count() shouldBe 64L
    Warehouse.read(spark, whStanding, "chunk_heavy").count() shouldBe 0L
    val batch = Seq((64L, "src1", shared)).toDF("doc_id", "source", "text")
    Warehouse.mergeBatch(spark, whStanding, batch, Some(emptyBatchEmb)) shouldBe 2L
    Warehouse.buildOf(spark, docsOf(65), emb, whFull) shouldBe 1L
    // The crossing is recorded and the cluster dissolved.
    Warehouse.read(spark, whStanding, "chunk_heavy").count() shouldBe 1L
    Warehouse.read(spark, whStanding, "chunk_clusters").count() shouldBe 0L
    Warehouse.TableNames.foreach { t =>
      withClue(s"table $t after cap-crossing merge:") {
        sameRows(Warehouse.read(spark, whStanding, t),
          Warehouse.read(spark, whFull, t))
      }
    }
  }

  test("semantic refresh re-centers from stored state and links everything else") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files
      .createTempDirectory("graft-wh-refresh").toString
    Warehouse.build(spark, sfDir, wh) shouldBe 1L
    def parts(v: Long, t: String): Set[String] =
      Option(new java.io.File(s"$wh/v=$v/$t").listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
        .toSet
    val nonSem = Warehouse.TableNames
      .filterNot(Seq("centroids", "cells", "cells_q8", "cells_pq",
        "sem_purge").contains)
    val pre = nonSem.map(t => t -> parts(1L, t)).toMap
    val cellsBefore = Warehouse.read(spark, wh, "cells").count()
    // The fixture's seed centroids are not cell means: drift is real,
    // the gate fires at threshold 0 and stays quiet at a huge one.
    Warehouse.semanticDriftMicro(spark, wh) should be > 0L
    Warehouse.refreshSemanticIfDrifted(spark, wh, Long.MaxValue) shouldBe None
    Warehouse.version(wh) shouldBe 1L
    Warehouse.refreshSemanticIfDrifted(spark, wh, 0L) shouldBe Some(2L)
    Warehouse.version(wh) shouldBe 2L
    // Non-semantic tables: every file re-referenced BY NAME, none new.
    nonSem.foreach { t =>
      withClue(s"linked table $t:") { parts(2L, t) shouldBe pre(t) }
    }
    // Semantic family: every vector still indexed, centroids are the
    // stored cells' means, purge consistent with the new cells.
    Warehouse.read(spark, wh, "cells").count() shouldBe cellsBefore
    Warehouse.read(spark, wh, "centroids").count() should be > 0L
    sameRows(Warehouse.read(spark, wh, "sem_purge"),
      Similarity.semanticPurgeFromCells(Warehouse.read(spark, wh, "cells")))
  }

  test("a merge after a refresh assigns batch vectors against the refreshed centroids") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val wh = java.nio.file.Files
      .createTempDirectory("graft-wh-refresh-merge").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val isNewVec = pmod(col("vec_id"), lit(10L)) === lit(9L)
    Warehouse.buildOf(spark, docs.filter(col("source") =!= "src19"),
      emb.filter(!isNewVec), wh) shouldBe 1L
    Warehouse.refreshSemantic(spark, wh) shouldBe 2L
    val cents = Warehouse.read(spark, wh, "centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    Warehouse.mergeBatch(spark, wh, docs.filter(col("source") === "src19"),
      Some(emb.filter(isNewVec))) shouldBe 3L
    // Batch vectors were assigned with the REFRESHED centroid set.
    val batchCells = Warehouse.read(spark, wh, "cells")
      .filter(isNewVec)
    sameRows(batchCells,
      Similarity.cellRowsWith(emb.filter(isNewVec), cents))
    // And the spliced purge is consistent with the merged cells.
    sameRows(Warehouse.read(spark, wh, "sem_purge"),
      Similarity.semanticPurgeFromCells(Warehouse.read(spark, wh, "cells")))
  }

  test("all-grain merge certification (q139) pins every table to the rebuild") {
    val rows = Warehouse.warehouseFullMergeCertify(spark, sfDir).collect()
    rows.length shouldBe Warehouse.TableNames.length
    rows.foreach { r =>
      withClue(s"table ${r.getString(0)}:") {
        r.getBoolean(2) shouldBe true
      }
    }
  }

  test("q126 stored-path semantic increment matches an all-recompute run") {
    // Recompute form: both sides assigned in-query (the r12 body).
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val sig = Similarity.assignCellsWith(e, Similarity.collectCentroids(e))
      .select(col("vec_id"), col("v"), col("nv").as("norm"), col("cell"))
    val isNew = pmod(col("vec_id"), lit(10L)) === lit(9L)
    val nb = sig.filter(isNew)
      .select(col("vec_id").as("new_vec"), col("v").as("nv2"),
        col("norm").as("nn"), col("cell"))
    val ib = sig.filter(!isNew)
      .select(col("vec_id").as("idx_vec"), col("v").as("iv"),
        col("norm").as("inorm"), col("cell"))
    val denom = col("nn") * col("inorm")
    val recompute = nb.join(ib, Seq("cell"))
      .withColumn("cos",
        when(denom === 0.0, lit(-2.0))
          .otherwise(aggregate(zip_with(col("nv2"), col("iv"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) / denom))
      .groupBy(col("new_vec"), col("cell"))
      .agg(count(lit(1)).as("n_cell_index"),
        sum(when(col("cos") >= 0.4, 1L).otherwise(0L)).as("n_covering"),
        max(struct(col("cos"), (-col("idx_vec")).as("neg"))).as("best"))
      .select(col("new_vec"), col("cell"), col("n_cell_index"),
        col("n_covering"), (-col("best.neg")).as("best_match"),
        round(col("best.cos"), 6).as("best_cos"),
        (col("best.cos") >= 0.4).as("is_dup"))
    sameRows(Similarity.incrementalSemanticDedup(spark, sfDir), recompute)
  }
}
