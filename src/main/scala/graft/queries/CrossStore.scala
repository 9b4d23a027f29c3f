package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** ONE document delete across every store family (r16 verdict #4).
  *
  * A takedown / GDPR / license-revocation event is a DOCUMENT event,
  * but the document lives in three index families with three delete
  * disciplines: the retrieval store's postings (deletion vector +
  * stats subtraction — [[RetrievalIndex.deleteDocs]]), the dense
  * index's vectors (tombstone list every serve anti-joins —
  * [[Warehouse.deleteVectors]], q158) and the media digest table
  * (physical rewrite of the smallest family —
  * [[Warehouse.deleteMedia]]). [[deleteDoc]] composes the three under
  * one call so an operator cannot forget a family; q175 is the pair
  * certificate (the q159 audit idiom applied to deletes) that no
  * family serves a deleted id afterwards.
  *
  * Atomicity is PER STORE, not across stores — the same already-
  * documented posture as the warehouse↔retrieval dual-sink (q159): a
  * crash between commits leaves some families deleted and others not,
  * each store individually consistent; re-running the same call heals
  * (every family delete is idempotent or a no-op on already-deleted
  * ids). The certificate audits the healed end state.
  */
object CrossStore {

  /** Delete `docIds` from every family: dense vectors + media digests
    * (both in `denseWh`) and postings (in `retrWh`). Returns the two
    * stores' new versions (dense, retrieval). Ids must be indexed in
    * the dense cells and postings (each family's own refusal fires
    * otherwise — the per-family contracts hold unchanged); media rows
    * are deleted where present. */
  def deleteDoc(s: SparkSession, denseWh: String, retrWh: String,
      docIds: Seq[Long]): (Long, Long) = {
    require(docIds.nonEmpty, "deleteDoc needs at least one doc id")
    import s.implicits._
    Warehouse.deleteVectors(s, denseWh, docIds.toDF("vec_id"))
    val vDense = Warehouse.deleteMedia(s, denseWh, docIds.toDF("media_id"))
    val vRetr = RetrievalIndex.deleteDocs(s, retrWh, docIds.toDF("doc_id"))
    (vDense, vRetr)
  }

  /** The q175 pinned delete wave — ids indexed in every family at
    * every fixture SF; the q150 dense request vector (123) and its
    * probe battery survive. */
  private[queries] val CrossDeleteIds = Seq(17L, 137L, 257L)

  private val crossWh =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** The memoized CROSS-DELETED fixture pair: full dense warehouse +
    * full retrieval index over the corpus, then ONE [[deleteDoc]]
    * wave — the ensureVecPurged / ensurePurged idiom at the
    * cross-store grain. */
  private[queries] def ensureCrossDeleted(s: SparkSession,
      dir: String): (String, String) =
    crossWh.computeIfAbsent(dir, _ => {
      val dense = java.nio.file.Files
        .createTempDirectory("graft-crossdel-wh").toString
      val retr = java.nio.file.Files
        .createTempDirectory("graft-crossdel-retr").toString
      Warehouse.build(s, dir, dense)
      RetrievalIndex.buildOf(s, Tables.documents(s, dir), retr)
      deleteDoc(s, dense, retr, CrossDeleteIds)
      (dense, retr)
    })

  /** q175 — the CROSS-STORE DELETE certificate: after one
    * [[deleteDoc]] wave, every family's serve/store excludes the
    * deleted ids, certified value-for-value against a from-raw
    * re-derivation over the SURVIVING corpus:
    *
    *  - `dense` rows — the q150 parameterized probe over the deleted
    *    store (tombstone anti-join), one row per served (vec_id,
    *    cosine): must equal a from-scratch probe over the remaining
    *    vectors (the q158 idiom);
    *  - `sparse` rows — the q149 parameterized BM25 request over the
    *    deleted store (tombstones + subtracted stats), one row per
    *    served (doc_id, bm25): must equal a from-scratch request over
    *    the remaining documents (the q147 equivalence);
    *  - `media` rows — per deleted id the count of digest rows still
    *    stored (all 0.0 — the physical rewrite left nothing), plus
    *    one (-1, live-count) row the oracle derives from the raw
    *    corpus minus the wave.
    *
    * Output (family, id, score), ordered (family, id) — one frame, so
    * a single hash mismatch convicts whichever family still serves a
    * dead id. */
  def crossDeleteServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (denseWh, retrWh) = ensureCrossDeleted(s, dir)
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(Similarity.ParamQueryVecId))
      .select(Similarity.doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    val dense = Similarity.serveFrom(s, denseWh, Seq((0L, qv)),
        Similarity.AnnServeOpts(Similarity.ParamNprobe, Similarity.ParamAnnK))
      .select(lit("dense").as("family"), col("vec_id").as("id"),
        col("cosine").as("score"))
    val sparse = RetrievalIndex.bm25Serve(s, retrWh,
        RetrievalIndex.ParamTerms, RetrievalIndex.ParamK)
      .select(lit("sparse").as("family"), col("doc_id").as("id"),
        col("bm25").as("score"))
    val digests = Warehouse.read(s, denseWh, "media_digests")
    val deadCounts = CrossDeleteIds.toDF("id")
      .join(digests.groupBy(col("media_id").as("id"))
        .agg(count(lit(1)).as("n")), Seq("id"), "left")
      .select(lit("media").as("family"), col("id"),
        coalesce(col("n"), lit(0L)).cast("double").as("score"))
    val liveCount = digests.groupBy()
      .agg(count(lit(1)).as("n"))
      .select(lit("media").as("family"), lit(-1L).as("id"),
        col("n").cast("double").as("score"))
    dense.unionByName(sparse).unionByName(deadCounts).unionByName(liveCount)
      .orderBy("family", "id")
  }

  val crossDeleteServeSql: String = {
    val ids = CrossDeleteIds.mkString(", ")
    val deadRows = CrossDeleteIds.map(i =>
      s"""SELECT 'media' AS family, CAST($i AS BIGINT) AS id,
         |  CAST((SELECT count(*) FROM documents
         |        WHERE doc_id = $i AND doc_id NOT IN ($ids)) AS DOUBLE)
         |    AS score""".stripMargin).mkString("\n  UNION ALL\n  ")
    s"""WITH ${Similarity.cellAssignCteSql},
       |sig0 AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |sig AS (SELECT * FROM sig0 WHERE vec_id NOT IN ($ids)),
       |${Similarity.annRequestProbeTailCteSql(
            Similarity.ParamQueryVecId, Similarity.ParamNprobe)},
       |${RetrievalIndex.bm25RequestCteSql(RetrievalIndex.ParamTerms,
            s" WHERE doc_id NOT IN ($ids)")},
       |denseleg AS (
       |  SELECT 'dense' AS family, vec_id AS id, round(cos, 6) AS score
       |  FROM aqcand
       |  ORDER BY cos DESC, vec_id ASC
       |  LIMIT ${Similarity.ParamAnnK}),
       |sparseleg AS (
       |  SELECT 'sparse' AS family, doc_id AS id, round(s, 6) AS score
       |  FROM rqsc
       |  WHERE ${RetrievalIndex.ParamTerms.distinct.sorted
            .map(t => s"tf_$t > 0").mkString(" OR ")}
       |  ORDER BY s DESC, doc_id ASC
       |  LIMIT ${RetrievalIndex.ParamK}),
       |medialeg AS (
       |  $deadRows
       |  UNION ALL
       |  SELECT 'media', CAST(-1 AS BIGINT),
       |    CAST((SELECT count(*) FROM documents
       |          WHERE doc_id NOT IN ($ids)) AS DOUBLE))
       |SELECT family, id, score FROM denseleg
       |UNION ALL
       |SELECT family, id, score FROM sparseleg
       |UNION ALL
       |SELECT family, id, score FROM medialeg
       |ORDER BY family, id""".stripMargin
  }
}
