package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkFixture}

/** Physical-plan contracts for the whole query surface.
  *
  * Correctness gates (oracle + specs) prove the RESULTS; this spec
  * pins the PLAN SHAPES the 100 TB design depends on, so a refactor
  * that silently degrades a plan — a dropped broadcast hint turning a
  * dim join into a cartesian, a wrapped column killing parquet
  * pushdown — fails CI even though results stay identical.
  */
class PlanShapeSpec extends AnyFunSuite with Matchers with SparkFixture {

  // Plan text of every registered query at sf0.001 (planning only for
  // most; the iterative queries execute their small driver loops).
  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.executedPlan.toString
    }

  // Queries whose nested-loop join is INTENTIONAL and bounded:
  // either a cross-join against a SINGLE-ROW aggregate (a broadcast
  // nested-loop of 1 row — constant cost at any scale) or a
  // similarity scan that broadcasts its bounded probe side (k query
  // points / nprobe centroids) against every embedding — the
  // brute-force/IVF ANN shape, linear in the corpus by design.
  // Anything else showing a nested-loop or cartesian is a plan bug.
  private val boundedNestedLoops = Set(
    "q55_tfidf_terms",     // corpus doc-count denominator (1 row)
    "q57_set_ops",         // single-row count reconciliation
    "q63_sketch_union",    // merged-vs-global sketch row (1×1)
    "q79_cm_heavy_hitters", // 1-row merged sketch + 1-row eps bound × top-10
    "q80_theta_overlap",   // 1-row sketch estimates × 1-row exact flags
    "q81_kll_quantiles",   // 1-row quantile estimates × events rank check
    "q94_bloom_decontaminate", // 1-row train count × 1-row certificate
    "q29_cosine_topk",     // broadcast k query vectors × corpus
    "q30_knn_join",        // broadcast probe set × corpus
    "q46_ivf_topk",        // broadcast centroid/probe side
    "q103_int8_recall",    // broadcast 5 probe vectors × corpus (q30 shape)
    "q106_ivf_recall",     // broadcast centroids/probe side (q46 shape)
    "q112_bm25_topk",      // 1-row corpus-stats broadcast (q55 idiom)
    "q115_funnel",         // 1-row per-step counts assembled 1×1
    "q117_calibration",    // 1-row user-count denominator broadcast
    "q118_hybrid_rrf",     // q29 1-row query vector + q112 1-row stats legs
    "q119_semantic_decontam", // broadcast probe block × corpus (q30 shape)
    "q123_purge_by_quality", // 1-row doc-count denominator (q117 idiom)
    "q125_vocab_drift",    // sources × broadcast top-20 terms dense completion
    "q128_ivf_int8",       // broadcast centroids/probe side (q46/q106 shape)
    "q137_retrieval_eval", // broadcast |Q| query vectors + 1-row stats legs
    "q142_ann_serve",      // 1-row stored query vector broadcast (q46 shape)
    "q144_bm25_serve",     // 1-row stats + 1-row df broadcasts (q112 idiom)
    "q146_hybrid_serve",   // both serving legs' 1-row broadcasts (q118 shape)
    "q147_purge_serve",    // q144's broadcasts over the purged store
    "q148_ann_serve_purged", // q142's broadcasts + sem_purge anti side
    "q149_bm25_serve_param", // 1-row stats broadcast (q144 idiom, request form)
    "q152_refresh_recall",   // broadcast 5 probe vectors × corpus (q106 shape), both legs
    "q154_bm25_serve_batch", // 1-row stats broadcast shared by all 60 requests (q149 idiom)
    "q155_ann_serve_batch",  // broadcast 60-request frame × k centroids (q46 probe shape)
    "q156_hybrid_serve_batch", // both batch legs' bounded broadcasts (q154+q155 shapes)
    "q157_quant_serve",      // broadcast 5-probe battery × stored index (q106 shape)
    "q179_pq_serve",         // broadcast 5-probe battery × stored index (q157 shape)
    "q184_pq_refresh_serve", // the q179 shape over the refreshed store
    "q186_pq_rescore_sweep", // the q179 legs swept at 4 window depths
    "q162_quant_serve_batch", // broadcast 60-request frame × k centroids (q155 shape)
    "q168_filtered_bm25",    // 1-row stats broadcast (q149 idiom, filter form)
    // The r17 unified serve kernel scores centroids against the
    // broadcast request frame (|requests| × k_centroid rows, both
    // sides bounded) — every serve form shares the q155 probe shape:
    "q150_ann_serve_param",  // 1-request frame × k centroids
    "q158_vec_delete_serve", // 1-request frame × k centroids (purged store)
    "q164_split_serve",      // 1-request frame × split-store centroids
    "q166_merge_serve",      // 1-request frame × merge-store centroids
    "q167_filtered_serve",   // 1-request frame × k centroids (filter leg joins hash)
    "q170_filtered_batch_serve", // 40-request frame × k centroids
    "q171_filtered_quant_serve", // 1-request frame × k centroids (int8 tier)
    "q172_filtered_quant_batch", // 50-request frame × k centroids (int8 tier)
    "q173_hybrid_inplan",    // both batch legs' bounded broadcasts (q156 shapes)
    "q174_seed_compare",     // broadcast 5 probe vectors × corpus, both legs (q152 shape)
    "q175_cross_delete",     // 1-request frame × k centroids + 1-row stats (q150+q149 shapes)
    "q183_snapshot_serve")   // 1-request frame × k centroids, both retained versions (q150 shape)

  test("audit queries read the STORED warehouse, never the corpus") {
    // The r13 warehouse contract: every dedup audit's plan scans
    // warehouse parquet only — a refactor that quietly re-derives an
    // input from `documents` would reintroduce the corpus-sized scan
    // the materialized index exists to avoid.
    Seq("q120_minhash_error", "q122_purge_audit", "q123_purge_by_quality",
        "q124_lsh_recall", "q133_purge_impact", "q134_warehouse_stats")
      .foreach { n =>
        withClue(s"$n must not scan the corpus:") {
          plans(n) should not include "documents.parquet"
        }
        withClue(s"$n must scan the stored warehouse:") {
          plans(n) should include("graft-warehouse")
        }
      }
  }

  test("ANN serving reads ONLY the stored index — zero corpus scans") {
    // q142: query vector, probe centroids, and candidates all come
    // from warehouse parquet; a serving tier holds the index, not the
    // corpus. Either raw-table scan creeping in would reintroduce a
    // corpus-sized read per search.
    plans("q142_ann_serve") should include("graft-warehouse")
    plans("q142_ann_serve") should not include "embeddings.parquet"
    plans("q142_ann_serve") should not include "documents.parquet"
  }

  test("BM25 serving reads pruned stored postings — zero corpus scans") {
    // q144: the plan scans the retrieval store's postings with a
    // LITERAL term_bucket IN predicate — static partition pruning at
    // plan time (the executed form of the partitioned-index posture) —
    // plus the one-row corpus_stats; the raw corpus never appears.
    plans("q144_bm25_serve") should include("graft-retr-wh")
    plans("q144_bm25_serve") should not include "documents.parquet"
    plans("q144_bm25_serve") should include("PartitionFilters")
    plans("q144_bm25_serve") should include("term_bucket")
  }

  test("sem-purge-aware ANN serving reads only stored tables") {
    // q148: the probe AND the purge decision both come from the
    // materialized warehouse (cells/centroids/sem_purge).
    plans("q148_ann_serve_purged") should include("graft-warehouse")
    plans("q148_ann_serve_purged") should not include "embeddings.parquet"
    plans("q148_ann_serve_purged") should not include "documents.parquet"
  }

  test("purge-aware serving reads the tombstoned store — zero corpus scans") {
    // q147: the purge was APPLIED at fixture time through deleteDocs;
    // the serve plan reads pruned postings + the broadcast tombstone
    // table and never recomputes the purge or rescans the corpus.
    plans("q147_purge_serve") should include("graft-retr-purged")
    plans("q147_purge_serve") should not include "documents.parquet"
    plans("q147_purge_serve") should include("PartitionFilters")
  }

  test("hybrid serving fuses two stored indexes — zero corpus scans") {
    // q146: the sparse leg reads pruned stored postings, the dense leg
    // reads stored cells/centroids; NEITHER raw table appears — the
    // production RAG read path never touches the corpus.
    plans("q146_hybrid_serve") should include("graft-retr-wh")
    plans("q146_hybrid_serve") should include("graft-warehouse")
    plans("q146_hybrid_serve") should not include "documents.parquet"
    plans("q146_hybrid_serve") should not include "embeddings.parquet"
    plans("q146_hybrid_serve") should include("PartitionFilters")
  }

  test("parameterized serving keeps the stored-index plan shape") {
    // q149: an arbitrary-request BM25 serve still prunes stored
    // postings partitions and never scans the corpus; the request
    // path additionally carries ZERO per-term expression nodes (the
    // fold is one aggregate column), so a wide term set cannot grow
    // the plan — pin the absence of per-term pivot aggregates.
    plans("q149_bm25_serve_param") should include("graft-retr-wh")
    plans("q149_bm25_serve_param") should not include "documents.parquet"
    plans("q149_bm25_serve_param") should include("PartitionFilters")
    plans("q149_bm25_serve_param") should include("term_bucket")
    plans("q149_bm25_serve_param") should not include "tf_"
    // q150: an arbitrary-vector ANN serve reads only the stored index;
    // the query vector is a literal, not an embeddings scan.
    plans("q150_ann_serve_param") should include("graft-warehouse")
    plans("q150_ann_serve_param") should not include "embeddings.parquet"
    plans("q150_ann_serve_param") should not include "documents.parquet"
  }

  test("batched serving keeps the stored-index plan shape per family") {
    // q154: one postings scan serves all 60 requests — the literal
    // term_bucket IN over the batch's UNION of buckets still prunes
    // partitions statically; the request fan-out is a broadcast of the
    // tiny (req_id, term) frame, and the corpus never appears.
    plans("q154_bm25_serve_batch") should include("graft-retr-wh")
    plans("q154_bm25_serve_batch") should not include "documents.parquet"
    plans("q154_bm25_serve_batch") should include("PartitionFilters")
    plans("q154_bm25_serve_batch") should include("term_bucket")
    // q155: one cells scan serves all 60 probes via the broadcast
    // (req_id, probe_cell) frame; neither raw table appears.
    plans("q155_ann_serve_batch") should include("graft-warehouse")
    plans("q155_ann_serve_batch") should not include "embeddings.parquet"
    plans("q155_ann_serve_batch") should not include "documents.parquet"
    // q162: the quantized batch serve's only corpus-scale read is the
    // 1-byte/dim cells_q8 tier (pruned by the broadcast probe frame);
    // the full-precision tier is touched only through the broadcast
    // rescore-id join, and neither raw table appears (the request
    // vectors are driver-side literals fetched before the plan).
    plans("q162_quant_serve_batch") should include("graft-warehouse")
    plans("q162_quant_serve_batch") should include("cells_q8")
    plans("q162_quant_serve_batch") should not include "embeddings.parquet"
    plans("q162_quant_serve_batch") should not include "documents.parquet"
    // q173: the IN-PLAN fused frame carries BOTH stored-index legs in
    // one lazy plan — zero driver-side rank collection (a collected
    // fusion would leave only a LocalTableScan) and zero corpus scans.
    plans("q173_hybrid_inplan") should include("graft-retr-wh")
    plans("q173_hybrid_inplan") should include("graft-warehouse")
    plans("q173_hybrid_inplan") should include("PartitionFilters")
    plans("q173_hybrid_inplan") should not include "documents.parquet"
    plans("q173_hybrid_inplan") should not include "embeddings.parquet"
    // q156: the registered frame is the driver-side fusion of the
    // two already-collected leg arrays (the legs overlap on the leg
    // pool), so the corpus-free property is pinned on the LEG plans
    // the fusion collects — the same q154/q155 batch frames.
    val sparseLeg = RetrievalIndex.bm25ServeBatch(spark,
      RetrievalIndex.ensure(spark, sfDir),
      RetrievalIndex.batchHybridTermReqs, TextOps.Bm25K)
      .queryExecution.executedPlan.toString
    sparseLeg should include("graft-retr-wh")
    sparseLeg should not include "documents.parquet"
    sparseLeg should include("PartitionFilters")
    val vecs = Warehouse.stored(spark, sfDir, "cells")
      .filter(org.apache.spark.sql.functions.col("vec_id")
        .isin(RetrievalIndex.BatchHybridVecIds: _*))
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val denseLeg = Similarity.annServeBatch(spark, sfDir, vecs,
      Similarity.AnnProbeN, Similarity.AnnServeK)
      .queryExecution.executedPlan.toString
    denseLeg should include("graft-warehouse")
    denseLeg should not include "embeddings.parquet"
    denseLeg should not include "documents.parquet"
  }

  test("split-store queries read the SPLIT store — zero corpus scans") {
    // q163/q164: both the balance certificate and the post-split serve
    // read the split warehouse only (the q164 request vector is a
    // driver-side literal fetched before the plan); the split itself
    // already happened at store-build time, so neither raw table can
    // appear in a registered plan.
    plans("q163_cell_split") should include("graft-split-wh")
    plans("q163_cell_split") should not include "embeddings.parquet"
    plans("q163_cell_split") should not include "documents.parquet"
    plans("q164_split_serve") should include("graft-split-wh")
    plans("q164_split_serve") should not include "embeddings.parquet"
    plans("q164_split_serve") should not include "documents.parquet"
    // q165/q166: same contract for the cold-merge pair.
    plans("q165_cold_merge") should include("graft-merge-wh")
    plans("q165_cold_merge") should not include "embeddings.parquet"
    plans("q165_cold_merge") should not include "documents.parquet"
    plans("q166_merge_serve") should include("graft-merge-wh")
    plans("q166_merge_serve") should not include "embeddings.parquet"
    plans("q166_merge_serve") should not include "documents.parquet"
    // q167: the filter side is the STORED doc_stats table, never the
    // corpus — a filtered serve that re-read documents.parquet would
    // reintroduce a corpus-sized scan per request.
    plans("q167_filtered_serve") should include("graft-warehouse")
    plans("q167_filtered_serve") should include("doc_stats")
    plans("q167_filtered_serve") should not include "embeddings.parquet"
    plans("q167_filtered_serve") should not include "documents.parquet"
    // q168: the sparse twin — bucket-pruned postings candidate side,
    // stored-doc_stats filter side, no corpus file.
    plans("q168_filtered_bm25") should include("graft-retr-wh")
    plans("q168_filtered_bm25") should include("PartitionFilters")
    plans("q168_filtered_bm25") should include("doc_stats")
    plans("q168_filtered_bm25") should not include "documents.parquet"
    // q170–q172: the filled serve-matrix cells keep every pin of the
    // variants they compose — stored index only, doc_stats filter
    // side, and (for the quantized cells) the 1-byte/dim cells_q8
    // tier as the only corpus-scale read.
    Seq("q170_filtered_batch_serve", "q171_filtered_quant_serve",
        "q172_filtered_quant_batch").foreach { n =>
      plans(n) should include("graft-warehouse")
      plans(n) should include("doc_stats")
      plans(n) should not include "embeddings.parquet"
      plans(n) should not include "documents.parquet"
    }
    Seq("q171_filtered_quant_serve", "q172_filtered_quant_batch").foreach { n =>
      plans(n) should include("cells_q8")
    }
    // q169: driver-side fusion of the two filtered legs (the q156
    // registered-frame shape); the corpus-free property is pinned on
    // the LEG plans the fusion collects.
    val filtSparse = RetrievalIndex.bm25ServeFiltered(spark,
      RetrievalIndex.ensure(spark, sfDir), sfDir,
      RetrievalIndex.HybridParamTerms, 10, Similarity.FilterSources)
      .queryExecution.executedPlan.toString
    filtSparse should include("graft-retr-wh")
    filtSparse should include("doc_stats")
    filtSparse should not include "documents.parquet"
  }

  test("the cross-store delete certificate reads only the deleted stores") {
    // q175: all three family legs read their own deleted stores (the
    // request vector is a driver-side literal fetched before the
    // plan); no corpus file appears, the dense leg carries the
    // tombstone anti-join.
    plans("q175_cross_delete") should include("graft-crossdel-wh")
    plans("q175_cross_delete") should include("graft-crossdel-retr")
    plans("q175_cross_delete") should include("vec_tombstones")
    plans("q175_cross_delete") should include("media_digests")
    plans("q175_cross_delete") should not include "documents.parquet"
    plans("q175_cross_delete") should not include "embeddings.parquet"
  }

  test("vector-delete serving anti-joins the broadcast tombstones, zero corpus scans") {
    // q158: the delete wave is ONLY a broadcast tombstone list — the
    // candidate read excludes it via a broadcast anti-join (pinned),
    // cells hard-link forward, and neither raw table appears on the
    // candidate side (the one embeddings read is the driver-side
    // request-vector fetch, which happens before the returned plan).
    plans("q158_vec_delete_serve") should include("graft-vecpurged-wh")
    plans("q158_vec_delete_serve") should not include "documents.parquet"
    plans("q158_vec_delete_serve") should not include "embeddings.parquet"
    plans("q158_vec_delete_serve").toLowerCase should include("leftanti")
    plans("q158_vec_delete_serve") should include("vec_tombstones")
  }

  test("the media purge's candidate stage reads stored digests, never payloads") {
    // q153's registered plan ends at the CC operator's localCheckpoint
    // (an ExistingRDD scan — lineage deliberately truncated per round),
    // so the corpus-free property is pinned on the stage that feeds
    // it: the band/Hamming edge frame must read the stored
    // media_digests table and neither raw table.
    val edges = TextOps
      .mediaPhashEdges(Warehouse.stored(spark, sfDir, "media_digests"))
      .queryExecution.executedPlan.toString
    edges should include("graft-warehouse")
    edges should not include "documents.parquet"
    edges should not include "embeddings.parquet"
  }

  test("q188's min-fold combines map-side — no pair set crosses an exchange (r18 #6)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // The O(batch) claim, shape-pinned: the verdict's per-new-id min
    // runs as a PARTIAL aggregate on the gated broadcast-join output
    // BEFORE any shuffle, so every exchange above the pair-producing
    // join moves ≤ |batch| combined verdict rows, never the pair
    // set. Structurally: each ShuffleExchangeExec whose subtree
    // contains the banding join must have an aggregate BETWEEN
    // itself and that join (the executed plan's initial tree —
    // exchanges only exist after EnsureRequirements).
    val plan = graft.SparkEntry
      .queries("q188_media_verdict")(spark, sfDir)
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case o => o
      }
    val pairExchanges = plan.collect {
      case e: ShuffleExchangeExec
        if e.child.collectFirst { case j: BaseJoinExec => j }.isDefined => e
    }
    pairExchanges should not be empty
    pairExchanges.foreach { e =>
      val combined = e.child.collectFirst {
        case a: BaseAggregateExec
          if a.collectFirst { case j: BaseJoinExec => j }.isDefined => a
      }
      assert(combined.isDefined,
        s"q188: an exchange moves raw pairs (no map-side combine below " +
          s"it):\n${e.treeString}")
    }
  }

  test("the merge-diff audit reads two snapshot versions, never the corpus") {
    // q143: both purge versions + doc_stats come from the merged
    // fixture warehouse via the retention window — time travel is a
    // parquet read, not a recompute.
    plans("q143_purge_delta") should include("graft-merge-wh")
    plans("q143_purge_delta") should not include "documents.parquet"
    plans("q143_purge_delta") should not include "embeddings.parquet"
  }

  test("the curation summary is served from the run's committed store") {
    // q136: the whole chain ran at pipeline time; the registry query
    // is one parquet scan of the persisted summary.
    plans("q136_curation_run") should include("graft-curation")
    plans("q136_curation_run") should not include "documents.parquet"
  }

  test("the incremental paths scan the warehouse index side and only the new slice of the corpus") {
    // q113: index bands/token-hashes from stored parquet; the ONLY
    // documents scans are the new batch with the source filter pushed.
    plans("q113_incr_dedup") should include("graft-warehouse")
    val docScans = plans("q113_incr_dedup").linesIterator
      .filter(l => l.contains("documents.parquet")).toSeq
    docScans should not be empty
    docScans.foreach { l =>
      withClue(s"corpus scan without the new-batch pushdown: $l") {
        l should include("EqualTo(source,src19)")
      }
    }
    // q126: cell index from stored parquet; embeddings scanned only
    // for the new-batch assignment.
    plans("q126_incr_semdedup") should include("graft-warehouse")
  }

  test("the increment's index side never shuffles (r13 verdict #1, pinned)") {
    // The O(matched buckets) claim as a PLAN contract: every join in
    // q113/q126 is a broadcast probe (batch side ships; stored side
    // streams map-only). A single SortMergeJoin or ShuffledHashJoin
    // would mean an index-sized exchange crept back in; the only
    // non-broadcast exchanges allowed are the candidate-distinct and
    // the final per-doc aggregation/sort, all O(batch · fan-out).
    Seq("q113_incr_dedup", "q126_incr_semdedup").foreach { n =>
      withClue(s"$n index side must stay map-only:") {
        plans(n) should not include "SortMergeJoin"
        plans(n) should not include "ShuffledHashJoin"
      }
    }
    val shuffles = plans("q113_incr_dedup").linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange") &&
        !l.contains("ReusedExchange"))
    withClue("q113 non-broadcast exchanges (candidate distinct + verdict agg + sort):") {
      shuffles should be <= 3
    }
  }

  test("no unbounded cartesian product in any registered query plan") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    offenders.toSeq.sorted shouldBe empty
  }

  test("nested-loop joins appear only as single-row broadcast denominators") {
    val offenders = plans.collect {
      case (n, p)
        if p.contains("BroadcastNestedLoopJoin") &&
          !boundedNestedLoops.contains(n) => n
    }
    offenders.toSeq.sorted shouldBe empty
  }

  test("the PQ tier serves and audits from stored tables — zero corpus scans") {
    // q178/q180 group the STORED codes against the STORED books (the
    // fixture/refreshed store); q179's only corpus-scale read is the
    // 8-byte/vector cells_pq tier (pruned by the broadcast probe
    // frame), the full-precision tier touched only through the
    // bounded rescore join and the exact reference leg.
    Seq("q178_pq_index", "q179_pq_serve", "q180_pq_refresh").foreach { n =>
      plans(n) should not include "embeddings.parquet"
      plans(n) should not include "documents.parquet"
    }
    plans("q178_pq_index") should include("pq_books")
    plans("q179_pq_serve") should include("cells_pq")
    plans("q180_pq_refresh") should include("graft-pqrefresh-wh")
    plans("q184_pq_refresh_serve") should not include "embeddings.parquet"
    plans("q184_pq_refresh_serve") should include("graft-pqrefresh-wh")
  }

  test("the snapshot serve reads both retained versions, never the corpus") {
    // q183: the request vector is fetched driver-side; both legs read
    // the q139 fixture store's retained version directories only.
    plans("q183_snapshot_serve") should not include "embeddings.parquet"
    plans("q183_snapshot_serve") should not include "documents.parquet"
    plans("q183_snapshot_serve") should include("graft-fullmerge-wh")
  }

  test("the model quality gate reads stored features — zero corpus scans") {
    // q181 scores the STORED token_hashes stage (the features ARE the
    // dedup chain's first table) and attributes by stored doc_stats.
    plans("q181_quality_model") should not include "documents.parquet"
    plans("q181_quality_model") should include("token_hashes")
  }

  test("selective scans push their predicates into parquet") {
    // q02: range + numeric predicates; q35: StringStartsWith prefix.
    Seq("q02_filter_project", "q35_prefix_filter").foreach { n =>
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plans(n))
      withClue(s"$n should have non-empty PushedFilters:") {
        pushed.isDefined shouldBe true
      }
    }
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    plans("q03_revenue_by_nation") should include("BroadcastHashJoin")
  }

  test("chunk-grain dedup shuffles digests, never chunk text") {
    // q102's 100 TB posture: chunk text is digested in the corpus scan
    // stage; every Exchange moves (digest, id) or (pair, count) rows.
    // A refactor that shuffles the `text` or `chunk` column would be a
    // corpus-sized shuffle at scale — fail it here.
    val exchanges = plans("q102_chunk_dedup").linesIterator
      .filter(_.contains("Exchange")).toSeq
    exchanges should not be empty
    exchanges.foreach { l =>
      withClue(s"exchange row carries raw text: $l") {
        l should not include "text#"
        l should not include "chunk#"
      }
    }
  }

  test("semantic dedup enumerates pairs cell-locally via a shuffle-hash self-join") {
    // q109's 100 TB posture: the within-cell pair join must be a
    // ShuffledHashJoin whose BOTH sides hash-partition on `cell` (the
    // sub-quadratic knob), never a broadcast nested loop or cartesian
    // — a dropped hint here turns SemDeDup into an n² scan at scale.
    val p = plans("q109_semantic_dedup")
    p should include("ShuffledHashJoin [cell#")
    p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(cell#")) shouldBe 2
    p should not include "BroadcastNestedLoopJoin"
  }

  test("native template-match kernel stays inside whole-stage codegen") {
    // AQE's plan string hides codegen spans until execution; plan the
    // query once with AQE off to see the codegen-annotated tree.
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val plan = SparkEntry.queries("q47_template_native")(spark, sfDir)
        .queryExecution.executedPlan.toString
      plan should include("graft_template_match")
      // The kernel's evaluation site (the project feeding the agg) is
      // inside a WholeStageCodegen span — i.e. the expression codegens
      // rather than falling back to interpreted eval.
      val inCodegen = plan.linesIterator.exists(l =>
        l.contains("graft_template_match") && l.contains("*("))
      withClue("graft_template_match not under a WholeStageCodegen (*) node:\n" + plan) {
        inCodegen shouldBe true
      }
    } finally spark.conf.set(key, prev)
  }
}
