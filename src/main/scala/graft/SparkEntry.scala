package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SkewJoin
import graft.queries.{Dedup, Extras, LogOps, MLOps, RawLog, Relational, Scalars, Serving, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets one entry in
  * `queries` (Spark-first implementation) and, where expressible, a
  * matching ANSI-SQL oracle in `oracleSql` run by the driver under DuckDB.
  * Column names/aliases are kept identical on both sides (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> (Relational.pricingSummary _),
    "q02_filter_project"   -> (Relational.filterProject _),
    "q03_revenue_by_nation" -> (Relational.revenueByNation _),
    "q04_topk_orders"      -> (Relational.topkOrders _),
    "q05_semi_join"        -> (Relational.activeCustomersBySegment _),
    "q06_anti_join"        -> (Relational.inactiveCustomers _),
    "q07_window_latest_order" -> (Relational.latestOrderPerCustomer _),
    "q08_distinct"         -> (Relational.distinctFlagStatus _),
    "q09_conditional_agg"  -> (Relational.orderStatusBreakdown _),
    "q10_serving_latest"   -> (Serving.latestEvents _),
    "q11_serving_by_user"  -> (Serving.eventsByUser _),
    "q12_serving_time_range" -> (Serving.eventsTimeRange _),
    "q13_serving_threshold" -> (Serving.highValueEvents _),
    "q14_serving_stats"    -> (Serving.servingStats _),
    "q15_serving_delete"   -> (Serving.deleteUserEvents _),
    "q16_serving_keyword"  -> (Serving.keywordFacet _),
    "q17_json_extract"     -> (Scalars.jsonExtract _),
    "q18_orders_per_month" -> (Scalars.ordersPerMonth _),
    "q19_activity_span"    -> (Scalars.userActivitySpan _),
    "q20_doc_tokens"       -> (Scalars.docTokens _),
    "q21_sessionize"       -> (LogOps.sessionizeEvents _),
    "q22_template_match"   -> (LogOps.templateMatchDocs _),
    "q23_event_pivot"      -> (LogOps.eventPivot _),
    "q24_exact_dedup"      -> (Dedup.exactDedup _),
    "q25_normalized_dedup" -> (Dedup.normalizedDedup _),
    "q26_ngram_jaccard"    -> (Dedup.ngramJaccard _),
    "q27_minhash_sig"      -> (Dedup.minhashSignatures _),
    "q28_minhash_bands"    -> (Dedup.minhashBands _),
    "q29_cosine_topk"      -> (Similarity.cosineTopK _),
    "q30_knn_join"         -> (Similarity.knnJoin _),
    "q31_lsh_buckets"      -> (Similarity.lshBuckets _),
    "q32_embedding_stats"  -> (Similarity.embeddingStats _),
    "q33_tumbling_metrics" -> (LogOps.tumblingMetrics _),
    // No oracle (not SQL-expressible): driver records rows-only checks.
    "q34_lr_anomaly"       -> (MLOps.lrAnomaly _),
    "q35_prefix_filter"    -> (Extras.prefixFilter _),
    "q36_lang_id"          -> (TextOps.langId _),
    "q37_quality_score"    -> (TextOps.qualityScore _),
    "q38_token_stats"      -> (TextOps.tokenStats _),
    "q39_fingerprint"      -> (TextOps.fingerprint _),
    "q40_multimodal_meta"  -> (TextOps.multimodalMeta _),
    "q41_hash_sample"      -> (Extras.hashSample _),
    "q42_random_pick"      -> (Extras.randomPick _),
    "q43_nulls_last"       -> (Extras.nullsLastSort _),
    "q44_try_cast"         -> (Extras.tryCastParse _),
    "q45_cosine_neardup"   -> (Similarity.cosineNearDup _),
    "q46_ivf_topk"         -> (Similarity.ivfTopK _),
    "q47_template_native"  -> (LogOps.templateMatchNative _),
    "q48_salted_join"      -> (SkewJoin.saltedJoinAgg _),
    "q49_dup_clusters"     -> (Dedup.dupClusters _),
    "q50_revenue_rollup"   -> (Relational.revenueRollup _),
    "q51_group_percentiles" -> (Extras.groupPercentiles _),
    "q52_asof_attribution" -> (Extras.purchaseAttribution _),
    "q53_range_join"       -> (Extras.sessionRangeJoin _),
    "q54_vocab_topk"       -> (TextOps.vocabTopK _),
    "q55_tfidf_terms"      -> (TextOps.tfidfTopTerms _),
    "q56_moving_revenue"   -> (Relational.movingRevenue _),
    "q57_set_ops"          -> (Relational.setOps _),
    "q58_media_frames"     -> (TextOps.mediaFrames _),
    "q59_scored_anomalies" -> (MLOps.scoredAnomalies _),
    "q60_event_unpivot"    -> (LogOps.eventUnpivot _),
    "q61_raw_log_sessions" -> (RawLog.rawLogSessions _),
    "q62_raw_log_features" -> (RawLog.rawLogFeatures _),
    // No oracle (approx estimates don't cross engines): rows-only; the
    // row itself carries its invariant (merge_matches_global = true).
    "q63_sketch_union"     -> (Extras.sketchUnion _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"  -> Relational.pricingSummarySql,
    "q02_filter_project"   -> Relational.filterProjectSql,
    "q03_revenue_by_nation" -> Relational.revenueByNationSql,
    "q04_topk_orders"      -> Relational.topkOrdersSql,
    "q05_semi_join"        -> Relational.activeCustomersBySegmentSql,
    "q06_anti_join"        -> Relational.inactiveCustomersSql,
    "q07_window_latest_order" -> Relational.latestOrderPerCustomerSql,
    "q08_distinct"         -> Relational.distinctFlagStatusSql,
    "q09_conditional_agg"  -> Relational.orderStatusBreakdownSql,
    "q10_serving_latest"   -> Serving.latestEventsSql,
    "q11_serving_by_user"  -> Serving.eventsByUserSql,
    "q12_serving_time_range" -> Serving.eventsTimeRangeSql,
    "q13_serving_threshold" -> Serving.highValueEventsSql,
    "q14_serving_stats"    -> Serving.servingStatsSql,
    "q15_serving_delete"   -> Serving.deleteUserEventsSql,
    "q16_serving_keyword"  -> Serving.keywordFacetSql,
    "q17_json_extract"     -> Scalars.jsonExtractSql,
    "q18_orders_per_month" -> Scalars.ordersPerMonthSql,
    "q19_activity_span"    -> Scalars.userActivitySpanSql,
    "q20_doc_tokens"       -> Scalars.docTokensSql,
    "q21_sessionize"       -> LogOps.sessionizeEventsSql,
    "q22_template_match"   -> LogOps.templateMatchDocsSql,
    "q23_event_pivot"      -> LogOps.eventPivotSql,
    "q24_exact_dedup"      -> Dedup.exactDedupSql,
    "q25_normalized_dedup" -> Dedup.normalizedDedupSql,
    "q26_ngram_jaccard"    -> Dedup.ngramJaccardSql,
    "q27_minhash_sig"      -> Dedup.minhashSignaturesSql,
    "q28_minhash_bands"    -> Dedup.minhashBandsSql,
    "q29_cosine_topk"      -> Similarity.cosineTopKSql,
    "q30_knn_join"         -> Similarity.knnJoinSql,
    "q31_lsh_buckets"      -> Similarity.lshBucketsSql,
    "q32_embedding_stats"  -> Similarity.embeddingStatsSql,
    "q33_tumbling_metrics" -> LogOps.tumblingMetricsSql,
    "q35_prefix_filter"    -> Extras.prefixFilterSql,
    "q36_lang_id"          -> TextOps.langIdSql,
    "q37_quality_score"    -> TextOps.qualityScoreSql,
    "q38_token_stats"      -> TextOps.tokenStatsSql,
    "q39_fingerprint"      -> TextOps.fingerprintSql,
    "q40_multimodal_meta"  -> TextOps.multimodalMetaSql,
    "q41_hash_sample"      -> Extras.hashSampleSql,
    "q42_random_pick"      -> Extras.randomPickSql,
    "q43_nulls_last"       -> Extras.nullsLastSortSql,
    "q44_try_cast"         -> Extras.tryCastParseSql,
    "q45_cosine_neardup"   -> Similarity.cosineNearDupSql,
    "q46_ivf_topk"         -> Similarity.ivfTopKSql,
    "q47_template_native"  -> LogOps.templateMatchNativeSql,
    "q48_salted_join"      -> SkewJoin.saltedJoinAggSql,
    "q49_dup_clusters"     -> Dedup.dupClustersSql,
    "q50_revenue_rollup"   -> Relational.revenueRollupSql,
    "q51_group_percentiles" -> Extras.groupPercentilesSql,
    "q52_asof_attribution" -> Extras.purchaseAttributionSql,
    "q53_range_join"       -> Extras.sessionRangeJoinSql,
    "q54_vocab_topk"       -> TextOps.vocabTopKSql,
    "q55_tfidf_terms"      -> TextOps.tfidfTopTermsSql,
    "q56_moving_revenue"   -> Relational.movingRevenueSql,
    "q57_set_ops"          -> Relational.setOpsSql,
    "q58_media_frames"     -> TextOps.mediaFramesSql,
    "q59_scored_anomalies" -> MLOps.scoredAnomaliesSql,
    "q60_event_unpivot"    -> LogOps.eventUnpivotSql,
    "q61_raw_log_sessions" -> RawLog.rawLogSessionsSql,
    "q62_raw_log_features" -> RawLog.rawLogFeaturesSql,
  )
}
