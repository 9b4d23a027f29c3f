package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.log.Templates
import graft.ml.Scorer

/** The speed layer, end to end (SURVEY.md §2.8, §3.2): micro-batch
  * source → `from_json` → stateless enrich (reusing the batch-layer
  * parse/template/feature code) → score → checkpointed keyed upsert
  * into the serving store.
  *
  * Reference chain: `kafka_consumer.py:13-40` (poll loop) →
  * `transform.py:8-97` (re-parse) → `ML_predict.py:78-115` (score) →
  * `insert_data_to_HBase.py:6-46` (keyed put). One message at a time,
  * at-least-once, idempotent only by accident of the rowkey. Here the
  * same dataflow is a Structured Streaming query: micro-batches give
  * scan-side parallelism, the checkpoint + `ServingStore` batch-id
  * high-water mark give effective exactly-once (ST1/ST2/ST3).
  */
object StreamPipeline {

  /** Wire a raw `value`-column stream (Kafka-shaped; any source) into
    * the enrich → upsert pipeline. Caller starts with MemoryStream,
    * file source, or `KafkaIO.source`. */
  def run(
      rawValues: DataFrame,
      templates: Seq[Templates.Template],
      scorer: Scorer,
      storePath: String,
      checkpointDir: String,
      threshold: Double = Scorer.DefaultThreshold): StreamingQuery =
    StreamMessages.parse(rawValues)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // enrichLocal (r18 verdict #5): per-message map-only features
        // — the reference's one-message-at-a-time transform semantics
        // and ~5× the batch-formulated enrich's rows/s at micro-batch
        // sizes (its explode → keyed agg → join chain paid ~5
        // scheduled stages per batch; see StreamTransform.enrichLocal
        // for the exact semantic boundary, spec-pinned).
        val enriched =
          StreamTransform.enrichLocal(batch, templates, scorer, threshold)
        ServingStore.upsert(enriched, storePath, "block_id", batchId)
        ()
      }
      .start()

  /** 1-minute tumbling metrics (ST4/ST5): `err_1m`, `cnt_1m`, `p95_1m`
    * — the reference's aspirational serving schema
    * (`hbase_client.py:23-26`), never actually computed there. One
    * windowed aggregation; on a stream the watermark (default 5 min,
    * the reference's unread `WATERMARK_MINUTES`, `config.py:25`)
    * bounds state by closing windows older than the watermark.
    *
    * Works identically on a batch frame (no watermark applied), so the
    * oracle-checked q33 and the streaming path share this exact code.
    * `percentile` is the exact interpolating aggregate — matches
    * DuckDB's `quantile_cont` digit-for-digit before the round(…,6).
    */
  def metrics1m(
      df: DataFrame,
      tsCol: String,
      isErr: Column,
      value: Column,
      watermark: String = "5 minutes"): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base
      .groupBy(window(col(tsCol), "1 minute").as("w"))
      .agg(
        count(lit(1)).as("cnt_1m"),
        sum(isErr.cast("long")).as("err_1m"),
        round(percentile(value, lit(0.95)), 6).as("p95_1m"))
      .select(unix_millis(col("w.start")).as("minute_start_ms"),
        col("cnt_1m"), col("err_1m"), col("p95_1m"))
  }

  /** `metrics1m` with MERGEABLE sketch state alongside the exact
    * metrics: a KLL sketch of the value column (any-quantile-later)
    * and an HLL sketch of the user column (distincts), per 1-minute
    * window. This is what turns the serving store into a telemetry
    * product at 100 TB: the exact `p95_1m` answers "this minute", but
    * only the sketch columns let a dashboard answer "p95 over the
    * last hour/day" by MERGING ~3 KB blobs per minute-row
    * (`rollupSketches`) instead of rescanning raw events — the
    * reaggregation the reference's `m:p95_1m` schema
    * (`hbase_client.py:23-26`) aspires to but cannot do, because a
    * stored percentile is not mergeable while a stored sketch is.
    *
    * Both sketch aggregates are incremental streaming state:
    * `graft_kll_agg` is a TypedImperativeAggregate (live sketch
    * buffer, serialized only at shuffle/state-store boundaries) and
    * `hll_sketch_agg` is Spark-native. Column NAMES (not Columns) for
    * value/user keep the kernel call in SQL form. */
  def metrics1mSketched(
      df: DataFrame,
      tsCol: String,
      isErr: Column,
      valueCol: String,
      userCol: String,
      watermark: String = "5 minutes"): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base
      .groupBy(window(col(tsCol), "1 minute").as("w"))
      .agg(
        count(lit(1)).as("cnt_1m"),
        sum(isErr.cast("long")).as("err_1m"),
        round(percentile(col(valueCol), lit(0.95)), 6).as("p95_1m"),
        expr(s"graft_kll_agg(CAST(`$valueCol` AS DOUBLE))").as("kll_value"),
        hll_sketch_agg(col(userCol)).as("hll_users"))
      .select(unix_millis(col("w.start")).as("minute_start_ms"),
        col("cnt_1m"), col("err_1m"), col("p95_1m"),
        col("kll_value"), col("hll_users"))
  }

  /** Product wiring for the sketch-columned metrics path: stream →
    * `metrics1mSketched` (update mode — windows re-emit as late rows
    * arrive) → keyed upsert into the serving store on the minute key
    * (last write per window wins, replay-guarded by the batch-id
    * high-water mark). The stored table is then `rollupSketches`-able
    * at any granularity without touching raw data. Same contract as
    * `run` (the scored-events pipeline); SketchServingSpec drives
    * this exact entry end-to-end against an exact recompute. */
  def runMetricsSketched(
      events: DataFrame,
      tsCol: String,
      isErr: Column,
      valueCol: String,
      userCol: String,
      storePath: String,
      checkpointDir: String,
      watermark: String = "5 minutes"): StreamingQuery =
    metrics1mSketched(events, tsCol, isErr, valueCol, userCol, watermark)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ServingStore.upsert(batch, storePath, "minute_start_ms", batchId)
        ()
      }
      .start()

  /** Reaggregate stored `metrics1mSketched` rows into coarser buckets
    * by SKETCH MERGE — no rescan of raw data: counts add, KLL blobs
    * union into `p95_est` (rank-error-bounded, certified by
    * SketchServingSpec), HLL blobs union into `distinct_users_est`.
    * O(minute-rows) input, O(buckets) output; this is the 1-min →
    * 1-hour → 1-day rollup chain of a sketch-columned store. */
  def rollupSketches(minuteRows: DataFrame, bucketMs: Long = 3600000L): DataFrame =
    minuteRows
      .groupBy((col("minute_start_ms") -
        pmod(col("minute_start_ms"), lit(bucketMs))).as("bucket_start_ms"))
      .agg(
        sum(col("cnt_1m")).as("cnt"),
        sum(col("err_1m")).as("err"),
        graft.functions.Kll.union(col("kll_value")).as("kll"),
        hll_union_agg(col("hll_users")).as("hll"))
      .select(
        col("bucket_start_ms"), col("cnt"), col("err"),
        expr("graft_kll_quantile(kll, 0.95d)").as("p95_est"),
        hll_sketch_estimate(col("hll")).as("distinct_users_est"))
}
