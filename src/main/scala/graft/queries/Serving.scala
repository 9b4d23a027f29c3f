package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Serving-layer query surface (SURVEY.md §2.9 Q1–Q9), re-expressed over
  * the `events` table: the reference answers these with HBase scans +
  * client-side filter/sort/limit; here each is one declarative DataFrame
  * query.
  *
  * Scale notes: every query is filter + top-k. `orderBy(...).limit(n)`
  * compiles to TakeOrderedAndProject (per-partition heaps, no global
  * sort); range/equality predicates push down to the parquet scan. At
  * 100 TB the serving store would be time-partitioned so `ts_ms` ranges
  * prune whole partitions — same query shape, fewer files scanned.
  *
  * Timestamps are exposed as epoch millis (`ts_ms`): bit-stable across
  * engines, and the reference's own serving schema is ms-based
  * (hbase_client.py:90-99).
  */
object Serving {

  private val servingCols = Seq("event_id", "ts_ms", "user_id", "event_type", "value")

  /** Q1/W4/Q8: latest N, ties broken by event_id for determinism. */
  def latestEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .orderBy(col("ts_ms").desc, col("event_id").desc)
      .limit(100)
      .select(servingCols.map(col): _*)

  val latestEventsSql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
      |FROM events
      |ORDER BY ts_ms DESC, event_id DESC
      |LIMIT 100""".stripMargin

  /** Q2: scoped by key (user), newest first. */
  def eventsByUser(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("user_id") === 13)
      .orderBy(col("ts_ms").desc, col("event_id").desc)
      .limit(50)
      .select(servingCols.map(col): _*)

  val eventsByUserSql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
      |FROM events
      |WHERE user_id = 13
      |ORDER BY ts_ms DESC, event_id DESC
      |LIMIT 50""".stripMargin

  /** Q3/Q4/P8: inclusive time-range scan (2024-01-10 .. 2024-01-12 UTC). */
  def eventsTimeRange(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("ts_ms").between(1704844800000L, 1705017600000L))
      .select(servingCols.map(col): _*)
      .orderBy("event_id")

  val eventsTimeRangeSql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
      |FROM events
      |WHERE epoch_ms(ts) BETWEEN 1704844800000 AND 1705017600000
      |ORDER BY event_id""".stripMargin

  /** Q5/P7: score-threshold scan, top-k by value. */
  def highValueEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value") >= 300.0)
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(100)
      .select(servingCols.map(col): _*)

  val highValueEventsSql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
      |FROM events
      |WHERE value >= 300.0
      |ORDER BY value DESC, event_id ASC
      |LIMIT 100""".stripMargin

  /** Q6/A10: single-scan serving stats (count / distincts / avg /
    * threshold count). Partial aggregation makes this one shuffle of one
    * row per partition. */
  def servingStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_event_types"),
        round(avg(col("value")), 2).as("avg_value"),
        sum(when(col("value") >= 400.0, 1L).otherwise(0L)).as("n_high"))

  val servingStatsSql: String =
    """SELECT count(*) AS n_events,
      | count(DISTINCT user_id) AS n_users,
      | count(DISTINCT event_type) AS n_event_types,
      | round(avg(value), 2) AS avg_value,
      | CAST(sum(CASE WHEN value >= 400.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM events""".stripMargin

  /** Q7: point delete as an anti-join rewrite — serving table minus a key
    * set, summarized per type to keep the output small. */
  def deleteUserEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val victims = ev.filter(col("user_id") === 13).select("event_id")
    ev.join(victims, Seq("event_id"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_remaining"))
      .orderBy("event_type")
  }

  val deleteUserEventsSql: String =
    """SELECT event_type, count(*) AS n_remaining
      |FROM events e
      |WHERE NOT EXISTS (SELECT 1 FROM events v
      |                  WHERE v.user_id = 13 AND v.event_id = e.event_id)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Q9/P9/F17: keyword facet — case-insensitive substring over the
    * payload plus a prediction-style equality facet. */
  def keywordFacet(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(lower(col("event_type")).contains("err") && col("value") >= 100.0)
      .orderBy(col("ts_ms").desc, col("event_id").desc)
      .limit(200)
      .select(servingCols.map(col): _*)

  val keywordFacetSql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
      |FROM events
      |WHERE contains(lower(event_type), 'err') AND value >= 100.0
      |ORDER BY ts_ms DESC, event_id DESC
      |LIMIT 200""".stripMargin

  /** q99 — ServingStore END-STATE certification (round-11 verdict #7):
    * replay a recorded multi-batch stream through the REAL store
    * machinery and oracle-check what the store then SERVES, not just
    * per-operator specs. The "recording" is deterministic: every event
    * is assigned to one of 3 micro-batches by the portable keyed hash
    * (so both engines can reconstruct the same batches), each batch is
    * reduced to its newest row per user (`StreamTransform.dedupeLatest`
    * semantics: ts desc, id desc) and applied IN ORDER with
    * `ServingStore.upsert` — versioned snapshot, atomic pointer swap,
    * batch-id high-water mark, exactly the calls `foreachBatch` makes
    * (reference chain: `kafka_consumer.py:13-40` →
    * `insert_data_to_HBase.py:6-46`, rowkey=key overwrite). The final
    * batch is then RE-DELIVERED and must be skipped by the replay
    * guard (asserted live, inside the query). The returned frame is
    * the store's committed end-state, which DuckDB reproduces
    * declaratively: per user, the newest row of the LAST batch that
    * contains that user — a rank over (batch DESC, ts DESC, id DESC).
    *
    * Scale: one window shuffle keyed (user, batch) + K bounded keyed
    * upserts. The per-batch frames are ≤ |users| rows each; the
    * replay itself is the store's O(snapshot) merge, which is the
    * documented compaction model at 100 TB (per-key-range rewrite).
    *
    * This builder is EAGER by design — constructing the DataFrame
    * runs the replay (the assertions above are part of the query's
    * contract), so a plan-only caller (plan hashing, explain) also
    * pays one replay, and each call leaves a few-KB temp store behind
    * for the returned frame to read (OS-reaped tmp; a store cannot be
    * deleted before its lazy reader runs). */
  def storeReplay(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.ServingStore
    val nBatches = 3
    val batch = (graft.functions.PortableHash
      .keyedHash60(col("event_id"), "replay") % nBatches).cast("int")
    // Null keys are excluded up front: the store's left_anti merge
    // never matches a NULL key (so stale null rows would survive
    // every upsert) while the oracle's PARTITION BY groups all nulls
    // together — the engines would disagree. No current fixture has
    // null user_ids; the filter pins the contract regardless.
    val ev = Tables.events(s, dir).filter(col("user_id").isNotNull).select(
      col("user_id"), col("event_id"), col("ts_ms"),
      col("event_type"), col("value"), batch.as("batch"))
    val w = Window.partitionBy(col("user_id"), col("batch"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    // Persisted: three filtered upserts + the re-delivery would
    // otherwise each rescan events (the no-duplicated-subplan
    // discipline from the r10 audit). Bounded: ≤ |users|·K rows.
    val perBatch = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn").persist()
    try {
      val store = java.nio.file.Files
        .createTempDirectory("graft-replay-store").toString
      (0 until nBatches).foreach { k =>
        val applied = ServingStore.upsert(
          perBatch.filter(col("batch") === k).drop("batch"),
          store, "user_id", k.toLong)
        require(applied, s"replay batch $k must apply")
      }
      // Live idempotence: a re-delivered final batch (the foreachBatch
      // recovery path) must be a no-op under the high-water mark.
      require(!ServingStore.upsert(
        perBatch.filter(col("batch") === (nBatches - 1)).drop("batch"),
        store, "user_id", (nBatches - 1).toLong),
        "re-delivered batch must be skipped by the replay guard")
      ServingStore.read(s, store).orderBy("user_id")
    } finally perBatch.unpersist()
  }

  val storeReplaySql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
      |    ('0x' || substr(md5('replay' || event_id::VARCHAR), 1, 15))::BIGINT % 3 AS batch
      |  FROM events
      |  WHERE user_id IS NOT NULL
      |), ranked AS (
      |  SELECT user_id, event_id, ts_ms, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY batch DESC, ts_ms DESC, event_id DESC) AS rn
      |  FROM e
      |)
      |SELECT user_id, event_id, ts_ms, event_type, value
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id""".stripMargin
}
