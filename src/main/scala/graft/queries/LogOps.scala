package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.log.Templates

/** Log-domain operator shapes (SURVEY.md §2.4 A1–A3, §2.7 F2/F3)
  * exercised over the driver's testdata so the DuckDB oracle can gate
  * them: `events` plays the parsed-log-lines role (user_id ≈ block_id,
  * event_type ≈ event id), `documents.text` plays the message role for
  * template matching. The same code paths (`graft.log.*`) run on real
  * raw logs — see LogPipelineSpec.
  */
object LogOps {

  /** A2 sessionize: one row per "session" (user) with span, count and a
    * deterministic ordered trace. Single hash aggregation = one shuffle;
    * sort_array gives intra-group determinism without a window stage. */
  def sessionizeEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        (max(expr("ts_ms div 1000")) - min(expr("ts_ms div 1000")))
          .as("duration_sec"),
        count(lit(1)).as("num_events"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("ts_ns"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ",").as("trace"))
      .orderBy("user_id")

  val sessionizeEventsSql: String =
    """SELECT user_id,
      | min(epoch_ms(ts)) AS start_ms,
      | max(epoch_ms(ts)) AS end_ms,
      | CAST(max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000) AS BIGINT) AS duration_sec,
      | count(*) AS num_events,
      | string_agg(event_type, ',' ORDER BY ts, event_id) AS trace
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** F2/F3 template matching through graft.log.Templates: first match in
    * template order wins, compiled to one CASE of rlike branches. */
  private val docTemplates = Seq(
    Templates.Template("E1", "hash[*]join"),
    Templates.Template("E2", "sort[*]merge"),
    Templates.Template("E3", "window[*]scan"),
    Templates.Template("E4", "stream"))

  def templateMatchDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("event_id",
        coalesce(
          Templates.eventIdColumn(docTemplates, col("text")), lit("none")))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("event_id")

  val templateMatchDocsSql: String =
    """SELECT CASE
      |   WHEN regexp_matches(text, 'hash.*join') THEN 'E1'
      |   WHEN regexp_matches(text, 'sort.*merge') THEN 'E2'
      |   WHEN regexp_matches(text, 'window.*scan') THEN 'E3'
      |   WHEN regexp_matches(text, 'stream') THEN 'E4'
      |   ELSE 'none' END AS event_id,
      | count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY event_id
      |ORDER BY event_id""".stripMargin

  /** F2/F3 through the NATIVE codegen'd `TemplateMatch` expression
    * (graft.functions.TemplateMatch via GraftExtensions) — same
    * semantics and oracle as q22, different engine path: one
    * compile-once first-match loop per row instead of a CASE of rlike
    * branches. Green here certifies the custom Expression against the
    * same DuckDB truth as the built-in form. */
  def templateMatchNative(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("event_id",
        coalesce(
          Templates.eventIdColumnNative(docTemplates, col("text")), lit("none")))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("event_id")

  val templateMatchNativeSql: String = templateMatchDocsSql

  /** A3 feature matrix: wide per-key counts, one column per event type —
    * single-pass `sum(when(...))`, full map-side combine (the scalable
    * form of the reference's collect-then-count, SURVEY §7.4.2). */
  def eventPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val counts = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(counts.head, counts.tail: _*)
      .orderBy("user_id")
  }

  /** q60: UNPIVOT — melt the wide q23 feature matrix back to long
    * (user_id, event_type, n) form via `stack` (Spark's unpivot
    * generator; one map-side pass, rows fan out 5× with no shuffle).
    * The oracle is the DIRECT long-form aggregation over events, so a
    * green row set proves pivot→unpivot is a faithful round trip of
    * groupBy(user, type).count — the schema migration every feature
    * store does in both directions. Zero-count cells are dropped (the
    * long form never had them). */
  def eventUnpivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val stackArgs = types.map(t => s"'$t', n_$t").mkString(", ")
    eventPivot(s, dir)
      .select(col("user_id"),
        expr(s"stack(${types.length}, $stackArgs) AS (event_type, n)"))
      .filter(col("n") > 0)
      .orderBy("user_id", "event_type")
  }

  val eventUnpivotSql: String =
    """SELECT user_id, event_type, count(*) AS n
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** ST4 tumbling metrics, batch-equivalent form: the EXACT code path
    * the streaming layer runs (`StreamPipeline.metrics1m`) applied to
    * the events table — `err_1m`/`cnt_1m`/`p95_1m` per 1-minute window
    * (the reference's aspirational metrics schema,
    * `hbase_client.py:23-26`). Batch here, `withWatermark` + the same
    * aggregation on a stream; oracle-checking this row set certifies
    * the streaming aggregation logic too. */
  def tumblingMetrics(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamPipeline.metrics1m(
      Tables.events(s, dir), "ts",
      col("event_type") === "error", col("value"))
      .orderBy("minute_start_ms")

  val tumblingMetricsSql: String =
    """SELECT epoch_ms(date_trunc('minute', ts)) AS minute_start_ms,
      | count(*) AS cnt_1m,
      | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err_1m,
      | round(quantile_cont(value, 0.95), 6) AS p95_1m
      |FROM events
      |GROUP BY 1
      |ORDER BY minute_start_ms""".stripMargin

  /** q91 — metric anomaly detection over the 1-minute event counts:
    * flag minutes whose count deviates from the trailing 60-minute
    * window by more than 3 standard deviations — the dashboard alarm
    * the reference's anomaly product aspires to, expressed so it is
    * EXACT in both engines. The z-score test is rewritten in pure
    * integer arithmetic: with n prior counts, Σx and Σx² (exact BIGINT
    * sums), population σ² = (n·Σx² − (Σx)²)/n², so
    * `|x − μ| > 3σ` ⟺ `(n·x − Σx)² > 9·(n·Σx² − (Σx)²)`
    * (both sides scaled by n²) — no float mean, no float variance, no
    * summation-order drift, no sqrt; the comparison cannot differ by
    * a ulp because there are no ulps. Only full 60-minute windows are
    * scored (no warm-up partials). At 100 TB the counts frame is
    * already minute-grained (O(minutes) rows), so the window pass is
    * trivially cheap.
    *
    * Overflow posture: every term of the identity runs in
    * DECIMAL(38,0) — `cnt²` is cast BEFORE squaring, so no
    * intermediate ever computes in Long. Exact up to per-minute
    * counts of ~10¹⁷ (dev ≤ 61·max ⇒ dev² < 10³⁸, the decimal cap;
    * the output Long Σx hits 2⁶³ at the same order), eleven orders of magnitude above any real event rate; the
    * DuckDB oracle runs the same arithmetic in HUGEINT (int128,
    * exact to 1.7·10³⁸), so the engines agree exactly everywhere
    * below the cap. Beyond it both engines ERROR under their defaults
    * (Spark 4 ANSI decimal overflow, DuckDB HUGEINT overflow) — loud,
    * not a silent wrap like the previous all-Long form; under legacy
    * non-ANSI Spark the row would NULL out instead. The
    * AnomalyOverflowSpec pins the Long-overflowing region.
    *
    * One aggregation (minute counts) + one ordered window over the
    * minute frame — two shuffles of minute-cardinality rows. */
  def metricAnomalies(s: SparkSession, dir: String): DataFrame = {
    val perMin = Tables.events(s, dir)
      .groupBy((col("ts_ms") - pmod(col("ts_ms"), lit(60000L))).as("minute_start_ms"))
      .agg(count(lit(1)).as("cnt"))
    anomalyScore(perMin)
  }

  /** The 3σ integer-identity test over a (minute_start_ms, cnt) frame —
    * factored out of q91 so the overflow regression spec can feed it
    * synthetic counts in the Long-overflowing region. */
  private[graft] def anomalyScore(perMin: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val trailing = Window.orderBy(col("minute_start_ms"))
      .rowsBetween(-60, -1)
    val scored = perMin.select(
      col("minute_start_ms"), col("cnt"),
      count(col("cnt")).over(trailing).as("n_win"),
      sum(col("cnt")).over(trailing).as("sx"),
      sum(col("cnt").cast(dec) * col("cnt").cast(dec)).over(trailing).as("sxx"))
    scored
      .filter(col("n_win") === 60)
      .filter({
        val dev = col("n_win").cast(dec) * col("cnt").cast(dec) - col("sx").cast(dec)
        dev * dev >
          lit(9L).cast(dec) * (col("n_win").cast(dec) * col("sxx") -
            col("sx").cast(dec) * col("sx").cast(dec))
      })
      .select(col("minute_start_ms"), col("cnt"), col("sx").as("sum_prev_60"))
      .orderBy("minute_start_ms")
  }

  val metricAnomaliesSql: String =
    """WITH m AS (
      |  SELECT epoch_ms(ts) - epoch_ms(ts) % 60000 AS minute_start_ms,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1),
      |w AS (
      |  -- arithmetic in HUGEINT (int128): exact wherever Spark's
      |  -- DECIMAL(38,0) form is, no silent wrap (see Scaladoc)
      |  SELECT minute_start_ms, cnt,
      |    count(cnt) OVER tw AS n_win,
      |    CAST(sum(CAST(cnt AS HUGEINT)) OVER tw AS HUGEINT) AS sx,
      |    CAST(sum(CAST(cnt AS HUGEINT) * cnt) OVER tw AS HUGEINT) AS sxx
      |  FROM m
      |  WINDOW tw AS (ORDER BY minute_start_ms
      |                ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING))
      |SELECT minute_start_ms, cnt, CAST(sx AS BIGINT) AS sum_prev_60
      |FROM w
      |WHERE n_win = 60
      |  AND (CAST(n_win AS HUGEINT) * cnt - sx) * (CAST(n_win AS HUGEINT) * cnt - sx)
      |      > 9 * (CAST(n_win AS HUGEINT) * sxx - sx * sx)
      |ORDER BY minute_start_ms""".stripMargin

  /** q96 — cohort retention: users bucketed by first-seen day, then
    * each (cohort, day-offset) cell counts the cohort members active
    * that day — the standard product-analytics retention matrix, and
    * the dashboard aggregate the reference's serving layer would back.
    *
    * Exactness: retention is reported in ppm by INTEGER floor division
    * (`n·10⁶ div size` / DuckDB `//`) — no float ratio to drift a ulp
    * between engines. Plan: ONE user-keyed aggregation computes each
    * user's cohort day AND distinct active-day set together (the set
    * is bounded by the calendar — days per user, not events — so the
    * buffer is O(observation window)); exploding it yields
    * already-distinct (cohort, offset) rows, so the matrix is a plain
    * count. The cohort SIZE needs no second pass at all: every member
    * is by definition active on its cohort day, so the day-offset-0
    * cell already holds it — a window max over the O(days²) matrix
    * reads it back, keeping the whole query to a single event-grained
    * exchange (a `sizes = users.groupBy(...)` branch would re-evaluate
    * the user aggregation — Spark has no common-subplan reuse across
    * differently-pruned branches, the q64 lesson). */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      // pmod-floor day bucketing, NOT bare `div`: `div` truncates
      // toward zero while DuckDB `//` floors, so a pre-epoch (corrupt/
      // sentinel) timestamp would land in different days per engine.
      // Subtracting the non-negative pmod first makes the numerator an
      // exact multiple, so the division IS floor — the q91 posture.
      .select(col("user_id"),
        expr("(ts_ms - pmod(ts_ms, 86400000)) div 86400000").as("day"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"),
        collect_set(col("day")).as("days"))
    val cells = users
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
    val byCohort = Window.partitionBy(col("cohort_day"))
    cells
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0L, col("n_users"))).over(byCohort))
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        col("cohort_size"),
        expr("(n_users * 1000000) div cohort_size").as("retention_ppm"))
      .orderBy("cohort_day", "day_offset")
  }

  val cohortRetentionSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day
      |  FROM events WHERE user_id IS NOT NULL),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT e.user_id, f.cohort_day, e.day - f.cohort_day AS day_offset
      |  FROM e JOIN f USING (user_id)),
      |h AS (
      |  SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
      |  FROM a GROUP BY cohort_day, day_offset),
      |sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM f GROUP BY cohort_day)
      |SELECT h.cohort_day, h.day_offset, h.n_users, sz.cohort_size,
      |  (h.n_users * 1000000) // sz.cohort_size AS retention_ppm
      |FROM h JOIN sz USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** q84 — ST6's declarative form under the oracle: gap-based session
    * windows (`StreamOps.gapSessions`, the built-in `session_window`
    * aggregation) applied to the events table in batch. A session
    * extends while a user's events keep arriving within 30 minutes of
    * the previous one and closes 30 minutes after the last; the SAME
    * code runs streaming with a watermark (StreamOpsSpec), so
    * oracle-checking the batch rows certifies the streaming session
    * semantics too — exactly the q33 pattern, session edition.
    *
    * The DuckDB oracle is the classic island detection: a new session
    * starts when `ts >= prev_ts + gap` (matching Spark's merge rule —
    * per-event windows `[ts, ts+gap)` merge only when they OVERLAP),
    * session id = running sum of the starts, then min/max+gap per
    * island. Both engines compare at microsecond precision (Spark
    * truncates ns→µs via `timestamp_micros`, DuckDB truncates ns
    * parquet the same way), and the ms outputs floor identically.
    *
    * Scale shape: one shuffle by user + in-partition sort — the same
    * cost as any sessionization; state on the streaming side is
    * watermark-bounded. */
  def gapSessions(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.gapSessions(
      Tables.events(s, dir), "user_id", "ts", "30 minutes")
      .orderBy("user_id", "session_start_ms")

  val gapSessionsSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
      |           OR lag(ts) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |ids AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  epoch_ms(min(ts)) AS session_start_ms,
      |  epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS session_end_ms,
      |  count(*) AS n_events
      |FROM ids
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start_ms""".stripMargin

  val eventPivotSql: String =
    """SELECT user_id,
      | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q114: time-spine gap fill + LOCF ------------------------------

  /** q114 — per-user daily time-series densification: build each
    * user's complete day spine (min to max active day), mark the days
    * with no events, and carry the last observed daily value sum
    * forward (LOCF) — the gap-fill every downstream
    * per-entity-per-period model (retention, LTV, anomaly baselines)
    * needs before it can difference or window anything. Days are exact
    * epoch-day integers (the q91/q96 pmod-floor bucketing — no DATE
    * type at the oracle boundary).
    *
    * Scale shape: ONE aggregation reduces events to (user, day) grain
    * — after that everything is per-user-period rows, corpus-free. The
    * spine is `sequence` + `explode` per user (bounded by the span,
    * not the event count), the fill join is key-partitioned on
    * (user, day), and LOCF is a running `last(ignoreNulls)` window per
    * user — O(1) state, no skew beyond the per-user span. The double
    * sum is rounded at the boundary only AFTER the carry (the q01/q03
    * reassociation posture). */
  def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("(ts_ms - pmod(ts_ms, 86400000)) div 86400000").as("day"),
        col("value"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("filled"),
        round(last(col("v"), ignoreNulls = true).over(byUser), 2)
          .as("locf_value"))
      .orderBy("user_id", "day")
  }

  val gapFillDailySql: String =
    """WITH d AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |    count(*) AS n, sum(value) AS v
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
      |sp AS (
      |  SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
      |  FROM d GROUP BY user_id),
      |j AS (
      |  SELECT sp.user_id, sp.day, d.n, d.v
      |  FROM sp LEFT JOIN d USING (user_id, day)),
      |f AS (
      |  SELECT user_id, day, coalesce(n, 0) AS n_events, (n IS NULL) AS filled,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
      |  FROM j)
      |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events, filled,
      |  round(locf, 2) AS locf_value
      |FROM f
      |ORDER BY user_id, day""".stripMargin

  // ---- q115: ordered funnel ------------------------------------------

  /** The funnel's overall window: each later step must land within
    * 7 days of the user's FIRST view. Nanosecond integers — exact. */
  private val FunnelWindowNs = 7L * 86400L * 1000000000L

  /** q115 — ordered three-step funnel (view → click → purchase): a
    * user converts step n only with an event STRICTLY after their
    * step-(n−1) time and within [[FunnelWindowNs]] of their first
    * view — the product-analytics staple that needs event ORDER, not
    * just presence (contrast q23's per-user counts). One summary row:
    * per-step converted-user counts and exact ppm conversion rates
    * (the q96 integer-division idiom; every compared quantity is an
    * int64 nanosecond or a count — no float near a predicate).
    *
    * Scale shape: three conditional min-aggregations at user grain,
    * each chained through an equi-join on user_id against the previous
    * step's (already user-grain, i.e. corpus-reduced) frame — the scan
    * is filtered to one event type before each join, so no step ever
    * shuffles the full event log, and the final counts reduce to one
    * row. The 1×1 crossJoins assembling the summary are constant-cost
    * (the q55/q57 denominator idiom). */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_ns") > col("t_view") &&
        col("ts_ns") <= col("t_view") + lit(FunnelWindowNs))
      .groupBy("user_id").agg(min("ts_ns").as("t_click"), min("t_view").as("t_view"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts_ns") > col("t_click") &&
        col("ts_ns") <= col("t_view") + lit(FunnelWindowNs))
      .groupBy("user_id").agg(min("ts_ns").as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      .select(
        col("n_view"), col("n_click"), col("n_purchase"),
        when(col("n_view") === 0, lit(null))
          .otherwise(expr("(n_click * 1000000) div n_view"))
          .as("view_to_click_ppm"),
        when(col("n_click") === 0, lit(null))
          .otherwise(expr("(n_purchase * 1000000) div n_click"))
          .as("click_to_purchase_ppm"))
  }

  val funnelSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ns(ts) AS ts_ns
       |  FROM events WHERE user_id IS NOT NULL),
       |v AS (
       |  SELECT user_id, min(ts_ns) AS t_view
       |  FROM e WHERE event_type = 'view' GROUP BY 1),
       |c AS (
       |  SELECT e.user_id, min(e.ts_ns) AS t_click, min(v.t_view) AS t_view
       |  FROM e JOIN v USING (user_id)
       |  WHERE e.event_type = 'click' AND e.ts_ns > v.t_view
       |    AND e.ts_ns <= v.t_view + $FunnelWindowNs
       |  GROUP BY 1),
       |p AS (
       |  SELECT e.user_id, min(e.ts_ns) AS t_purchase
       |  FROM e JOIN c USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.ts_ns > c.t_click
       |    AND e.ts_ns <= c.t_view + $FunnelWindowNs
       |  GROUP BY 1),
       |n AS (
       |  SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
       |    (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
       |    (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase)
       |SELECT n_view, n_click, n_purchase,
       |  CASE WHEN n_view = 0 THEN NULL
       |    ELSE (n_click * 1000000) // n_view END AS view_to_click_ppm,
       |  CASE WHEN n_click = 0 THEN NULL
       |    ELSE (n_purchase * 1000000) // n_click END AS click_to_purchase_ppm
       |FROM n""".stripMargin

  // ---- q121: event transition matrix ---------------------------------

  /** q121 — the first-order Markov transition matrix over per-user
    * event streams: for each consecutive event pair within a user's
    * timeline, count (src → dst) and its share of all transitions out
    * of src in exact ppm (the funnel's q115 integer-division idiom —
    * no float probabilities near the oracle). This is the "how do
    * users actually move" table behind journey diagrams, next-event
    * priors, and anomaly heuristics (a transition whose ppm collapses
    * between releases is a broken flow).
    *
    * Ordering is total and deterministic: (ts_ns, event_id) — two
    * events in the same nanosecond can't flip the matrix between runs
    * or engines.
    *
    * Scale shape: ONE shuffle on user_id for the lead() window (the
    * q21 sessionize partitioning — at 100 TB the log is already
    * bucketed by user/block for exactly these passes), then a
    * map-side-combined aggregation on (src, dst) whose group count is
    * |event_type|² — constant, regardless of corpus size. The ppm
    * normalization runs on that constant-size matrix, not on data. */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val perSrc = Window.partitionBy(col("src_type"))
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byTime))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("next_type").as("dst_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_src", sum(col("n")).over(perSrc))
      .select(col("src_type"), col("dst_type"), col("n"),
        expr("(n * 1000000) div n_src").as("ppm"))
      .orderBy("src_type", "dst_type")
  }

  // ---- q132: inter-event gap quantiles -------------------------------

  /** q132 — latency/cadence profiling: per event type, the
    * distribution of inter-arrival gaps within a user's stream of
    * that type — count, lower median, and p90, all RANK-EXACT (the
    * value at row_number (n+1) div 2 resp. ceil(9n/10) of the sorted
    * gaps) rather than interpolated: engines disagree on percentile
    * interpolation rules, but the value at a rank in a sorted
    * multiset is engine-independent even under row_number tie
    * shuffling (equal gaps at the boundary carry the same value).
    * This is the table a pipeline owner reads to set session gaps
    * (q21/q84), watermarks (ST5), and poll budgets.
    *
    * Scale: one (user, type)-keyed window computes gaps (the
    * sessionize partitioning), one type-keyed rank window over the
    * gap rows, one aggregation. Gap rows ≈ event rows; nothing
    * quadratic, no driver collection. */
  def gapQuantiles(s: SparkSession, dir: String): DataFrame = {
    val byStream = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byStream))
      .filter(col("prev_ns").isNotNull)
      .select(col("event_type"),
        expr("(ts_ns - prev_ns) div 1000000").as("gap_ms"))
    val counts = gaps.groupBy("event_type").agg(count(lit(1)).as("n_gaps"))
    val byGap = Window.partitionBy(col("event_type")).orderBy(col("gap_ms"))
    gaps.join(broadcast(counts), Seq("event_type"))
      .withColumn("rk", row_number().over(byGap).cast("long"))
      .groupBy("event_type")
      .agg(
        max(col("n_gaps")).as("n_gaps"),
        max(when(col("rk") === expr("(n_gaps + 1) div 2"), col("gap_ms")))
          .as("median_gap_ms"),
        max(when(col("rk") === expr("(9 * n_gaps + 9) div 10"), col("gap_ms")))
          .as("p90_gap_ms"))
      .orderBy("event_type")
  }

  val gapQuantilesSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns
      |  FROM events WHERE user_id IS NOT NULL),
      |g AS (
      |  SELECT event_type,
      |    (ts_ns - lag(ts_ns) OVER (PARTITION BY user_id, event_type
      |                              ORDER BY ts_ns, event_id)) // 1000000 AS gap_ms
      |  FROM e),
      |gg AS (SELECT event_type, gap_ms FROM g WHERE gap_ms IS NOT NULL),
      |c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps
      |      FROM gg GROUP BY event_type),
      |r AS (
      |  SELECT gg.event_type, gg.gap_ms, c.n_gaps,
      |    row_number() OVER (PARTITION BY gg.event_type ORDER BY gg.gap_ms) AS rk
      |  FROM gg JOIN c USING (event_type))
      |SELECT event_type, max(n_gaps) AS n_gaps,
      |  max(CASE WHEN rk = (n_gaps + 1) // 2 THEN gap_ms END) AS median_gap_ms,
      |  max(CASE WHEN rk = (9 * n_gaps + 9) // 10 THEN gap_ms END) AS p90_gap_ms
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val transitionMatrixSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns
      |  FROM events WHERE user_id IS NOT NULL),
      |p AS (
      |  SELECT event_type AS src_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts_ns, event_id) AS dst_type
      |  FROM e),
      |c AS (
      |  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE dst_type IS NOT NULL
      |  GROUP BY src_type, dst_type)
      |SELECT src_type, dst_type, n,
      |  (n * 1000000) // CAST(sum(n) OVER (PARTITION BY src_type) AS BIGINT) AS ppm
      |FROM c
      |ORDER BY src_type, dst_type""".stripMargin
}
