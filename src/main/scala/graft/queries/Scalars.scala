package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar-function coverage (SURVEY.md §2.7): regex extraction, JSON
  * field access, datetime formatting/arithmetic, string building.
  * All codegen'd built-ins — no UDFs (the reference registers zero UDFs,
  * SURVEY §2.11; we keep the whole-stage-codegen property).
  */
object Scalars {

  /** F16 (JSON) + F1 (regex): pull int field `k` out of the JSON props
    * column with a regex (engine-portable), aggregate per event type.
    * `get_json_object` would be idiomatic Spark; regexp keeps the oracle
    * exactly equivalent. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    // Empty-match guard BEFORE the cast: regexp_extract returns "" on
    // no match, and under Spark 4's default ANSI mode casting "" to
    // long THROWS (same hazard class as the LogParser try_to_timestamp
    // fix). NULL-on-no-match also mirrors the oracle's NULLIF.
    val raw = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
    Tables.events(s, dir)
      .withColumn("k", when(raw === "", lit(null)).otherwise(raw).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
      | max(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** F6/F7 (datetime format) + A4: orders per calendar month. */
  def ordersPerMonth(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy("month")

  val ordersPerMonthSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      | count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY month
      |ORDER BY month""".stripMargin

  /** F8 (epoch arithmetic): per-user activity span in seconds —
    * the `duration_sec = cast(end) - cast(start)` semantics of the
    * reference's sessionize (prepare_data_batch.ipynb:845). */
  def userActivitySpan(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        (max(expr("ts_ns div 1000000000")) - min(expr("ts_ns div 1000000000"))).as("span_sec"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  val userActivitySpanSql: String =
    """SELECT user_id,
      | CAST(max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000) AS BIGINT) AS span_sec,
      | count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** F5/F9/F17 (string building, split, case fold): normalized doc key =
    * source + upper(lang), token count from whitespace split. */
  def docTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        concat_ws("#", col("source"), upper(col("lang"))).as("doc_key"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_text_chars"),
        col("n_chars"))
      .orderBy("doc_id")

  val docTokensSql: String =
    """SELECT doc_id,
      | concat_ws('#', source, upper(lang)) AS doc_key,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(length(text) AS BIGINT) AS n_text_chars,
      | n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
