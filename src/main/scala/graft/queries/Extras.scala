package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Remaining SURVEY §2 operator shapes: prefix predicates (P10),
  * deterministic sampling (SA2), random row pick (W6), nulls-last
  * ordering (W3), best-effort parse (F20).
  *
  * Sampling note: `df.sample`/`rand(seed)` are reproducible within
  * Spark but not across engines, so the ORACLE-checked forms here use
  * a portable hash-mod Bernoulli (md5 of the key) — the same
  * deterministic-sampling trick production pipelines use to make
  * samples stable across reruns and engines. The native `sample`/
  * `rand` APIs are exercised in SamplingSpec.
  */
object Extras {

  /** P10: key-prefix scan — the reference's rowkey-prefix query
    * (`hbase_client.py:284-290`). `startsWith` pushes down to the
    * parquet scan as StringStartsWith; on a key-partitioned store the
    * same predicate prunes whole partitions. */
  def prefixFilter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_name").startsWith("Customer#00000001"))
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val prefixFilterSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_name LIKE 'Customer#00000001%'
      |ORDER BY c_custkey""".stripMargin

  private def hashBucket(key: org.apache.spark.sql.Column, salt: String) =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 100

  /** SA2 (portable form): deterministic ~10% Bernoulli sample by key
    * hash — engine-independent and stable under reruns/backfills. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id"), "s"))
      .filter(col("bucket") < 10)
      .select("doc_id", "bucket", "source")
      .orderBy("doc_id")

  val hashSampleSql: String =
    """SELECT doc_id,
      | ('0x' || substr(md5('s' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bucket,
      | source
      |FROM documents
      |WHERE ('0x' || substr(md5('s' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
      |ORDER BY doc_id""".stripMargin

  /** W6 (portable form): "random" single-row pick = global argmin of a
    * keyed hash — one TakeOrderedAndProject pass, deterministic across
    * engines (the reference's `random.randint` row pick,
    * `stream_data.py:39-44`). */
  def randomPick(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("h", hashBucket(col("doc_id"), "pick"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(1)
      .select("doc_id", "source", "n_chars")

  val randomPickSql: String =
    """SELECT doc_id, source, n_chars
      |FROM documents
      |ORDER BY ('0x' || substr(md5('pick' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 ASC,
      |  doc_id ASC
      |LIMIT 1""".stripMargin

  /** W3: nulls-last ascending sort — the reference's
    * `na_position="last"` (`transform.py:50`). The nullable column is
    * derived (value gated at 300) so both engines face real NULLs. */
  def nullsLastSort(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("gated", when(col("value") >= 300.0, col("value")))
      .orderBy(col("gated").asc_nulls_last, col("event_id").asc)
      .limit(50)
      .select("event_id", "gated", "user_id")

  val nullsLastSortSql: String =
    """SELECT event_id,
      | CASE WHEN value >= 300.0 THEN value END AS gated,
      | user_id
      |FROM events
      |ORDER BY gated ASC NULLS LAST, event_id ASC
      |LIMIT 50""".stripMargin

  /** F20: best-effort numeric parse — `try_cast` semantics at the read
    * boundary (the reference re-types stringly HBase values with
    * per-field try/except, `hbase_client.py:203-248`). Direct cast of
    * the JSON blob fails for every row (NULL, counted), the extracted
    * field parses; no exception either way. */
  def tryCastParse(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        expr("try_cast(props AS BIGINT)").as("direct"),
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT)").as("k"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("direct")).as("n_direct_parsed"),
        count(col("k")).as("n_k_parsed"),
        sum(col("k")).as("sum_k"))

  val tryCastParseSql: String =
    """SELECT count(*) AS n_rows,
      | count(try_cast(props AS BIGINT)) AS n_direct_parsed,
      | count(try_cast(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS n_k_parsed,
      | CAST(sum(try_cast(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events""".stripMargin
}
