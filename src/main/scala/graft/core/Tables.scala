package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All graft queries receive a scale-factor directory and pull tables
  * through here, so path conventions and read options live in one place.
  * At cluster scale the same API would point at a partitioned table root;
  * parquet scans keep column pruning + predicate pushdown intact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects ([PARQUET_TYPE_ILLEGAL]). The session must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (all graft entry points —
    * Bench, Verify, Probe, the test fixture — do so in their builders;
    * setting it here would be a hidden session-wide mutation whose effect
    * depends on call order). Exposed columns:
    *   - `ts_ns`  raw nanos since epoch (bit-exact, joins/sorts)
    *   - `ts_ms`  floor-divided millis (matches DuckDB `epoch_ms(ts)`)
    *   - `ts`     TimestampType truncated to micros (matches DuckDB
    *              `CAST(ts AS TIMESTAMP)` truncation for post-epoch data)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      // `div` = integral division; a double `/` would lose precision on
      // ~1.7e18 nanos (beyond double's 2^53 exact-integer range).
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
