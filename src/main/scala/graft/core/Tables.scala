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

  /** The events table's `ts` physical type has varied across fixture
    * generations: parquet TIMESTAMP(MICROS) without timezone (current
    * driver testdata — Spark reads TIMESTAMP_NTZ) or TIMESTAMP(NANOS)
    * (legacy, readable only as int64 via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which all graft entry
    * points still set — harmless for micros data). Spec fixtures also
    * write raw int64 nanos directly. This loader normalizes all of them
    * to one downstream contract:
    *   - `ts_ns`  int64 nanos since epoch (bit-exact, joins/sorts)
    *   - `ts_ms`  floor-divided millis (matches DuckDB `epoch_ms(ts)`)
    *   - `ts`     TimestampType micros under the UTC session timezone
    *              (matches DuckDB `CAST(ts AS TIMESTAMP)`)
    * The NTZ→instant cast is exact because every graft session pins
    * `spark.sql.session.timeZone=UTC`, so wall-clock == UTC instant and
    * `unix_micros` returns the stored micros — DuckDB's `epoch_ns(ts)`
    * is then exactly `ts_ns` (micros · 1000). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // Fail fast if an entry point forgot the UTC pin: the NTZ→instant
    // cast below silently shifts by the local offset otherwise.
    // Normalized comparison so equivalent ids ("Etc/UTC", "GMT",
    // "+00:00") — under which the cast was already exact — still pass.
    val tz = s.conf.get("spark.sql.session.timeZone")
    val isUtc = scala.util.Try(
      java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC).getOrElse(false)
    require(isUtc,
      s"graft.events requires a UTC session timezone (set by all graft builders), got '$tz'")
    val raw = load(s, d, "events")
    val tsNs = raw.schema("ts").dataType match {
      // Legacy int64-nanos (nanosAsLong or a spec fixture's raw long).
      case LongType => col("ts")
      // TIMESTAMP_NTZ / TIMESTAMP: exact under the pinned UTC session.
      case _ => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    }
    raw.withColumn("ts_ns", tsNs)
      // `div` = integral division; a double `/` would lose precision on
      // ~1.7e18 nanos (beyond double's 2^53 exact-integer range).
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
