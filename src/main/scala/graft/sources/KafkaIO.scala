package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink wiring (SURVEY.md §2.1 S5/S6; reference
  * `kafka_producer.py:10-28`, `kafka_consumer.py:13-27` — topic
  * `log_stream_topic`, UTF-8 JSON values, `startingOffsets=latest`).
  *
  * These helpers only assemble the standard `format("kafka")` readers/
  * writers; the `spark-sql-kafka-0-10` connector package must be on the
  * cluster classpath at runtime (it is not bundled here — this
  * container has no broker, so the streaming tests drive the same
  * pipeline through MemoryStream instead; the pipeline itself is
  * source-agnostic, taking any `value`-column frame).
  */
object KafkaIO {

  val DefaultTopic = "log_stream_topic"

  /** True when the `spark-sql-kafka-0-10` connector is on the
    * classpath. The integration specs gate on this (plus a broker
    * address from the environment), so dropping the connector jar
    * into the jars dir auto-enables the live end-to-end tests with no
    * code change — and their absence skips them cleanly instead of
    * failing. */
  def connectorAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** S6: subscribe and expose the UTF-8 decoded `value` column —
    * feed to `StreamMessages.parse`. */
  def source(
      spark: SparkSession,
      brokers: String,
      topic: String = DefaultTopic,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))

  /** S5 (stream): JSON-serialize every row into `value` and write to
    * the topic. `acks=all` mirrors the reference producer. */
  def sink(
      df: DataFrame,
      brokers: String,
      topic: String = DefaultTopic,
      checkpointDir: String): DataStreamWriter[Row] =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("kafka.acks", "all")
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** S5 (batch): one-shot publish of a batch frame. */
  def publish(
      df: DataFrame,
      brokers: String,
      topic: String = DefaultTopic): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("kafka.acks", "all")
      .option("topic", topic)
      .save()
}
