package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixed stream-message schema and its JSON codec (SURVEY.md §1.1
  * "Stream message", §2.7 F16; reference `stream_data.py:35`,
  * `kafka_producer.py:12`, `transform.py:89-97`, `README.md:136-145`).
  *
  * The reference serializes a per-block session dict to JSON on the
  * producer side and `json.loads`es it per message on the consumer.
  * Spark-first both directions are single expressions — `to_json
  * (struct(*))` / `from_json(value, schema)` — that run codegen'd
  * inside the stream's map stage; the schema is explicit and fixed
  * (no inference on the hot path).
  */
object StreamMessages {

  /** `{block_id, start_ts, end_ts, duration_sec, log_full, num_lines}` —
    * the canonical block-session record in flight. */
  val schema: StructType = StructType(Seq(
    StructField("block_id", StringType),
    StructField("start_ts", TimestampType),
    StructField("end_ts", TimestampType),
    StructField("duration_sec", LongType),
    StructField("log_full", StringType),
    StructField("num_lines", LongType)))

  /** Kafka-shaped frame (`value` string column) → typed message frame.
    * Works identically on a streaming or a batch DataFrame. Malformed
    * JSON yields a NULL struct (from_json semantics) — dropped, the
    * stream equivalent of the reference's swallow-per-message error
    * handling (`kafka_consumer.py:39-40`), but observable as a count
    * rather than a print. */
  def parse(frame: DataFrame, valueCol: String = "value"): DataFrame =
    frame
      .select(from_json(col(valueCol), schema).as("m"))
      .filter(col("m").isNotNull && col("m.block_id").isNotNull)
      .select("m.*")

  /** Typed message frame → Kafka-shaped `value` JSON string column. */
  def toJson(messages: DataFrame): DataFrame =
    messages.select(to_json(struct(schema.fieldNames.map(col): _*)).as("value"))
}
