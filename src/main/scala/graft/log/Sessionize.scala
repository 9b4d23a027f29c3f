package graft.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block sessionization (SURVEY.md §2.4 A2, §2.7 F8/F10–F14; reference
  * `prepare_data_batch.ipynb:811-866`).
  *
  * Groups parsed lines by `block_id` into one session row:
  * `block_id, start_ts, end_ts, duration_sec, log_full, num_lines`.
  *
  * Scale notes:
  *  - One hash aggregation = one shuffle keyed on `block_id`. Partial
  *    (map-side) aggregation applies to min/max/count; `collect_list`
  *    buffers per group — block sessions are bounded (tens of lines),
  *    so group state stays small even when the table is 100 TB.
  *  - `sort_array(collect_list(struct(ts, line)))` gives deterministic
  *    intra-session order without a separate window/sort stage — the
  *    reference's `collect_list` order is non-deterministic (SURVEY
  *    §7.4.2); we fix that by construction.
  *  - Skewed block ids (one giant session) would blow group state; for
  *    logs that can't happen by construction (a block has bounded
  *    lines), otherwise AQE skew handling + a salting pass applies.
  */
object Sessionize {

  /** parsed+filtered lines → one row per block session. */
  def sessions(lines: DataFrame): DataFrame =
    lines
      .groupBy(col("block_id"))
      .agg(
        min(col("datetime")).as("start_ts"),
        max(col("datetime")).as("end_ts"),
        count(lit(1)).as("num_lines"),
        sort_array(collect_list(struct(col("datetime"), col("clean_line"))))
          .as("lines"))
      .withColumn("log_full",
        array_join(transform(col("lines"), x => x.getField("clean_line")), "\n"))
      // Reference semantics: duration = long(end) - long(start), i.e.
      // whole seconds (prepare_data_batch.ipynb:845).
      .withColumn("duration_sec",
        col("end_ts").cast("long") - col("start_ts").cast("long"))
      .select("block_id", "start_ts", "end_ts", "duration_sec",
        "log_full", "num_lines")

  /** Left-join anomaly labels (SURVEY J2): `labels(block_id, label)`. */
  def labeled(sessions: DataFrame, labels: DataFrame): DataFrame =
    sessions.join(labels, Seq("block_id"), "left")
}
