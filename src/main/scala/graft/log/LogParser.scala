package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw-log-line parser (SURVEY.md §2.7 F1–F8; reference
  * `prepare_data_batch.ipynb:168-240,762-791`).
  *
  * Input: one string column (default `value`, as produced by
  * `spark.read.text`) holding lines shaped
  * `<yyMMdd> <HHmmss> <pid> <LEVEL> <component>: <message>` with an
  * optional `blk_<id>` token anywhere in the message.
  *
  * All fields are extracted with codegen'd `regexp_extract` — no UDFs —
  * so the parse stage stays inside whole-stage codegen and the narrow
  * projection after it lets Catalyst prune the raw column early. On a
  * 100 TB raw-log scan this is a single map stage: no shuffle, no
  * driver involvement, trivially parallel across file splits.
  */
object LogParser {

  /** `081109 203518` → 2008-11-09 20:35:18 (2-digit year, base 2000). */
  val TimestampFormat = "yyMMdd HHmmss"

  // tsRe/blockRe/restRe remain the DOCUMENTED regex contracts of the
  // r20 native kernels (graft.functions.LogLineExprs) — the oracle SQL
  // still uses them verbatim and LogLineKernelSpec pins kernel ≡ regex.
  private[graft] val tsRe   = "^(\\d{6}\\s+\\d{6})"
  private[graft] val restRe = "^\\d{6}\\s+\\d{6}\\s+"
  private val pidRe   = "^\\d{6}\\s+\\d{6}\\s+(\\d+)"
  private val levelRe = "\\b(INFO|WARN|ERROR|DEBUG|FATAL|TRACE)\\b"
  private val compRe  = "\\b(?:INFO|WARN|ERROR|DEBUG|FATAL|TRACE)\\s+([A-Za-z0-9$_.*]+):"
  private val msgRe   = "\\b(?:INFO|WARN|ERROR|DEBUG|FATAL|TRACE)\\s+[A-Za-z0-9$_.*]+:\\s*(.*)"
  private[graft] val blockRe = "(blk_[\\-0-9]+)"

  /** Parse a raw-lines frame into the canonical event schema. Unmatched
    * fields come back as `""` (regexp_extract semantics); rows without a
    * parseable timestamp get a NULL `datetime`. */
  def parse(raw: DataFrame, lineCol: String = "value"): DataFrame = {
    val line = col(lineCol)
    raw
      .withColumn("ts_raw", tsRawOf(line))
      .withColumn("pid", regexp_extract(line, pidRe, 1))
      .withColumn("level", regexp_extract(line, levelRe, 1))
      .withColumn("component", regexp_extract(line, compRe, 1))
      .withColumn("message", regexp_extract(line, msgRe, 1))
      .withColumn("block_id", blockOf(line))
      // try_to_timestamp, not to_timestamp: Spark 4 runs ANSI mode by
      // default, where a malformed timestamp THROWS and would kill the
      // whole scan on one bad log line. NULL-on-garbage matches the
      // reference (pandas errors="coerce", transform.py:29) and
      // Spark 3.2's legacy behavior. Found by LogPropertiesSpec.
      .withColumn("datetime", try_to_timestamp(col("ts_raw"), lit(TimestampFormat)))
      .withColumn("clean_line", cleanLine(line))
      .select("datetime", "pid", "level", "component", "message",
        "block_id", "clean_line")
  }

  /** Reference's "clean line": ISO-formatted timestamp + the rest of the
    * line with the original `yyMMdd HHmmss ` prefix stripped
    * (`prepare_data_batch.ipynb:787-791`). */
  def cleanLine(line: Column): Column =
    concat(
      date_format(
        try_to_timestamp(tsRawOf(line), lit(TimestampFormat)),
        "yyyy-MM-dd HH:mm:ss"),
      lit(" "),
      call_function("graft_log_rest", line))

  /** The `^(\d{6}\s+\d{6})` timestamp-prefix extraction as the NATIVE
    * byte-scan kernel (r20; exact regex twin —
    * `functions.LogLineExprs`, equivalence pinned by
    * LogLineKernelSpec). Requires a session built
    * `withExtensions(new GraftExtensions)` — all graft entry points
    * are. */
  def tsRawOf(line: Column): Column = call_function("graft_log_ts_raw", line)

  /** Keep only lines that belong to a block session (SURVEY P4). */
  def withBlock(parsed: DataFrame): DataFrame =
    parsed.filter(col("block_id") =!= "")

  /** The `message` field of ONE raw line as a scalar expression — the
    * exact `parse` extraction, usable inside higher-order-function
    * lambdas (the stream path's per-message local enrich iterates a
    * message's own lines without exploding them into rows). */
  def messageOf(line: Column): Column = regexp_extract(line, msgRe, 1)

  /** The `block_id` field of ONE raw line as a scalar expression —
    * the `parse` extraction; `""` when the line names no block (the
    * `withBlock` filter's condition, scalar form). Native byte-scan
    * kernel since r20 (exact regex twin; the unanchored `(blk_[\-0-9]+)`
    * find was the parse stage's hottest regex AND runs twice per line
    * — once in the pushed-down filter, once in the projection). */
  def blockOf(line: Column): Column = call_function("graft_log_block_id", line)
}
