package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.log.{Features, LogParser, Sessionize, Templates}

/** The production raw-log batch pipeline under the driver's DuckDB
  * oracle (SURVEY.md §3.1; reference `prepare_data_batch.ipynb:84-930`)
  * — the reference's single most important artifact, previously gated
  * only by GoldenBatchSpec:
  *
  *  - q61: raw text → parse (6 regexp_extracts) → sessionize by block
  *    → left-join anomaly labels — S1+F1–F8+F10–F14+A2+J2 end-to-end;
  *  - q62: raw text → parse → 29-template first-match tag → per-block
  *    E1..E29 count matrix → labels — F2/F3+A3+J1 end-to-end.
  *
  * Inputs are the committed synthesized fixture
  * (`data/hdfs_synth.log`, `data/hdfs_labels.csv` — see
  * `tools.MakeLogFixture`) and the reference's real 29-template
  * dimension, NOT the sf tables, so the oracle SQL reads them by
  * absolute path (`read_csv(..., delim='')` = line reader). The
  * DuckDB side re-implements the whole pipeline in SQL: same parse
  * regexes (RE2-compatible as written), and the template dimension
  * compiled to a CASE chain with RE2-safe quoting (`re2Quote` — Java's
  * `Pattern.quote` emits `\Q…\E`, which RE2 lacks). Both engines run
  * first-match-in-file-order, so even ambiguous messages agree.
  *
  * Timestamps cross the engine boundary as `yyyy-MM-dd HH:mm:ss`
  * strings (second precision is the log format's own), which also
  * oracle-certifies the F6 `date_format` path.
  */
object RawLog {

  /** Fixture root; driver-family env override for relocated checkouts. */
  def dataDir: String =
    sys.env.getOrElse("SPARK_GRAFT_DATA_DIR", "/root/repo/data")
  def logPath: String = s"$dataDir/hdfs_synth.log"
  def templatesPath: String = s"$dataDir/HDFS.log_templates.csv"
  def labelsPath: String = s"$dataDir/hdfs_labels.csv"

  private def labels(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").csv(path)
      .select(col("BlockId").as("block_id"), col("Label").as("label"))

  private def parsedBlocks(s: SparkSession, path: String): DataFrame =
    LogParser.withBlock(LogParser.parse(s.read.text(path)))

  /** q61: one row per block session, labels joined. */
  def rawLogSessions(s: SparkSession, dir: String): DataFrame =
    rawLogSessionsAt(s, logPath, labelsPath)

  /** q61's pipeline against arbitrary fixture paths — the same code
    * object the registry runs, reused by the raw-log SCALE bench
    * (`Bench`'s rawlog section) on the `MakeBigLogFixture` corpus. */
  def rawLogSessionsAt(s: SparkSession, log: String, lab: String): DataFrame =
    Sessionize.labeled(Sessionize.sessions(parsedBlocks(s, log)), labels(s, lab))
      .select(
        col("block_id"),
        date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        col("duration_sec"), col("num_lines"), col("log_full"), col("label"))
      .orderBy("block_id")

  /** q62: the E1..E29 feature matrix, labels joined. */
  def rawLogFeatures(s: SparkSession, dir: String): DataFrame =
    rawLogFeaturesAt(s, logPath, labelsPath)

  /** q62's pipeline against arbitrary fixture paths (see
    * [[rawLogSessionsAt]]). */
  def rawLogFeaturesAt(s: SparkSession, log: String, lab: String): DataFrame = {
    val templates = Templates.load(s, templatesPath)
    val tagged = Templates.tagNative(parsedBlocks(s, log), templates)
    Features.joinLabels(
        Features.eventCounts(tagged, templates.map(_.id)), labels(s, lab))
      .orderBy("block_id")
  }

  // ---- DuckDB oracle ----------------------------------------------------

  /** RE2-safe literal quoting (no `\Q…\E` in RE2). */
  private def re2Quote(s: String): String =
    s.flatMap(c =>
      if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) s"\\$c" else c.toString)

  /** Template → RE2 regex: quoted literal segments, `.*` in the holes —
    * the RE2 twin of `Templates.toRegex`. */
  def toRegexRe2(pattern: String): String =
    pattern.split("\\[\\*\\]", -1)
      .map(seg => if (seg.isEmpty) "" else re2Quote(seg))
      .mkString(".*")

  /** The template dimension, read WITHOUT a SparkSession (oracle SQL is
    * generated at `Verify` dump time on the driver). */
  private lazy val templateSeq: Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(templatesPath)
    try src.getLines().drop(1).map { l =>
      val i = l.indexOf(','); (l.substring(0, i), l.substring(i + 1))
    }.toList
    finally src.close()
  }

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** Shared parse CTEs: raw lines → parsed fields → block lines.
    * Interpolated into OUTER stripMargin blocks, so no continuation
    * line here may start with '|' (a leading '||' concat would lose a
    * pipe to the second margin strip). */
  private def parseCtes: String =
    s"""WITH raw AS (
       |  SELECT value FROM read_csv('${sqlQuote(logPath)}',
       |    columns={'value': 'VARCHAR'}, delim='', quote='', escape='', header=false)
       |), parsed AS (
       |  SELECT
       |    try_strptime(regexp_extract(value, '^(\\d{6}\\s+\\d{6})', 1), '%y%m%d %H%M%S') AS datetime,
       |    regexp_extract(value, '(blk_[\\-0-9]+)', 1) AS block_id,
       |    regexp_extract(value, '\\b(?:INFO|WARN|ERROR|DEBUG|FATAL|TRACE)\\s+[A-Za-z0-9$$_.*]+:\\s*(.*)', 1) AS message,
       |    strftime(try_strptime(regexp_extract(value, '^(\\d{6}\\s+\\d{6})', 1), '%y%m%d %H%M%S'), '%Y-%m-%d %H:%M:%S') ||
       |      ' ' || regexp_replace(value, '^\\d{6}\\s+\\d{6}\\s+', '') AS clean_line
       |  FROM raw
       |), blocks AS (
       |  SELECT * FROM parsed WHERE block_id <> ''
       |), labels AS (
       |  SELECT BlockId AS block_id, Label AS label
       |  FROM read_csv('${sqlQuote(labelsPath)}', header=true)
       |)""".stripMargin

  lazy val rawLogSessionsSql: String =
    s"""$parseCtes,
       |sess AS (
       |  SELECT block_id,
       |    strftime(min(datetime), '%Y-%m-%d %H:%M:%S') AS start_ts,
       |    strftime(max(datetime), '%Y-%m-%d %H:%M:%S') AS end_ts,
       |    CAST(epoch(max(datetime)) - epoch(min(datetime)) AS BIGINT) AS duration_sec,
       |    count(*) AS num_lines,
       |    string_agg(clean_line, chr(10) ORDER BY datetime, clean_line) AS log_full
       |  FROM blocks GROUP BY block_id
       |)
       |SELECT s.block_id, s.start_ts, s.end_ts, s.duration_sec, s.num_lines,
       |  s.log_full, l.label
       |FROM sess s LEFT JOIN labels l USING (block_id)
       |ORDER BY s.block_id""".stripMargin

  lazy val rawLogFeaturesSql: String = {
    val caseChain = templateSeq.map { case (id, pattern) =>
      s"WHEN regexp_matches(message, '${sqlQuote(toRegexRe2(pattern))}') THEN '$id'"
    }.mkString("CASE ", " ", " END")
    val countCols = templateSeq.map { case (id, _) =>
      s"CAST(sum(CASE WHEN event_id = '$id' THEN 1 ELSE 0 END) AS BIGINT) AS $id"
    }.mkString(",\n    ")
    s"""$parseCtes,
       |tagged AS (
       |  SELECT block_id, $caseChain AS event_id FROM blocks
       |), feat AS (
       |  SELECT block_id,
       |    $countCols
       |  FROM tagged WHERE event_id IS NOT NULL GROUP BY block_id
       |)
       |SELECT f.*, l.label
       |FROM feat f LEFT JOIN labels l USING (block_id)
       |ORDER BY f.block_id""".stripMargin
  }
}
