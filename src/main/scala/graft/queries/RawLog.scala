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

  /** The scan→parse→filter prefix of q61/q62 as its own frame — the
    * bench's rawlog battery times it as a standalone stage (r19
    * verdict #1: parse-cost and page-cache attribution). */
  def parsedBlocksAt(s: SparkSession, log: String): DataFrame =
    parsedBlocks(s, log)

  /** q61's sessionize sub-pipeline (parse → exchange → aggregate)
    * WITHOUT the label join and final global sort — the bench stage
    * whose delta against q61_full prices exactly the join+sort leg. */
  def sessionsOnlyAt(s: SparkSession, log: String): DataFrame =
    Sessionize.sessions(parsedBlocks(s, log))

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

  /** The q61 sessionize rule text (`sess`), factored so the q189
    * stream-scored certificate splices the IDENTICAL message-payload
    * derivation (one rule text, two finals — the house discipline). */
  private def sessCte: String =
    s"""sess AS (
       |  SELECT block_id,
       |    strftime(min(datetime), '%Y-%m-%d %H:%M:%S') AS start_ts,
       |    strftime(max(datetime), '%Y-%m-%d %H:%M:%S') AS end_ts,
       |    CAST(epoch(max(datetime)) - epoch(min(datetime)) AS BIGINT) AS duration_sec,
       |    count(*) AS num_lines,
       |    string_agg(clean_line, chr(10) ORDER BY datetime, clean_line) AS log_full
       |  FROM blocks GROUP BY block_id
       |)""".stripMargin

  lazy val rawLogSessionsSql: String =
    s"""$parseCtes,
       |$sessCte
       |SELECT s.block_id, s.start_ts, s.end_ts, s.duration_sec, s.num_lines,
       |  s.log_full, l.label
       |FROM sess s LEFT JOIN labels l USING (block_id)
       |ORDER BY s.block_id""".stripMargin

  /** The q62 tag/count rule text (`tagged`, `feat`), factored so the
    * q189 stream-scored certificate splices the IDENTICAL per-block
    * feature derivation. */
  private lazy val taggedFeatCtes: String = {
    val caseChain = templateSeq.map { case (id, pattern) =>
      s"WHEN regexp_matches(message, '${sqlQuote(toRegexRe2(pattern))}') THEN '$id'"
    }.mkString("CASE ", " ", " END")
    val countCols = templateSeq.map { case (id, _) =>
      s"CAST(sum(CASE WHEN event_id = '$id' THEN 1 ELSE 0 END) AS BIGINT) AS $id"
    }.mkString(",\n    ")
    s"""tagged AS (
       |  SELECT block_id, $caseChain AS event_id FROM blocks
       |), feat AS (
       |  SELECT block_id,
       |    $countCols
       |  FROM tagged WHERE event_id IS NOT NULL GROUP BY block_id
       |)""".stripMargin
  }

  lazy val rawLogFeaturesSql: String =
    s"""$parseCtes,
       |$taggedFeatCtes
       |SELECT f.*, l.label
       |FROM feat f LEFT JOIN labels l USING (block_id)
       |ORDER BY f.block_id""".stripMargin

  // ---- q189: the stream scored path, oracle-certified end to end -----

  /** Pinned literal serving weights for [[streamScoredCertify]]: a
    * deterministic function of the template order ((i mod 5 − 2)/10,
    * bias −0.5 — the StreamBench stand-in, now certified). The
    * artifact-TRAINED scorers ride q34/q59; this row certifies the
    * SERVING algebra — per-message local features → literal-weight
    * sigmoid → the reference's 0.83 verdict (`kafka_consumer.py:35`)
    * — with weights the oracle can inline (the reference ships its
    * model as a file and inlines it into the consumer the same way,
    * `ML_predict.py:78-115`). */
  private[graft] lazy val streamScorerWeights: Seq[Double] =
    templateSeq.indices.map(i => (i % 5 - 2) * 0.1)
  private[graft] val StreamScorerBias = -0.5

  /** q189 — the SPEED LAYER's served enrichment, oracle-certified
    * (rows+schema+hash): q61's block sessions ARE the message
    * payloads the reference publishes to Kafka
    * (`kafka_producer.py:10-28` sends exactly these rows), and the
    * stream pipeline's per-message transform
    * ([[graft.streaming.StreamTransform.enrichLocal]] — the map-only
    * form `StreamPipeline.run` serves since r19) re-parses each
    * payload's own lines, counts the 29 templates through the native
    * kernel, and scores at 0.83. The oracle re-derives the whole
    * chain from the RAW LOG FILE in one statement — parse → q61's
    * sessionize rule → q62's tag/count rule (per-message local ≡
    * global grouping here because a session's `log_full` holds
    * exactly the lines whose extracted id IS its block — how `sess`
    * is grouped) → the literal-weight sigmoid and verdict. This
    * lifts ST3/A8–A9 from spec-certified to oracle-certified: the
    * exact frame the serving store ingests, hash-matched against an
    * independent engine. */
  def streamScoredCertify(s: SparkSession, dir: String): DataFrame = {
    val msgs = rawLogSessions(s, dir).select(
      col("block_id"),
      to_timestamp(col("start_ts")).as("start_ts"),
      to_timestamp(col("end_ts")).as("end_ts"),
      col("duration_sec"), col("log_full"), col("num_lines"))
    val templates = Templates.load(s, templatesPath)
    val scorer = graft.ml.Scorer.LinearScorer(
      streamScorerWeights, StreamScorerBias)
    graft.streaming.StreamTransform.enrichLocal(msgs, templates, scorer)
      .select(col("block_id"), col("num_lines"),
        array_join(col("features"), ",").as("features_csv"),
        round(col("proba"), 6).as("proba"),
        col("prediction"), col("ts_ms"))
      .orderBy("block_id")
  }

  lazy val rawLogStreamScoredSql: String = {
    val csv = templateSeq.map { case (id, _) =>
      s"CAST(COALESCE(f.$id, 0) AS VARCHAR)" }
      .mkString("concat_ws(',', ", ", ", ")")
    val zExpr = templateSeq.zip(streamScorerWeights).map {
      case ((id, _), w) => s"COALESCE(f.$id, 0) * ($w)" }
      .mkString(s"($StreamScorerBias) + ", " + ", "")
    s"""$parseCtes,
       |$sessCte,
       |$taggedFeatCtes,
       |z AS (
       |  SELECT s.block_id, s.num_lines, $csv AS features_csv,
       |    $zExpr AS z,
       |    epoch_ms(strptime(s.end_ts, '%Y-%m-%d %H:%M:%S')) AS ts_ms
       |  FROM sess s LEFT JOIN feat f USING (block_id))
       |SELECT block_id, num_lines, features_csv,
       |  round(1.0 / (1.0 + exp(-z)), 6) AS proba,
       |  CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.83
       |    THEN 1 ELSE 0 END AS INTEGER) AS prediction,
       |  ts_ms
       |FROM z ORDER BY block_id""".stripMargin
  }
}
