package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The production batch layer, end to end (SURVEY.md §3.1; reference
  * `prepare_data_batch.ipynb` cells 2–32): raw log file → parse →
  * template match → per-block features ⋈ labels, and raw → sessionize
  * ⋈ labels — the two outputs the reference writes to HDFS.
  *
  * This is the real `spark.read.text` entry (S1): a production caller
  * points it at an HDFS/S3 path glob and the whole flow is two scans
  * of the raw text (features pass + session pass, exactly the
  * reference's structure but each pass is parse → single keyed
  * aggregation → broadcast-joined labels: scan-parallel, one shuffle
  * per output, no driver loops).
  */
object BatchPipeline {

  /** Both batch outputs from a raw log path. `labels` is the
    * `(block_id, label)` dimension (anomaly_label.csv in the
    * reference); `templatesPath` the `EventId,EventTemplate` CSV. */
  def run(
      spark: SparkSession,
      logPath: String,
      templatesPath: String,
      labels: DataFrame): (DataFrame, DataFrame) = {
    val templates = Templates.load(spark, templatesPath)
    val parsed = LogParser.withBlock(LogParser.parse(spark.read.text(logPath)))
    val tagged = Templates.tagNative(parsed, templates)
    val features = Features.joinLabels(
      Features.eventCounts(tagged, templates.map(_.id)), labels)
    val sessions = Sessionize.labeled(Sessionize.sessions(parsed), labels)
    (features, sessions)
  }
}
