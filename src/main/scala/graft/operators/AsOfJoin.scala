package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (temporal "latest right row at-or-before each
  * left row", per key).
  *
  * The naive forms both fail at 100 TB: an inequality join explodes
  * to a per-key cross product before filtering, and a correlated
  * "max right time ≤ t" subquery rescans the right side per left
  * row. The scalable classic is union + window: tag both sides,
  * union them into one (key, time)-stream, and take
  * `last(right_payload, ignoreNulls)` over a running window ordered
  * by (time, tag) — right rows sort before left rows at equal
  * timestamps, so "at-or-before" is inclusive. Cost: ONE shuffle of
  * left+right on the key (the window's partitionBy), no
  * amplification, and the window state is O(1) per row (a running
  * `last`, not a buffered frame). Skewed keys shard exactly like any
  * window — and the payload struct is the only extra byte-weight the
  * union carries.
  *
  * Rows on each side must be unique per (key, time) for a
  * deterministic answer (pre-aggregate the right side to enforce it
  * — same contract as DuckDB's ASOF JOIN, which this operator's
  * oracle uses).
  */
object AsOfJoin {

  /** For each row of `left`, append `payload` columns from the latest
    * `right` row with `right(rightTime) <= left(leftTime)` and
    * `right(rightKey) == left(leftKey)` (NULLs when no such row).
    * Time columns must be the same orderable type on both sides;
    * exact integer epochs beat timestamps (no sub-unit truncation
    * surprises). */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    val paySchema = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema.fields)
    val leftSchema = org.apache.spark.sql.types.StructType(left.schema.fields)
    val lu = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_tag"),
      struct(left.columns.map(col).toSeq: _*).as("_l"),
      lit(null).cast(paySchema).as("_r"))
    // NULL-key right rows can never match under join equality (the
    // DuckDB ASOF oracle's ON l.k = r.k), but Window.partitionBy
    // groups NULL keys into ONE partition — so drop them here, which
    // leaves NULL-key left rows alone in their partition and therefore
    // unmatched, exactly the join-semantics answer.
    val ru = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_tag"),
      lit(null).cast(leftSchema).as("_l"),
      struct(payload.map(col): _*).as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_l.*") +: payload.map(p => col(s"_match.$p").as(p)): _*)
  }
}
