package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The documented at-scale decile swap (round-13 verdict #4).
  *
  * q117/q123/q131 assign exact global (or per-source) rank deciles via
  * `row_number` over an unpartitioned window — required for the DuckDB
  * oracle (exact to the last row) but single-partition at corpus
  * scale. The documented 100 TB form is: ONE pass computes the 9
  * decile EDGES with `percentile_approx` (a mergeable Greenwald-Khanna
  * sketch — map-side partials, constant driver state), then a
  * MAP-ONLY bucket assignment compares each row against the 9
  * broadcast edges. No global sort, no single-partition window,
  * identical downstream aggregation.
  *
  * This object makes that swap EXECUTABLE behind a session flag
  * ([[ApproxConf]], default off): the registered queries keep the
  * exact rank form as their oracle contract, flip the flag and the
  * same query plans the sketch form. `DecileSwapSpec` certifies
  * bucket-assignment agreement within the sketch's published error
  * bound (rank error ≤ n/accuracy ⇒ every row lands in its exact
  * bucket or an adjacent one; at accuracy 10⁴ and fixture n the edges
  * are exact, so only rows TIED with an edge score may differ — the
  * rank form splits score-ties across buckets by doc_id, the bucket
  * form keeps equal scores together, which is the defensible at-scale
  * semantics).
  */
object Deciles {

  /** Session flag: `spark.graft.decile.approx = true` plans the
    * sketch-edge decile in q117/q123 instead of the exact rank. */
  val ApproxConf = "spark.graft.decile.approx"

  /** GK sketch accuracy: rank error ≤ n / Accuracy. */
  val Accuracy = 10000

  def useApprox(s: SparkSession): Boolean =
    s.conf.getOption(ApproxConf).exists(_.equalsIgnoreCase("true"))

  /** Add DESC-ordered decile `as` of `score` (0 = top 10%): approx
    * edges at p10..p90 + map-only strict-greater bucketing. A row
    * above the p90 edge sees 0 edges greater → decile 0; below the
    * p10 edge all 9 → decile 9. Equal-score rows always share a
    * bucket. */
  def withApproxDescDecile(df: DataFrame, score: String,
      as: String = "decile"): DataFrame = {
    val edges = df.agg(percentile_approx(col(score),
      array((1 to 9).map(i => lit(i / 10.0)): _*), lit(Accuracy)).as("__edges"))
    df.crossJoin(broadcast(edges))
      .withColumn(as,
        size(filter(col("__edges"), e => e > col(score))).cast("long"))
      .drop("__edges")
  }

  /** Per-group variant — the q131 at-scale form: edges per `group`
    * (one map-side-combined sketch aggregation, |groups| rows), then
    * the same map-only bucketing after a broadcast join. */
  def withApproxDescDecileBy(df: DataFrame, group: String, score: String,
      as: String = "decile"): DataFrame = {
    val edges = df.groupBy(group).agg(percentile_approx(col(score),
      array((1 to 9).map(i => lit(i / 10.0)): _*), lit(Accuracy)).as("__edges"))
    df.join(broadcast(edges), Seq(group))
      .withColumn(as,
        size(filter(col("__edges"), e => e > col(score))).cast("long"))
      .drop("__edges")
  }

  /** Exact DESC rank decile over `n` — the reference form the spec
    * compares against (the q117/q123 window, factored). */
  private[queries] def withExactDescDecile(df: DataFrame, score: String,
      tie: String, as: String = "decile"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(score).desc, col(tie).asc)
    df.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__n"))))
      .withColumn(as, expr(s"((__rk - 1) * 10) div __n"))
      .drop("__rk", "__n")
  }
}
