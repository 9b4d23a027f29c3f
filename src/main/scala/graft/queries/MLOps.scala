package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.log.Features
import graft.ml.Pipeline

/** The ML surface as a driver-checkable query (SURVEY.md §2.10).
  *
  * Not SQL-expressible (no LR trainer in the oracle), so this entry is
  * registered WITHOUT oracle SQL — the driver records the weaker
  * rows>0 check; the numeric contract is pinned by MLPipelineSpec
  * instead (scorer-vs-model parity to 1e-9, metric sanity).
  */
object MLOps {

  private val types = Seq("click", "error", "purchase", "signup", "view")

  /** M1–M6 end to end on the events table: per-user event-count
    * features, a scale-free derived label (error share ≥ 20%), class
    * weights, weighted LR (reference hyperparameters), and a confusion
    * summary of the threshold-0.83 expression scorer vs the label —
    * grouped small output so the driver can snapshot it. */
  def lrAnomaly(s: SparkSession, dir: String): DataFrame = {
    val pivot = LogOps.eventPivot(s, dir)
    // Cache the (small, aggregated) feature table: the indexer fit, the
    // class-weight aggregation, every LBFGS iteration and the final
    // summary would otherwise each re-run the events scan + pivot.
    // Same dataflow point the reference caches before fit.
    val labeled = pivot.withColumn("label",
      when(col("n_error") * 5 >= types.map(t => col(s"n_$t")).reduce(_ + _),
        "anomaly").otherwise("normal"))
      .cache()
    val indexed = Pipeline.indexLabel(labeled)
    val weighted = Features.withClassWeights(indexed, "label_index")
    // The training table is one aggregated row per user — thousands of
    // rows, not billions. Each LBFGS iteration is one job over it, so
    // 32 near-empty tasks × up to 200 iterations is pure scheduler
    // overhead; one partition per ~1M aggregated rows is the right
    // layout (scale the divisor, not the pattern, on a real cluster).
    val assembled = Pipeline.assemble(weighted, types.map(t => s"n_$t"))
      .coalesce(1).cache()
    val model = Pipeline.trainLR(assembled)
    val scorer = Pipeline.toScorer(model)
    val featuresArr = array(types.map(t => col(s"n_$t")): _*)
    weighted
      .withColumn("prediction", scorer.predict(featuresArr))
      .groupBy(col("label_index"), col("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label_index", "prediction")
  }
}
