package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-count feature matrix + train/test machinery (SURVEY.md §2.4
  * A1/A3/A11, §2.3 J1/J3/J4, §2.6 SA1/SA2; reference
  * `prepare_data_batch.ipynb:345-420,580-607`).
  *
  * The reference builds features in two passes (collect_list into an
  * array, then 29 `aggregate(filter(...))` columns over it). We count
  * directly in the aggregation — `sum(when(event_id = Ei, 1))` per
  * template — which is a single shuffle with full map-side combine and
  * no per-group array state: strictly better at scale, identical
  * results (counts are order-invariant, SURVEY §7.4.2).
  */
object Features {

  /** Wide per-block event counts: one `Ei` int column per template id.
    *
    * Two-phase on purpose. A single wide `sum(when(event_id = Ei, …))`
    * aggregation looks tighter but is a plan pathology: CollapseProject
    * inlines the derived `event_id` — a 29-branch CASE of rlike — into
    * every one of the 29 aggregate expressions, so the plan carries
    * 29×29 regex nodes (measured: 20 s at 9k rows, pure planning/
    * codegen blow-up). Phase 1 groups by `(block_id, event_id)` so the
    * CASE is evaluated ONCE per row inside the grouping key, with full
    * map-side combine; phase 2 pivots the tiny long-form frame
    * (blocks × ≤29 rows) to wide with cheap literal comparisons. */
  def eventCounts(tagged: DataFrame, templateIds: Seq[String]): DataFrame = {
    val long = tagged
      .filter(col("event_id").isNotNull)
      .groupBy(col("block_id"), col("event_id"))
      .agg(count(lit(1)).as("n"))
    val counts: Seq[Column] = templateIds.map { id =>
      sum(when(col("event_id") === id, col("n")).otherwise(0L)).cast("int").as(id)
    }
    long.groupBy(col("block_id")).agg(counts.head, counts.tail: _*)
  }

  /** Deterministic per-block event trace (reference A1, made stable by
    * sorting on (datetime, event_id)). */
  def eventTraces(tagged: DataFrame): DataFrame =
    tagged
      .filter(col("event_id").isNotNull)
      .groupBy(col("block_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("datetime"), col("event_id")))),
        x => x.getField("event_id")).as("event_sequence"))

  /** J1: features ⋈ labels, left. 1:1 on block_id → plain shuffle join;
    * Catalyst broadcasts automatically when the label side is small. */
  def joinLabels(features: DataFrame, labels: DataFrame): DataFrame =
    features.join(labels, Seq("block_id"), "left")

  /** SA1 + J3: stratified test split by label column, train = complement
    * via left-anti on the key. */
  def stratifiedSplit(df: DataFrame, labelCol: String, keyCol: String,
      fraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val labels = df.select(labelCol).distinct().collect().map(_.get(0))
    val fractions = labels.map(l => l -> fraction).toMap
    val test = df.stat.sampleBy(labelCol, fractions, seed)
    val train = df.join(test.select(keyCol), Seq(keyCol), "left_anti")
    (train, test)
  }

  /** SA3: stratified 60/20/20 three-way split (reference
    * `XGBoot.ipynb` cell 10, sklearn `train_test_split(stratify=y)`
    * applied twice): test = 20% stratified sample, valid = 25% of the
    * remainder (= 20% overall), train = the rest. Disjoint by
    * construction (anti-joins on the key). */
  def stratifiedSplit3(df: DataFrame, labelCol: String, keyCol: String,
      seed: Long): (DataFrame, DataFrame, DataFrame) = {
    val (rest, test) = stratifiedSplit(df, labelCol, keyCol, 0.2, seed)
    val (train, valid) = stratifiedSplit(rest, labelCol, keyCol, 0.25, seed + 1)
    (train, valid, test)
  }

  /** A11 + J4: balanced class weights `N / (K * n_class)` joined back on
    * the label column (broadcast — the weight dim has K rows).
    *
    * Action-free: `N` and `K` come from an unbounded window over the
    * K-row counts frame instead of two driver `first()`/`count()`
    * round-trips, so the whole derivation stays one lazy plan (two
    * fewer blocking jobs on the q34 path). The whole-frame window
    * collapses only the counts dim — K rows — never the input. */
  def withClassWeights(df: DataFrame, labelCol: String,
      weightCol: String = "weight"): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val all = Window.partitionBy()
    val weights = counts.withColumn(
        weightCol,
        sum(col("n")).over(all).cast("double") /
          (count(lit(1)).over(all) * col("n")))
      .drop("n")
    df.join(broadcast(weights), Seq(labelCol), "left")
  }

  /** SA1 (portable, exact form): per-stratum sample of EXACTLY
    * `floor(fraction * |stratum|)` rows, chosen by ascending md5 of the
    * key — deterministic across engines, reruns, and backfills (the
    * property `sampleBy`'s per-row Bernoulli draw lacks: its sample
    * SIZE varies run to run at the same seed across Spark versions,
    * and no external system can reproduce it). One shuffle on the
    * stratum column; the rank window streams each stratum, so state is
    * O(1) per row. Skew note: a single giant stratum serializes into
    * one task — for heavy-tailed strata prefer the hash-threshold
    * Bernoulli (`Extras.hashSample` per stratum), which is map-only at
    * the cost of approximate counts. */
  def hashStratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      fraction: Double, salt: String): DataFrame =
    hashStratifiedTake(df, stratumCol, keyCol,
      floor(lit(fraction) *
        count(lit(1)).over(Window.partitionBy(col(stratumCol)))), salt)

  /** SA3 in exact-fraction deterministic form: assign EVERY row to
    * train/valid/test (60/20/20) inside its label stratum by keyed-md5
    * rank — the oracle-able counterpart of `stratifiedSplit3` (whose
    * `sampleBy` draw is Bernoulli and engine-private). Proportions are
    * exact per stratum (`floor` arithmetic, same in any engine),
    * assignment is a pure function of (salt, key) — rerun-stable and
    * backfill-safe — and the three splits are disjoint-exhaustive by
    * construction (one CASE over one rank, no anti-joins). Cost: one
    * stratum-keyed shuffle, rank window streaming with O(1) state.
    *
    * PRECONDITION: `keyCol` must be unique per row — it IS the
    * identity the assignment is a function of. Duplicate keys tie on
    * the full (hash, key) sort key, so their relative rank is
    * engine-arbitrary and a floor cut falling between them would
    * assign the duplicates nondeterministically. Callers with
    * non-unique business keys should pass a composite key column. */
  def hashSplit3(df: DataFrame, stratumCol: String, keyCol: String,
      salt: String, splitCol: String = "split"): DataFrame = {
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val rnC = fresh("__graft_rn")
    val cntC = fresh("__graft_cnt")
    val h = graft.functions.PortableHash.keyedHash60(col(keyCol), salt)
    val byStratum = Window.partitionBy(col(stratumCol))
    df.withColumn(rnC, row_number().over(byStratum.orderBy(h.asc, col(keyCol).asc)))
      .withColumn(cntC, count(lit(1)).over(byStratum))
      .withColumn(splitCol,
        when(col(rnC) <= floor(lit(0.6) * col(cntC)), "train")
          .when(col(rnC) <= floor(lit(0.8) * col(cntC)), "valid")
          .otherwise("test"))
      .drop(rnC, cntC)
  }

  /** General form: keep the first `quota` rows of each stratum in
    * keyed-md5 rank order, where `quota` is any per-row Column (a
    * scalar mixture spec, a window count, a joined-in dim). A NULL or
    * larger-than-stratum quota means "none" / "take all" respectively.
    * One stratum-keyed shuffle; the rank window streams each stratum
    * with O(1) state per row. Scratch columns are collision-checked
    * against the caller's schema (deterministically, so plan
    * fingerprints stay stable), never silently clobbered. */
  def hashStratifiedTake(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Column, salt: String): DataFrame = {
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val qc = fresh("__graft_quota")
    val rc = fresh("__graft_rn")
    val h = graft.functions.PortableHash.keyedHash60(col(keyCol), salt)
    val rank = Window.partitionBy(col(stratumCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn(qc, quota)
      .withColumn(rc, row_number().over(rank))
      .filter(col(rc) <= col(qc))
      .drop(rc, qc)
  }
}
