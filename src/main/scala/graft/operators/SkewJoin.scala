package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's skew-join split (on by default in every graft session) handles
  * moderate skew by splitting oversized shuffle blocks, but it can only
  * split what already fits through a shuffle: a single key carrying a
  * double-digit percentage of a 100 TB fact still funnels into one
  * reducer's input before AQE sees it. Salting fixes that *in the plan*:
  * the big side spreads each key over `nSalts` sub-keys via a
  * deterministic per-row hash, the small side replicates each row
  * `nSalts` times, and the join key becomes (key, salt) — so the hot
  * key's rows land on `nSalts` reducers instead of one. Join output is
  * set-identical to the unsalted join (every big-side row still meets
  * every matching small-side row exactly once).
  *
  * Cost model: small-side replication ×`nSalts` (shuffle volume, not
  * storage) buys a ÷`nSalts` bound on the hottest reducer. Use for
  * fact⋈dim or fact⋈medium joins where one key dominates; for fact⋈fact
  * with mutual skew, prefer AQE + bucketing.
  *
  * The reference never needed this (its joins are collection-local), but
  * any training-data pipeline joining web-scale logs on domain/user keys
  * hits it — heavy-hitter keys (bot users, blank domains) are the rule
  * at 100 TB, which is why the builder mandate lists salting alongside
  * broadcast and bucketing.
  *
  * **DECISION RULE (AQE vs manual salt — adjudicated empirically in
  * `SkewJoinAqeSpec`, round 11):** let AQE handle it first. A skewed
  * INNER/SEMI equi-join whose output feeds a different-keyed (or no)
  * exchange gets its hot partition split at runtime
  * (`AQEShuffleRead … skewed`) with zero code — do NOT salt those.
  * Reach for `saltedHot` only when AQE provably cannot act:
  *  1. the join output's hash partitioning is reused by a same-key
  *     downstream operator (groupBy/window on the join key):
  *     `OptimizeSkewedJoin` declines rather than insert an extra
  *     shuffle (`forceOptimizeSkewedJoin` default false);
  *  2. the skewed side is the preserved side of an outer join —
  *     unsplittable by construction (splitting would null-extend
  *     unmatched rows once per split);
  *  3. there is no exchange at all (bucketed/co-located scans) — AQE
  *     re-plans exchanges, and none exists.
  * Salting is result-identical either way, so mis-classification is
  * safe; it just pays the ×nSalts small-side replication needlessly.
  */
object SkewJoin {

  private val SaltCol = "_graft_salt"

  /** Inner equi-join of `big ⋈ small` on `bigKey = smallKey`, salted to
    * `nSalts` sub-keys. `saltBy` must be deterministic per big-side row
    * (any per-row hash works — salt placement never changes the result,
    * only the reducer layout; determinism just keeps reruns identical
    * task-for-task). */
  def salted(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltBy: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val b = big.withColumn(SaltCol, pmod(saltBy, lit(nSalts.toLong)).cast("int"))
    val sm = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(sm, b(bigKey) === sm(smallKey) && b(SaltCol) === sm(SaltCol))
      .drop(SaltCol)
  }

  private val HotKeyCol = "_graft_hot_key"

  /** Heavy-hitter keys of `big(key)`, estimated from a deterministic
    * sample — the production form of skew detection: counting every
    * key exactly would cost a full shuffle of the fact table before
    * the join even starts, while a small sample finds every key hot
    * enough to matter (a key that dominates a reducer at 100 TB is,
    * with overwhelming probability, well represented in a 1–25%
    * sample). Mis-detection is SAFE either way: salting never changes
    * the join result, only the reducer layout, so a missed warm key
    * just falls back to AQE and a false positive merely salts a cold
    * key. Returns a single-column frame (`_graft_hot_key`) intended
    * for `broadcast()`. */
  def hotKeys(big: DataFrame, key: String, fraction: Double,
      minSampleCount: Long, seed: Long = 42L): DataFrame =
    big.select(key).sample(fraction, seed)
      .groupBy(col(key))
      .agg(count(lit(1)).as("_graft_n"))
      .filter(col("_graft_n") >= minSampleCount)
      .select(col(key).as(HotKeyCol))

  /** Salted join restricted to detected heavy hitters — the production
    * refinement of `salted`: only rows whose key is in `hot` pay the
    * small-side ×`nSalts` replication; the cold remainder joins plain
    * (where AQE's skew split suffices). At 100 TB this is the
    * difference between replicating the dim table 8× for everyone vs
    * for the handful of bot/blank/default keys that actually melt a
    * reducer. `hot` is broadcast to both sides, so the split is two
    * map-side semi/anti filters — no extra shuffle of either input. */
  def saltedHot(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltBy: Column, nSalts: Int, hot: DataFrame): DataFrame = {
    val bHot = big.join(broadcast(hot), col(bigKey) === col(HotKeyCol), "left_semi")
    val bCold = big.join(broadcast(hot), col(bigKey) === col(HotKeyCol), "left_anti")
    val smHot = small.join(broadcast(hot), col(smallKey) === col(HotKeyCol), "left_semi")
    // Frame-qualified keys: with bigKey == smallKey (the common
    // fact⋈dim case — both sides keyed "user_id"/"domain") a bare
    // col() reference is ambiguous. The union is POSITIONAL for the
    // same reason: both branches emit big-cols ++ small-cols in that
    // order, and with equal key names a by-name union would reject
    // the (legitimate) duplicate output column.
    bCold.join(small, bCold(bigKey) === small(smallKey))
      .union(salted(bHot, smHot, bigKey, smallKey, saltBy, nSalts))
  }

  /** q48: the hot-key salted join as an oracle-checkable query —
    * lineitem ⋈ orders with sampled heavy-hitter detection (25%
    * sample, ≥3 hits ⇒ hot — deliberately low so the salted path
    * carries real rows at test scale; a production job would set the
    * threshold from its rows-per-reducer budget), hot keys salted ×8,
    * cold keys joined plain, then a small aggregate. Result is
    * provably identical to the plain join — exactly what the DuckDB
    * oracle asserts. */
  def saltedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
    val hot = hotKeys(li, "l_orderkey", fraction = 0.25, minSampleCount = 3)
    saltedHot(li, ord, "l_orderkey", "o_orderkey",
        xxhash64(col("l_orderkey"), col("l_linenumber")), nSalts = 8, hot)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val saltedJoinAggSql: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      | round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
}
