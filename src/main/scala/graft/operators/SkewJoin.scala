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

  /** q48: the salted join as an oracle-checkable query — lineitem (big
    * side, salted by a per-row hash) ⋈ orders (replicated ×8), then a
    * small aggregate. Result is provably identical to the plain join,
    * which is exactly what the DuckDB oracle asserts. */
  def saltedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
    salted(li, ord, "l_orderkey", "o_orderkey",
        xxhash64(col("l_orderkey"), col("l_linenumber")), nSalts = 8)
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
