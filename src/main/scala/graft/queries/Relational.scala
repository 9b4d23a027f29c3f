package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2.2–§2.6) expressed over the
  * driver's TPC-H-ish testdata.
  *
  * Scale notes (100 TB design):
  *  - Filters/projections are plain `Column` predicates so Catalyst pushes
  *    them into the parquet scan (`PushedFilters` / pruned `ReadSchema`).
  *  - Dimension joins (`nation`, `region`, tiny aggregates) are explicitly
  *    `broadcast()`-hinted; fact-fact joins shuffle on their equi-keys and
  *    rely on AQE for skew handling.
  *  - Derived float columns are rounded at the output boundary only (oracle
  *    hash parity); raw columns pass through bit-exact.
  *  - Final `orderBy` on *small* results (post-agg / top-k) makes output
  *    deterministic; it is a single-stage sort of a few hundred rows even
  *    at SF 1000, never a bottleneck.
  */
object Relational {

  private def money(c: Column): Column = round(c, 2)

  /** TPC-H Q1-style pricing summary: multi-agg groupBy with derived
    * expressions (SURVEY A2/A4/A5, F18). Map-side partial aggregation
    * makes this a single shuffle of ~|groups| rows. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(col("l_quantity"))).as("sum_qty"),
        money(sum(col("l_extendedprice"))).as("sum_base_price"),
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        money(avg(col("l_quantity"))).as("avg_qty"),
        money(avg(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      | round(avg(l_quantity), 2) AS avg_qty,
      | round(avg(l_extendedprice), 2) AS avg_price,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + narrow projection (SURVEY P1–P4): predicate and
    * column pruning must reach the scan. Raw columns pass through
    * bit-exact — no rounding needed. */
  def filterProject(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(
        col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-01-01").cast("timestamp"))
          && col("l_quantity") >= 45 && col("l_discount") >= 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val filterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_quantity >= 45 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join: fact-fact shuffle join (lineitem ⋈ orders) + shuffled
    * customer join + broadcast dims (SURVEY J1/J2/J4). Revenue per
    * (region, nation).
    *
    * Shape: the lineitem side is PARTIALLY AGGREGATED on the join key
    * BEFORE the fact-fact join (eager aggregation / group-by pushdown —
    * the rewrite Catalyst does not apply on its own). The final group
    * keys (r_name, n_name) are functionally determined by o_custkey, so
    * summing revenue/items per l_orderkey first and re-summing after the
    * joins is exact: sums of sums and sums of counts. What it buys at
    * scale: the orderkey exchange carries ~|orders| narrow rows instead
    * of ~|lineitem| wide ones (×4 fewer at TPC-H fan-out, and only 2
    * doubles instead of price+discount per row), map-side combine does
    * the reduction before the wire, and the agg's hash-partitioning on
    * l_orderkey is REUSED by the join (same key → no second exchange on
    * the left side). Revenue is still rounded once, at the output
    * boundary only. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    val liByOrder = li.groupBy(col("l_orderkey")).agg(
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("ord_revenue"),
      count(lit(1)).as("ord_items"))
    liByOrder.join(o, liByOrder("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        money(sum(col("ord_revenue"))).as("revenue"),
        sum(col("ord_items")).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  // NOTE: the Spark side pre-aggregates revenue per (orderkey-side
  // key) below the join (two-level summation) while this oracle sums
  // flat; the round(...,2) is what absorbs the fp reassociation delta
  // between the two orders (Spark's partial-agg order was never
  // deterministic anyway). If a larger fixture ever shows last-ulp
  // drift here, mirror the two-level sum in this SQL.
  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q86 — the TPC-H Q5 shape: a SIX-table join tree (lineitem ⋈
    * orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region) with the
    * local-supply twist — customer and supplier must share a nation —
    * plus a region filter and a one-year date window. The deepest
    * join pipeline in the suite; what it certifies is Catalyst's
    * multi-way planning under the engine's stated rules:
    *
    *  - the region filter collapses nation⋈region to a 5-row "asian
    *    nations" dim, BROADCAST into both customer and supplier —
    *    both fact-side inputs are nation-pruned before any fact
    *    shuffle moves;
    *  - the o_orderdate window is a plain pushable predicate (reaches
    *    the orders scan as PushedFilters);
    *  - the only shuffles are the fact equi-joins (l_orderkey,
    *    o_custkey, l_suppkey); c_nationkey = s_nationkey rides the
    *    suppkey join as a residual filter, never a join of its own.
    *
    * At 100 TB: dims stay broadcast at any SF (nation/region are
    * fixed-cardinality), fact shuffles scale linearly, AQE re-plans
    * the post-filter sizes. */
  def localSupplyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val asianNations = n
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = c.join(broadcast(asianNations),
        c("c_nationkey") === asianNations("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = sup.join(broadcast(asianNations),
        sup("s_nationkey") === asianNations("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(cust, o("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val localSupplyRevenueSql: String =
    """SELECT n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** q87 — the TPC-H Q17 shape: a correlated aggregate ("lineitems
    * below 20% of their part's average quantity"), written the way a
    * distributed engine should DECORRELATE it — aggregate once per
    * part, join back on the part key, filter, re-aggregate. A naive
    * correlated subquery re-scans the fact per outer row; this form
    * is two shuffles on l_partkey total (the avg dim is map-side
    * combined to |parts| rows, and AQE sizes the join). The 0.2·avg
    * threshold is exact cross-engine arithmetic: quantities are
    * integer-valued doubles, so sum/count and the scaling are
    * identical IEEE operations in both engines — the comparison can
    * never flip on a ulp. */
  def smallOrderRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val avgQ = li.groupBy(col("l_partkey").as("p_key"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(avgQ, li("l_partkey") === avgQ("p_key"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        money(sum(col("l_extendedprice"))).as("small_order_revenue"),
        count(lit(1)).as("n_items"))
  }

  val smallOrderRevenueSql: String =
    """WITH pq AS (
      |  SELECT l_partkey AS p_key, avg(l_quantity) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT round(sum(l_extendedprice), 2) AS small_order_revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN pq ON l_partkey = p_key
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** Top-k (SURVEY W4): orderBy+limit compiles to TakeOrderedAndProject —
    * per-partition heap + driver merge, no global sort. */
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** Left-semi join (SURVEY P5/J5): customers with at least one order,
    * counted per segment. */
  def activeCustomersBySegment(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val activeCustomersBySegmentSql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Left-anti join (SURVEY J3): customers with no high-value order.
    * The build side is pre-filtered (predicate below the join), so the
    * anti-join's hash side stays small even at scale. */
  def inactiveCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  val inactiveCustomersSql: String =
    """SELECT c_custkey, c_name, c_nationkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** Window function (SURVEY W1–W3): latest order per customer via
    * row_number over a (custkey, date desc) window. One shuffle on the
    * partition key. */
  def latestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  val latestOrderPerCustomerSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** DISTINCT (SURVEY A6): partial-aggregate based dedup of a 2-col key. */
  def distinctFlagStatus(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  val distinctFlagStatusSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Conditional aggregation (SURVEY P7/F15/F18): threshold predicates
    * folded into a single scan. */
  def orderStatusBreakdown(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 300000, 1L).otherwise(0L)).as("n_high_value"),
        money(avg(col("o_totalprice"))).as("avg_price"),
        money(max(col("o_totalprice"))).as("max_price"),
        money(min(col("o_totalprice"))).as("min_price"))
      .orderBy("o_orderstatus")

  val orderStatusBreakdownSql: String =
    """SELECT o_orderstatus,
      | count(*) AS n_orders,
      | CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
      | round(avg(o_totalprice), 2) AS avg_price,
      | round(max(o_totalprice), 2) AS max_price,
      | round(min(o_totalprice), 2) AS min_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q56: window FRAMES — 7-day moving average and running total over
    * daily revenue. The daily pre-aggregation shrinks the window input
    * to |days| rows (the frame never sees raw orders), so the sort
    * inside the single window partition is over thousands of rows even
    * at SF1000 — window-over-aggregate, never window-over-fact, is the
    * scale rule for global moving metrics. (A keyed variant partitions
    * by the key and shards normally.) */
  def movingRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy(col("day"))
    daily
      .select(col("day"), col("n_orders"),
        money(col("rev")).as("revenue"),
        money(avg(col("rev")).over(w.rowsBetween(-6, 0))).as("ma7"),
        money(sum(col("rev")).over(
          w.rowsBetween(Window.unboundedPreceding, 0))).as("cum_revenue"))
      .orderBy("day")
      .limit(400)
  }

  val movingRevenueSql: String =
    """WITH daily AS (
      |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders,
      |    sum(o_totalprice) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT day, n_orders, round(rev, 2) AS revenue,
      |  round(avg(rev) OVER (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7,
      |  round(sum(rev) OVER (ORDER BY day
      |    ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
      |FROM daily
      |ORDER BY day
      |LIMIT 400""".stripMargin

  /** q57: explicit set operators (SURVEY §2.6) — customers ordering in
    * BOTH 1995 and 1996 (INTERSECT) vs only 1995 (EXCEPT). Catalyst
    * plans both as aggregates/anti-joins over the distinct key sets —
    * the same shuffle shape as q05/q06, exposed through the set-op
    * API. Scale note: the two set-ops each recompute their year
    * branches (no common-subplan reuse), so orders is scanned 4× —
    * fine for an API-coverage query over pruned 1-column scans, but
    * the single-scan form at 100 TB is one groupBy(custkey) with
    * per-year presence flags, then flag predicates (the q23
    * sum-when pivot shape). */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def custsIn(yr: Int) =
      o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey")).distinct()
    val both = custsIn(1995).intersect(custsIn(1996))
    val only95 = custsIn(1995).except(custsIn(1996))
    both.agg(count(lit(1)).as("n_both"))
      .crossJoin(only95.agg(count(lit(1)).as("n_only_1995")))
  }

  val setOpsSql: String =
    """SELECT
      | (SELECT count(*) FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      |    INTERSECT
      |    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)) AS n_both,
      | (SELECT count(*) FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      |    EXCEPT
      |    SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)) AS n_only_1995""".stripMargin

  /** q78: FULL OUTER equi-join — the reconciliation report between two
    * derived aggregates (per-customer 1995 vs 1996 order counts) where
    * BOTH sides genuinely contribute unmatched keys. The Seq-key join
    * coalesces the key across sides (exactly SQL's USING semantics);
    * the presence flag reads each side's null-ness BEFORE the counts
    * are zero-coalesced. Plan: two pruned scans → two map-side-combined
    * aggregations → one shuffle full-outer on the key; row-for-row the
    * single-scan q23-style pivot (q57's scaladoc) is the alternative —
    * this query certifies the JOIN TYPE itself, the one member of the
    * join family the rest of the suite never exercises. */
  def yearReconcile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def perCust(yr: Int, out: String) =
      o.filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as(out))
    perCust(1995, "n_1995").join(perCust(1996, "n_1996"), Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey"),
        when(col("n_1995").isNull, "only_1996")
          .when(col("n_1996").isNull, "only_1995")
          .otherwise("both").as("presence"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"),
        coalesce(col("n_1996"), lit(0L)).as("n_1996"))
      .orderBy("o_custkey")
  }

  val yearReconcileSql: String =
    """WITH a AS (
      |  SELECT o_custkey, count(*) AS n_1995 FROM orders
      |  WHERE EXTRACT(year FROM o_orderdate) = 1995 GROUP BY o_custkey),
      |b AS (
      |  SELECT o_custkey, count(*) AS n_1996 FROM orders
      |  WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY o_custkey)
      |SELECT o_custkey,
      |  CASE WHEN a.n_1995 IS NULL THEN 'only_1996'
      |       WHEN b.n_1996 IS NULL THEN 'only_1995'
      |       ELSE 'both' END AS presence,
      |  coalesce(a.n_1995, 0) AS n_1995,
      |  coalesce(b.n_1996, 0) AS n_1996
      |FROM a FULL OUTER JOIN b USING (o_custkey)
      |ORDER BY o_custkey""".stripMargin

  /** q50: hierarchical revenue rollup — GROUPING SETS via `rollup()`
    * (nation, order year): detail rows, per-nation subtotals, grand
    * total in ONE aggregation pass. At 100 TB this replaces three
    * separate scans/aggregations with one shuffle whose partial aggs
    * combine map-side; `grouping_id()` disambiguates genuine NULLs
    * from rolled-up levels (both engines put the first rollup column
    * in the high bit — verified). Dimension joins stay broadcast. */
  def revenueRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .rollup(col("n_name"), col("o_year"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        money(sum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first, col("o_year").asc_nulls_first)

  val revenueRollupSql: String =
    """SELECT CAST(grouping_id(n_name, o_year) AS BIGINT) AS gid,
      | n_name, o_year, count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS revenue
      |FROM (
      |  SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |    o_totalprice
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |GROUP BY ROLLUP(n_name, o_year)
      |ORDER BY gid, n_name NULLS FIRST, o_year NULLS FIRST""".stripMargin
}
