package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Exact._

/** TPC-H-shaped multi-way join pipelines (flagship scale shapes: the
  * only shuffling joins are fact-to-fact; every dimension broadcasts;
  * aggregation is partial+final).
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def revenueE4 = // Σ price·(1−disc) in exact 1e-4 units
    sum(e2(col("l_extendedprice")) * (lit(100L) - e2(col("l_discount"))))

  /** Q3 shape — shipping priority: top-10 open orders by revenue. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(o("o_orderkey").as("orderkey"),
        o("o_orderdate").cast("date").as("orderdate"),
        o("o_orderpriority").as("orderpriority"))
      .agg((revenueE4 / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("orderkey"))
      .limit(10)
  }

  /** Q5 shape — local supplier volume: revenue per nation where the
    * customer and supplier share the nation, one region, one year.
    * Year 1996: inside the fixture's o_orderdate range
    * (1995-01-01 … 2001-08-01), so the selection is non-empty and the
    * oracle hash certifies the 6-way join, not an empty set.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c),
        o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name").as("nation"))
      .agg((revenueE4 / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  /** Q10 shape — returned items report: top-20 customers by revenue lost
    * to returns in a quarter. Fact-fact join (orders⋈lineitem) shuffles;
    * customer and nation broadcast; top-20 via TakeOrderedAndProject.
    * Quarter 1996-10-01 … 1997-01-01 lies inside the fixture's
    * order-date range so the report is non-trivial (371 customers at
    * sf0.01 before the limit).
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.ordersPar(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitemPar(spark, dir)
      .filter(col("l_returnflag") === "R")
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey").as("custkey"), c("c_name").as("name"),
        n("n_name").as("nation"))
      .agg((revenueE4 / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(20)
  }

  /** Q21 shape — suppliers who kept orders waiting: the hardest public
    * TPC-H join shape (a fact correlated with TWO more scans of itself:
    * EXISTS + NOT EXISTS over the same order). The fixture's lineitem
    * has no receipt/commit dates, so "late" is `l_returnflag = 'R'`:
    * suppliers SOLELY responsible for returned items on multi-supplier
    * finalized orders. Shape is Q21's exactly — inner ⋈ orders, a
    * LEFT SEMI self-join (another supplier exists on the order) and a
    * LEFT ANTI self-join (no OTHER supplier was late) — both equi on
    * l_orderkey with the ≠-supplier residual, so the self-correlation
    * shuffles on the join key and no cartesian/BNL appears (asserted in
    * PlanSpec); supplier and nation broadcast.
    */
  def q21SuppliersWaiting(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
      col("l_suppkey").as("l2_suppkey"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    l1.join(o, l1("l_orderkey") === o("o_orderkey"))
      .join(l2, l1("l_orderkey") === l2("l2_orderkey") &&
        l1("l_suppkey") =!= l2("l2_suppkey"), "left_semi")
      .join(l3, l1("l_orderkey") === l3("l3_orderkey") &&
        l1("l_suppkey") =!= l3("l3_suppkey"), "left_anti")
      .join(broadcast(s), l1("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(s("s_name").as("s_name"), n("n_name").as("nation"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q4 shape — order priority checking: per-priority counts of
    * quarter orders having at least one LATE line item. The fixture
    * has no commit/receipt dates, so "late" is l_shipdate more than
    * 90 days after the order date — same correlated-EXISTS shape,
    * planned as one LeftSemi equi-join with a residual condition.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q7 shape — volume shipping between a nation pair, both
    * directions, revenue per (supplier nation, customer nation,
    * ship year). Fact-fact join shuffles once; all four dims
    * broadcast.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), s("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_3"
          && col("cust_nation") === "NATION_7")
        || (col("supp_nation") === "NATION_7"
          && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((revenueE4 / 10000.0).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q14 shape — promotion effect: promo revenue share of a month, in
    * exact integer 1e-4 units divided once at the end (both engines
    * do the same single double division).
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
    val p = Tables.part(spark, dir)
    val rev = e2(col("l_extendedprice")) * (lit(100L) - e2(col("l_discount")))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
          .as("promo_e4"),
        sum(rev).as("total_e4"))
      .select(
        (lit(100.0) * col("promo_e4") / col("total_e4"))
          .as("promo_revenue_pct"),
        col("promo_e4"), col("total_e4"))
  }

  /** Q16 shape — parts/supplier relationship: distinct suppliers per
    * (brand, type, size) over the observed supply pairs (the fixture
    * has no partsupp table; DISTINCT (l_partkey, l_suppkey) from
    * lineitem is the observed surrogate), excluding one brand, one
    * type, a size set, and "complaint" suppliers (negative account
    * balance stands in for the comment filter).
    */
  def q16PartsSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitemPar(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
        && col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    ps.join(bad, ps("l_suppkey") === bad("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q18 (large-volume customer) at the standard 300-quantity
    * parameter — the only classic shape that was still missing and
    * fixture-feasible (Q2/Q9/Q11/Q12/Q20 need partsupp/shipmode/
    * commit-date columns the fixture lacks). The HAVING subquery runs
    * as a pre-aggregated fact (one map-side-combined sum per orderkey)
    * joined back to orders, so lineitem is scanned once and the
    * qualifying-order set (≈0.3% of orders at any scale) is the only
    * thing that reaches the customer join — which broadcasts.
    * o_orderkey is appended to the spec's sort as a deterministic
    * tie-break (value-preserving: totalprice ties are measure-zero,
    * but the engines must not disagree on truncation order).
    */
  def q18LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 300L)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"),
        col("o_orderkey"))
      .limit(100)
  }

  val defs: Map[String, Q] = Map(
    "q18_large_volume" -> (q18LargeVolume(_, _)),
    "q6_forecast_revenue" -> (q6ForecastRevenue(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q13_customer_distribution" -> (q13CustomerDistribution(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q17_small_quantity" -> (q17SmallQuantity(_, _)),
    "q4_order_priority" -> (q4OrderPriority(_, _)),
    "q7_volume_shipping" -> (q7VolumeShipping(_, _)),
    "q14_promo_revenue" -> (q14PromoRevenue(_, _)),
    "q16_parts_supplier" -> (q16PartsSupplier(_, _)),
    "q19_disc_revenue" -> (q19DiscRevenue(_, _)),
    "q22_sales_opportunity" -> (q22SalesOpportunity(_, _)),
    "q3_shipping_priority" -> (q3ShippingPriority(_, _)),
    "q5_local_supplier" -> (q5LocalSupplier(_, _)),
    "q10_returned_items" -> (q10ReturnedItems(_, _)),
    "q21_suppliers_waiting" -> (q21SuppliersWaiting(_, _))
  )

  /** Q19 shape — discounted revenue under an OR-of-ANDs predicate
    * (brand × size × quantity bands). The disjunction mixes part and
    * lineitem attributes, so only the `l_partkey IS NOT NULL`-style
    * conjuncts push to the scans; the point of the shape is that
    * Catalyst still broadcasts the dim and evaluates the residual
    * map-side after the join — one fact scan, zero fact shuffles.
    * (TPC-H Q19 adapted to the fixture's columns: it has no
    * container/shipmode, so the bands are brand/size/quantity.)
    */
  def q19DiscRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val bands =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#14" && col("p_size").between(1, 15)
        && col("l_quantity").between(20, 30))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(bands)
      .agg(count(lit(1)).as("n_lines"),
        (revenueE4 / 10000.0).as("revenue"))
  }

  /** Q22 shape — sales opportunity: rich customers (balance above the
    * positive-balance mean) who have LAPSED — no order since 2001 —
    * grouped by nation. (Every fixture customer has some order, so the
    * classic no-orders-ever anti-join would certify an empty set; the
    * recency window keeps the anti-join load-bearing.) The threshold is
    * an INTEGER floor-average of exact cents, so the boundary
    * comparison cannot flip on a last-ulp `avg` difference between
    * engines; balances aggregate as exact cents.
    */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("bal_cents", e2(col("c_acctbal")))
    val thr = c.filter(col("c_acctbal") > 0.0)
      .agg(expr("sum(bal_cents) div count(1)").as("thr_cents"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    c.crossJoin(broadcast(thr))
      .filter(col("bal_cents") > col("thr_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("bal_cents")).as("total_bal_cents"))
      .orderBy(col("c_nationkey"))
  }

  /** Q6 shape — forecast revenue change: one scan, every predicate
    * pushed to parquet; revenue = Σ price·discount in exact 1e-4
    * integer units (the discount BETWEEN runs on exact cents).
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        e2(col("l_discount")).between(5, 7) && col("l_quantity") < 24)
      .agg((sum(e2(col("l_extendedprice")) * e2(col("l_discount")))
        / 10000.0).as("revenue"))

  /** Q8 shape — national market share: NATION_3's share of PROMO-part
    * revenue sold into ASIA customers, by order year. Fact-to-fact
    * join on orderkey; every dimension broadcasts; the share is one
    * division of two exact BIGINT sums (q14's discipline).
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n1 = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
    val vol = (e2(col("l_extendedprice")) *
      (lit(100L) - e2(col("l_discount"))))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), c("c_nationkey") === n1("n_nationkey"))
      .join(broadcast(r), n1("n_regionkey") === r("r_regionkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n2), s("s_nationkey") === col("sn_key"))
      .groupBy(year(o("o_orderdate")).as("o_year"))
      .agg((sum(when(col("sn_name") === "NATION_3", vol).otherwise(0L))
          .cast("double") / sum(vol).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q13 shape — customer order-count distribution: LEFT join keeps
    * order-less customers in the c_count=0 bucket; the priority filter
    * stands in for the original's comment LIKE (no comment column in
    * the fixture). Two hash aggregates, both key-partitioned.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String)
      : DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.ordersPar(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15 shape — top supplier(s): quarterly revenue per supplier, keep
    * those achieving the maximum. The max re-attaches as a broadcast
    * 1-row frame over exact integer revenue (no double boundary).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(revenueE4.as("rev_e4"))
    val mx = rev.agg(max(col("rev_e4")).as("mx"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(mx))
      .filter(col("rev_e4") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_e4") / 10000.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17 shape — small-quantity-order revenue: lineitems of one brand
    * below a fifth of their part's average quantity. The correlated
    * average compares in EXACT integers (qty·5·cnt < Σqty — quantities
    * are integral), so the boundary can't drift cross-engine; the
    * per-part stats re-attach by broadcast (small after the brand
    * filter).
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_brand") === "Brand#23")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val stats = li.groupBy(col("p_partkey").as("sp_key"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_q"),
        count(lit(1)).as("cnt_q"))
    li.join(broadcast(stats), col("p_partkey") === col("sp_key"))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("cnt_q")
        < col("sum_q"))
      .agg((sumFixed(col("l_extendedprice"), 2) / 7.0).as("avg_yearly"))
  }

  private val revSql =
    "CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) / 10000.0"

  val oracles: Map[String, String] = Map(
    "q18_large_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey
        |    HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate,
        |  o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |    * CAST(round(l_discount*100,0) AS BIGINT)) AS BIGINT)
        |    / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND CAST(round(l_discount*100,0) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
        |      AS o_year,
        |    CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND p_type = 'PROMO' AND r_name = 'ASIA')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
        |           ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q13_customer_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)))
        |      AS BIGINT) AS rev_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, rev_e4 / 10000.0 AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_quantity" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |st AS (
        |  SELECT l_partkey AS sp_key,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
        |    count(*) AS cnt_q
        |  FROM li GROUP BY l_partkey)
        |SELECT round(SUM(l_extendedprice), 2) / 7.0 AS avg_yearly
        |FROM li JOIN st ON l_partkey = sp_key
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt_q < sum_q"""
        .stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate
        |                  + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         |  $revSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q14_promo_revenue" ->
      """WITH r AS (
        |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
        |SELECT 100.0
        |    * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
        |        AS BIGINT)
        |    / CAST(SUM(rev) AS BIGINT) AS promo_revenue_pct,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
        |    AS BIGINT) AS promo_e4,
        |  CAST(SUM(rev) AS BIGINT) AS total_e4
        |FROM r""".stripMargin,
    "q16_parts_supplier" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q19_disc_revenue" ->
      s"""SELECT count(*) AS n_lines, $revSql AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
        |    c_acctbal
        |  FROM customer),
        |thr AS (SELECT SUM(bal_cents) // COUNT(*) AS thr_cents
        |        FROM c WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
        |FROM c CROSS JOIN thr
        |WHERE bal_cents > thr_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderdate >=
        |                      TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT o_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS orderdate,
         |  o_orderpriority AS orderpriority, $revSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         |GROUP BY orderkey, orderdate, orderpriority
         |ORDER BY revenue DESC, orderkey LIMIT 10""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
         |  $revSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, custkey LIMIT 20""".stripMargin,
    "q21_suppliers_waiting" ->
      """SELECT s_name, n_name AS nation, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name AS nation, $revSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  )
}
