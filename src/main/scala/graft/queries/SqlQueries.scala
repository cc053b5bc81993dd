package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** SQL-surface + typed-Dataset coverage: GROUPING SETS (SQL-only in
  * Spark's DataFrame API), pivot, and a typed `Dataset[T]` pipeline —
  * the three §2-B axes not yet exercised by the other modules.
  */
object SqlQueries {
  type Q = (SparkSession, String) => DataFrame

  /** GROUPING SETS via spark.sql over a temp view (registry queries may
    * use the SQL entry point too — same Catalyst plan).
    */
  def qSqlGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  round(SUM(o_totalprice), 2) AS sum_price
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Pivot: order counts by year × status (wide form). */
  def qSqlPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("yr"))

  /** Scalar subquery: customers whose spend exceeds the global average
    * spend-per-customer. The threshold is a division of two already-exact
    * values (Exact.scala discipline), so the comparison is identical in
    * both engines — no float boundary flakiness.
    */
  def qSqlScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """WITH spend AS (
        |  SELECT o_custkey, round(SUM(o_totalprice), 2) AS s
        |  FROM orders_v GROUP BY o_custkey)
        |SELECT o_custkey AS custkey, s AS spend
        |FROM spend
        |WHERE s > (SELECT round(SUM(s), 2) / COUNT(*) FROM spend)
        |ORDER BY custkey""".stripMargin)
  }

  /** TPC-H Q18 shape (large-volume customers): IN-subquery with HAVING
    * over an aggregate — Catalyst plans the IN as a left-semi join
    * against the aggregated subquery, so the big three-way join only
    * touches qualifying orders. Threshold 260 ≈ the fixture's p99
    * per-order quantity (non-vacuous at every sf). total_qty is a sum
    * of whole-valued quantities → exact long.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v18")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v18")
    spark.sql(
      """SELECT c_name, o_orderkey, o_totalprice,
        |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM customer_v18, orders_v18, lineitem_v
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem_v
        |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 260)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin)
  }

  /** LATERAL VIEW posexplode — the generator (UDTF) surface of SQL:
    * one row per (position, token) of each document's whitespace split.
    * Catalyst plans this as a Generate node fused into the scan stage
    * (no shuffle before the final sort); at 100 TB the explode is
    * map-side and output size is the only cost.
    */
  def qSqlLateralExplode(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents_lv")
    spark.sql(
      """SELECT doc_id, pos, tok
        |FROM documents_lv
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        |WHERE doc_id < 20
        |ORDER BY doc_id, pos""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT (top-2-per-key
    * as a lateral, the SQL:2016 form of top-k-per-group). Catalyst
    * decorrelates this into a ranked window join — no per-row subquery
    * execution, same shape as q_window_topk but driven from the SQL
    * surface.
    */
  def qSqlLateralJoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_lat")
    spark.sql(
      """SELECT c.custkey, o.o_orderkey, o.o_totalprice
        |FROM (SELECT DISTINCT o_custkey AS custkey FROM orders_lat
        |      WHERE o_custkey <= 50) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
        |         WHERE o_custkey = c.custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.custkey, o.o_orderkey""".stripMargin)
  }

  case class Line(l_orderkey: Long, l_quantity: Double,
                  l_extendedprice: Double, l_returnflag: String)

  /** Typed Dataset pipeline: as[T] → typed filter/groupByKey/mapGroups.
    * Same oracle-able semantics, compile-time row type.
    */
  def qTypedDataset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Line] = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag")).as[Line]
    ds.filter(_.l_quantity > 25.0)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var qty = 0.0
        rows.foreach { r => n += 1; qty += r.l_quantity }
        (flag, n, qty)
      }
      .toDF("flag", "n", "sum_qty")
      .withColumn("sum_qty", round(col("sum_qty"), 2))
      .orderBy(col("flag"))
  }

  case class CustT(c_custkey: Long, c_name: String)
  case class OrdT(o_custkey: Long, o_orderkey: Long, cents: Long)

  /** Typed joinWith → reduceGroups — the two Dataset combinators
    * q_typed_dataset/q_typed_cogroup leave uncovered: joinWith keeps
    * BOTH sides as typed objects (no column flattening/ambiguity),
    * and reduceGroups folds each customer's orders to the
    * (cents, orderkey)-max without materializing groups. Exact cents
    * keep the reduction order-free.
    */
  def qTypedJoinwith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name")).as[CustT]
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        Exact.e2(col("o_totalprice")).as("cents")).as[OrdT]
    c.joinWith(o, c("c_custkey") === o("o_custkey"), "inner")
      .groupByKey(_._1.c_custkey)
      .reduceGroups { (a, b) =>
        if (a._2.cents > b._2.cents ||
          (a._2.cents == b._2.cents &&
            a._2.o_orderkey >= b._2.o_orderkey)) a else b
      }
      .map { case (k, (cu, best)) =>
        (k, cu.c_name, best.o_orderkey, best.cents)
      }
      .toDF("c_custkey", "c_name", "best_orderkey", "best_cents")
      .orderBy(col("c_custkey"))
  }

  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic trap
    * that silently empties real queries: a single NULL in the NOT IN
    * subquery makes every row's predicate UNKNOWN (null-aware anti
    * join), while NOT EXISTS keeps its rows. The subquery's NULL is
    * constructed (nullif on a real value) so both engines see the
    * same poisoned list; the query reports both counts side by side
    * plus the per-segment survivors of each idiom.
    */
  def qSqlNotInNull(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("cust_nin")
    Tables.orders(spark, dir).createOrReplaceTempView("ord_nin")
    spark.sql(
      """SELECT c_mktsegment,
        |  SUM(CASE WHEN c_custkey NOT IN
        |    (SELECT nullif(o_custkey, 7) FROM ord_nin)
        |    THEN 1 ELSE 0 END) AS not_in_survivors,
        |  SUM(CASE WHEN NOT EXISTS
        |    (SELECT 1 FROM ord_nin o
        |     WHERE nullif(o.o_custkey, 7) = c.c_custkey)
        |    THEN 1 ELSE 0 END) AS not_exists_survivors,
        |  COUNT(*) AS n
        |FROM cust_nin c
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Correlated EXISTS + NOT EXISTS — planned as LeftSemi/LeftAnti
    * joins by Catalyst (no per-row subquery execution).
    */
  def qSqlExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders_v o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice < 5000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Wide→long unpivot (melt) of a per-flag aggregate — the inverse of
    * qSqlPivot; Spark's `Dataset.unpivot` (Expand under the hood, zero
    * extra shuffles on top of the aggregate). Values are integral longs
    * (l_quantity is whole-valued in the fixture) so the oracle compare
    * is exact.
    */
  def qSqlUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("n_items"), col("n_orders"), col("sum_qty")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  /** Shared body of the recursive-CTE BFS (identical text runs in both
    * engines modulo the lineitem table name): min-hop distance from
    * supplier 1 over the sparse co-supply graph, depth-bounded to 3.
    * UNION ALL recursion + outer MIN is the portable BFS form; the
    * depth bound caps path enumeration on the sparse fixture graph.
    */
  private def recursiveBfsSql(lineitem: String): String =
    s"""WITH RECURSIVE und AS (
      |  SELECT DISTINCT least(x.s, y.s) AS a, greatest(x.s, y.s) AS b
      |  FROM (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |        FROM $lineitem WHERE l_quantity = 1.0) x
      |  JOIN (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |        FROM $lineitem WHERE l_quantity = 1.0) y
      |    ON x.p = y.p AND x.s < y.s),
      |sym AS (SELECT a AS u, b AS v FROM und
      |        UNION ALL SELECT b, a FROM und),
      |reach(v, hops) AS (
      |  SELECT CAST(1 AS BIGINT) AS v, 0 AS hops
      |  UNION ALL
      |  SELECT s.v, r.hops + 1
      |  FROM reach r JOIN sym s ON r.v = s.u
      |  WHERE r.hops < 3)
      |SELECT v AS supplier, MIN(hops) AS hops
      |FROM reach GROUP BY v ORDER BY supplier""".stripMargin

  /** Recursive CTE (WITH RECURSIVE, Spark 4.x): bounded BFS. */
  def qSqlRecursive(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(recursiveBfsSql("lineitem_v"))
  }

  /** Typed COGROUP (KeyValueGroupedDataset.cogroup): per-key streams
    * of two datasets processed together by arbitrary Scala — the typed
    * escape hatch when a join + agg can't express per-group logic
    * (here it can, which is what makes it oracle-checkable: customers
    * cogrouped with their orders → order count + exact cent sum, the
    * LEFT JOIN + GROUP BY twin). Scale shape: one co-partitioned
    * shuffle on the key, no driver involvement; money folds in integer
    * cents (Exact.scala discipline).
    */
  def qTypedCogroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .as[(Long, Double)].groupByKey(_._1)
    val ords = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"))
      .as[(Long, Double)].groupByKey(_._1)
    cust.cogroup(ords) { (k, cs, os) =>
      val cl = cs.toSeq
      if (cl.isEmpty) Iterator.empty // orders of unknown customers
      else {
        var n = 0L
        var cents = 0L
        os.foreach { o => n += 1; cents += math.round(o._2 * 100) }
        Iterator((k, cl.head._2, n, cents))
      }
    }.toDF("c_custkey", "acctbal", "n_orders", "sum_price_cents")
      .orderBy(col("c_custkey"))
  }

  val defs: Map[String, Q] = Map(
    "q_typed_cogroup" -> (qTypedCogroup(_, _)),
    "q_typed_joinwith" -> (qTypedJoinwith(_, _)),
    "q_sql_not_in_null" -> (qSqlNotInNull(_, _)),
    "q_sql_recursive" -> (qSqlRecursive(_, _)),
    "q18_large_orders" -> (q18LargeOrders(_, _)),
    "q_sql_unpivot" -> (qSqlUnpivot(_, _)),
    "q_sql_exists" -> (qSqlExists(_, _)),
    "q_sql_grouping_sets" -> (qSqlGroupingSets(_, _)),
    "q_sql_pivot" -> (qSqlPivot(_, _)),
    "q_sql_scalar_subquery" -> (qSqlScalarSubquery(_, _)),
    "q_sql_lateral_explode" -> (qSqlLateralExplode(_, _)),
    "q_sql_lateral_join" -> (qSqlLateralJoin(_, _)),
    "q_typed_dataset" -> (qTypedDataset(_, _))
  )

  val oracles: Map[String, String] = Map(
    // identical three-valued logic — both engines are ANSI here
    "q_sql_not_in_null" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN c_custkey NOT IN
        |    (SELECT nullif(o_custkey, 7) FROM orders)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS not_in_survivors,
        |  CAST(SUM(CASE WHEN NOT EXISTS
        |    (SELECT 1 FROM orders o
        |     WHERE nullif(o.o_custkey, 7) = c.c_custkey)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS not_exists_survivors,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer c
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // max-by (cents, orderkey) replayed as a rank-1 window
    "q_typed_joinwith" ->
      """WITH j AS (SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY c.c_custkey
        |      ORDER BY CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
        |        DESC, o.o_orderkey DESC) AS rn
        |  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey)
        |SELECT c_custkey, c_name, o_orderkey AS best_orderkey,
        |  cents AS best_cents
        |FROM j WHERE rn = 1
        |ORDER BY c_custkey""".stripMargin,
    "q_typed_cogroup" ->
      """SELECT c.c_custkey, c.c_acctbal AS acctbal,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(coalesce(SUM(CAST(round(o.o_totalprice * 100, 0)
        |    AS BIGINT)), 0) AS BIGINT) AS sum_price_cents
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_acctbal
        |ORDER BY c.c_custkey""".stripMargin,
    "q_sql_recursive" -> recursiveBfsSql("lineitem"),
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, o_totalprice,
        |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 260)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q_sql_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag, COUNT(*) AS n_items,
        |    COUNT(DISTINCT l_orderkey) AS n_orders,
        |    CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM agg
        |UNION ALL
        |SELECT l_returnflag, 'n_orders', n_orders FROM agg
        |UNION ALL
        |SELECT l_returnflag, 'sum_qty', sum_qty FROM agg
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q_sql_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice < 5000)
        |ORDER BY c_custkey""".stripMargin,
    "q_sql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  round(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    // DuckDB has no LATERAL VIEW; the twin zips two unnests (positions
    // from range(), tokens from the split list) — positional zip is
    // exactly posexplode's contract.
    "q_sql_lateral_explode" ->
      """SELECT doc_id, CAST(unnest(range(len(toks))) AS INT) AS pos,
        |  unnest(toks) AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_sql_lateral_join" ->
      """SELECT c.custkey, o.o_orderkey, o.o_totalprice
        |FROM (SELECT DISTINCT o_custkey AS custkey FROM orders
        |      WHERE o_custkey <= 50) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.custkey, o.o_orderkey""".stripMargin,
    "q_sql_scalar_subquery" ->
      """WITH spend AS (
        |  SELECT o_custkey, round(SUM(o_totalprice), 2) AS s
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey AS custkey, s AS spend
        |FROM spend
        |WHERE s > (SELECT round(SUM(s), 2) / COUNT(*) FROM spend)
        |ORDER BY custkey""".stripMargin,
    "q_sql_pivot" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q_typed_dataset" ->
      """SELECT l_returnflag AS flag, COUNT(*) AS n,
        |  round(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_quantity > 25.0
        |GROUP BY flag ORDER BY flag""".stripMargin
  )
}
