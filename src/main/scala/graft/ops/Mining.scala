package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mining operators: Pareto frontier (skyline) and market-basket
  * association pairs — the "insight" queries an analytics service fields
  * once the relational surface exists. (The reference delegates all
  * analytics to user DAGs, SURVEY §2-B; these are the canonical shapes.)
  */
object Mining {

  /** Exact 2-D skyline (Börzsönyi et al., ICDE'01): the set of rows not
    * dominated under (minimize `xCol`, maximize `yCol`) — q dominates p
    * iff q.x ≤ p.x ∧ q.y ≥ p.y with at least one strict. Null x/y rows
    * are excluded (incomparable).
    *
    * Shape: the naive formulation is a quadratic NOT-EXISTS self-join
    * (the oracle twin runs exactly that); this implementation is the
    * sort-based linear one — a point is dominated iff
    * max{y' : x' < x} ≥ y (strictly-cheaper dominator) or
    * max{y' : x' = x} > y (same-price dominator). Per-x maxima come from
    * ONE hash aggregate (map-side partial over the full table); the
    * running max is a window over the |distinct x| aggregated rows only —
    * the frontier prefix-scan is inherently sequential in x, and the
    * window input is already reduced from O(n) to O(|distinct x|). At
    * 100 TB the aggregate does the heavy lifting distributed; if distinct
    * x itself is huge, the prefix-max generalizes to a range-partitioned
    * two-pass scan (per-partition max + broadcast prefix), same contract.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = pts.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__my"))
    val prefix = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val maxima = perX.withColumn("__M", max(col("__my")).over(prefix))
    pts.join(maxima, pts(xCol) === maxima("__x"))
      .filter(!(coalesce(col("__M") >= col(yCol), lit(false))
        || col("__my") > col(yCol)))
      .drop("__x", "__my", "__M")
  }

  /** Market-basket association pairs (Agrawal & Srikant, VLDB'94 —
    * Apriori's pair stage): co-occurrence counts and exact integer lift
    * for every item pair appearing in a basket together.
    *
    * `minItemSupport` is the Apriori level-1 prune: items below the
    * support floor are dropped BEFORE pairing, which is what bounds the
    * within-basket self-join — the quadratic blowup on a hub basket is
    * quadratic only in its count of FREQUENT items. Lift is published as
    * exact integer parts-per-million (`cnt_ab·n_baskets·10⁶ div
    * (cnt_a·cnt_b)`), bit-identical cross-engine — the same determinism
    * doctrine as [[Graph.pagerank]].
    *
    * Shape: one distinct (basket, item) aggregate, one self-equi-join on
    * basket, one pair aggregate, two item-count joins (Catalyst
    * broadcasts the item-count side when small). No driver actions.
    */
  def assocPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                 minItemSupport: Long = 1L): DataFrame = {
    val items = CacheScope.cached(
      baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
        .distinct())
    val itemCnt = CacheScope.cached(
      items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= minItemSupport))
    val frequent = items.join(itemCnt, "__i")
      .select(col("__b"), col("__i"))
    val nBaskets = items.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = frequent.as("x")
      .join(frequent.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("cnt_ab"))
    pairs
      .join(itemCnt.select(col("__i").as("item_a"), col("__c").as("cnt_a")),
        "item_a")
      .join(itemCnt.select(col("__i").as("item_b"), col("__c").as("cnt_b")),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("cnt_ab"), col("cnt_a"),
        col("cnt_b"), col("n_baskets"),
        expr("cnt_ab * n_baskets * 1000000L div (cnt_a * cnt_b)")
          .as("lift_ppm"))
  }
}
