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
    * running max over the |distinct x| aggregated rows is the
    * range-partitioned two-pass prefix scan ([[Prefix]]): per-range
    * local prefix max + a carry-in over the per-partition totals (a
    * window bounded by PARTITION COUNT, not data), so even a huge
    * distinct-x domain never serializes through one task. At 100 TB
    * the aggregate does the heavy lifting distributed and the prefix
    * stays distributed with it.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = pts.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__my"))
    val maxima = Prefix.runningMaxExclusive(
      perX, Seq(col("__x")), col("__my"), "__M")
    pts.join(maxima, pts(xCol) === maxima("__x"))
      .filter(!(coalesce(col("__M") >= col(yCol), lit(false))
        || col("__my") > col(yCol)))
      .drop("__x", "__my", "__M")
  }

  /** Exact 3-D skyline by the two-phase distributed algorithm (the
    * sort-based 2-D trick stops at two dimensions): phase 1 computes a
    * LOCAL skyline per partition (a point only survives if no partition
    * peer dominates it — dominance is transitive-free but local
    * filtering is sound because a dominated point stays dominated
    * globally), phase 2 merges the surviving candidates by LOGARITHMIC
    * HALVING (the [[skylineND]] loop): each round coalesces pairs of
    * partitions and re-filters, so every task is bounded by two
    * frontiers even in anti-correlated worst cases where Σ local
    * frontier sizes is itself huge. The skyline is a unique SET, so
    * the result is deterministic regardless of partitioning and merge
    * order; ties (equal vectors) all survive.
    *
    * This is the documented `mapPartitions` exception: the in-memory
    * pairwise frontier filter has no relational equivalent that isn't
    * the quadratic self-join the oracle runs.
    *
    * @param key  unique row key (survivors re-attach by semi-join)
    * @param dims exactly three (column, minimize?) specs
    */
  def skyline3D(df: DataFrame, key: String,
                dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.size == 3, "skyline3D takes exactly three dimensions")
    val keyType = df.schema(key).dataType
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType")
        .contains(keyType.toString),
      s"skyline3D requires an integral key column (survivors re-attach " +
        s"by an exact long join); got $keyType for '$key' — hash or " +
        "surrogate-key non-numeric ids first")
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(
      col(key).cast("long").as("__k") +:
        dims.zipWithIndex.map { case ((c, minimize), i) =>
          (if (minimize) col(c) else -col(c)).cast("double").as(s"__d$i")
        }: _*)
      .filter(col("__d0").isNotNull && col("__d1").isNotNull
        && col("__d2").isNotNull)
      .as[(Long, Double, Double, Double)]
    def dominates(q: (Long, Double, Double, Double),
                  p: (Long, Double, Double, Double)): Boolean =
      q._2 <= p._2 && q._3 <= p._3 && q._4 <= p._4 &&
        (q._2 < p._2 || q._3 < p._3 || q._4 < p._4)
    def localSkyline(it: Iterator[(Long, Double, Double, Double)])
        : Iterator[(Long, Double, Double, Double)] = {
      val frontier =
        scala.collection.mutable.ArrayBuffer
          .empty[(Long, Double, Double, Double)]
      it.foreach { p =>
        if (!frontier.exists(q => dominates(q, p))) {
          val kept = frontier.filterNot(q => dominates(p, q))
          frontier.clear(); frontier ++= kept; frontier += p
        }
      }
      frontier.iterator
    }
    // merge by logarithmic halving (the skylineND loop): each round
    // coalesces pairs of partitions — no shuffle — and re-filters, so
    // no task ever holds more than two frontiers' worth of candidates
    // even when Σ local-frontier sizes is large (anti-correlated data).
    var cur = proj.mapPartitions(localSkyline)
    var parts = cur.rdd.getNumPartitions
    while (parts > 1) {
      parts = (parts + 1) / 2
      cur = cur.coalesce(parts).mapPartitions(localSkyline)
    }
    val survivors = cur.toDF("__k", "__d0", "__d1", "__d2")
    df.join(survivors.select(col("__k")),
      col(key).cast("long") === col("__k"), "left_semi")
  }

  /** Exact N-dimensional skyline — the divide-and-conquer generalization
    * of [[skyline3D]] (Börzsönyi et al., ICDE'01, §D&C): a local
    * frontier per partition, then LOGARITHMIC HALVING merge rounds
    * instead of one single-task union — each round coalesces pairs of
    * partitions (no shuffle) and re-filters, so for anti-correlated
    * data where Σ local-frontier sizes is itself large, no single task
    * ever sees the full candidate union at once; the final task sees
    * only the survivors of log₂(p) prior prunes. The skyline is a
    * unique set, so the result is independent of partitioning and merge
    * order; ties (equal vectors) all survive.
    *
    * Dominance per [[skyline3D]]: every dim ≤ with at least one strict,
    * after minimize/maximize normalization. Null dims are excluded
    * (incomparable). The in-memory frontier filter is the documented
    * `mapPartitions` exception — its only relational equivalent is the
    * quadratic self-join the oracle runs.
    */
  def skylineND(df: DataFrame, key: String,
                dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.size >= 2, "skylineND needs at least two dimensions")
    val keyType = df.schema(key).dataType
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType")
        .contains(keyType.toString),
      s"skylineND requires an integral key column; got $keyType for " +
        s"'$key' — hash or surrogate-key non-numeric ids first")
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df
      .filter(dims.map { case (c, _) => col(c).isNotNull }.reduce(_ && _))
      .select(col(key).cast("long").as("__k"),
        array(dims.map { case (c, minimize) =>
          (if (minimize) col(c) else -col(c)).cast("double")
        }: _*).as("__d"))
      .as[(Long, Seq[Double])]
    def dominates(q: Seq[Double], p: Seq[Double]): Boolean = {
      var allLe = true
      var anyLt = false
      var i = 0
      while (allLe && i < q.length) {
        if (q(i) > p(i)) allLe = false
        else if (q(i) < p(i)) anyLt = true
        i += 1
      }
      allLe && anyLt
    }
    def localSkyline(it: Iterator[(Long, Seq[Double])])
        : Iterator[(Long, Seq[Double])] = {
      val frontier =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
      it.foreach { p =>
        if (!frontier.exists(q => dominates(q._2, p._2))) {
          val kept = frontier.filterNot(q => dominates(p._2, q._2))
          frontier.clear(); frontier ++= kept; frontier += p
        }
      }
      frontier.iterator
    }
    var cur = proj.mapPartitions(localSkyline)
    var parts = cur.rdd.getNumPartitions
    while (parts > 1) {
      parts = (parts + 1) / 2
      cur = cur.coalesce(parts).mapPartitions(localSkyline)
    }
    df.join(cur.toDF("__k", "__d").select(col("__k")),
      col(key).cast("long") === col("__k"), "left_semi")
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
        // Numerator widened to DECIMAL(38,0): at 100 TB (n_baskets ~1e10,
        // cnt_ab ~1e6) the BIGINT product would silently wrap in
        // non-ANSI mode. `div` over decimals still yields BIGINT ppm.
        expr("cast(cnt_ab as decimal(38,0)) * n_baskets * 1000000" +
            " div (cast(cnt_a as decimal(38,0)) * cnt_b)")
          .as("lift_ppm"))
  }
}
