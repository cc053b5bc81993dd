package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Exact._

/** Aggregation battery (SURVEY.md §2-B "Aggregations").
  *
  * Each query is a scan → (filter) → hash-aggregate plan: Catalyst emits
  * partial (map-side) + final aggregation automatically, so at 100 TB the
  * shuffle carries one row per (partition × group), not per input row.
  */
object AggQueries {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: the flagship scan→filter→agg→sort slice. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumFixed($"l_quantity", 2).as("sum_qty"),
        sumFixed($"l_extendedprice", 2).as("sum_base_price"),
        (sum(e2($"l_extendedprice") * (lit(100L) - e2($"l_discount"))) / 10000.0)
          .as("sum_disc_price"),
        (sum(e2($"l_extendedprice") * (lit(100L) - e2($"l_discount"))
          * (lit(100L) + e2($"l_tax"))) / 1000000.0).as("sum_charge"),
        (sumFixed($"l_quantity", 2) / count(lit(1))).as("avg_qty"),
        (sumFixed($"l_extendedprice", 2) / count(lit(1))).as("avg_price"),
        (sumFixed($"l_discount", 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Distinct + plain counts per group (countDistinct exercises the
    * two-phase distinct-aggregate plan).
    */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        count($"l_orderkey").as("n_rows"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .orderBy($"l_returnflag")
  }

  /** Rollup over two grouping columns: subtotals + grand total.
    * Null grouping rows ordered explicitly NULLS FIRST in both engines.
    */
  def qAggRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), sumFixed($"l_quantity", 2).as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Cube over two grouping columns: all grouping-set combinations. */
  def qAggCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sumFixed($"o_totalprice", 2).as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** Approximate aggregates (HLL distinct + percentile_approx)
    * certified against exact recomputation: the sketches themselves
    * differ across engines, so the published columns are the EXACT
    * distinct count plus booleans asserting each approximation landed
    * inside its error bound — |HLL − exact| ≤ 3·rsd·exact, and each
    * approx percentile's EXACT RANK within p·n ± 0.005·n (Spark's
    * percentile_approx rank error is 1/accuracy = 1e-4, so 50×
    * headroom), checked in pure integer arithmetic. Spark's sketches
    * are deterministic on fixed input, so the booleans are stable; the
    * DuckDB twin recomputes the exact side and emits TRUE — a hard
    * oracle over the approximation contract, not the sketch bits.
    *
    * Shape (the propose→certify discipline of ops/Quantiles.scala):
    * one partial-aggregable sketch pass, one conditional-aggregation
    * scan for the proposals' exact ranks (never a per-group sort), one
    * shuffle for the exact distinct count. Driver state: one row per
    * group — bounded.
    */
  def qAggApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = graft.ops.CacheScope.cached(
      Tables.lineitem(spark, dir).select($"l_returnflag".as("flag"),
        $"l_orderkey", $"l_extendedprice".as("x")))
    val approx = li.groupBy($"flag")
      .agg(count(lit(1)).as("n"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        percentile_approx($"x", lit(0.5), lit(10000)).as("amed"),
        percentile_approx($"x", lit(0.95), lit(10000)).as("ap95"))
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    val aggs = approx.toSeq.flatMap { case (f, _, _, amed, ap95) => Seq(
      sum(when($"flag" === f && $"x" <= amed, 1L).otherwise(0L))
        .as(s"rm_$f"),
      sum(when($"flag" === f && $"x" <= ap95, 1L).otherwise(0L))
        .as(s"rp_$f")) }
    val cert = li.agg(aggs.head, aggs.tail: _*).head()
    val checks = approx.toSeq.map { case (f, n, ao, _, _) =>
      val rm = cert.getAs[Long](s"rm_$f")
      val rp = cert.getAs[Long](s"rp_$f")
      // |rank − 0.5n| ≤ 0.005n  ⇔  100·|2·rank − n| ≤ n
      val medianOk = 100L * math.abs(2L * rm - n) <= n
      // |rank − 0.95n| ≤ 0.005n ⇔  10·|20·rank − 19n| ≤ n
      val p95Ok = 10L * math.abs(20L * rp - 19L * n) <= n
      (f, ao, medianOk, p95Ok)
    }.toDF("l_returnflag", "approx_orders", "median_ok", "p95_ok")
    li.groupBy($"flag".as("l_returnflag"))
      .agg(countDistinct($"l_orderkey").as("exact_orders"))
      .join(broadcast(checks), "l_returnflag")
      .select($"l_returnflag", $"exact_orders",
        (abs($"approx_orders" - $"exact_orders")
          <= lit(0.06) * $"exact_orders").as("distinct_ok"),
        $"median_ok", $"p95_ok")
      .orderBy($"l_returnflag")
  }

  /** Mergeable-sketch rollup (Apache DataSketches HLL — the library
    * Spark 4 ships behind hll_sketch_agg/hll_union_agg): per-DAY user
    * sketches — the pre-aggregate a 100 TB pipeline materializes once in
    * a rollup table — UNIONED per event type into the monthly
    * distinct-user estimate WITHOUT re-touching raw events. That
    * re-aggregability is what approx_count_distinct's opaque one-shot
    * estimate (q_agg_approx) cannot give. Certify discipline is the
    * same: a binary sketch can't cross engines, so the exact distinct
    * count rides along and the published check is the boolean
    * "union estimate within ±5%" (≫ the lgK=12 theoretical
    * 1.04/√2¹² ≈ 1.6% bound).
    */
  def qAggHllUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"), $"user_id")
    val daily = ev.groupBy($"event_type", $"day")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
    val monthly = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est"))
    ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
      .join(broadcast(monthly), "event_type")
      .select($"event_type", $"n_days", $"exact_users",
        (abs($"est" - $"exact_users") * 20.0 <= $"exact_users" * 1.0)
          .as("union_ok"))
      .orderBy($"event_type")
  }

  /** Exact sample variance/stddev from integer power sums:
    * var = (n·Σx² − (Σx)²) / (n(n−1)). Both engines do identical integer
    * arithmetic, then one identical double division + sqrt — the
    * Exact.scala discipline applied to second moments. Column choice
    * (integer-valued l_quantity) keeps n·Σx² far below Int64 overflow at
    * sf0.1; for money columns this needs DECIMAL power sums instead.
    */
  def qAggStddev(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = $"l_quantity".cast("long")
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum(q).as("s1"), sum(q * q).as("s2"))
      .select($"l_returnflag", $"n",
        (($"n" * $"s2" - $"s1" * $"s1") / ($"n" * ($"n" - 1)))
          .as("var_qty"),
        sqrt(($"n" * $"s2" - $"s1" * $"s1") / ($"n" * ($"n" - 1)))
          .as("stddev_qty"))
      .orderBy($"l_returnflag")
  }

  /** EXACT percentiles (interpolated, same definition as SQL
    * quantile_cont) — complements the sketch-based q_agg_approx, which
    * can't be oracle-compared.
    */
  def qAggMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitemPar(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.5)).as("median_price"),
        percentile($"l_extendedprice", lit(0.95)).as("p95_price"),
        percentile($"l_quantity", lit(0.25)).as("q1_qty"))
      .orderBy($"l_returnflag")
  }

  /** DECIMAL money path: exact fixed-point aggregation via DecimalType —
    * the alternative to Exact.e2 integer math when power sums would
    * overflow Int64. Decimal sums are order-independent exact in both
    * engines; the output is pinned to DECIMAL(38,2)-rendered-as-string on
    * BOTH sides (Spark's sum yields decimal(28,2), DuckDB's DECIMAL(38,2) —
    * same value, different physical types, so the raw column hash differs).
    */
  def qAggDecimal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        sumDecimalStr($"o_totalprice", 2).as("sum_price_dec"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** WIDE-DECIMAL path: power sums of a money column. Σ(cents²) per row is
    * ~2.5e15 and the group sums reach ~4e19 — PAST Int64.MaxValue — so the
    * Exact.e2 integer route silently wraps; decimal(18,2)² sums accumulate
    * in DECIMAL(38,4) exactly in both engines (overflow asserted in
    * AggDecimalSpec). This is the path money-column variance needs.
    */
  def qAggDecimalWide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = $"o_totalprice".cast("decimal(18,2)")
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        sum(p * p).cast("decimal(38,4)").cast("string").as("sum_price_sq"),
        sumDecimalStr($"o_totalprice", 2).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** max_by/min_by (argmax/argmin aggregates). Spark's max_by is
    * nondeterministic under ordering ties, and DuckDB's arg_max takes
    * no composite key — so the ordering key is made UNIQUE by
    * construction: exact cents × 10^7 + orderkey (fits a long:
    * ≤ 5.5e14 + 1.5e7). Deterministic in both engines, no tie left to
    * break.
    */
  def qAggArgmax(spark: SparkSession, dir: String): DataFrame = {
    val ukey = Exact.e2(col("o_totalprice")) * lit(10000000L) +
      col("o_orderkey")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(max_by(col("o_orderkey"), ukey).as("top_order"),
        min_by(col("o_orderkey"), ukey).as("bottom_order"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** KMV distinct sketches + pairwise set-INTERSECTION estimation over
    * per-source token vocabularies (Beyer et al., SIGMOD'07) — the
    * sketch family member HLL cannot be: the state is the k smallest
    * 60-bit md5 token hashes per source (a deterministic function of
    * the input set, mergeable exactly under Spark's partial
    * aggregation — ≤ k longs per partition cross the shuffle), so
    * union sketches compose by taking the k smallest of the
    * concatenation, the fraction of the union sketch present in both
    * sides estimates Jaccard, and J·D̂(∪) estimates the intersection.
    * The exact pairwise intersection rides along to certify the
    * estimates (~1/√k relative error); every number — sketch hashes,
    * estimates, exact counts — is replayed bit-for-bit by the DuckDB
    * twin because the hash family is the portable md5 one.
    */
  def qAggKmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    // word BIGRAMS, not tokens: the fixture's flat token vocabulary
    // (~31/source) would leave a k=64 sketch unsaturated and the
    // estimator untested; bigram vocabularies run to the hundreds, so
    // the k-th-smallest estimate and its ~1/√k error are real here
    val toks = Tables.documentsPar(spark, dir)
      .select(col("source"),
        explode(graft.ops.TextAnalysis.wordNgrams(col("text"), 2))
          .as("tok"))
      .where(col("tok") =!= "")
    val hashed = toks.withColumn("h",
      expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"))
    val kmv = new graft.functions.KmvAgg(k).asUdaf
    val sk = hashed.groupBy(col("source")).agg(kmv(col("h")).as("sk"))
    def est(c: String) =
      round(when(size(col(c)) < k, size(col(c)).cast("double"))
        .otherwise(lit((k - 1).toDouble * 1152921504606846976.0) /
          element_at(col(c), k).cast("double")), 6)
    val pairs = sk.as("a")
      .join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
      .withColumn("u", expr(
        s"slice(array_sort(array_distinct(concat(ska, skb))), 1, $k)"))
      .withColumn("rho", expr(
        "size(filter(u, x -> array_contains(ska, x)" +
          " and array_contains(skb, x)))"))
      .withColumn("d_a_est", est("ska"))
      .withColumn("d_b_est", est("skb"))
      .withColumn("d_union_est", est("u"))
      .withColumn("j_est",
        round(col("rho").cast("double") / size(col("u")).cast("double"), 6))
      .withColumn("inter_est",
        round(col("rho").cast("double") / size(col("u")).cast("double") *
          est("u"), 6))
    val dist = toks.distinct()
    val exact = dist.as("x")
      .join(dist.as("y"),
        col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"),
        col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter_exact"))
    pairs.join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("d_a_est"),
        col("d_b_est"), col("d_union_est"), col("j_est"), col("inter_est"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Count-Min sketch point-frequency estimation (Cormode &
    * Muthukrishnan 2005) over the token stream — the bounded-state
    * complement to the Misra-Gries heavy-hitters pass: d×w counters
    * (d=4 rows, w=16 — w deliberately tiny so collisions are REAL and
    * the min-over-rows recovery is exercised, not vacuous), each row a
    * different md5-salted hash. Estimates can only overestimate
    * (est ≥ exact always; E[err] ≤ 2N/w per row, min over d rows);
    * the exact per-token counts ride along to certify. The counter
    * grid is pure `groupBy(row, col).sum` — mergeable by addition, so
    * partial aggregation ships ≤ d·w cells per partition at any
    * corpus size; the probe is a broadcast-size join of the (tiny)
    * distinct-token list against the grid. Deterministic cross-engine:
    * the salted hash family is the portable md5 one.
    */
  def qAggCountMin(spark: SparkSession, dir: String): DataFrame =
    countMinEstimates(Tables.documentsPar(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .where(col("tok") =!= ""), d = 4, w = 16)
      .orderBy(col("tok"))

  private def cmCellsOf(r: Int, w: Int) = {
    val cell = expr(
      s"cast(conv(substring(md5(concat('$r:', tok)), 1, 15), 16, 10)" +
        s" as bigint) % $w")
    struct(lit(r).as("r"), cell.as("c"))
  }

  /** The d×w CM counter grid of a single-column `tok` frame — one
    * `groupBy(row, col).sum` (mergeable by addition, so partials ship
    * ≤ d·w cells per partition at any corpus size). */
  private[queries] def cmGrid(toks: DataFrame, d: Int, w: Int)
      : DataFrame =
    toks
      .select(explode(array((0 until d).map(cmCellsOf(_, w)): _*))
        .as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))

  /** The reusable CM core over a single-column `tok` frame:
    * (tok, c_exact, c_est, overcount) for every distinct token. */
  private[queries] def countMinEstimates(toks: DataFrame, d: Int, w: Int)
      : DataFrame = {
    def cellsOf(r: Int) = cmCellsOf(r, w)
    val grid = cmGrid(toks, d, w)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_exact"))
    exact
      .select(col("tok"), col("c_exact"),
        explode(array((0 until d).map(cellsOf): _*)).as("rc"))
      .select(col("tok"), col("c_exact"),
        col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(grid), Seq("r", "c"))
      .groupBy(col("tok"), col("c_exact"))
      .agg(min(col("cnt")).as("c_est"))
      .select(col("tok"), col("c_exact"), col("c_est"),
        (col("c_est") - col("c_exact")).as("overcount"))
  }

  /** COUNT-MIN JOIN-CARDINALITY ESTIMATE (Cormode & Muthukrishnan
    * 2005 §4.2: the CM inner product): |clicks ⋈ purchases| on user_id
    * — the pre-join size estimate an optimizer wants before committing
    * to a join strategy — from two d×w sketches alone:
    * est_r = Σ_c A[r][c]·B[r][c], est = min_r est_r ≥ exact always
    * (collisions only ADD mass). The exact Σ_u a_u·b_u rides along to
    * certify, with the per-row estimates published so the min-over-
    * rows recovery is visible (w = 16 keeps collisions REAL, the
    * q_agg_countmin discipline). Sketch build is one mergeable
    * groupBy(row, col) count per side — at 100 TB two d·w-cell frames
    * meet in a broadcast join while the raw sides never co-shuffle.
    */
  def qAggCmJoinCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"user_id".isNotNull)
    def side(t: String) = ev.filter($"event_type" === t)
      .select($"user_id".cast("string").as("tok"))
    val (d, w) = (4, 16)
    val ga = cmGrid(side("click"), d, w)
    val gb = cmGrid(side("purchase"), d, w)
    // LEFT join so a row whose cells never overlap publishes the CM
    // inner product's true 0 (min_r est_r then reports it) instead of
    // vanishing from the min — every row index survives because each
    // non-empty sketch occupies ≥ 1 cell per row
    val perRow = ga.join(gb.withColumnRenamed("cnt", "cntb"),
        Seq("r", "c"), "left")
      .groupBy($"r")
      .agg(sum($"cnt" * coalesce($"cntb", lit(0L))).as("est_r"))
    val est = perRow.groupBy()
      .agg(min($"est_r").as("cm_est"),
        (0 until d).map(r =>
          sum(when($"r" === r, $"est_r")).as(s"est_r$r")): _*)
    val exact = side("click").groupBy($"tok").agg(count(lit(1)).as("a"))
      .join(side("purchase").groupBy($"tok")
        .agg(count(lit(1)).as("b")), "tok")
      .agg(sum($"a" * $"b").as("exact_card"))
    est.crossJoin(broadcast(exact))
      .select($"exact_card", $"cm_est",
        ($"cm_est" - $"exact_card").as("overcount"),
        $"est_r0", $"est_r1", $"est_r2", $"est_r3")
  }

  /** EXACT mergeable distinct-count rollup via presence BITMAPS — the
    * deterministic counterpart to the HLL rollup (q_agg_hll_union):
    * each (type, day, cell) row carries a 63-bit slice of the user-id
    * presence set (cell = id div 63, bit = id mod 63 — 63 not 64:
    * 1 << 63 overflows signed arithmetic in ANSI engines), daily
    * distincts are popcount sums, and the monthly distinct re-ORs the
    * CELLS without re-reading raw events. bit_or is the aggregate, so
    * partials combine map-side and the shuffle carries one long per
    * populated cell — the roaring-bitmap pattern in plain SQL types.
    * Dense-id domains only (cells ∝ max-id/63); sparse/wide domains →
    * the HLL rollup.
    */
  def qAggBitmapRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"),
        expr("user_id div 63").as("cell"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
          .as("bit"))
      .groupBy($"event_type", $"day", $"cell")
      .agg(bit_or($"bit").as("bits"))
    val daily = cells.groupBy($"event_type", $"day")
      .agg(sum(bit_count($"bits")).as("d"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"d").cast("long").as("sum_daily_distinct"))
    val monthly = cells.groupBy($"event_type", $"cell")
      .agg(bit_or($"bits").as("mbits"))
      .groupBy($"event_type")
      .agg(sum(bit_count($"mbits")).cast("long")
        .as("monthly_distinct"))
    daily.join(monthly, "event_type").orderBy($"event_type")
  }

  val defs: Map[String, Q] = Map(
    "q_agg_bitmap_rollup" -> (qAggBitmapRollup(_, _)),
    "q_agg_countmin" -> (qAggCountMin(_, _)),
    "q_agg_cm_join_card" -> (qAggCmJoinCard(_, _)),
    "q_agg_kmv_intersect" -> (qAggKmvIntersect(_, _)),
    "q_agg_argmax" -> (qAggArgmax(_, _)),
    "q1_pricing_summary" -> (q1PricingSummary(_, _)),
    "q_agg_decimal" -> (qAggDecimal(_, _)),
    "q_agg_decimal_wide" -> (qAggDecimalWide(_, _)),
    "q_agg_median" -> (qAggMedian(_, _)),
    "q_agg_stddev" -> (qAggStddev(_, _)),
    "q_agg_distinct" -> (qAggDistinct(_, _)),
    "q_agg_rollup" -> (qAggRollup(_, _)),
    "q_agg_cube" -> (qAggCube(_, _)),
    "q_agg_approx" -> (qAggApprox(_, _)),
    "q_agg_hll_union" -> (qAggHllUnion(_, _)),
    "q_agg_quantile_sketch" -> (qAggQuantileSketch(_, _)),
    "q_agg_quantile_grouped" -> (qAggQuantileGrouped(_, _))
  )

  /** GROUPED exact deciles per return flag via the driver-state-free
    * KLL path (ops/Quantiles.sketchDecilesByKey) — sketch summaries
    * stay in-plan, bands derive map-side, so the same code runs with
    * millions of groups. Twin: per-group full-sort row_number.
    */
  def qAggQuantileGrouped(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Quantiles.sketchDecilesByKey(
      Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice")

  /** Exact deciles of l_extendedprice by the KLL-sketch-narrowed path
    * (ops/Quantiles.scala): sketch proposes bands, exact counts certify
    * the ε=0.02 rank bound, exact in-band selection publishes the true
    * decile values — only ~10% of rows are ever sorted. The oracle twin
    * recomputes the same integer rank ⌈i·n/10⌉ with a full window sort.
    */
  def qAggQuantileSketch(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Quantiles.sketchDeciles(
      Tables.lineitem(spark, dir), "l_extendedprice")

  val oracles: Map[String, String] = Map(
    "q_agg_bitmap_rollup" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    user_id // 63 AS cell,
        |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT))
        |      AS bits
        |  FROM events GROUP BY 1, 2, 3),
        |daily AS (
        |  SELECT event_type, day, SUM(bit_count(bits)) AS d
        |  FROM cells GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, COUNT(*) AS n_days,
        |    CAST(SUM(d) AS BIGINT) AS sum_daily_distinct
        |  FROM daily GROUP BY 1),
        |monthly AS (
        |  SELECT event_type,
        |    CAST(SUM(bit_count(mbits)) AS BIGINT) AS monthly_distinct
        |  FROM (SELECT event_type, cell, bit_or(bits) AS mbits
        |        FROM cells GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT dd.event_type, dd.n_days, dd.sum_daily_distinct,
        |  monthly.monthly_distinct
        |FROM dd JOIN monthly USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // same d=4 salted hashes into w=16 columns, same min-over-rows
    "q_agg_countmin" -> {
      def cell(r: Int) =
        s"""CAST(list_sum(list_transform(generate_series(1, 15),
           |  dd -> CAST(strpos('0123456789abcdef',
           |      substring(md5('$r:' || tok), dd, 1)) - 1 AS BIGINT)
           |    * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT)
           |  % 16""".stripMargin
      s"""WITH tk AS (
         |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
         |  FROM documents),
         |t AS (SELECT tok FROM tk WHERE tok <> ''),
         |cells AS (
         |  SELECT r, CASE r
         |      WHEN 0 THEN ${cell(0)} WHEN 1 THEN ${cell(1)}
         |      WHEN 2 THEN ${cell(2)} ELSE ${cell(3)} END AS c
         |  FROM t, (SELECT unnest(generate_series(0, 3)) AS r)),
         |grid AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c),
         |exact AS (SELECT tok, count(*) AS c_exact FROM t GROUP BY tok),
         |probes AS (
         |  SELECT tok, c_exact, r, CASE r
         |      WHEN 0 THEN ${cell(0)} WHEN 1 THEN ${cell(1)}
         |      WHEN 2 THEN ${cell(2)} ELSE ${cell(3)} END AS c
         |  FROM exact, (SELECT unnest(generate_series(0, 3)) AS r))
         |SELECT p.tok, p.c_exact, min(g.cnt) AS c_est,
         |  min(g.cnt) - p.c_exact AS overcount
         |FROM probes p JOIN grid g USING (r, c)
         |GROUP BY p.tok, p.c_exact
         |ORDER BY p.tok""".stripMargin
    },
    // same salted md5 grid per side; inner product per row, min over
    // rows; exact Σ a_u·b_u certifier
    "q_agg_cm_join_card" -> {
      def cell(r: Int) =
        s"""CAST(list_sum(list_transform(generate_series(1, 15),
           |  dd -> CAST(strpos('0123456789abcdef',
           |      substring(md5('$r:' || tok), dd, 1)) - 1 AS BIGINT)
           |    * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT)
           |  % 16""".stripMargin
      def gridOf(src: String) =
        s"""(SELECT r, CASE r
           |      WHEN 0 THEN ${cell(0)} WHEN 1 THEN ${cell(1)}
           |      WHEN 2 THEN ${cell(2)} ELSE ${cell(3)} END AS c,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM $src, (SELECT unnest(generate_series(0, 3)) AS r)
           |  GROUP BY 1, 2)""".stripMargin
      s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS tok,
         |    event_type FROM events WHERE user_id IS NOT NULL),
         |a AS (SELECT tok FROM ev WHERE event_type = 'click'),
         |b AS (SELECT tok FROM ev WHERE event_type = 'purchase'),
         |ga AS ${gridOf("a")},
         |gb AS ${gridOf("b")},
         |pr AS (SELECT ga.r,
         |    CAST(SUM(ga.cnt * COALESCE(gb.cnt, 0)) AS BIGINT) AS est_r
         |  FROM ga LEFT JOIN gb USING (r, c) GROUP BY ga.r),
         |e AS (SELECT CAST(MIN(est_r) AS BIGINT) AS cm_est,
         |    MAX(CASE WHEN r = 0 THEN est_r END) AS est_r0,
         |    MAX(CASE WHEN r = 1 THEN est_r END) AS est_r1,
         |    MAX(CASE WHEN r = 2 THEN est_r END) AS est_r2,
         |    MAX(CASE WHEN r = 3 THEN est_r END) AS est_r3
         |  FROM pr),
         |ex AS (SELECT CAST(SUM(ac.cnt * bc.cnt) AS BIGINT)
         |      AS exact_card
         |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |      FROM a GROUP BY tok) ac
         |  JOIN (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |      FROM b GROUP BY tok) bc USING (tok))
         |SELECT exact_card, cm_est, cm_est - exact_card AS overcount,
         |  est_r0, est_r1, est_r2, est_r3
         |FROM e CROSS JOIN ex""".stripMargin
    },
    // same 60-bit md5 token hashes, k smallest per source via
    // row_number, identical union/Jaccard arithmetic
    "q_agg_kmv_intersect" -> {
      def est(c: String) =
        s"""round(CASE WHEN len($c) < 64 THEN CAST(len($c) AS DOUBLE)
           |  ELSE 63.0 * 1152921504606846976.0 / CAST($c[64] AS DOUBLE)
           |  END, 6)""".stripMargin
      s"""WITH tk0 AS (
         |  SELECT source, string_split_regex(text, '\\s+') AS t
         |  FROM documents),
         |tk AS (
         |  SELECT source, array_to_string(t[i:i+1], ' ') AS tok
         |  FROM (SELECT source, t, unnest(generate_series(1,
         |          greatest(len(t) - 1, 1))) AS i FROM tk0)),
         |t AS (SELECT DISTINCT source, tok FROM tk WHERE tok <> ''),
         |h AS (
         |  SELECT DISTINCT source,
         |    CAST(list_sum(list_transform(generate_series(1, 15),
         |      dd -> CAST(strpos('0123456789abcdef',
         |          substring(md5(tok), dd, 1)) - 1 AS BIGINT)
         |        * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT)
         |      AS h
         |  FROM t),
         |r AS (SELECT source, h, row_number() OVER (
         |        PARTITION BY source ORDER BY h) AS rn FROM h),
         |sk AS (SELECT source, list(h ORDER BY h) AS sk
         |       FROM r WHERE rn <= 64 GROUP BY source),
         |p AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    a.sk AS ska, b.sk AS skb
         |  FROM sk a JOIN sk b ON a.source < b.source),
         |pu AS (SELECT *,
         |         list_sort(list_distinct(list_concat(ska, skb)))[1:64]
         |           AS u
         |       FROM p),
         |pr AS (SELECT *,
         |         len(list_filter(u, x -> list_contains(ska, x)
         |           AND list_contains(skb, x))) AS rho
         |       FROM pu),
         |ex AS (
         |  SELECT x.source AS source_a, y.source AS source_b,
         |    count(*) AS n_inter_exact
         |  FROM t x JOIN t y
         |    ON x.tok = y.tok AND x.source < y.source
         |  GROUP BY 1, 2)
         |SELECT pr.source_a, pr.source_b,
         |  ${est("ska")} AS d_a_est,
         |  ${est("skb")} AS d_b_est,
         |  ${est("u")} AS d_union_est,
         |  round(CAST(rho AS DOUBLE) / CAST(len(u) AS DOUBLE), 6)
         |    AS j_est,
         |  round(CAST(rho AS DOUBLE) / CAST(len(u) AS DOUBLE)
         |    * ${est("u")}, 6) AS inter_est,
         |  coalesce(ex.n_inter_exact, 0) AS n_inter_exact
         |FROM pr LEFT JOIN ex USING (source_a, source_b)
         |ORDER BY source_a, source_b""".stripMargin
    },
    "q_agg_quantile_sketch" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |cnt AS (SELECT count(*) AS n FROM v),
        |ps AS (SELECT unnest(generate_series(1, 9)) AS i),
        |r AS (SELECT i, i / 10.0 AS p,
        |        greatest(1, (i * n + 9) // 10) AS r, n
        |      FROM ps CROSS JOIN cnt),
        |s AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v)
        |SELECT p, s.x AS exact_value, r.n AS n, TRUE AS rank_ok
        |FROM r JOIN s ON s.rn = r.r
        |ORDER BY p""".stripMargin,
    "q_agg_quantile_grouped" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS x
        |           FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL
        |             AND l_returnflag IS NOT NULL),
        |cnt AS (SELECT g, count(*) AS n FROM v GROUP BY g),
        |ps AS (SELECT unnest(generate_series(1, 9)) AS i),
        |r AS (SELECT g, i, i / 10.0 AS p,
        |        greatest(1, (i * n + 9) // 10) AS r, n
        |      FROM cnt CROSS JOIN ps),
        |s AS (SELECT g, x, row_number() OVER (
        |        PARTITION BY g ORDER BY x) AS rn FROM v)
        |SELECT r.g AS l_returnflag, p, s.x AS exact_value, r.n,
        |  TRUE AS rank_ok
        |FROM r JOIN s ON s.g = r.g AND s.rn = r.r
        |ORDER BY l_returnflag, p""".stripMargin,
    // exact side + claimed-true certification booleans (the sketch
    // bytes themselves can't cross engines — q_agg_approx discipline)
    "q_agg_hll_union" ->
      """SELECT event_type,
        |  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  COUNT(DISTINCT user_id) AS exact_users, TRUE AS union_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_agg_approx" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS distinct_ok, TRUE AS median_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_argmax" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 10000000
        |      + o_orderkey) AS top_order,
        |  arg_min(o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 10000000
        |      + o_orderkey) AS bottom_order,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(SUM(l_quantity), 2) AS sum_qty,
        |  round(SUM(l_extendedprice), 2) AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT)) * (100 + CAST(round(l_tax*100,0) AS BIGINT))) AS BIGINT) / 1000000.0 AS sum_charge,
        |  round(SUM(l_quantity), 2) / COUNT(*) AS avg_qty,
        |  round(SUM(l_extendedprice), 2) / COUNT(*) AS avg_price,
        |  round(SUM(l_discount), 2) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_decimal" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS VARCHAR) AS sum_price_dec,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_decimal_wide" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
        |    * CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4))
        |    AS VARCHAR) AS sum_price_sq,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS VARCHAR) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS median_price,
        |  quantile_cont(l_extendedprice, 0.95) AS p95_price,
        |  quantile_cont(l_quantity, 0.25) AS q1_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_stddev" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  (COUNT(*) * SUM(q*q) - SUM(q)*SUM(q))
        |    / (COUNT(*) * (COUNT(*) - 1)) AS var_qty,
        |  sqrt((COUNT(*) * SUM(q*q) - SUM(q)*SUM(q))
        |    / (COUNT(*) * (COUNT(*) - 1))) AS stddev_qty
        |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(l_orderkey) AS n_rows,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  round(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  round(SUM(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
