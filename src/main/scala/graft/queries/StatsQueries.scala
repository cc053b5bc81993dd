package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Selection
import Exact._

/** Statistical-profiling aggregate battery (SURVEY.md §2-B "Aggregations",
  * extended: the column-statistics surface an ETL service's admission /
  * profiling step needs — correlation, regression, mode, histograms,
  * boolean and bitwise reductions, ordered string aggregation).
  *
  * Cross-engine exactness doctrine (see [[Exact]]): every moment is
  * aggregated as an exact BIGINT sum (order-independent integer
  * arithmetic in both engines), and the floating-point formulas are
  * applied ONCE, identically, on the already-exact sums — so corr /
  * slope / covariance are bit-identical across Spark and DuckDB even
  * though their native `corr()` implementations stream doubles in
  * different orders.
  *
  * Scale shape: every query here is scan → single hash-aggregate →
  * (tiny) projection. Partial aggregation runs map-side; the shuffle
  * carries one row per (partition × group). At 100 TB the BIGINT moment
  * sums are the only thing crossing the wire.
  */
object StatsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Pearson correlation + sample covariance + OLS slope/intercept of
    * (x = l_quantity, y = l_discount·100) per return flag, from exact
    * integer moment sums. Overflow audit: x ≤ 50, y ≤ 10; at SF100
    * (~600M rows/group) sxy ≤ 3e11, n·sxy ≤ 1.8e20 — beyond Int64, so
    * the n-scaled products are computed in DOUBLE on the already-exact
    * sums (identical IEEE ops on identical inputs in both engines).
    * The denominator product (n·sxx−sx²)·(n·syy−sy²) would overflow
    * even at sf0.1, so each factor takes sqrt separately.
    */
  def qAggCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = $"l_quantity".cast("long")
    val y = e2($"l_discount")
    val sums = Tables.lineitem(spark, dir)
      .select($"l_returnflag", x.as("x"), y.as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
    val n = $"n".cast("double")
    val num = n * $"sxy" - $"sx".cast("double") * $"sy"
    sums.select(
      $"l_returnflag",
      $"n",
      (num / (n * (n - 1))).as("covar_samp"),
      (num / (sqrt(n * $"sxx" - $"sx".cast("double") * $"sx")
        * sqrt(n * $"syy" - $"sy".cast("double") * $"sy"))).as("corr_qd"),
      (num / (n * $"sxx" - $"sx".cast("double") * $"sx")).as("regr_slope"),
      (($"sy".cast("double")
        - (num / (n * $"sxx" - $"sx".cast("double") * $"sx")) * $"sx") / n)
        .as("regr_intercept"))
      .orderBy($"l_returnflag")
  }

  /** Deterministic mode: most frequent l_quantity per return flag,
    * smallest value wins ties. Engines' native `mode()` breaks ties
    * arbitrarily, so the tie is removed by construction: arg-max over
    * the unique key cnt·100 − q (q ≤ 50 < 100). Two hash aggregates,
    * both map-side partial; the second one's input is one row per
    * (flag, quantity) — tiny.
    */
  def qAggMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("q"))
      .groupBy($"l_returnflag", $"q").agg(count(lit(1)).as("cnt"))
      .groupBy($"l_returnflag")
      .agg(max_by($"q", $"cnt" * 100 - $"q").as("mode_qty"),
        max($"cnt").as("mode_count"),
        count(lit(1)).as("n_distinct"))
      .orderBy($"l_returnflag")
  }

  /** Ordered string aggregation (LISTAGG / string_agg): the names of a
    * region's nations as one sorted CSV cell. `collect_list` is
    * order-nondeterministic under shuffle, so the deterministic form is
    * collect → `array_sort` → `array_join` — the exact semantics of
    * `string_agg(x, ',' ORDER BY x)`. Broadcast-joined dims; the
    * aggregate state (a short array) is the only shuffled payload.
    */
  def qAggListagg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.region(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        $"r_regionkey" === $"n_regionkey")
      .groupBy($"r_name")
      .agg(array_join(array_sort(collect_list($"n_name")), ",")
          .as("nations_csv"),
        count(lit(1)).as("n_nations"))
      .orderBy($"r_name")
  }

  /** Fixed-width histogram of order totals: 12 × $50k buckets (last
    * bucket open-ended). The bucket id is exact integer arithmetic on
    * cents — `least(cents div 5_000_000, 11)` — so no float boundary
    * can land a row in different buckets across engines. One
    * hash-aggregate; at 100 TB the shuffle carries ≤ 12 rows per map
    * partition.
    */
  def qAggHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(least(e2($"o_totalprice").divide(lit(5000000L)).cast("long"),
        lit(11L)).as("bucket"), $"o_totalprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        sumFixed($"o_totalprice", 2).as("sum_price"))
      .withColumn("bucket_lo_usd", $"bucket" * 50000L)
      .select($"bucket", $"bucket_lo_usd", $"n", $"sum_price")
      .orderBy($"bucket")
  }

  /** Boolean + bitwise + filtered-count reductions per return flag:
    * every/any predicates, count_if, and bit_and/or/xor over the
    * quantity — all single-pass, map-side-partial aggregates.
    */
  def qAggBoolBits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("q"),
        $"l_discount", $"l_tax")
      .groupBy($"l_returnflag")
      .agg(
        every($"l_discount" <= 0.10).as("all_disc_le10"),
        some($"q" >= 50).as("any_qty_50"),
        count_if($"l_tax" === 0.0).as("n_tax_free"),
        bit_and($"q").as("qty_bit_and"),
        bit_or($"q").as("qty_bit_or"),
        bit_xor($"q").as("qty_bit_xor"))
      .orderBy($"l_returnflag")
  }

  /** Winsorized statistics per event type: clamp `value` into its
    * type's [P5, P95] band, where the bounds are RANK-SELECTED values
    * (percentile_disc semantics — a value the data contains, picked at
    * rank ⌈p·n⌉, never interpolated, so both engines select the
    * identical double), then exact integer-cent sums of the clamped
    * column. The outlier-robust mean every metrics pipeline publishes
    * next to the raw one.
    *
    * Scale plan: rank selection is a per-type window over the shuffled
    * (type, value) pairs (state = one type's values; for corpus-scale
    * types the KLL propose-certify path computes the same two
    * boundaries without the sort — documented trade); bounds re-attach
    * by broadcast; the clamp + sums are one map-side pass.
    */
  def qStatWinsorized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = graft.ops.CacheScope.cached(
      Tables.events(spark, dir).select($"event_type", $"value")
        .filter($"value".isNotNull))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value")
    val ranked = e.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type")))
    val bounds = ranked
      .filter($"rk" === ceil($"n" * 0.05) || $"rk" === ceil($"n" * 0.95))
      .groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    e.join(broadcast(bounds), "event_type")
      .withColumn("wv", least(greatest($"value", $"lo"), $"hi"))
      .groupBy($"event_type")
      .agg(min($"lo").as("lo"), min($"hi").as("hi"),
        count(lit(1)).as("n"),
        (round(sum(graft.queries.Exact.e2($"wv")), 0) / 100.0)
          .as("sum_w"),
        count(when($"value" < $"lo" || $"value" > $"hi", 1))
          .as("n_clamped"))
      .orderBy($"event_type")
  }

  /** MAD-based robust outlier detection (Hampel's 3-MAD rule): per
    * event type, the lower-tail-robust alternative to z-scores — median,
    * median absolute deviation, and the count of |v − med| > 3·MAD.
    * All arithmetic is IEEE-exact (abs / subtract / ×3 / compare) and
    * the medians interpolate identically cross-engine, so the oracle is
    * hard. Shape: two grouped aggregates + two broadcast joins of the
    * 5-row per-type stats back onto events — events shuffle on
    * event_type once per pass, never collected.
    */
  def qStatMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = graft.ops.CacheScope.cached(
      Tables.events(spark, dir).select($"event_type", $"value"))
    val med = e.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("med"))
    val dev = graft.ops.CacheScope.cached(
      e.join(broadcast(med), "event_type")
        .withColumn("adev", abs($"value" - $"med")))
    val mad = dev.groupBy($"event_type")
      .agg(min($"med").as("med"), percentile($"adev", lit(0.5)).as("mad"),
        count(lit(1)).as("n"))
    dev.select($"event_type", $"adev")
      .join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(min($"med").as("med"), min($"mad").as("mad"),
        count(when($"adev" > lit(3.0) * $"mad", 1)).as("n_outliers"),
        min($"n").as("n"))
      .orderBy($"event_type")
  }

  /** Chi-square contingency analysis of order status × priority: per
    * cell, observed count, expected count under independence, and the
    * cell's χ² contribution. Counts and margin products are exact
    * BIGINTs; the two divisions and the squared difference are single
    * IEEE operations in a fixed order — bit-identical cross-engine. The
    * scalar χ² total is the consumer's fold over the |cells| rows (kept
    * per-cell here: a cross-cell double sum has no canonical order).
    */
  def qStatChi2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        $"o_orderpriority".as("priority"))
    val obs = o.groupBy($"status", $"priority")
      .agg(count(lit(1)).as("obs"))
    val rowT = o.groupBy($"status").agg(count(lit(1)).as("row_n"))
    val colT = o.groupBy($"priority").agg(count(lit(1)).as("col_n"))
    val n = o.agg(count(lit(1)).as("n"))
    obs.join(broadcast(rowT), "status")
      .join(broadcast(colT), "priority")
      .crossJoin(broadcast(n))
      .withColumn("expected",
        (($"row_n" * $"col_n").cast("double")) / $"n")
      .select($"status", $"priority", $"obs", $"expected",
        (($"obs" - $"expected") * ($"obs" - $"expected") / $"expected")
          .as("chi2_contrib"))
      .orderBy($"status", $"priority")
  }

  /** BROWN–FORSYTHE (Levene-with-medians, 1974) variance-homogeneity
    * test across event types — the assumption gate q_stat_anova's F
    * test rests on, run on the same calendar-bounded daily table:
    * one-way ANOVA on zᵢ = |vᵢ − median_g| with the LOWER median
    * (integer — the q_stat_runs convention), so every deviation is an
    * exact integer. The α=0.05 verdict (F crit by df₁ = k−1 at
    * df₂→∞, CASE-selected — 3.841 … 2.099 for k = 2…7+)
    * is a cross-multiplied DECIMAL(38)/HUGEINT comparison
    * with common denominator P = Πn_g (the q_stat_kruskal device):
    * (Q·N − T²·P)·(N−k)·1000 > 2372·(S2·P − Q)·N·(k−1),
    * Q = Σ T_g²·(P/n_g). Robustness to non-normality is the whole
    * point of the median variant — the daily-count fixture is
    * Poisson-ish, exactly where plain Levene misleads.
    */
  /** ANSARI–BRADLEY SCALE TEST (Ansari & Bradley, AMS 1960): do daily
    * click and view volumes differ in DISPERSION? Scores run from both
    * ends of the combined order (a(p) = min(p, N+1−p)); T = Σ scores
    * of sample A; two-sided normal verdict via the exact permutation
    * variance of a linear rank statistic. Completes the scale battery:
    * q_stat_levene needs a location estimate (moments on deviations),
    * q_stat_qn is an absolute estimator — Ansari–Bradley tests scale
    * with NO location estimate, robust to monotone contamination.
    *
    * Exactness with ties: per distinct value the block integers
    * (S2 = Σ doubled end-scores over the block's positions, t, cA)
    * are exact BIGINTs from a running-count window + position
    * explode; each tied average S2/t is ONE double division and the
    * block terms fold in VALUE order (sort_array + aggregate HOF ≡
    * the twin's list_sum over an ORDER BY v list — identical IEEE
    * sequence, the q_time_holt fold discipline). |z| > 1.96 on
    * identical doubles.
    *
    * Scale shape: the raw scan collapses to the value histogram
    * (calendar-bounded here, domain-bounded in general — the
    * q_stat_kendall boundedness argument); everything after is
    * metadata-sized.
    */
  def qStatAnsari(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("y"))
    ansariFromSamples(
      daily.select(lit("a").as("g"), $"x".as("v"))
        .unionByName(daily.select(lit("b").as("g"), $"y".as("v"))))
  }

  /** LEPAGE TEST (Lepage, Biometrika 1971): the combined
    * LOCATION-AND-SCALE two-sample screen D = z_W² + z_AB² — the
    * standardized Wilcoxon rank-sum (location) plus the standardized
    * Ansari–Bradley (scale), χ²(2) under H₀. The battery's location
    * tests miss a pure scale shift and vice versa; Lepage is the
    * standard single-gate alternative when either change matters
    * (the two components are asymptotically independent, Lepage's own
    * result). Verdict vs χ²₀.₀₅(2) = 5.991465.
    *
    * Exactness: both components read the SAME value histogram.
    * z_W² is computed entirely from exact integers — doubled tied
    * ranks r2 = 2·cumt + t + 1 (the kruskal doctrine) give
    * W2 = Σ ca·r2 = 2W exactly; the tie-corrected variance folds into
    * the single rational z_W² = 3·N·(N−1)·(W2 − m(N+1))² /
    * (m·n_b·(N³−N−ΣT)) carried in DECIMAL(38,0) until ONE double
    * division. z_AB is [[ansariFromSamples]]'s statistic verbatim
    * (exact BIGINT block scores, tied averages folded in value order,
    * exact permutation variance). D adds the two doubles once —
    * deterministic by shape, twin-replayable.
    */
  def qStatLepage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("y"))
    lepageFromSamples(
      daily.select(lit("a").as("g"), $"x".as("v"))
        .unionByName(daily.select(lit("b").as("g"), $"y".as("v"))))
  }

  /** Lepage core on a (g ∈ {a, b}, v: long) frame — see
    * [[qStatLepage]]. Exposed for LepageSpec brute parity. Same
    * caller-enforced bounded-value-domain contract as
    * [[ansariFromSamples]]. */
  private[queries] def lepageFromSamples(s: DataFrame): DataFrame = {
    import s.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = s.groupBy($"v").agg(count(lit(1)).as("t"),
      sum(when($"g" === "a", 1L).otherwise(0L)).as("ca"))
    val w = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = hist
      .withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
    val tot = blocks.agg(sum($"t").as("nn"), sum($"ca").as("m"))
    // Wilcoxon half: exact integers off the same blocks
    val wilcox = blocks.crossJoin(broadcast(tot))
      .groupBy($"nn", $"m")
      .agg(sum($"ca" * (lit(2L) * $"cumt" + $"t" + 1L)).as("w2"),
        sum($"t" * $"t" * $"t" - $"t").as("tsum"))
    // Ansari half: tied-average scores, ordered fold — the
    // ansariFromSamples pipeline verbatim up to (t2, q2, sum2)
    val s2b = blocks.crossJoin(broadcast(tot))
      .select($"v", $"t", $"ca", $"cumt", $"nn", $"m",
        explode(expr("sequence(1L, t)")).as("i"))
      .select($"v", $"t", $"ca", $"nn", $"m",
        (lit(2L) * least($"cumt" + $"i",
          $"nn" + 1L - ($"cumt" + $"i"))).as("a2"))
      .groupBy($"v", $"t", $"ca", $"nn", $"m")
      .agg(sum($"a2").as("s2"))
    val ans = s2b.groupBy($"nn", $"m")
      .agg(expr("sort_array(collect_list(struct(v, t, ca, s2)))")
        .as("arr"), sum($"s2").as("sum2"))
      .select($"nn", $"m", $"sum2",
        expr("aggregate(arr, 0D, (acc, x) -> acc + " +
          "CAST(x.ca AS DOUBLE) * (CAST(x.s2 AS DOUBLE) " +
          "/ CAST(x.t AS DOUBLE)))").as("t2"),
        expr("aggregate(arr, 0D, (acc, x) -> acc + " +
          "CAST(x.s2 AS DOUBLE) * (CAST(x.s2 AS DOUBLE) " +
          "/ CAST(x.t AS DOUBLE)))").as("q2"))
    val zab = expr("(t2 - CAST(m * sum2 AS DOUBLE) / CAST(nn AS " +
      "DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE) / CAST(nn * " +
      "(nn - 1) AS DOUBLE) * (q2 - CAST(sum2 AS DOUBLE) * sum2 " +
      "/ nn))")
    val zw2 = expr("CAST(CAST(3 AS DECIMAL(38,0)) * nn * (nn - 1) " +
      "* (w2 - m * (nn + 1)) * (w2 - m * (nn + 1)) AS DOUBLE) " +
      "/ CAST(CAST(m AS DECIMAL(38,0)) * (nn - m) " +
      "* (nn * nn * nn - nn - tsum) AS DOUBLE)")
    wilcox.join(ans, Seq("nn", "m"))
      .select($"nn", $"m", ($"nn" - $"m").as("n_b"), $"w2", $"tsum",
        $"sum2", round($"t2", 6).as("t2_r6"),
        zw2.as("zw2"), zab.as("zab"))
      .select($"nn", $"m", $"n_b", $"w2", $"tsum", $"sum2", $"t2_r6",
        round($"zw2", 6).as("zw2_r6"),
        round($"zab" * $"zab", 6).as("zab2_r6"),
        round($"zw2" + $"zab" * $"zab", 6).as("d_r6"),
        ($"zw2" + $"zab" * $"zab" > lit(5.991465)).as("reject"))
  }

  /** Ansari–Bradley core on a (g ∈ {a, b}, v: long) frame — see
    * [[qStatAnsari]]. Exposed for AnsariSpec brute parity.
    *
    * CONTRACT (caller-enforced): the VALUE DOMAIN of `v` must be
    * bounded — the core collapses the scan to a per-distinct-value
    * histogram and then runs a single-partition running-count window
    * plus (here) a one-row collect_list over that histogram. Feed it
    * domain-bounded samples (calendar-day counts, bucketed measures);
    * an unbounded/continuous `v` makes the histogram row count equal
    * the sample count and the single-partition fold a scale killer.
    * The registered callers are calendar-bounded (≤ #days rows). */
  private[queries] def ansariFromSamples(s: DataFrame): DataFrame = {
    import s.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = s.groupBy($"v").agg(count(lit(1)).as("t"),
      sum(when($"g" === "a", 1L).otherwise(0L)).as("ca"))
    val w = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = hist
      .withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
    val tot = blocks.agg(sum($"t").as("nn"), sum($"ca").as("m"))
    val s2b = blocks.crossJoin(broadcast(tot))
      .select($"v", $"t", $"ca", $"cumt", $"nn", $"m",
        explode(expr("sequence(1L, t)")).as("i"))
      .select($"v", $"t", $"ca", $"nn", $"m",
        (lit(2L) * least($"cumt" + $"i",
          $"nn" + 1L - ($"cumt" + $"i"))).as("a2"))
      .groupBy($"v", $"t", $"ca", $"nn", $"m")
      .agg(sum($"a2").as("s2"))
    s2b.groupBy($"nn", $"m")
      .agg(expr("sort_array(collect_list(struct(v, t, ca, s2)))")
        .as("arr"), sum($"s2").as("sum2"))
      .select($"nn", $"m", ($"nn" - $"m").as("n_b"), $"sum2",
        expr("aggregate(arr, 0D, (acc, x) -> acc + " +
          "CAST(x.ca AS DOUBLE) * (CAST(x.s2 AS DOUBLE) " +
          "/ CAST(x.t AS DOUBLE)))").as("t2"),
        expr("aggregate(arr, 0D, (acc, x) -> acc + " +
          "CAST(x.s2 AS DOUBLE) * (CAST(x.s2 AS DOUBLE) " +
          "/ CAST(x.t AS DOUBLE)))").as("q2"))
      .select($"nn", $"m", $"n_b", $"sum2", round($"t2", 6).as("t2_r6"),
        expr("round((t2 - CAST(m * sum2 AS DOUBLE) / CAST(nn AS " +
          "DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE) / CAST(nn * " +
          "(nn - 1) AS DOUBLE) * (q2 - CAST(sum2 AS DOUBLE) * sum2 " +
          "/ nn)), 6)").as("z_r6"),
        expr("abs((t2 - CAST(m * sum2 AS DOUBLE) / CAST(nn AS " +
          "DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE) / CAST(nn * " +
          "(nn - 1) AS DOUBLE) * (q2 - CAST(sum2 AS DOUBLE) * sum2 " +
          "/ nn))) > 1.959963984540054").as("reject"))
  }

  /** MOOD'S SCALE TEST (Mood, AMS 1954) — the squared-rank-deviation
    * companion to [[qStatAnsari]]: T = Σ over sample A of
    * (r − (N+1)/2)², large when A holds the EXTREME ranks. With
    * midranks a tie block occupying positions [lo, hi] gives every
    * member the SAME doubled midrank lo + hi, so the ×4 score
    * (2·cumt + t − N)² is one exact BIGINT per block and every sum in
    * the statistic is a plain order-independent integer SUM — no
    * ordered fold, no per-block division; the permutation-variance z
    * applies ONE double division at the end. Strictly tighter
    * exactness than Ansari–Bradley (whose tied averages are
    * rationals); the two tests weight tails differently (quadratic vs
    * triangular), so both belong in the battery.
    *
    * Long envelope: q4 sums Σ t·score4² reach 16·N⁵ — carried in
    * DECIMAL(38,0) (HUGEINT in the twin) so the statistic is exact to
    * N ~ 10⁷ sample points; the histogram collapse (kendall
    * boundedness) keeps block counts domain-bounded regardless.
    */
  def qStatMoodScale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("y"))
    moodScaleFromSamples(
      daily.select(lit("a").as("g"), $"x".as("v"))
        .unionByName(daily.select(lit("b").as("g"), $"y".as("v"))))
  }

  /** Mood scale core on a (g ∈ {a, b}, v: long) frame — see
    * [[qStatMoodScale]]. Exposed for MoodScaleSpec brute parity.
    *
    * CONTRACT (caller-enforced, same as [[ansariFromSamples]]): the
    * value domain of `v` must be bounded — after the histogram
    * collapse a single-partition running-count window orders the
    * distinct values. Domain-bounded inputs (calendar-day counts)
    * keep that fold metadata-sized; do not feed a continuous `v`. */
  private[queries] def moodScaleFromSamples(s: DataFrame): DataFrame = {
    import s.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = s.groupBy($"v").agg(count(lit(1)).as("t"),
      sum(when($"g" === "a", 1L).otherwise(0L)).as("ca"))
    val w = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = hist
      .withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
    val tot = blocks.agg(sum($"t").as("nn"), sum($"ca").as("m"))
    blocks.crossJoin(broadcast(tot))
      .select($"t", $"ca", $"nn", $"m",
        ((lit(2L) * $"cumt" + $"t" - $"nn")
          * (lit(2L) * $"cumt" + $"t" - $"nn")).as("s4"))
      .groupBy($"nn", $"m")
      .agg(sum($"ca" * $"s4").as("t4"),
        sum($"t" * $"s4").as("sum4"),
        // widen BEFORE the first multiply: t*s4 alone reaches 4N³/27
        // and would wrap BIGINT silently (non-ANSI) near N ~ 2·10⁶,
        // inside the documented exactness envelope; in decimal(38,0)
        // the full t·s4² product is exact to N ~ 10⁷
        sum($"t".cast("decimal(38,0)") * $"s4" * $"s4").as("q4"))
      .select($"nn", $"m", ($"nn" - $"m").as("n_b"), $"t4", $"sum4",
        expr("round((CAST(t4 AS DOUBLE) - CAST(m * sum4 AS DOUBLE) " +
          "/ CAST(nn AS DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE) " +
          "/ CAST(nn * (nn - 1) AS DOUBLE) * (CAST(q4 AS DOUBLE) " +
          "- CAST(sum4 AS DOUBLE) * sum4 / nn)), 6)").as("z_r6"),
        expr("abs((CAST(t4 AS DOUBLE) - CAST(m * sum4 AS DOUBLE) " +
          "/ CAST(nn AS DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE) " +
          "/ CAST(nn * (nn - 1) AS DOUBLE) * (CAST(q4 AS DOUBLE) " +
          "- CAST(sum4 AS DOUBLE) * sum4 / nn))) " +
          "> 1.959963984540054").as("reject"))
  }

  def qStatLevene(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .select($"event_type".as("g"), to_date($"ts").as("d"))
      .groupBy($"g", $"d").agg(count(lit(1)).as("v"))
    val med = daily
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"d")))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy($"g")))
      .filter($"rn" === expr("(nn + 1) div 2"))
      .select($"g", $"v".as("m"))
    val z = daily.join(broadcast(med), "g")
      .select($"g", abs($"v" - $"m").as("z"))
    val grp = z.groupBy($"g")
      .agg(count(lit(1)).as("ng"), sum($"z").as("tg"),
        sum($"z" * $"z").as("qg"))
    grp.groupBy()
      .agg(expr("sort_array(collect_list(struct(g, ng, tg, qg)))")
        .as("gs"))
      .select(
        expr("cast(size(gs) as bigint)").as("k"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.ng)")
          .as("n"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.tg)")
          .as("t"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.qg)")
          .as("s2"),
        expr("aggregate(gs, cast(1 as decimal(38,0)), (a, x) -> a * x.ng)")
          .as("p"),
        expr("aggregate(gs, cast(0.0 as double)," +
          " (a, x) -> a + cast(x.tg as double) * x.tg / x.ng)")
          .as("qd"),
        $"gs")
      .select($"k", $"n", $"t", $"s2", $"qd",
        expr("aggregate(gs, cast(0 as decimal(38,0))," +
          " (a, x) -> a + cast(x.tg as decimal(38,0)) * x.tg" +
          " * (p div x.ng))").as("q"), $"p")
      .select($"k", $"n",
        round(expr(
          """((qd - cast(t as double) * t / n) / (k - 1))
            |/ ((s2 - qd) / (n - k))"""
            .stripMargin.replace('\n', ' ')), 6).as("f_r6"),
        expr("""(cast(q as decimal(38,0)) * n
               |  - cast(t as decimal(38,0)) * t * p) * (n - k) * 1000
               |> cast(case when k = 2 then 3841 when k = 3 then 2996
               |       when k = 4 then 2605 when k = 5 then 2372
               |       when k = 6 then 2214 else 2099 end
               |       as decimal(38,0))
               |  * (cast(s2 as decimal(38,0)) * p - q) * n * (k - 1)"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** JARQUE–BERA normality test (Jarque & Bera 1980) of daily volumes
    * per event type — the assumption check the moment battery feeds:
    * JB = n/6·(g₁² + g₂'²/4). Both terms are RATIONAL in the n-scaled
    * central moments (no sqrt survives the squaring):
    * M2 = nΣx²−(Σx)², M3 = n²Σx³−3nΣxΣx²+2(Σx)³,
    * M4 = n³Σx⁴−4n²ΣxΣx³+6n(Σx)²Σx²−3(Σx)⁴ — the n-powers cancel in
    * g₁² = M3²/M2³ and g₂' = (M4−3M2²)/M2², so the α=0.05 verdict
    * JB > χ²₂ = 5.991 is the exact cross-multiplication
    * 1000·n·(4·M3²·M2 + (M4−3M2²)²) > 143784·M2⁴, evaluated in
    * DECIMAL(38,0)/HUGEINT. Calendar-bounded inputs keep every
    * product under 10³². jb_r6 is the same quantity as one double
    * formula on the exact Ms.
    */
  def qStatJarque(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("s1"),
        sum($"x" * $"x").as("s2"), sum($"x" * $"x" * $"x").as("s3"),
        sum($"x" * $"x" * $"x" * $"x").as("s4"))
      .withColumn("m2", expr(
        "cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1"))
      .withColumn("m3", expr(
        """cast(n as decimal(38,0)) * n * s3
          |- 3 * cast(n as decimal(38,0)) * s1 * s2
          |+ 2 * cast(s1 as decimal(38,0)) * s1 * s1"""
          .stripMargin.replace('\n', ' ')))
      .withColumn("m4", expr(
        """cast(n as decimal(38,0)) * n * n * s4
          |- 4 * cast(n as decimal(38,0)) * n * s1 * s3
          |+ 6 * cast(n as decimal(38,0)) * s1 * s1 * s2
          |- 3 * cast(s1 as decimal(38,0)) * s1 * s1 * s1"""
          .stripMargin.replace('\n', ' ')))
      .select($"event_type", $"n",
        round(expr(
          """cast(n as double)
            |* (4.0 * cast(m3 as double) * m3 * m2
            |   + (cast(m4 as double) - 3.0 * cast(m2 as double) * m2)
            |     * (cast(m4 as double) - 3.0 * cast(m2 as double) * m2))
            |/ (24.0 * cast(m2 as double) * m2 * m2 * m2)"""
            .stripMargin.replace('\n', ' ')), 6).as("jb_r6"),
        expr("""cast(1000 as decimal(38,0)) * n
               |  * (4 * m3 * m3 * m2 + (m4 - 3 * m2 * m2)
               |     * (m4 - 3 * m2 * m2))
               |> cast(143784 as decimal(38,0)) * m2 * m2 * m2 * m2"""
          .stripMargin.replace('\n', ' ')).as("reject"))
      .orderBy($"event_type")
  }

  /** CRAMÉR'S V — the effect size q_stat_chi2's per-cell report feeds
    * (Cramér 1946): V = √(χ²/(N·(min(r,c)−1))), the [0,1]-normalized
    * association strength a raw χ² (which grows with N) can't give.
    * The scalar χ² is a CELL-ORDERED fold over the exact-integer
    * contingency contributions (the q_stat_anova list-fold idiom — a
    * cross-cell double sum has no canonical order otherwise), and V
    * is one sqrt on it. Shape: one contingency aggregate, broadcast
    * margins, a |cells|-row fold.
    */
  def qStatCramers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderstatus".as("status"),
        $"o_orderpriority".as("priority"))
    val obs = o.groupBy($"status", $"priority")
      .agg(count(lit(1)).as("obs"))
    val rowT = o.groupBy($"status").agg(count(lit(1)).as("row_n"))
    val colT = o.groupBy($"priority").agg(count(lit(1)).as("col_n"))
    val n = o.agg(count(lit(1)).as("n"))
    // the FULL r×c grid — zero cells still contribute E to χ²
    // (q_stat_chi2's per-cell report enumerates observed cells only;
    // an effect size cannot)
    val cells = rowT.crossJoin(broadcast(colT))
      .join(obs, Seq("status", "priority"), "left")
      .withColumn("obs", coalesce($"obs", lit(0L)))
      .crossJoin(broadcast(n))
      .select($"status", $"priority", $"n",
        (($"obs" - ($"row_n" * $"col_n").cast("double") / $"n")
          * ($"obs" - ($"row_n" * $"col_n").cast("double") / $"n")
          / (($"row_n" * $"col_n").cast("double") / $"n"))
          .as("contrib"))
    cells.groupBy()
      .agg(first($"n").as("n"),
        countDistinct($"status").as("r"),
        countDistinct($"priority").as("c"),
        expr("aggregate(sort_array(collect_list(struct(" +
          "status, priority, contrib))), cast(0.0 as double)," +
          " (a, x) -> a + x.contrib)").as("chi2"))
      .select($"n", $"r", $"c", round($"chi2", 6).as("chi2_r6"),
        round(sqrt($"chi2" / ($"n" * (least($"r", $"c") - lit(1L))
          .cast("double"))), 6).as("v_r6"))
  }

  /** Equi-depth (decile) histogram of order totals — the SCALABLE
    * formulation: exact interpolated decile boundaries from one
    * aggregate, then a map-side bucket assignment (count of boundaries
    * strictly below the value) and a hash aggregate. No global ntile
    * sort: the only single-point step is the 9-value boundary row,
    * broadcast back. Ties sit in the lower bucket on both engines, so
    * bucket populations are exactly reproducible (and only approximately
    * equal — the honest contract for equi-depth over duplicated values).
    */
  def qAggEquidepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_totalprice")
    // ONE percentile aggregate evaluating all 9 fractions over one
    // buffer (9 separate aggs would hold 9 copies of the sort buffer)
    val bounds = o.agg(percentile($"o_totalprice",
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("bs"))
      .select((1 to 9).map(i =>
        element_at(col("bs"), i).as(s"b$i")): _*)
    val bucket = (1 to 9).map(i =>
      when($"o_totalprice" > col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    o.crossJoin(broadcast(bounds))
      .select($"o_totalprice", bucket.as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"))
      .orderBy($"bucket")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between every pair
    * of event types' `value` distributions — the standard
    * distribution-shift gate a data pipeline runs between a reference
    * slice and a fresh batch (Massey 1951 for the statistic; the
    * pairwise matrix is the drift dashboard form).
    *
    * Exactness doctrine: D = max_v |F_a(v) − F_b(v)| is computed as the
    * INTEGER max of |cum_a·n_b − cum_b·n_a| over integer-cent cell
    * counts — order-independent, so both engines agree bit-for-bit; the
    * one division (d_num / (n_a·n_b)) happens once on the final
    * integers. The argmax location reports the SMALLEST v achieving the
    * max (strict-> fold vs min-filter in the twin — same rule).
    *
    * Scale shape: the corpus-sized shuffle is the (type, cents) cell
    * reduction — map-side partial, cells bounded by the metric's
    * 2-decimal domain (≤ ~49k cells/type here), NOT by row count. The
    * per-pair ECDF merge then folds two domain-bounded arrays on one
    * row each: the same per-entity-series pattern as q_time_holt. For
    * an unbounded metric, bucketize to fixed cells first (or pivot to
    * the KLL sketch, q_agg_quantile_sketch).
    */
  def qStatKs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type".as("t"), e2($"value").as("v"))
      .groupBy($"t", $"v").agg(count(lit(1)).as("c"))
    val byType = cells.groupBy($"t")
      .agg(expr("sort_array(collect_list(struct(v, c)))").as("arr"),
        sum($"c").as("n"))
    val a = byType.select($"t".as("ta"), $"arr".as("ea"), $"n".as("na"))
    val b = byType.select($"t".as("tb"), $"arr".as("eb"), $"n".as("nb"))
    a.join(broadcast(b), $"ta" < $"tb")
      .withColumn("entries", expr(
        """sort_array(concat(
          |  transform(ea, x -> struct(x.v AS v, x.c AS ca,
          |    CAST(0 AS BIGINT) AS cb)),
          |  transform(eb, x -> struct(x.v AS v, CAST(0 AS BIGINT) AS ca,
          |    x.c AS cb))))""".stripMargin))
      // fold: evaluate |cum_a·n_b − cum_b·n_a| at every distinct-v
      // boundary (ECDFs are right-continuous: all cells at v must be
      // absorbed before v is scored), then once more at the last v
      .withColumn("r", expr(
        """aggregate(entries,
          |  named_struct('ca', CAST(0 AS BIGINT), 'cb', CAST(0 AS BIGINT),
          |    'prev', CAST(NULL AS BIGINT),
          |    'best', CAST(-1 AS BIGINT), 'at', CAST(NULL AS BIGINT)),
          |  (acc, x) -> named_struct(
          |    'ca', acc.ca + x.ca, 'cb', acc.cb + x.cb, 'prev', x.v,
          |    'best', CASE WHEN acc.prev IS NOT NULL AND x.v <> acc.prev
          |        AND abs(acc.ca * nb - acc.cb * na) > acc.best
          |      THEN abs(acc.ca * nb - acc.cb * na) ELSE acc.best END,
          |    'at', CASE WHEN acc.prev IS NOT NULL AND x.v <> acc.prev
          |        AND abs(acc.ca * nb - acc.cb * na) > acc.best
          |      THEN acc.prev ELSE acc.at END),
          |  acc -> named_struct(
          |    'best', CASE WHEN abs(acc.ca * nb - acc.cb * na) > acc.best
          |      THEN abs(acc.ca * nb - acc.cb * na) ELSE acc.best END,
          |    'at', CASE WHEN abs(acc.ca * nb - acc.cb * na) > acc.best
          |      THEN acc.prev ELSE acc.at END))""".stripMargin))
      .select($"ta".as("type_a"), $"tb".as("type_b"),
        $"na".as("n_a"), $"nb".as("n_b"),
        $"r.best".as("d_num"), $"r.at".as("ks_at_cents"),
        ($"r.best".cast("double") / ($"na" * $"nb").cast("double"))
          .as("ks_d"))
      .orderBy($"type_a", $"type_b")
  }

  /** Poisson-bootstrap thresholds: the cumulative Poisson(1) CDF as
    * string-identical double literals in both engines (IEEE parse is
    * exact-nearest, so the CASE boundaries agree bit-for-bit). */
  private val poissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.73575888234288467", "0.91969860292860583",
    "0.98101184312384622", "0.99634015317265632", "0.99940581518241834",
    "0.99991675885071201")

  /** POISSON BOOTSTRAP confidence intervals (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams") for the mean
    * event value per type: classic bootstrap resampling needs n draws
    * WITH replacement — a shuffle per replicate at scale — but
    * Poisson(1) weights per (row, replicate) approximate the same
    * multinomial and are assigned MAP-SIDE from a deterministic
    * md5-derived uniform, so B = 32 replicates cost one widened
    * aggregate, zero extra shuffles of raw data.
    *
    * Determinism: u = hash/2³² is an exact dyadic rational, the CDF
    * thresholds are string-identical literals, each replicate mean is
    * one exact-integer-sums division, and the CI bounds are
    * rank-selected VALUES over the 32 sorted means.
    */
  def qStatBootstrap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = 32
    val weightCase = poissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")
    // eventsPar: 32 md5-weight evaluations per row dominate this query
    // and a single-task scan serialized them (6.1 s → 1.3 s measured)
    val reps = Tables.eventsPar(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", e2($"value").as("cents"))
      .select($"event_type", $"event_id", $"cents",
        explode(expr(s"sequence(0, ${b - 1})")).as("rep"))
      .withColumn("u", expr(
        """CAST(conv(substring(md5(concat(CAST(event_id AS STRING),
          |  ':', CAST(rep AS STRING))), 1, 8), 16, 10) AS BIGINT)
          |  / 4294967296.0""".stripMargin.replace("\n", " ")))
    val means = reps
      .withColumn("w", expr(weightCase))
      .groupBy($"event_type", $"rep")
      .agg(sum($"w" * $"cents").as("wc"), sum($"w").as("ws"))
      .withColumn("m", $"wc".cast("double") / $"ws")
    means.groupBy($"event_type")
      .agg(expr("array_sort(collect_list(m))").as("ms"),
        count(lit(1)).as("n_reps"))
      .select($"event_type", $"n_reps",
        round(expr("element_at(ms, 2)"), 6).as("boot_lo_r6"),
        round(expr(s"element_at(ms, ${b - 1})"), 6).as("boot_hi_r6"))
      .orderBy($"event_type")
  }

  /** POPULATION STABILITY INDEX — the industry-standard binned drift
    * score (credit-risk monitoring lineage): reference = the first 15
    * days of events, fresh = the rest; buckets are the reference's
    * rank-selected value deciles (percentile_disc semantics — values
    * the data contains, exact cross-engine), PSI = Σ (p−q)·ln(p/q)
    * with add-one smoothing on counts so empty cells stay finite.
    * Rule of thumb thresholds reported inline (<0.1 stable, >0.25
    * action). ln is rounded to 6 dp per convention; everything else is
    * exact integer counts and exact divisions.
    *
    * Scale shape: one pass for the reference decile boundaries
    * (rank-select window per type — or the KLL sketch at 100 TB), one
    * broadcast, one counting aggregate.
    */
  def qStatPsi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", e2($"value").as("v"),
        (datediff(to_date($"ts"),
          min(to_date($"ts")).over(Window.partitionBy($"event_type")))
          < 15).as("is_ref"))
    val ref = ev.filter($"is_ref")
    val w = Window.partitionBy($"event_type").orderBy($"v")
    val bounds = ref
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy($"event_type")))
      .filter((1 to 9).map(i =>
        $"rk" === ceil($"n" * i / 10.0).cast("long")).reduce(_ || _))
      .groupBy($"event_type")
      .agg(expr("sort_array(collect_set(v))").as("bs"))
    val bucketed = ev.join(broadcast(bounds), "event_type")
      .withColumn("bucket", expr(
        "size(filter(bs, b -> v > b))"))
      .groupBy($"event_type", $"bucket")
      .agg(count_if($"is_ref").as("cr"), count_if(!$"is_ref").as("cf"))
    val totals = bucketed.groupBy($"event_type")
      .agg(sum($"cr").as("tr"), sum($"cf").as("tf"),
        count(lit(1)).as("nb"))
    bucketed.join(broadcast(totals), "event_type")
      .withColumn("p", ($"cr" + 1L).cast("double") / ($"tr" + $"nb"))
      .withColumn("q", ($"cf" + 1L).cast("double") / ($"tf" + $"nb"))
      .groupBy($"event_type")
      .agg(max($"tr").as("n_ref"), max($"tf").as("n_fresh"),
        round(sum(($"p" - $"q") * log($"p" / $"q")), 6).as("psi_r6"))
      .withColumn("verdict",
        when($"psi_r6" < 0.1, "stable")
          .when($"psi_r6" < 0.25, "watch").otherwise("action"))
      .orderBy($"event_type")
  }

  /** ONE-WAY ANOVA of purchase values across event types — the
    * k-group mean-difference test next to q_stat_ttest's two-group
    * form: F = (SSB/(k−1)) / (SSW/(n−k)) with SSB = Σ T_g²/n_g − T²/n
    * and SSW = Q − Σ T_g²/n_g, all from EXACT integer group moments
    * (n_g, T_g = Σ cents, Q_g = Σ cents²). The only floating work is
    * the T_g²/n_g fold, run over the groups in SORTED type order in
    * both engines (collected k-row array here, ORDER BY-ed list there)
    * — identical IEEE op sequence on identical integers.
    *
    * Scale: one hash aggregate to k moment rows; the fold is driver-
    * sized. cents² sums bound: 10⁶ rows of ≤ $10⁴ values ≈ 10¹⁶ < 2⁶³;
    * beyond that, widen to DECIMAL(38) sums.
    */
  def qStatAnova(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", e2($"value").as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("ng"), sum($"v").as("tg"),
        sum($"v" * $"v").as("qg"))
    g.groupBy()
      .agg(expr("sort_array(collect_list(struct(event_type, ng, tg, qg)))")
        .as("gs"))
      .select(
        expr("cast(size(gs) as bigint)").as("k"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.ng)")
          .as("n"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.tg)")
          .as("t"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.qg)")
          .as("q"),
        expr("aggregate(gs, cast(0.0 as double)," +
          " (a, x) -> a + cast(x.tg as double) * x.tg / x.ng)")
          .as("sst"))
      .select(col("k"), col("n"),
        round(expr("sst - cast(t as double) * t / n"), 6).as("ssb_r6"),
        round(expr("q - sst"), 6).as("ssw_r6"),
        round(expr(
          "((sst - cast(t as double) * t / n) / (k - 1)) /" +
            " ((q - sst) / (n - k))"), 6).as("f_r6"))
  }

  /** Benford first-digit conformance of order totals — the classic
    * fabricated-data screen: observed first-significant-digit counts
    * vs Benford's log10(1 + 1/d) expectation, with the χ² statistic
    * per digit and in total. Digit extraction is pure string/integer
    * arithmetic on exact cents; the nine expected probabilities are
    * pinned literals (identical in both engines), so the only float
    * work is the final χ² arithmetic on exact counts.
    */
  def qStatBenford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probs = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    // the D suffix keeps the literals DOUBLE — a bare decimal literal
    // parses as DECIMAL in Spark SQL and drags the whole chi-square
    // into decimal arithmetic
    val probsSql = probs.map(p => s"${p}D").mkString("array(", ",", ")")
    val digits = Tables.orders(spark, dir)
      .select(substring(e2($"o_totalprice").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter($"digit" >= 1)
      .groupBy($"digit").agg(count(lit(1)).as("obs"))
    val total = digits.agg(sum($"obs").as("n"))
    digits.crossJoin(broadcast(total))
      .withColumn("expected",
        expr(s"element_at($probsSql, digit)") * $"n")
      .select($"digit", $"obs", round($"expected", 6).as("expected_r6"),
        round(($"obs" - $"expected") * ($"obs" - $"expected")
          / $"expected", 6).as("chi2_contrib_r6"))
      .orderBy($"digit")
  }

  /** GINI COEFFICIENT of revenue concentration per market segment —
    * the inequality index (Lorenz-curve area) by the exact rank
    * formula G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over amounts sorted
    * ascending (ties broken by order key for a deterministic i).
    * Numerator and denominator are exact BIGINT sums of cents; the one
    * division happens last — bit-identical cross-engine.
    */
  def qStatGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", e2($"o_totalprice").as("cents"),
        $"o_orderkey")
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"cents", $"o_orderkey")
    o.withColumn("i", row_number().over(w))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sx"),
        sum($"i" * $"cents").as("six"))
      .select($"c_mktsegment", $"n",
        (($"sx" / 100.0)).as("revenue_usd"),
        ((lit(2.0) * $"six" - ($"n" + 1).cast("double") * $"sx") /
          ($"n".cast("double") * $"sx")).as("gini"))
      .orderBy($"c_mktsegment")
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) — the nonparametric two-sample
    * location test (Mann & Whitney 1947), on open ('O') vs fulfilled
    * ('F') order totals, ENTIRELY in integer arithmetic. Instead of
    * materializing per-row average ranks, U is computed from the
    * distinct-value table: each group-A row at value v beats the B rows
    * below v and half-ties the B rows at v, so
    * 2·U = Σ_v a_v·(2·cumB(<v) + b_v) — exact integers throughout. The
    * z-test verdict at α=0.05 (z=1.96=49/25) with the tie-corrected
    * variance σ² = mn/12·((N+1) − ΣT/(N(N−1))), ΣT = Σ(t³−t), is a
    * cross-multiplied integer comparison
    * (2U−mn)²·7500·N·(N−1) > 9604·mn·((N+1)·N·(N−1) − ΣT)
    * evaluated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — no float
    * ever enters, so the reject bit cannot flip at the boundary.
    *
    * Shape: one hash aggregate to the distinct-value table (~|values|
    * rows), one prefix sum over it, one 1-row reduction. At 100 TB the
    * prefix sum range-partitions on v with a two-level carry (the
    * q_curate_shard pattern); fixture scale runs it as one window.
    */
  private[queries] def mannWhitney(s: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = s.groupBy(col("v"))
      .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("a"),
        sum(when(col("isA"), 0L).otherwise(1L)).as("b"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byV.withColumn("cumb", coalesce(sum(col("b")).over(w), lit(0L)))
      .groupBy()
      .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
        sum(col("a") * (lit(2L) * col("cumb") + col("b"))).as("u_x2"),
        sum((col("a") + col("b")) * (col("a") + col("b"))
          * (col("a") + col("b")) - (col("a") + col("b")))
          .as("tie_term"))
      .select(col("n_a"), col("n_b"), col("u_x2"), col("tie_term"),
        expr("""cast(u_x2 - n_a * n_b as decimal(38,0))
               |  * (u_x2 - n_a * n_b) * 7500
               |  * (n_a + n_b) * (n_a + n_b - 1)
               |> cast(9604 as decimal(38,0)) * n_a * n_b
               |  * (cast(n_a + n_b + 1 as decimal(38,0))
               |     * (n_a + n_b) * (n_a + n_b - 1) - tie_term)"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** TUKEY IQR FENCES per return flag — the boxplot outlier rule
    * (Tukey 1977, EDA): q1/q3 by exact linear-interpolation percentile
    * on integer cents (interpolated values are exact quarter-cents —
    * identical doubles in both engines), fences at ±1.5·IQR, outlier
    * counts on either side. Complements q_stat_zscore (moment-based)
    * and q_stat_mad (median-based) with the rank-based rule. Two
    * passes: one percentile aggregate, stats broadcast back for the
    * fence counts.
    */
  def qStatIqr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("flag"),
        e2($"l_extendedprice").as("c"))
    val stats = li.groupBy($"flag")
      .agg(percentile($"c", lit(0.25)).as("q1_c"),
        percentile($"c", lit(0.75)).as("q3_c"))
      .withColumn("lo", $"q1_c" - lit(1.5) * ($"q3_c" - $"q1_c"))
      .withColumn("hi", $"q3_c" + lit(1.5) * ($"q3_c" - $"q1_c"))
    li.join(broadcast(stats), "flag")
      .groupBy($"flag")
      .agg(count(lit(1)).as("n"),
        first($"q1_c").as("q1_c"), first($"q3_c").as("q3_c"),
        sum(when($"c" < $"lo", 1L).otherwise(0L)).as("n_low"),
        sum(when($"c" > $"hi", 1L).otherwise(0L)).as("n_high"))
      .orderBy($"flag")
  }

  def qStatMannwhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mannWhitney(Tables.orders(spark, dir)
      .filter($"o_orderstatus".isin("O", "F"))
      .select(($"o_orderstatus" === "O").as("isA"),
        e2($"o_totalprice").as("v")))
  }

  /** CLIFF'S DELTA effect size (Cliff 1993) between click-day and
    * view-day volumes: δ = (#{a > b} − #{a < b}) / (n_a·n_b), the
    * ordinal dominance measure that reports HOW SEPARATED two samples
    * are after q_stat_mannwhitney has said THAT they differ —
    * significance without effect size is the classic reporting trap,
    * and δ is the standard nonparametric companion (linearly related
    * to the U statistic but bounded in [−1, 1]). Magnitude bands at
    * |δ| = 0.147 / 0.33 / 0.474 (Romano, Kromrey, Coraggio & Skowronek
    * 2006) label the verdict.
    *
    * Exactness (the q_stat_mannwhitney value-histogram doctrine): the
    * scan collapses to the per-distinct-value (count_a, count_b)
    * histogram — calendar-bounded here, domain-bounded in general —
    * one exclusive running count gives #{a < v} per value, and both
    * dominance counts are exact BIGINT sums; δ is ONE double division
    * at the end, the bands compare that one double. */
  def qStatCliffs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"event_type".isin("click", "view"))
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("v"))
    cliffsDelta(daily.select(($"event_type" === "click").as("isA"),
      $"v"))
  }

  /** Cliff's delta core on a (isA: boolean, v: long) frame — see
    * [[qStatCliffs]]. Exposed for CliffsSpec brute parity. Same
    * bounded-value-domain contract as [[ansariFromSamples]]: the
    * histogram collapse plus one single-partition running count. */
  private[queries] def cliffsDelta(s: DataFrame): DataFrame = {
    import s.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val hist = s.groupBy($"v").agg(
      sum(when($"isA", 1L).otherwise(0L)).as("ca"),
      sum(when(!$"isA", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("cuma", coalesce(sum($"ca").over(w), lit(0L)))
    val tot = cum.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
    cum.crossJoin(broadcast(tot))
      .select($"na", $"nb",
        ($"cb" * ($"na" - $"cuma" - $"ca")).as("gt_v"),
        ($"cb" * $"cuma").as("lt_v"))
      .groupBy($"na", $"nb")
      .agg(sum($"gt_v").as("gt"), sum($"lt_v").as("lt"))
      .select($"na".as("n_a"), $"nb".as("n_b"), $"gt", $"lt",
        (($"gt" - $"lt").cast("double")
          / ($"na" * $"nb").cast("double")).as("delta"))
      .select($"n_a", $"n_b", $"gt", $"lt",
        round($"delta", 6).as("delta_r6"),
        when(abs($"delta") < 0.147, "negligible")
          .when(abs($"delta") < 0.33, "small")
          .when(abs($"delta") < 0.474, "medium")
          .otherwise("large").as("magnitude"))
  }

  /** KRUSKAL–WALLIS H — the k-group rank ANOVA (Kruskal & Wallis 1952),
    * completing the nonparametric battery beyond the two-sample
    * Mann–Whitney: does any event type's DAILY VOLUME distribution
    * differ in location from the others? Observations are the
    * (event_type, day) daily counts — a calendar-bounded table
    * (k·days rows, ~150 here) no matter how many raw events feed it,
    * so the rank stage is scale-free: 100 TB of events still reduces
    * to one map-side-combined count aggregate before any ranking.
    *
    * Exactness doctrine (the q_stat_mannwhitney pattern): ranks are
    * never materialized as halves — the DOUBLED average rank at value
    * v is the integer r2 = 2·cum(<v) + t_v + 1, so the per-group rank
    * sums S2_g = 2·R_g are exact BIGINTs. The α=0.05 verdict
    * H/C > χ²_{k−1} is evaluated as ONE cross-multiplied
    * DECIMAL(38,0)/HUGEINT comparison with common denominator
    * P = Πn_g (P/n_g is exact integral division):
    * 3000·(N−1)·Σ_g S2_g²·(P/n_g) − 3000·(N+1)·(N³−N)·P
    *   > crit1000_{k−1} · (N³−N−ΣT) · P,   ΣT = Σ_v (t³−t).
    * No float touches the reject bit; h_r6/hc_r6 are the same
    * quantities as doubles via a group-ordered fold (the q_stat_anova
    * list-fold idiom) for human consumption.
    */
  def qStatKruskal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = Tables.events(spark, dir)
      .select($"event_type".as("g"), to_date($"ts").as("d"))
      .groupBy($"g", $"d").agg(count(lit(1)).as("v"))
    val byV = obs.groupBy($"v").agg(count(lit(1)).as("t"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    val r2 = byV
      .withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
      .select($"v", $"t", (lit(2L) * $"cumt" + $"t" + 1L).as("r2"))
    val ties = r2.groupBy()
      .agg(sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
    val groups = obs.join(r2.select($"v", $"r2"), "v")
      .groupBy($"g")
      .agg(count(lit(1)).as("ng"), sum($"r2").as("s2"))
    val folded = groups.groupBy()
      .agg(expr("sort_array(collect_list(struct(g, ng, s2)))").as("gs"))
      .select(
        expr("cast(size(gs) as bigint)").as("k"),
        expr("aggregate(gs, cast(0 as bigint), (a, x) -> a + x.ng)")
          .as("n"),
        expr("aggregate(gs, cast(1 as decimal(38,0)), (a, x) -> a * x.ng)")
          .as("p"),
        expr("aggregate(gs, cast(0.0 as double)," +
          " (a, x) -> a + cast(x.s2 as double) * x.s2 / x.ng / 4.0)")
          .as("rsum"),
        $"gs")
      .select($"k", $"n", $"rsum",
        expr("aggregate(gs, cast(0 as decimal(38,0))," +
          " (a, x) -> a + cast(x.s2 as decimal(38,0)) * x.s2" +
          " * (p div x.ng))").as("qp"),
        $"p")
    folded.crossJoin(broadcast(ties))
      .select($"k", $"n", $"tie_term",
        round(expr("12.0 * rsum / (n * (n + 1.0)) - 3.0 * (n + 1)"), 6)
          .as("h_r6"),
        round(expr("(12.0 * rsum / (n * (n + 1.0)) - 3.0 * (n + 1))" +
          " * (cast(n as double) * n * n - n)" +
          " / (cast(n as double) * n * n - n - tie_term)"), 6)
          .as("hc_r6"),
        expr("""cast(3000 as decimal(38,0)) * (n - 1) * qp
               |  - cast(3000 as decimal(38,0)) * (n + 1)
               |    * (cast(n as decimal(38,0)) * n * n - n) * p
               |> cast(case when k = 2 then 3841 when k = 3 then 5991
               |       when k = 4 then 7815 when k = 5 then 9488
               |       when k = 6 then 11070 else 12592 end
               |       as decimal(38,0))
               |  * (cast(n as decimal(38,0)) * n * n - n - tie_term) * p"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** SKEWNESS & EXCESS KURTOSIS per return flag from exact raw moment
    * sums (Σx..Σx⁴ of the small-integer quantity column are exact
    * BIGINTs at any scale that fits — ≤50⁴·|rows|), with the
    * population-moment formulas applied ONCE on the exact sums. The
    * only non-arithmetic call is sqrt (correctly rounded), so σ³ is
    * written v·√v, never pow(v, 1.5) — libm pow is NOT
    * correctly-rounded and would fork the engines. Completes the
    * moment battery beyond q_agg_corr/q_agg_stddev.
    */
  def qAggMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = $"l_quantity".cast("long")
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", x.as("x"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"x").as("s1"),
        sum($"x" * $"x").as("s2"),
        sum($"x" * $"x" * $"x").as("s3"),
        sum($"x" * $"x" * $"x" * $"x").as("s4"))
      .withColumn("g1_r6", round(expr(
        """((cast(s3 as double) / n)
          |  - 3.0 * (cast(s1 as double) / n) * (cast(s2 as double) / n)
          |  + 2.0 * (cast(s1 as double) / n) * (cast(s1 as double) / n)
          |    * (cast(s1 as double) / n))
          |/ ((cast(s2 as double) / n
          |    - (cast(s1 as double) / n) * (cast(s1 as double) / n))
          |  * sqrt(cast(s2 as double) / n
          |    - (cast(s1 as double) / n) * (cast(s1 as double) / n)))"""
          .stripMargin.replace('\n', ' ')), 6))
      .withColumn("kurt_r6", round(expr(
        """((cast(s4 as double) / n)
          |  - 4.0 * (cast(s1 as double) / n) * (cast(s3 as double) / n)
          |  + 6.0 * (cast(s1 as double) / n) * (cast(s1 as double) / n)
          |    * (cast(s2 as double) / n)
          |  - 3.0 * (cast(s1 as double) / n) * (cast(s1 as double) / n)
          |    * (cast(s1 as double) / n) * (cast(s1 as double) / n))
          |/ ((cast(s2 as double) / n
          |    - (cast(s1 as double) / n) * (cast(s1 as double) / n))
          |  * (cast(s2 as double) / n
          |    - (cast(s1 as double) / n) * (cast(s1 as double) / n)))
          |- 3.0""".stripMargin.replace('\n', ' ')), 6))
      .select($"l_returnflag", $"n", $"s1", $"s2", $"s3", $"s4",
        $"g1_r6", $"kurt_r6")
      .orderBy($"l_returnflag")
  }

  /** SPEARMAN ρ — rank correlation between daily click and purchase
    * volumes (Spearman 1904), the tie-robust complement to
    * q_stat_kendall on the same calendar-bounded table. Doubled
    * average ranks (the q_stat_kruskal integers) feed exact BIGINT
    * Pearson moments; scale factors cancel in ρ, so the r6 double is
    * one IEEE formula over exact sums. The α=0.05 verdict uses the
    * large-sample normal approximation z = ρ√(n−1) (documented, as in
    * q_stat_kendall) as the cross-multiplied integer comparison
    * 2500·num²·(n−1) > 9604·denx·deny with num = n·Sxy − Sx·Sy,
    * denx/deny the centered second moments — no float in the bit.
    */
  def qStatSpearman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    // doubled average rank of v within the daily table: 2·cum(<v)+t+1
    def ranked(c: String): DataFrame = {
      val byV = daily.groupBy(col(c).as("v")).agg(count(lit(1)).as("t"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byV.withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
        .select(col("v").as(c),
          (lit(2L) * $"cumt" + $"t" + 1L).as(s"r_$c"))
    }
    daily.join(ranked("x"), "x").join(ranked("y"), "y")
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum($"r_x").as("sx"), sum($"r_y").as("sy"),
        sum($"r_x" * $"r_y").as("sxy"),
        sum($"r_x" * $"r_x").as("sxx"),
        sum($"r_y" * $"r_y").as("syy"))
      .select($"n",
        ($"n" * $"sxy" - $"sx" * $"sy").as("num"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("denx"),
        ($"n" * $"syy" - $"sy" * $"sy").as("deny"))
      .select($"n", $"num", $"denx", $"deny",
        round($"num".cast("double")
          / (sqrt($"denx".cast("double")) * sqrt($"deny".cast("double"))),
          6).as("rho_r6"),
        expr("""cast(2500 as decimal(38,0)) * num * num * (n - 1)
               |> cast(9604 as decimal(38,0)) * denx * deny"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** WALD–WOLFOWITZ RUNS TEST (1940) on daily total volume around its
    * lower median — is the series' above/below pattern random, or do
    * regimes cluster? Signs, run count R, and the z-verdict are all
    * exact integers: values equal to the median are dropped (the
    * standard treatment), R counts sign changes + 1, and the α=0.05
    * bit is 2500·(N·R − 2·n1·n2 − N)²·(N−1) > 9604·2·n1·n2·(2·n1·n2−N)
    * — the cross-multiplied form of |R−μ| > 1.96σ. Calendar-bounded
    * like the rest of the daily battery.
    */
  def qStatRuns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("v"))
    // lower median: value at row ⌈N/2⌉ in (v, d) order
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy($"v", $"d")))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_all"))))
      .filter($"rn" === expr("(n_all + 1) div 2"))
      .select($"v".as("median_v"))
    val signs = daily.crossJoin(broadcast(med))
      .filter($"v" =!= $"median_v")
      .select($"d", when($"v" > $"median_v", 1L).otherwise(-1L).as("s"))
    val w = Window.orderBy($"d")
    signs
      .withColumn("chg",
        when(lag($"s", 1).over(w).isNull
          || lag($"s", 1).over(w) =!= $"s", 1L).otherwise(0L))
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum(when($"s" === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when($"s" === -1L, 1L).otherwise(0L)).as("n_neg"),
        sum($"chg").as("runs"))
      .select($"n", $"n_pos", $"n_neg", $"runs",
        expr("""cast(2500 as decimal(38,0))
               |  * (n * runs - 2 * n_pos * n_neg - n)
               |  * (n * runs - 2 * n_pos * n_neg - n) * (n - 1)
               |> cast(9604 as decimal(38,0)) * 2 * n_pos * n_neg
               |  * (2 * n_pos * n_neg - n)"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** MANN–KENDALL TREND TEST (Mann 1945, Kendall 1975) per event
    * type: S = Σ_{i<j} sign(v_j − v_i) over the daily series — the
    * standard monotone-trend screen (hydrology's workhorse), pairing
    * with q_time_theilsen exactly as published (MK decides IF there's
    * a trend, Theil–Sen says how steep). S and the tie-corrected
    * variance numerator n(n−1)(2n+5) − Σt(t−1)(2t+5) are exact
    * BIGINTs; the α=0.05 verdict applies the continuity correction as
    * the cross-multiplied comparison 2500·18·(|S|−1)² > 9604·varnum
    * (S = 0 never rejects). Day pairs are calendar-bounded as in
    * q_stat_kendall.
    */
  def qStatMannKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("v"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type")
          && col("a.d") < col("b.d"))
      .select(col("a.event_type").as("g"),
        when(col("b.v") > col("a.v"), 1L)
          .when(col("b.v") < col("a.v"), -1L).otherwise(0L).as("sg"))
      .groupBy($"g").agg(sum($"sg").as("s"))
    val ties = daily.groupBy($"event_type".as("g"), $"v")
      .agg(count(lit(1)).as("t"))
      .groupBy($"g")
      .agg(count(lit(1)).as("n_distinct"), sum($"t").as("n"),
        sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tie_term"))
    pairs.join(ties, "g")
      .select($"g".as("event_type"), $"n", $"s", $"tie_term",
        ($"n" * ($"n" - 1L) * (lit(2L) * $"n" + 5L) - $"tie_term")
          .as("var_num18"),
        ($"s" =!= 0L &&
          lit(45000L) * (abs($"s") - 1L) * (abs($"s") - 1L)
            > lit(9604L)
              * ($"n" * ($"n" - 1L) * (lit(2L) * $"n" + 5L)
                - $"tie_term")).as("reject"))
      .orderBy($"event_type")
  }

  /** KENDALL τ-b — rank correlation between daily click volume and
    * daily purchase volume (Kendall 1938; tau-b tie handling per
    * Kendall 1945). All pair classification is pure integer sign
    * arithmetic over the 30-row daily table (concordant / discordant /
    * tied-x / tied-y counted exactly), so C, D, and the tie counts are
    * exact BIGINTs; τ_b applies the one sqrt on those exact integers,
    * identically in both engines. The α=0.05 verdict uses the
    * no-ties normal approximation z = 3(C−D)/√(n(n−1)(2n+5)/2)
    * (documented approximation — ties here are rare) as the exact
    * integer comparison 45000·(C−D)² > 9604·n(n−1)(2n+5).
    *
    * Scale shape: the O(days²) pair join runs on the CALENDAR-bounded
    * daily aggregate (435 pairs for a month), never on raw events —
    * the same boundedness argument as q_stat_kruskal; the raw-event
    * scan is one map-side-combined conditional count.
    */
  def qStatKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    val pairs = daily.as("a").join(daily.as("b"), $"a.d" < $"b.d")
      .select(
        when($"b.x" > $"a.x", 1L).when($"b.x" < $"a.x", -1L)
          .otherwise(0L).as("sx"),
        when($"b.y" > $"a.y", 1L).when($"b.y" < $"a.y", -1L)
          .otherwise(0L).as("sy"))
    pairs.groupBy()
      .agg(
        count(lit(1)).as("n0"),
        sum(when($"sx" * $"sy" === 1L, 1L).otherwise(0L)).as("conc"),
        sum(when($"sx" * $"sy" === -1L, 1L).otherwise(0L)).as("disc"),
        sum(when($"sx" === 0L, 1L).otherwise(0L)).as("ties_x"),
        sum(when($"sy" === 0L, 1L).otherwise(0L)).as("ties_y"))
      .select($"n0", $"conc", $"disc", $"ties_x", $"ties_y",
        round(($"conc" - $"disc").cast("double")
          / sqrt((($"n0" - $"ties_x") * ($"n0" - $"ties_y"))
            .cast("double")), 6).as("tau_r6"),
        // n from n0 = n(n−1)/2: 1+8·n0 = (2n−1)², sqrt of a perfect
        // square is exact, so this is integral — no second aggregate
        expr("(1 + cast(sqrt(1.0 + 8.0 * n0) as bigint)) div 2").as("n"))
      .select($"n", $"n0", $"conc", $"disc", $"ties_x", $"ties_y",
        $"tau_r6",
        (lit(45000L) * ($"conc" - $"disc") * ($"conc" - $"disc")
          > lit(9604L) * $"n" * ($"n" - 1L) * (lit(2L) * $"n" + 5L))
          .as("reject"))
  }

  /** McNEMAR's test (McNemar 1947) for PAIRED binary outcomes — did the
    * same population's behavior change between two periods? Pairs are
    * customers; outcome A = placed an order in 1995, B = in 1996. Only
    * the DISCORDANT cells matter: b = active-then-quiet, c =
    * quiet-then-active; χ² = (b−c)²/(b+c) (df=1), plus the Edwards
    * continuity-corrected (|b−c|−1)²/(b+c). The reject verdict is a
    * cross-multiplied BIGINT comparison against χ²₀.₀₅,₁ = 3.841459 —
    * no float in the decision bit.
    *
    * Scale shape: one scan of orders → per-customer flag pair (hash
    * agg), one left join from the customer universe (quiet customers
    * are (0,0) concordant — counted in n_pairs, irrelevant to the
    * verdict), one global aggregate. The shuffle carries flag pairs.
    */
  def qStatMcnemar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flags = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(
        max(when(year(col("o_orderdate")) === 1995, 1).otherwise(0)).as("a"),
        max(when(year(col("o_orderdate")) === 1996, 1).otherwise(0)).as("b"))
    val paired = Tables.customer(spark, dir).select(col("c_custkey"))
      .join(flags, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("a"), lit(0)).as("a"),
        coalesce(col("b"), lit(0)).as("b"))
    paired.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
        .as("n_both"),
      sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
        .as("b_disc"),
      sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
        .as("c_disc"))
      .select(col("n_pairs"), col("n_both"), col("b_disc"), col("c_disc"),
        round((col("b_disc") - col("c_disc")).cast("double")
          * (col("b_disc") - col("c_disc"))
          / (col("b_disc") + col("c_disc")), 6).as("chi2_r6"),
        round((abs(col("b_disc") - col("c_disc")) - 1).cast("double")
          * (abs(col("b_disc") - col("c_disc")) - 1)
          / (col("b_disc") + col("c_disc")), 6).as("chi2_cc_r6"),
        (lit(1000000L) * (abs(col("b_disc") - col("c_disc")) - 1)
          * (abs(col("b_disc") - col("c_disc")) - 1)
          > lit(3841459L) * (col("b_disc") + col("c_disc")))
          .as("reject"))
  }

  /** Lagged CROSS-CORRELATION between two daily event series (does one
    * series lead the other?): x = daily click count, y = daily purchase
    * count, Pearson r at every lag in −7..+7 computed over the days
    * where both x_d and y_{d+lag} exist. Day alignment is an INTEGER
    * equi-join on (day-index + lag) — no window, no self-cross — and
    * each lag's five moment sums are exact BIGINTs, with the float
    * formula applied once on the already-exact sums (the [[Exact]]
    * doctrine; engine-native corr() would stream doubles in engine
    * order).
    *
    * Scale shape: the corpus-sized shuffle is the daily-count
    * aggregate; the lag battery runs over |days|×|lags| tiny rows.
    */
  def qTimeXcorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("di",
        datediff(col("day"), lit("2024-01-01").cast("date")))
    val x = daily.filter(col("event_type") === "click")
      .select(col("di"), col("n").as("x"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("di").as("ydi"), col("n").as("y"))
    val lagged = x
      .withColumn("lag", explode(expr("sequence(-7L, 7L)")))
      .withColumn("ydi", col("di") + col("lag"))
      .join(y, "ydi")
    val s = lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nd = col("n").cast("double")
    s.select(col("lag"), col("n"),
      round((nd * col("sxy") - col("sx").cast("double") * col("sy"))
        / (sqrt(nd * col("sxx") - col("sx").cast("double") * col("sx"))
          * sqrt(nd * col("syy") - col("sy").cast("double") * col("sy"))),
        6).as("r_r6"))
      .orderBy(col("lag"))
  }

  /** TWO-REGRESSOR OLS by exact normal equations (multiple regression,
    * the step past q_agg_corr's simple slope): daily order revenue in
    * cents regressed on x1 = day index and x2 = weekend flag. The 3×3
    * system X'Xβ = X'y is solved in closed form by CRAMER's rule over
    * ten moment sums, each aggregated exactly (BIGINT, DECIMAL(38) for
    * the squared-cents moment) and cast to double ONCE — both engines
    * then evaluate the IDENTICAL determinant expression tree, so every
    * coefficient is bit-identical. Weekend is pure integer calendar
    * arithmetic (days since Monday 1995-01-02, mod 7 ∈ {5,6}) — no
    * locale-dependent day-of-week function in either engine.
    *
    * Scale shape: scan → per-day hash agg → one global 10-sum
    * aggregate; only moment scalars cross the final shuffle.
    */
  def qStatOls2(spark: SparkSession, dir: String): DataFrame = {
    val day = to_date(col("o_orderdate"))
    val daily = Tables.orders(spark, dir)
      .groupBy(day.as("day"))
      .agg(sum(e2(col("o_totalprice"))).as("y"))
      .select(
        datediff(col("day"), lit("1995-01-01").cast("date"))
          .cast("long").as("x1"),
        ((datediff(col("day"), lit("1995-01-02").cast("date")) % 7 + 7) % 7
          >= 5).cast("long").as("x2"),
        col("y"))
    val s = daily.agg(
      count(lit(1)).as("n"), sum(col("x1")).as("s1"),
      sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    val (n, s1, s2, sy) = (col("n").cast("double"),
      col("s1").cast("double"), col("s2").cast("double"),
      col("sy").cast("double"))
    val (s11, s12, s22) = (col("s11").cast("double"),
      col("s12").cast("double"), col("s22").cast("double"))
    val (s1y, s2y, syy) = (col("s1y").cast("double"),
      col("s2y").cast("double"), col("syy").cast("double"))
    val det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s12 - s11 * s2))
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - s11 * s2)) / det
    val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    val sst = syy - sy * sy / n
    s.select(col("n").as("n_days"),
      round(b0, 6).as("beta0_r6"), round(b1, 6).as("beta1_r6"),
      round(b2, 6).as("beta2_r6"),
      round(lit(1.0) - sse / sst, 6).as("r2_r6"))
  }

  /** DYNAMIC TIME WARPING distance (Sakoe & Chiba 1978) between every
    * pair of daily event-type series — the alignment-tolerant series
    * similarity xcorr's fixed-lag shift cannot express (DTW lets the
    * alignment stretch locally). Classic O(n·m) DP run ENTIRELY in
    * integer arithmetic (|Δcount| costs, min over the three moves), so
    * the distance is exact in both engines: the Spark side folds the
    * DP row-by-row with a nested `aggregate` HOF (outer over x, inner
    * building each row left-to-right), the twin replays the SAME cell
    * order as a flattened recursive CTE over (i, j) carrying the
    * previous/current rows as LISTs. Boundary cells are a 10^12
    * sentinel (far above any real path sum, exact in BIGINT).
    *
    * Scale shape: the corpus-sized work is the daily-count aggregate;
    * the DP runs per TYPE-PAIR over |days|² cells — series length is a
    * calendar property, not a data-volume property, so the fold's cost
    * is fixed no matter the table size; pairs parallelize across the
    * cluster.
    */
  def qTimeDtw(spark: SparkSession, dir: String): DataFrame = {
    val inf = "1000000000000"
    // one DP row: cur[1] is the j=0 boundary; cell j appends
    // |x - y_j| + min(above, diag, left)
    val rowFold =
      s"""(prev, x) -> aggregate(
         |  sequence(1, size(ys)), array(cast($inf as bigint)),
         |  (cur, j) -> concat(cur, array(
         |    abs(x - element_at(ys, j)) + least(
         |      element_at(prev, j + 1), element_at(prev, j),
         |      element_at(cur, j)))),
         |  c -> c)""".stripMargin
    val dp =
      s"""aggregate(
         |  xs,
         |  concat(array(cast(0 as bigint)),
         |    transform(sequence(1, size(ys)),
         |      j -> cast($inf as bigint))),
         |  $rowFold,
         |  prev -> element_at(prev, size(ys) + 1))""".stripMargin
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val series = daily.groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(day, n)))," +
        " e -> e.n)").as("s"))
    val a = series.select(col("event_type").as("type_a"),
      col("s").as("xs"))
    val b = series.select(col("event_type").as("type_b"),
      col("s").as("ys"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        size(col("xs")).cast("long").as("n_a"),
        size(col("ys")).cast("long").as("n_b"),
        expr(dp).as("dtw"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** FISHER's EXACT test (Fisher 1935) on a 2×2 contingency table —
    * the small-sample independence test where χ² approximations break:
    * a fixed 50-supplier panel (s_suppkey ≤ 50, a bounded cohort at
    * any scale factor), rows = low/high nation key, cols = account
    * balance sign. The one-sided p-value is the EXACT hypergeometric
    * upper tail Σ_{k≥a} C(r1,k)·C(r2,c1−k) / C(n,c1), computed with no
    * floating point anywhere in the tail: each binomial is the
    * integer-exact multiplicative fold Π(m−j+i) div i (every prefix is
    * itself a binomial, so the division is exact at every step), the
    * tail sum accumulates in DECIMAL(38,0) (HUGEINT in the twin), and
    * the reject verdict is the cross-multiplied integer comparison
    * 20·num < den. Only the REPORTED p is a double — one division of
    * two exact integers.
    *
    * Scale shape: one scan filtered to the panel → a single 4-cell
    * aggregate; the combinatorial fold runs on one row of scalars
    * (n = 50 keeps every binomial < 2^63 and the tail sum < 10^38).
    */
  def qStatFisher(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.supplier(spark, dir)
      .filter(col("s_suppkey") <= 50)
      .agg(
        sum(when(col("s_nationkey") < 12 && col("s_acctbal") >= 0, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("s_nationkey") < 12 && col("s_acctbal") < 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("s_nationkey") >= 12 && col("s_acctbal") >= 0, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("s_nationkey") >= 12 && col("s_acctbal") < 0, 1L)
          .otherwise(0L)).as("d"))
      .withColumn("r1", col("a") + col("b"))
      .withColumn("r2", col("c") + col("d"))
      .withColumn("c1", col("a") + col("c"))
      .withColumn("n", col("r1") + col("r2"))
    // the j <= 0 guard matters: Spark's sequence(1, 0) DESCENDS
    // ([1, 0]) and the fold would divide by zero; C(m, 0) = 1
    def binom(m: String, j: String) =
      s"case when ($j) <= 0 then cast(1 as bigint) else" +
        s" aggregate(sequence(cast(1 as bigint), $j)," +
        s" cast(1 as bigint), (p, i) -> p * ($m - $j + i) div i) end"
    val num = "aggregate(sequence(a, least(r1, c1))," +
      " cast(0 as decimal(38,0)), (acc, k) -> acc" +
      s" + cast(${binom("r1", "k")} as decimal(38,0))" +
      s" * ${binom("r2", "(c1 - k)")})"
    val den = binom("n", "c1")
    cells
      .withColumn("num", expr(num))
      .withColumn("den", expr(den))
      .select(col("a"), col("b"), col("c"), col("d"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("p_r6"),
        (col("num") * 20 < col("den").cast("decimal(38,0)"))
          .as("reject"))
  }

  /** POWER ANALYSIS / SAMPLE-SIZE REQUIREMENT for the two-proportion
    * A/B test — the experiment-DESIGN step in front of every decide-
    * side test in this battery (q_event_abtest, q_stat_fisher decide
    * significance AFTER the fact; this query answers "how many users
    * per arm would detecting the observed effect need"): the standard
    *   n = (z_{α/2} + z_β)² · (p₁(1−p₁) + p₂(1−p₂)) / (p₁ − p₂)²
    * at α = 0.05 two-sided, power 0.80. Arms and conversions come
    * from exact integer counts (the q_event_abtest cohorts); the
    * z-quantiles are published constants; every double step is the
    * IDENTICAL expression tree on identical exact inputs, so the
    * ceiling is the same integer in both engines. The zero-effect
    * guard is the exact integer test s₁·n₂ = s₂·n₁ (null — no finite
    * sample detects a null effect).
    *
    * Scale: one user-level aggregate + a 2-row arm reduce; the design
    * math runs on one row of scalars.
    */
  def qStatPower(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("arm", when(col("user_id") % 2 === 0, "A")
        .otherwise("B"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("s"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n1"), col("s").as("s1"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n2"), col("s").as("s2"))
    a.crossJoin(broadcast(b))
      .withColumn("p1", expr("cast(s1 as double) / cast(n1 as double)"))
      .withColumn("p2", expr("cast(s2 as double) / cast(n2 as double)"))
      .select(col("n1"), col("s1"), col("n2"), col("s2"),
        round(col("p1"), 6).as("p1_r6"),
        round(col("p2"), 6).as("p2_r6"),
        expr("""case when s1 * n2 = s2 * n1 then null else
               |cast(ceil(
               |  (1.959963985D + 0.8416212336D)
               |    * (1.959963985D + 0.8416212336D)
               |    * (p1 * (1.0D - p1) + p2 * (1.0D - p2))
               |    / ((p1 - p2) * (p1 - p2))) as bigint) end"""
          .stripMargin.replace('\n', ' ')).as("n_per_arm"))
  }

  /** 2-VARIABLE PCA per return flag — eigendecomposition of the
    * (quantity, discount%) covariance matrix in closed form: the
    * n²-scaled second moments Sxx = n·Σx²−(Σx)², Sxy, Syy are EXACT
    * BIGINTs; the discriminant D = (Sxx−Syy)² + 4Sxy² is exact
    * DECIMAL(38)/HUGEINT; and the only irrational steps — sqrt(D) and
    * the divisions — run on those identical exact inputs, so IEEE
    * correctly-rounded sqrt gives bit-equal doubles in both engines
    * (the Jarque–Bera doctrine: exactness up to the last transcendental
    * step). Reports λ₁ ≥ λ₂, the explained-variance ratio λ₁/(λ₁+λ₂)
    * with its EXACT integer denominator tr = Sxx+Syy, and the leading
    * eigenvector slope (λ₁−Sxx)/Sxy (null when Sxy = 0 — axes already
    * principal).
    *
    * Scale: one map-side projection + one 6-sum aggregate per flag;
    * eigen math runs on |flags| rows of scalars.
    */
  def qStatPca2(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_discount * 100) as bigint)").as("y"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx0"),
        sum(col("y") * col("y")).as("syy0"),
        sum(col("x") * col("y")).as("sxy0"))
      .withColumn("sxx", expr("n * sxx0 - sx * sx"))
      .withColumn("syy", expr("n * syy0 - sy * sy"))
      .withColumn("sxy", expr("n * sxy0 - sx * sy"))
      .withColumn("sqd", expr(
        "sqrt(cast(cast(sxx - syy as decimal(38,0)) * (sxx - syy)" +
          " + 4 * cast(sxy as decimal(38,0)) * sxy as double))"))
      .withColumn("lam1", expr(
        "(cast(sxx + syy as double) + sqd) / 2.0d"))
      .withColumn("lam2", expr(
        "(cast(sxx + syy as double) - sqd) / 2.0d"))
      // λ reported RAW: the doubles are bit-identical by construction
      // (exact integer inputs + IEEE sqrt/arithmetic), while round(λ, 6)
      // at 1e10 magnitude asks for a 17th significant digit and the two
      // engines' decimal-rounding of the same binary value can differ by
      // one ulp. The O(1)-magnitude ratios round safely.
      .select(col("flag"), col("n"), col("sxx"), col("syy"), col("sxy"),
        col("lam1"), col("lam2"),
        round(expr("lam1 / cast(sxx + syy as double)"), 6)
          .as("evr_r6"),
        when(col("sxy") =!= 0,
          round(expr("(lam1 - cast(sxx as double))" +
            " / cast(sxy as double)"), 6)).as("dir_r6"))
      .orderBy(col("flag"))
  }

  /** PAIRWISE PEARSON CORRELATION MATRIX over the four lineitem
    * measures (quantity, discount%, tax%, price cents) — the
    * multivariate profiling sweep in front of any feature selection
    * ([[qAggCorr]] is the single-pair, per-flag exemplar with an OLS
    * slope; THIS query's additions are the full matrix in one
    * aggregate and the DECIMAL(38) sums the price² moments need past
    * 2⁶³).
    * Per-row products stay in BIGINT (each ≤ 10¹⁴), per-row casts to
    * DECIMAL(38)/HUGEINT make the SUMS exact past 2⁶³ (Σp² at sf0.1
    * is ~10²⁰), the n-scaled cross moments S_ab = n·Σab − Σa·Σb are
    * exact decimals, and r = S_ab / √(S_aa·S_bb) is the one
    * double-step on identical exact inputs (√ of a product of two
    * doubles — both engines IEEE). Emits the 6 upper-triangle pairs.
    *
    * Scale: one projection + ONE 15-sum aggregate over the corpus —
    * a single map-side-partial reduce; the matrix math is one row.
    */
  def qStatCorrmat(spark: SparkSession, dir: String): DataFrame = {
    def dsum(e: String) =
      sum(expr(s"cast($e as decimal(38,0))"))
    val agg = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("q"),
        expr("cast(round(l_discount * 100) as bigint)").as("d"),
        expr("cast(round(l_tax * 100) as bigint)").as("t"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("p"))
      .agg(count(lit(1)).as("n"),
        dsum("q").as("sq"), dsum("d").as("sd"),
        dsum("t").as("st"), dsum("p").as("sp"),
        dsum("q * q").as("sqq"), dsum("d * d").as("sdd"),
        dsum("t * t").as("stt"), dsum("p * p").as("spp"),
        dsum("q * d").as("sqd"), dsum("q * t").as("sqt"),
        dsum("q * p").as("sqp"), dsum("d * t").as("sdt"),
        dsum("d * p").as("sdp"), dsum("t * p").as("stp"))
    def s2(saa: String, sa: String) =
      s"(n * $saa - $sa * $sa)"
    def s11(sab: String, sa: String, sb: String) =
      s"(n * $sab - $sa * $sb)"
    def r(sab: String, sa: String, sb: String,
          saa: String, sbb: String) =
      s"round(cast(${s11(sab, sa, sb)} as double) / sqrt(" +
        s"cast(${s2(saa, sa)} as double) *" +
        s" cast(${s2(sbb, sb)} as double)), 6)"
    agg.select(col("n"), explode(expr(
        "array(" +
          s"struct('qty' as var_a, 'disc' as var_b, ${r("sqd", "sq", "sd", "sqq", "sdd")} as r_r6)," +
          s"struct('qty' as var_a, 'tax' as var_b, ${r("sqt", "sq", "st", "sqq", "stt")} as r_r6)," +
          s"struct('qty' as var_a, 'price' as var_b, ${r("sqp", "sq", "sp", "sqq", "spp")} as r_r6)," +
          s"struct('disc' as var_a, 'tax' as var_b, ${r("sdt", "sd", "st", "sdd", "stt")} as r_r6)," +
          s"struct('disc' as var_a, 'price' as var_b, ${r("sdp", "sd", "sp", "sdd", "spp")} as r_r6)," +
          s"struct('tax' as var_a, 'price' as var_b, ${r("stp", "st", "sp", "stt", "spp")} as r_r6))"))
        .as("pair"))
      .select(col("pair.var_a").as("var_a"), col("pair.var_b").as("var_b"),
        col("n"), col("pair.r_r6").as("r_r6"))
      .orderBy(col("var_a"), col("var_b"))
  }

  /** BENJAMINI–HOCHBERG FDR control (Benjamini & Hochberg 1995) over
    * a FAMILY of exact Fisher tests — the multiple-comparisons layer
    * every per-segment testing sweep needs (25 per-nation tests at
    * α=0.05 expect ~1 false positive; BH bounds the FALSE DISCOVERY
    * RATE instead of Bonferroni's family-wise error). Per nation, a
    * bounded 24-supplier panel (lowest suppkeys — fixed cohort at any
    * scale factor) gives a 2×2 of balance sign × suppkey parity; the
    * one-sided hypergeometric p is the same integer-exact
    * multiplicative-binomial tail as [[qStatFisher]] — n=24 keeps
    * every binomial < 2.8M, so the whole tail lives in BIGINT. The
    * step-up rule is exact: sort by the collision-free HUGEINT key
    * num·10¹⁴ div den (distinct rationals with den ≤ C(24,12) differ
    * by > 10⁻¹³), then reject ranks 1..k* where k* = max{k :
    * 500·num ≤ k·den} (the cross-multiplied form of p ≤ 0.05·k/25).
    *
    * Scale: one scan filtered to 25 bounded panels → 25 rows of
    * scalars; windows run over those 25 rows (bounded by the nation
    * dimension, documented single-partition class).
    */
  def qStatFdr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val panel = Tables.supplier(spark, dir)
      .withColumn("prk", row_number().over(
        Window.partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))))
      .filter(col("prk") <= 24)
    val cells = panel.groupBy(col("s_nationkey").as("nation"))
      .agg(
        sum(when(col("s_acctbal") >= 0 && col("s_suppkey") % 2 === 0, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("s_acctbal") >= 0 && col("s_suppkey") % 2 =!= 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("s_acctbal") < 0 && col("s_suppkey") % 2 === 0, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("s_acctbal") < 0 && col("s_suppkey") % 2 =!= 0, 1L)
          .otherwise(0L)).as("d"))
      .withColumn("r1", col("a") + col("b"))
      .withColumn("r2", col("c") + col("d"))
      .withColumn("c1", col("a") + col("c"))
      .withColumn("n", col("r1") + col("r2"))
    // same j <= 0 guard as qStatFisher (sequence(1, 0) descends)
    def binom(m: String, j: String) =
      s"case when ($j) <= 0 then cast(1 as bigint) else" +
        s" aggregate(sequence(cast(1 as bigint), $j)," +
        s" cast(1 as bigint), (p, i) -> p * ($m - $j + i) div i) end"
    val num = "aggregate(sequence(a, least(r1, c1))," +
      " cast(0 as bigint), (acc, k) -> acc" +
      s" + ${binom("r1", "k")} * ${binom("r2", "(c1 - k)")})"
    val den = binom("n", "c1")
    val ps = cells
      .withColumn("num", expr(num))
      .withColumn("den", expr(den))
      .withColumn("skey", expr(
        "(cast(num as decimal(38,0)) * 100000000000000)" +
          " div cast(den as decimal(38,0))"))
    val m = 25
    val ranked = ps.withColumn("rk", row_number().over(
      Window.orderBy(col("skey"), col("nation"))))
    val kstar = ranked
      .agg(max(when(col("num") * (20 * m) <= col("rk") * col("den"),
        col("rk"))).as("k_star"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("nation"), col("a"), col("b"), col("c"), col("d"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("p_r6"),
        col("rk").cast("long").as("rk"),
        (col("rk") <= coalesce(col("k_star"), lit(0L))).as("reject"))
      .orderBy(col("nation"))
  }

  /** KENDALL τ-b OVER THE FULL FACT TABLE via the joint-histogram
    * identity — the scale twin of [[qStatKendall]] (which pair-joins a
    * calendar-bounded daily cohort). For two LOW-CARDINALITY columns
    * (x = l_quantity ∈ 1..50, y = discount cents ∈ 0..10) every
    * pairwise comparison statistic is a function of the Dx×Dy joint
    * histogram alone: with cell counts c(x,y),
    *   C  = Σ_{x<x', y<y'} c(x,y)·c(x',y'),  D likewise for y>y',
    *   T_x = Σ_x m_x(m_x−1)/2 over the x-marginal (T_y symmetric),
    * so O(N²) pair enumeration collapses to one map-side-combined
    * count aggregate (the ONLY thing that scans the data) plus a
    * broadcast self-join of ≤550 histogram rows — at 100 TB the
    * shuffle carries Dx·Dy BIGINTs. Outputs the full concordance
    * family: τ-b (tie-corrected), Goodman–Kruskal γ (ties dropped),
    * and Somers' D(y|x) = (C−D)/(n0−T_x).
    *
    * Exactness: C, D, n0, T_x, T_y are exact BIGINTs (n0 ≈ 1.8e11 at
    * sf0.1 — fits); the τ-b denominator product (n0−T_x)(n0−T_y)
    * would overflow Int64 beyond sf0.01, so it is formed in DOUBLE on
    * the exact integers (identical IEEE multiply+sqrt both engines).
    */
  def qStatKendallFull(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kendallHistogram(Tables.lineitem(spark, dir)
      .select($"l_quantity".cast("long").as("x"), e2($"l_discount").as("y")))
  }

  /** Concordance family from a (x, y) observation frame — see
    * [[qStatKendallFull]]. */
  private[queries] def kendallHistogram(xy: DataFrame): DataFrame = {
    import xy.sparkSession.implicits._
    val cells = xy.groupBy($"x", $"y").agg(count(lit(1)).as("c"))
    val h = graft.ops.CacheScope.cached(cells)
    val pairs = h.as("a").join(broadcast(h.as("b")), $"a.x" < $"b.x")
      .agg(
        sum(when($"a.y" < $"b.y", $"a.c" * $"b.c").otherwise(0L)).as("conc"),
        sum(when($"a.y" > $"b.y", $"a.c" * $"b.c").otherwise(0L)).as("disc"))
    val margs = h.groupBy().agg(sum($"c").as("n"))
    val tx = h.groupBy($"x").agg(sum($"c").as("m"))
      .agg(sum(expr("m * (m - 1) div 2")).as("tx"))
    val ty = h.groupBy($"y").agg(sum($"c").as("m"))
      .agg(sum(expr("m * (m - 1) div 2")).as("ty"))
    pairs.crossJoin(broadcast(margs)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select($"n", expr("n * (n - 1) div 2").as("n0"), $"conc", $"disc",
        $"tx", $"ty")
      .select($"n", $"n0", $"conc", $"disc", $"tx", $"ty",
        round(($"conc" - $"disc").cast("double") /
          sqrt(($"n0" - $"tx").cast("double") *
            ($"n0" - $"ty").cast("double")), 6).as("tau_b_r6"),
        round(($"conc" - $"disc").cast("double") /
          ($"conc" + $"disc").cast("double"), 6).as("gamma_r6"),
        round(($"conc" - $"disc").cast("double") /
          ($"n0" - $"tx").cast("double"), 6).as("somers_yx_r6"))
  }

  /** HIGH-CARDINALITY EXACT KENDALL τ-b via GRID-DECOMPOSED 2-D
    * DOMINANCE COUNTING — the upgrade [[qStatKendallFull]]'s scaladoc
    * promises for pairs where the joint histogram is data-sized (here
    * x = order total cents, ~unique per row; y = order day): the
    * concordant count C = Σ_b c_b·W(b) needs the strict-dominance
    * weight W(b) = Σ_{a.x<b.x, a.y<b.y} c_a per cell, and the grid
    * decomposition computes it EXACTLY with no pair enumeration:
    *
    *  - bucket the DISTINCT x values (and y values) into B = 2048
    *    rank-ranges, so a whole x value lands in one bucket and
    *    bucket(a) < bucket(b) ⟹ a.x < b.x STRICTLY;
    *  - full blocks: a constant-size dense B×B block-mass table with a
    *    2-D inclusive prefix (two windows over B-row partitions) gives
    *    every cell its strictly-dominated block mass by one equi-join;
    *  - partial strips: the same-x-bucket and same-y-bucket remainders
    *    are per-bucket equi-joins of width M/B — total candidate work
    *    M²/B (≈10⁷ at sf0.1), the knob that turns the O(M²) identity
    *    into a linear-ish scan.
    *
    * D then follows by inclusion–exclusion from the exact marginals —
    * D = (n0−n1) − (n2−n3) − C — so the whole statistic is integer
    * arithmetic end to end. The DuckDB twin is the INDEPENDENT O(M²)
    * cell-pair identity (a.x < b.x range join), so the gate checks the
    * decomposition against a different algorithm, not a replay.
    *
    * B is the cost dial: strips do M²/B candidate-pair work (cheap
    * codegen'd hash-join rows), the dense prefix grid costs B² rows
    * (two windows over B-row partitions) — raise B with M. Measured
    * profile at sf0.1 (M≈150k, B=512, local[4]): scan+cells 3.4 s,
    * ranks 4.5 s, prefix 2.6 s, strips 3.1 s — evenly spread, nothing
    * data-quadratic anywhere.
    */
  def qStatKendallGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kendallGrid(Tables.orders(spark, dir).select(
      e2($"o_totalprice").as("x"),
      datediff(to_date($"o_orderdate"),
        lit("1992-01-01").cast("date")).cast("long").as("y")), 512)
  }

  private[queries] def kendallGrid(xy: DataFrame, b: Int): DataFrame = {
    import xy.sparkSession.implicits._
    val spark = xy.sparkSession
    val cells = graft.ops.CacheScope.cached(
      xy.groupBy($"x", $"y").agg(count(lit(1)).as("c")))
    val m0 = cells.agg(sum($"c").as("n"),
      sum(expr("c * (c - 1) div 2")).as("n3"))
    val mx = cells.groupBy($"x").agg(sum($"c").as("m"))
      .agg(sum(expr("m * (m - 1) div 2")).as("n1"),
        count(lit(1)).as("dx"))
    val my = cells.groupBy($"y").agg(sum($"c").as("m"))
      .agg(sum(expr("m * (m - 1) div 2")).as("n2"),
        count(lit(1)).as("dy"))
    // bucket ids from dense VALUE ranks computed directly on the cell
    // table (equal values share a rank, so a value's every occurrence
    // shares a bucket and lower bucket implies strictly smaller
    // value); stride = ceil(D/B) guarantees ≤ ⌈D/B⌉ distinct values
    // per strip regardless of value skew.
    // The rank exchanges are sized to the CELL COUNT (one cheap count
    // on the cached cell table; rank values are partition-count
    // invariant): at fixture scale the cell table is ~150k rows and a
    // 32-partition range exchange pays 32-task dispatch per stage for
    // nothing — the r11 local[32] wall doubling. At 100 TB the ratio
    // drives p back to the session parallelism.
    val rankP = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      (cells.count() + 65535L) / 65536L)).toInt
    val ranked = graft.ops.Prefix.denseRank(
      graft.ops.Prefix.denseRank(cells, Seq($"x"), "rx", rankP),
      Seq($"y"), "ry", rankP)
    val withB = graft.ops.CacheScope.cached(ranked
      .crossJoin(broadcast(mx.select($"dx")))
      .crossJoin(broadcast(my.select($"dy")))
      .select($"x", $"y", $"c",
        expr(s"(rx - 1) div ((dx + ${b - 1}) div $b)").as("px"),
        expr(s"(ry - 1) div ((dy + ${b - 1}) div $b)").as("py")))
    // dense B×B block masses + inclusive 2-D prefix (two windows over
    // B-row partitions — never data-sized)
    val blocks = withB.groupBy($"px", $"py").agg(sum($"c").as("bc"))
    val grid = spark.range(b).select($"id".as("px"))
      .crossJoin(spark.range(b).select($"id".as("py")))
      .join(blocks, Seq("px", "py"), "left")
      .select($"px", $"py", coalesce($"bc", lit(0L)).as("bc"))
    import org.apache.spark.sql.expressions.Window
    val wy = Window.partitionBy($"px").orderBy($"py")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wx = Window.partitionBy($"py").orderBy($"px")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pref = grid.withColumn("cy", sum($"bc").over(wy))
      .withColumn("p", sum($"cy").over(wx))
      .select($"px", $"py", $"p")
    val full = withB.as("cl")
      .join(pref.as("pf"),
        $"pf.px" === $"cl.px" - 1 && $"pf.py" === $"cl.py" - 1, "left")
      .select(($"cl.c" * coalesce($"pf.p", lit(0L))).as("w"))
    val xs = withB.as("a")
      .join(withB.as("bb"), $"a.px" === $"bb.px" &&
        $"a.x" < $"bb.x" && $"a.y" < $"bb.y")
      .select(($"a.c" * $"bb.c").as("w"))
    val ys = withB.as("a")
      .join(withB.as("bb"), $"a.py" === $"bb.py" &&
        $"a.px" < $"bb.px" && $"a.y" < $"bb.y")
      .select(($"a.c" * $"bb.c").as("w"))
    val conc = full.unionByName(xs).unionByName(ys)
      .agg(sum($"w").as("conc"))
    conc.crossJoin(broadcast(m0)).crossJoin(broadcast(mx.select($"n1")))
      .crossJoin(broadcast(my.select($"n2")))
      .select($"n", expr("n * (n - 1) div 2").as("n0"), $"conc",
        $"n1".as("tx"), $"n2".as("ty"), $"n3".as("txy"))
      .select($"n", $"n0", $"conc",
        (($"n0" - $"tx") - ($"ty" - $"txy") - $"conc").as("disc"),
        $"tx", $"ty", $"txy")
      .select($"n", $"n0", $"conc", $"disc", $"tx", $"ty", $"txy",
        round(($"conc" - $"disc").cast("double") /
          sqrt(($"n0" - $"tx").cast("double") *
            ($"n0" - $"ty").cast("double")), 6).as("tau_b_r6"))
  }

  /** WILCOXON SIGNED-RANK (Wilcoxon 1945) — the PAIRED location test
    * completing the nonparametric battery (Mann–Whitney = unpaired
    * two-sample, Kruskal–Wallis = k-sample): per customer, does the
    * open-order ('O') spend differ from the fulfilled ('F') spend?
    * Pairs are customers with both arms; d = cents(O) − cents(F);
    * zero differences are EXCLUDED (classic Wilcoxon, not Pratt —
    * documented contract).
    *
    * Scale + exactness (the [[qStatMannwhitney]] histogram doctrine):
    * ranks of |d| are never materialized per row — the |d|-value
    * histogram (t_v at value v, cum(<v) below it) gives the DOUBLED
    * average rank r2_v = 2·cum + t_v + 1 as an exact BIGINT, so
    * W2⁺ = Σ_{d>0} r2(|d|) = Σ_v a_v·r2_v from per-value positive
    * counts a_v. The α=0.05 normal-approximation verdict is one
    * cross-multiplied DECIMAL(38,0) comparison on exact integers
    * (7500·(2·W2⁺ − n(n+1))² > 9604·(2n(n+1)(2n+1) − ΣT),
    * ΣT = Σ_v t³−t the tie correction): no float touches the bit.
    */
  def qStatWilcoxon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.orders(spark, dir)
      .filter($"o_orderstatus".isin("O", "F"))
      .groupBy($"o_custkey")
      .agg(
        sum(when($"o_orderstatus" === "O", e2($"o_totalprice"))
          .otherwise(0L)).as("co"),
        sum(when($"o_orderstatus" === "F", e2($"o_totalprice"))
          .otherwise(0L)).as("cf"),
        count(when($"o_orderstatus" === "O", 1)).as("no"),
        count(when($"o_orderstatus" === "F", 1)).as("nf"))
      .filter($"no" > 0 && $"nf" > 0)
      .select(($"co" - $"cf").as("d"))
    wilcoxonFromDiffs(d)
  }

  /** Signed-rank machinery from a single `d` (paired difference)
    * column — see [[qStatWilcoxon]]. */
  private[queries] def wilcoxonFromDiffs(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    val nz = d.filter($"d" =!= 0L)
      .select(abs($"d").as("v"), ($"d" > 0L).as("pos"))
    val byV = nz.groupBy($"v")
      .agg(count(lit(1)).as("t"),
        sum(when($"pos", 1L).otherwise(0L)).as("a"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    byV
      .withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
      .agg(sum($"t").as("n"),
        sum($"a" * (lit(2L) * $"cumt" + $"t" + 1L)).as("w2_pos"),
        sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
      .select($"n", $"w2_pos", $"tie_term",
        expr("""cast(7500 as decimal(38,0))
               |  * (2 * w2_pos - n * (n + 1)) * (2 * w2_pos - n * (n + 1))
               |> cast(9604 as decimal(38,0))
               |  * (cast(2 as decimal(38,0)) * n * (n + 1) * (2 * n + 1)
               |     - tie_term)"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** FRIEDMAN RANK TEST (Friedman 1937) — the k-treatment BLOCKED
    * rank test (the nonparametric two-way ANOVA): do event types
    * differ in daily volume when each DAY is its own block (removing
    * the day effect Kruskal–Wallis ignores)? Blocks are the day×type
    * count grid COMPLETED WITH ZEROS (a day with no 'refund' events
    * is a 0-count observation, not a missing cell), so every block
    * has exactly k treatments.
    *
    * Within-block ranks ride the doubled-rank trick per (block,
    * value) group — r2 = 2·cnt(<v within block) + t + 1, exact
    * BIGINT — over k-row partitions (bounded by the type count, not
    * the data). The tie-corrected statistic is the ratio form
    * (Conover 1999): Q = (k−1)·Σ_j(R2_j − n(k+1))² /
    * (Σ_{b,j} r2² − n·k·(k+1)²) — numerator and denominator both
    * exact BIGINTs (the 2×-unit factors of 4 cancel), one identical
    * division for q_r6, and the α=0.05 verdict is the cross-multiplied
    * integer comparison against χ²_{k−1} (×1000).
    *
    * Scale: the raw scan reduces map-side to the day×type grid
    * (calendar-bounded); everything after is O(days·k).
    */
  def qStatFriedman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(to_date($"ts").as("d"), $"event_type".as("g"))
    val counts = ev.groupBy($"d", $"g").agg(count(lit(1)).as("v"))
    val grid = ev.select($"d").distinct()
      .crossJoin(broadcast(ev.select($"g").distinct()))
      .join(counts, Seq("d", "g"), "left")
      .select($"d", $"g", coalesce($"v", lit(0L)).as("v"))
    friedmanFromGrid(grid)
  }

  /** Doubled average ranks within each block of a complete (d = block,
    * g = treatment, v) grid, via the per-(block, value) histogram (no
    * tie-order ambiguity): r2 = 2·cnt(<v) + t + 1. Shared by
    * [[qStatFriedman]] and [[qStatPage]]. */
  private[queries] def rankedGrid(grid: DataFrame): DataFrame = {
    import grid.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val bv = grid.groupBy($"d", $"v").agg(count(lit(1)).as("t"))
    val wb = Window.partitionBy($"d").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2v = bv
      .withColumn("cumt", coalesce(sum($"t").over(wb), lit(0L)))
      .select($"d", $"v", (lit(2L) * $"cumt" + $"t" + 1L).as("r2"))
    grid.join(r2v, Seq("d", "v"))
      .select($"d", $"g", $"r2")
  }

  /** Blocked rank test from a complete (d = block, g = treatment, v)
    * grid — see [[qStatFriedman]]. */
  private[queries] def friedmanFromGrid(grid: DataFrame): DataFrame = {
    import grid.sparkSession.implicits._
    val ranked = rankedGrid(grid)
    val perT = ranked.groupBy($"g").agg(sum($"r2").as("s2"))
    val sq = ranked.agg(sum($"r2" * $"r2").as("sr2"),
      countDistinct($"d").as("n"), countDistinct($"g").as("k"))
    perT.crossJoin(broadcast(sq))
      .groupBy($"n", $"k", $"sr2")
      .agg(sum(($"s2" - $"n" * ($"k" + 1)) *
        ($"s2" - $"n" * ($"k" + 1))).as("num"))
      .select($"k", $"n",
        (($"k" - 1) * $"num").as("num"),
        ($"sr2" - $"n" * $"k" * ($"k" + 1) * ($"k" + 1)).as("den"))
      .select($"k", $"n", $"num", $"den",
        round($"num".cast("double") / $"den".cast("double"), 6)
          .as("q_r6"),
        (lit(1000L) * $"num" >
          when($"k" === 2, 3841L).when($"k" === 3, 5991L)
            .when($"k" === 4, 7815L).when($"k" === 5, 9488L)
            .when($"k" === 6, 11070L).otherwise(12592L)
          * $"den").as("reject"))
  }

  /** DURBIN–WATSON STATISTIC (Durbin & Watson 1950) — the
    * serial-correlation diagnostic on the residuals of the daily
    * revenue trend regression: DW = Σ(e_t − e_{t−1})² / Σe_t² over the
    * time-ordered OLS residuals (DW→0 positive autocorrelation, →2
    * none, →4 negative). The missing diagnostic next to
    * [[qStatOls2]]: a pipeline that fits trends should also test
    * whether the iid-error assumption holds.
    *
    * Exactness: regression moments (n, Σx, Σy, Σx², Σxy) are exact
    * order-independent BIGINT sums; slope/intercept are formed ONCE in
    * double on those exact integers (identical IEEE ops both engines;
    * Σxy at SF100 would need the decimal route — documented, not hit
    * at bench scales); residuals and both quadratic sums ride ordered
    * left folds over the day-sorted array, mirrored expression-for-
    * expression by the twin's list_reduce — every double is
    * bit-identical by construction, and DW ∈ [0,4] so round(·,6) is
    * safely inside the cross-engine decimal-rounding envelope.
    *
    * Scale shape: the corpus reduces map-side to one row per calendar
    * day (2.4k cells regardless of fact-table size); the fold is a
    * single bounded array — the q_time_acf class.
    */
  def qStatDw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(e2($"o_totalprice")).as("y"))
    val d0 = daily.agg(min($"day").as("d0"))
    daily.crossJoin(broadcast(d0))
      .select(datediff($"day", $"d0").cast("long").as("x"), $"y")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
        expr("sort_array(collect_list(struct(x, y)))").as("xs"))
      .withColumn("b1",
        ($"n".cast("double") * $"sxy" - $"sx".cast("double") * $"sy") /
          ($"n".cast("double") * $"sxx" - $"sx".cast("double") * $"sx"))
      .withColumn("b0", ($"sy".cast("double") - $"b1" * $"sx") / $"n")
      .withColumn("es", expr(
        "transform(xs, p -> cast(p.y as double) - b0" +
          " - b1 * cast(p.x as double))"))
      .withColumn("den", expr(
        "aggregate(es, cast(0.0 as double), (a, e) -> a + e * e)"))
      .withColumn("num", expr(
        """aggregate(sequence(2, cast(n as int)), cast(0.0 as double),
          |  (a, i) -> a + (element_at(es, i) - element_at(es, i - 1))
          |    * (element_at(es, i) - element_at(es, i - 1)))"""
          .stripMargin.replace('\n', ' ')))
      .select($"n",
        round($"num" / $"den", 6).as("dw_r6"),
        round(lit(1.0) - ($"num" / $"den") / 2.0, 6).as("rho_r6"))
  }

  /** COCHRAN'S Q (Cochran 1950) — the k-treatment generalization of
    * McNemar for BINARY repeated measures: did the same customers'
    * year-over-year activity (ordered in 1996 / 1997 / 1998) change
    * across years? Q = (k−1)·(k·ΣG_j² − T²)/(k·T − ΣL_i²) with G_j =
    * per-year active counts, L_i = per-customer active-year count,
    * T = ΣL — ALL exact BIGINTs, so the statistic is one identical
    * division and the α=0.05 verdict one integer cross-multiplication
    * against χ²₂.
    *
    * Cohort note: Q is algebraically INVARIANT to all-0 and all-k
    * subjects (adding an all-1 row shifts kΣG² and T² identically),
    * so never-active customers need no membership decision — the
    * orders table alone suffices. Scale: one map-side-combined
    * groupBy(custkey) then a 6-sum reduce; nothing after the first
    * aggregate exceeds one row.
    */
  def qStatCochranq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.orders(spark, dir)
      .select($"o_custkey", year($"o_orderdate").as("yr"))
      .filter($"yr".isin(1996, 1997, 1998))
      .groupBy($"o_custkey")
      .agg(max(when($"yr" === 1996, 1L).otherwise(0L)).as("t1"),
        max(when($"yr" === 1997, 1L).otherwise(0L)).as("t2"),
        max(when($"yr" === 1998, 1L).otherwise(0L)).as("t3"))
    rows
      .agg(count(lit(1)).as("n"),
        sum($"t1").as("g1"), sum($"t2").as("g2"), sum($"t3").as("g3"),
        sum($"t1" + $"t2" + $"t3").as("t"),
        sum(($"t1" + $"t2" + $"t3") * ($"t1" + $"t2" + $"t3")).as("l2"))
      .select($"n", $"g1", $"g2", $"g3",
        (lit(2L) * (lit(3L) * ($"g1" * $"g1" + $"g2" * $"g2" +
          $"g3" * $"g3") - $"t" * $"t")).as("num"),
        (lit(3L) * $"t" - $"l2").as("den"))
      .select($"n", $"g1", $"g2", $"g3", $"num", $"den",
        round($"num".cast("double") / $"den".cast("double"), 6)
          .as("q_r6"),
        (lit(1000L) * $"num" > lit(5991L) * $"den").as("reject"))
  }

  /** MAX STUDENTIZED DEVIATION — the Grubbs-statistic outlier screen
    * (Grubbs 1950) on order totals: which single row deviates most
    * from the mean in standard-deviation units, and does it cross the
    * asymptotic 3σ screening bar? (The exact Grubbs critical value is
    * a t-quantile in n — not expressible as a fixed integer
    * comparison across scale factors; the 3σ rule is the documented
    * contract, the same bar as q_stat_zscore's gate.) Complements the
    * moment (zscore), median (MAD) and rank (IQR) outlier rules with
    * the single-most-extreme-point decision.
    *
    * Exactness: the argmax is selected on the INTEGER deviation
    * |n·x − T| via struct extrema (ties → smallest orderkey), so the
    * chosen row can never flip on float rounding; G² = (n−1)·dev² /
    * (n·(n·Q − T²)) rides DECIMAL(38,0) (Q needs decimal even at
    * sf0.1) with one identical double division at the end; the
    * verdict G² > 9 is the integer comparison num > 9·den.
    *
    * Scale: one scan for the moments (3-sum reduce), one scan for the
    * argmax with the one-row stats broadcast back. Nothing after the
    * aggregates exceeds one row.
    */
  def qStatGrubbs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.orders(spark, dir)
      .select($"o_orderkey", e2($"o_totalprice").as("c"))
    val st = x.agg(count(lit(1)).as("n"), sum($"c").as("t"),
      sum($"c".cast("decimal(38,0)") * $"c").as("q"))
    x.crossJoin(broadcast(st))
      .select($"o_orderkey", $"c", $"n", $"t", $"q",
        abs($"n".cast("decimal(38,0)") * $"c" - $"t").as("dev"))
      .agg(max(struct($"dev", (-$"o_orderkey").as("nid"), $"c",
        $"n", $"t", $"q")).as("m"))
      .select((-$"m.nid").as("outlier_key"), $"m.c".as("outlier_cents"),
        $"m.n".as("n"),
        (($"m.n" - 1).cast("decimal(38,0)") * $"m.dev" * $"m.dev")
          .as("num"),
        ($"m.n".cast("decimal(38,0)") *
          ($"m.n" * $"m.q" - $"m.t".cast("decimal(38,0)") * $"m.t"))
          .as("den"))
      .select($"n", $"outlier_key", $"outlier_cents",
        round($"num".cast("double") / $"den".cast("double"), 6)
          .as("g2_r6"),
        ($"num" > lit(9) * $"den").as("reject"))
  }

  /** HODGES–LEHMANN pseudomedian (Hodges & Lehmann 1963) of 1995 order
    * totals per priority: the median of all n(n+1)/2 Walsh averages
    * (x_i + x_j)/2, i ≤ j — the location estimator dual to the Wilcoxon
    * signed-rank test (~95% Gaussian efficiency, 29% breakdown), the
    * robust mean a profiling surface should publish next to q_stat_mad.
    *
    * Never enumerates a pair: [[graft.ops.Selection.kthPairwise]]
    * binary-searches the integer SUM range and counts pairs ≤ t per
    * probe from the value histogram (see the Selection scaladoc for the
    * identity and the 100 TB shape). The selected sum is an achieved
    * Walsh sum by construction, so `hl_cents2` is an exact integer and
    * `hl` the one identical IEEE division. The DuckDB twin enumerates
    * the ~10⁵ pairs per group explicitly — feasible only because the
    * oracle slice is small, which is exactly the point: the engine's
    * counting search is the form that scales.
    */
  def qStatHodges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vals = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      .select($"o_orderpriority".as("g"), e2($"o_totalprice").as("v"))
    Selection.kthPairwise(vals, Selection.WalshSums,
        (_, m) => (m + 1) / 2)
      .select($"g".as("o_orderpriority"), $"n", $"m".as("n_pairs"), $"k",
        $"value".as("hl_cents2"), ($"value" / lit(200.0)).as("hl"))
      .orderBy($"o_orderpriority")
  }

  /** GROUPED Hodges–Lehmann at HIGH group cardinality — the HL
    * pseudomedian of order totalprice per (nation, order month):
    * ~2,000 concurrent binary searches, one shared probe job per
    * round (the broadcast threshold frame carries every active
    * group's mid). Exists to run [[graft.ops.Selection.kthPairwise]]'s
    * DISTRIBUTED probe loop as a first-class benched query: the
    * full-table (g, v) histogram deliberately blows the driver tier
    * (`smallHistLimit` 2¹³ — the fixture histogram is ≥ 15k distinct
    * rows at sf0.01, ~150k at sf0.1), so every probe is the
    * two-shuffle union-window job the 100 TB path pays, not the
    * local sort the driver tier absorbs in [[qStatHodges]]. Probe
    * count stays ⌈log₂ range⌉ ≈ 27 — a function of the cents domain,
    * independent of rows AND of group count.
    */
  def qStatHodgesGrouped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey")
    val vals = Tables.orders(spark, dir)
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select(concat($"c_nationkey".cast("string"), lit("|"),
          date_format($"o_orderdate", "yyyy-MM")).as("g"),
        e2($"o_totalprice").as("v"))
    Selection.kthPairwise(vals, Selection.WalshSums,
        (_, m) => (m + 1) / 2,
        maxGroups = 4096, smallHistLimit = 1L << 13,
        perGroupHistLimit = 0L) // force tier 3: this query BENCHES it
      .select($"g".as("nation_month"), $"n", $"m".as("n_pairs"), $"k",
        $"value".as("hl_cents2"), ($"value" / lit(200.0)).as("hl"))
      .orderBy($"nation_month")
  }

  /** The SAME grouped Hodges–Lehmann selection through
    * [[graft.ops.Selection.kthPairwise]]'s EXECUTOR-LOCAL GROUP tier
    * (r15): the full histogram still blows the driver probe
    * (`smallHistLimit` 0 here makes that explicit), but every single
    * group's histogram is task-sized, so the whole selection is ONE
    * exchange on the group key + a per-task run of the exact local
    * counting search — zero barrier rounds, zero per-round driver
    * actions, group count unbounded. This is the tier a 100 TB run
    * with thousands-to-millions of MEDIUM groups takes by default;
    * [[qStatHodgesGrouped]] keeps pricing the probe-loop shape the
    * rare jumbo-group workload needs. Identical output (same oracle
    * SQL), deliberately different plan — the pair is the cost story.
    */
  def qStatHodgesGroupedExec(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey")
    val vals = Tables.orders(spark, dir)
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select(concat($"c_nationkey".cast("string"), lit("|"),
          date_format($"o_orderdate", "yyyy-MM")).as("g"),
        e2($"o_totalprice").as("v"))
    Selection.kthPairwise(vals, Selection.WalshSums,
        (_, m) => (m + 1) / 2,
        maxGroups = 4096, smallHistLimit = 0L)
      .select($"g".as("nation_month"), $"n", $"m".as("n_pairs"), $"k",
        $"value".as("hl_cents2"), ($"value" / lit(200.0)).as("hl"))
      .orderBy($"nation_month")
  }

  /** ROUSSEEUW–CROUX Qn scale estimator (JASA 1993) of 1995 order totals
    * per priority: the C(h,2)-th smallest pairwise distance
    * |x_i − x_j| (i < j), h = ⌊n/2⌋ + 1 — a 50%-breakdown scale measure
    * that, unlike MAD, needs no location estimate and keeps 82%
    * Gaussian efficiency. `qn_scaled_r6` applies the published
    * consistency constant 2.2219. Same [[graft.ops.Selection]] counting
    * search as q_stat_hodges ([[Selection.AbsDiffs]] band count); same
    * explicit-enumeration DuckDB twin.
    */
  def qStatQn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vals = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      .select($"o_orderpriority".as("g"), e2($"o_totalprice").as("v"))
    Selection.kthPairwise(vals, Selection.AbsDiffs,
        (n, _) => { val h = n / 2 + 1; h * (h - 1) / 2 })
      .select($"g".as("o_orderpriority"), $"n", $"k",
        $"value".as("qn_cents"), ($"value" / lit(100.0)).as("qn"),
        round(lit(2.2219) * ($"value" / lit(100.0)), 6)
          .as("qn_scaled_r6"))
      .orderBy($"o_orderpriority")
  }

  /** GROUPED Qn SCALE at high group cardinality, through
    * [[graft.ops.Selection.kthPairwise]]'s EXECUTOR-LOCAL GROUP tier
    * (the q_stat_hodges_grouped_exec pattern, AbsDiffs mode): the
    * Rousseeuw–Croux Qn of order totals per (nation, order month) —
    * ~2k robust scale estimates in ONE exchange + a per-task run of
    * the shared counting solver; no barrier rounds, no driver state.
    * Monitoring dispersion per segment is exactly the workload shape
    * this tier exists for: many medium groups, none big enough to
    * need the probe loop. Singleton groups have no pairs and drop
    * (the kthPairwise contract).
    */
  def qStatQnGrouped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey")
    val vals = Tables.orders(spark, dir)
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select(concat($"c_nationkey".cast("string"), lit("|"),
          date_format($"o_orderdate", "yyyy-MM")).as("g"),
        e2($"o_totalprice").as("v"))
    Selection.kthPairwise(vals, Selection.AbsDiffs,
        (n, _) => { val h = n / 2 + 1; h * (h - 1) / 2 },
        maxGroups = 4096, smallHistLimit = 0L)
      .select($"g".as("nation_month"), $"n", $"k",
        $"value".as("qn_cents"), ($"value" / lit(100.0)).as("qn"),
        round(lit(2.2219) * ($"value" / lit(100.0)), 6)
          .as("qn_scaled_r6"))
      .orderBy($"nation_month")
  }

  /** JONCKHEERE–TERPSTRA TEST (Jonckheere 1954, Terpstra 1952) for
    * ordered alternatives across the five order priorities: J =
    * Σ_{g<h} U_gh, the sum of between-group Mann–Whitney counts in the
    * hypothesized group order — the independent-samples companion to
    * q_stat_page exactly as Kruskal–Wallis companions Friedman. When
    * the alternative is monotone in the group order, J dominates the
    * omnibus H.
    *
    * Exactness (the q_stat_mannwhitney distinct-value doctrine): the
    * scan collapses to the per-value pivoted group-count table
    * (bounded by the CURRENCY DOMAIN, not N); doubled counts
    * U2 = 2·#{x<y} + #{x=y} come from exclusive per-group cumulants
    * in one value-ordered window, so J2 = 2J and every moment (group
    * sums G_a/G_b/G_c, tie sums T_a/T_b/T_c) is an exact BIGINT. The
    * tie-corrected three-term variance (Kendall's form) and z are the
    * ONE identical double expression on those exact sums (the
    * q_agg_corr doctrine); one-sided α=0.05.
    */
  def qStatJonckheere(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jonckheereFromValues(Tables.orders(spark, dir)
      .select($"o_orderpriority".as("g"), e2($"o_totalprice").as("x")))
  }

  /** J-T from a (g, x) frame, groups = the five priority literals in
    * hypothesized order — see [[qStatJonckheere]]. Exposed for spec
    * brute-force parity. */
  private[queries] def jonckheereFromValues(v: DataFrame): DataFrame = {
    import v.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val slugs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val hvAggs = slugs.zipWithIndex.map { case (s, i) =>
      sum(when($"g" === s, 1L).otherwise(0L)).as(s"c${i + 1}")
    } :+ count(lit(1)).as("t")
    val hv = v.groupBy($"x").agg(hvAggs.head, hvAggs.tail: _*)
    val w = Window.orderBy($"x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hv.select(($"x" +: $"t" +:
      (1 to 5).map(i => col(s"c$i")) ++:
      (1 to 5).map(i =>
        coalesce(sum(col(s"c$i")).over(w), lit(0L)).as(s"f$i"))): _*)
    // per-value J2 contribution: Σ_h c_h · Σ_{g<h} (2·F_g + c_g)
    def below(h: Int): Column = (1 until h).map(g =>
      lit(2L) * col(s"f$g") + col(s"c$g")).reduce(_ + _)
    val perV = cum.select(
      (2 to 5).map(h => (col(s"c$h") * below(h)).as(s"j$h")) :+
        ($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("ta_v") :+
        ($"t" * ($"t" - 1L) * ($"t" - 2L)).as("tb_v") :+
        ($"t" * ($"t" - 1L)).as("tc_v"): _*)
    val sums = perV.agg(
      ((2 to 5).map(h => sum(col(s"j$h"))).reduce(_ + _)).as("j2"),
      sum($"ta_v").as("ta"), sum($"tb_v").as("tb"), sum($"tc_v").as("tc"))
    val grp = v.groupBy($"g").agg(count(lit(1)).as("ng"))
      .agg(sum($"ng").as("n"), sum($"ng" * $"ng").as("sn2"),
        sum($"ng" * ($"ng" - 1L) * (lit(2L) * $"ng" + 5L)).as("ga"),
        sum($"ng" * ($"ng" - 1L) * ($"ng" - 2L)).as("gb"),
        sum($"ng" * ($"ng" - 1L)).as("gc"))
    val j = sums.crossJoin(broadcast(grp))
    val varD = (($"n" * ($"n" - 1L) * (lit(2L) * $"n" + 5L) - $"ga"
      - $"ta").cast("double") / lit(72.0)) +
      (($"gb" * $"tb").cast("double")
        / (lit(36.0) * ($"n" * ($"n" - 1L) * ($"n" - 2L)).cast("double"))) +
      (($"gc" * $"tc").cast("double")
        / (lit(8.0) * ($"n" * ($"n" - 1L)).cast("double")))
    val num = (lit(2L) * $"j2" - ($"n" * $"n" - $"sn2")).cast("double")
    j.select($"n", $"j2", ($"n" * $"n" - $"sn2").as("e4"),
      $"ga", $"gb", $"gc", $"ta", $"tb", $"tc",
      round(num / (lit(4.0) * sqrt(varD)), 6).as("z_r6"),
      (num / (lit(4.0) * sqrt(varD)) > lit(1.644853626951472)).as("reject"))
  }

  /** BROWN–MOOD MEDIAN TEST (Brown & Mood 1951) — are the five order
    * priorities' totalprice distributions shifted? Dichotomize every
    * order at the GRAND exact median and chi-square the 2×5 above /
    * not-above table. The k-sample location screen that, unlike
    * q_stat_kruskal, needs no within-group ranking — one scan, one
    * broadcast threshold, map-side counts: the cheapest possible
    * k-sample test at 100 TB.
    *
    * Exactness: counts are exact BIGINTs; the grand median is exact
    * percentile interpolation ((a+b)/2 of exact integers — identical
    * IEEE in both engines); the χ² fold is pivoted into ONE row over
    * the five KNOWN priority literals so the five-term double sum has
    * one fixed order in both engines (the cross-row-fold caveat
    * documented at [[qStatChi2]], solved here by pivoting). Reject at
    * χ²₀.₀₅,₄ = 9.487729036781154 on identical doubles.
    */
  def qStatMood(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    moodFromValues(graft.ops.CacheScope.cached(
      Tables.orders(spark, dir)
        .select($"o_orderpriority".as("g"), e2($"o_totalprice").as("x"))))
  }

  /** Brown–Mood core on a (g = priority slug, x = long value) frame —
    * see [[qStatMood]]. Exposed for MoodSpec's hand-computed 2×5
    * tables (incl. the tie-on-the-median case: x == med counts as
    * NOT-above — the strict `>` dichotomy both engines replay). */
  private[queries] def moodFromValues(v: DataFrame): DataFrame = {
    import v.sparkSession.implicits._
    val med = v.agg(percentile($"x", lit(0.5)).as("med"))
    val byG = v.crossJoin(broadcast(med))
      .groupBy($"g")
      .agg(count(lit(1)).as("n_g"),
        sum(when($"x" > $"med", 1L).otherwise(0L)).as("a_g"),
        min($"med").as("med"))
    val slugs = Seq("1-URGENT" -> "urgent", "2-HIGH" -> "high",
      "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "notspec",
      "5-LOW" -> "low")
    val pivots = slugs.flatMap { case (lit0, s) =>
      Seq(sum(when($"g" === lit0, $"a_g")).as(s"a_$s"),
        sum(when($"g" === lit0, $"n_g")).as(s"n_$s"))
    }
    val wide = byG.groupBy()
      .agg(min($"med").as("med"),
        (Seq(sum($"n_g").as("n"), sum($"a_g").as("n_above"))
          ++ pivots): _*)
    def term(s: String): Column = {
      val e = col(s"n_$s") * col("n_above") / col("n")
      (col(s"a_$s") - e) * (col(s"a_$s") - e) *
        (lit(1.0) / e + lit(1.0) / (col(s"n_$s") - e))
    }
    val chi2 = slugs.map(p => term(p._2)).reduce(_ + _)
    wide.select((Seq($"med", $"n", $"n_above")
      ++ slugs.flatMap(p => Seq(col(s"a_${p._2}"), col(s"n_${p._2}")))
      ++ Seq(round(chi2, 6).as("chi2_r6"),
        (chi2 > lit(9.487729036781154)).as("reject"))): _*)
  }

  /** PAGE'S L TREND TEST (Page, JASA 1963) for ordered alternatives:
    * does daily event volume INCREASE along the hypothesized treatment
    * order? Blocks = days, treatments = the five event types in
    * alphabetical order (the fixture-chosen exemplar ordering —
    * production callers supply their dose/severity order), L = Σ_j j·R_j
    * over within-block average ranks. The sharper companion to
    * q_stat_friedman: when the alternative is MONOTONE, Page's L beats
    * Friedman's omnibus χ² exactly as Jonckheere beats Kruskal–Wallis.
    *
    * Doubled ranks keep ties integer-exact ([[rankedGrid]], shared with
    * Friedman); the one-sided α=0.05 normal-approximation verdict
    * (no-tie variance — documented approximation, as in
    * q_stat_mannkendall) is the exact integer cross-multiplication
    * 9·10⁶·(2L₂−bk(k+1)²)² > 2705543·b·k²(k+1)²(k−1) with the sign
    * guard, z²₀.₀₅ = 1.6448536…² ≈ 2.705543.
    */
  def qStatPage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pageFromEvents(Tables.events(spark, dir)
      .select(to_date($"ts").as("d"), $"event_type".as("g")))
  }

  /** Page's L core on a (d = block id, g = treatment) event frame —
    * see [[qStatPage]]. Exposed for PageSpec's brute-force L parity
    * (both verdict directions + a within-block tie). */
  private[queries] def pageFromEvents(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = ev.groupBy($"d", $"g").agg(count(lit(1)).as("v"))
    val grid = ev.select($"d").distinct()
      .crossJoin(broadcast(ev.select($"g").distinct()))
      .join(counts, Seq("d", "g"), "left")
      .select($"d", $"g", coalesce($"v", lit(0L)).as("v"))
    val ranked = rankedGrid(grid)
    // hypothesized-order weight: alphabetical position (k rows — the
    // bounded single-partition window class, as q_stat_runs)
    val wj = ranked.select($"g").distinct()
      .withColumn("wj", row_number().over(Window.orderBy($"g"))
        .cast("long"))
    val perT = ranked.join(broadcast(wj), Seq("g"))
      .groupBy($"g", $"wj").agg(sum($"r2").as("s2"))
    perT.groupBy()
      .agg(sum($"wj" * $"s2").as("l2"), count(lit(1)).as("k"))
      .crossJoin(broadcast(
        ranked.agg(countDistinct($"d").as("b"))))
      .select($"k", $"b", $"l2",
        ($"b" * $"k" * ($"k" + 1) * ($"k" + 1)).as("e_l4"),
        round(($"l2" * 2 - $"b" * $"k" * ($"k" + 1) * ($"k" + 1))
          .cast("double")
          / (lit(4.0) * sqrt(($"b" * $"k" * $"k" * ($"k" + 1)
            * ($"k" + 1) * ($"k" - 1)).cast("double") / lit(144.0))), 6)
          .as("z_r6"),
        ($"l2" * 2 > $"b" * $"k" * ($"k" + 1) * ($"k" + 1) &&
          lit(9000000L) * ($"l2" * 2 - $"b" * $"k" * ($"k" + 1) * ($"k" + 1))
            * ($"l2" * 2 - $"b" * $"k" * ($"k" + 1) * ($"k" + 1))
          > lit(2705543L) * $"b" * $"k" * $"k" * ($"k" + 1) * ($"k" + 1)
            * ($"k" - 1)).as("reject"))
  }

  /** HOEFFDING'S D TEST OF INDEPENDENCE (Hoeffding, AMS 1948) between
    * daily click and purchase volume — the dependence measure that
    * catches NON-MONOTONE association (U-shapes, bands) which Kendall,
    * Spearman and Pearson all score ~0. Completes the dependence
    * battery: Pearson (linear) → Spearman/Kendall (monotone) →
    * Hoeffding (any measurable dependence).
    *
    * Exactness with ties (the SAS convention: ½ for single-coordinate
    * ties, ¼ for double): average ranks R, S are doubled and the
    * bivariate rank Q is quadrupled, so every per-point quantity is an
    * exact BIGINT; D1, D2, D3 are published ×16 and D applies the one
    * IEEE division on exact integers, identically in both engines.
    * Pair classification runs on the CALENDAR-bounded daily aggregate
    * (the q_stat_kendall boundedness argument; the full-table scale
    * path is the q_stat_kendall_grid dominance machinery).
    */
  def qStatHoeffding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    hoeffdingFromSeries(daily)
  }

  /** Hoeffding's D from a (d = point id, x, y) frame — see
    * [[qStatHoeffding]]. Exposed for spec brute-force parity. */
  private[queries] def hoeffdingFromSeries(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val per = daily.as("a").join(daily.as("b"), $"a.d" =!= $"b.d")
      .groupBy($"a.d".as("d"))
      .agg(
        sum(when($"b.x" < $"a.x", 1L).otherwise(0L)).as("cx_lt"),
        sum(when($"b.x" === $"a.x", 1L).otherwise(0L)).as("cx_eq"),
        sum(when($"b.y" < $"a.y", 1L).otherwise(0L)).as("cy_lt"),
        sum(when($"b.y" === $"a.y", 1L).otherwise(0L)).as("cy_eq"),
        sum(when($"b.x" < $"a.x" && $"b.y" < $"a.y", 1L).otherwise(0L))
          .as("q_ll"),
        sum(when($"b.x" === $"a.x" && $"b.y" < $"a.y", 1L).otherwise(0L))
          .as("q_el"),
        sum(when($"b.x" < $"a.x" && $"b.y" === $"a.y", 1L).otherwise(0L))
          .as("q_le"),
        sum(when($"b.x" === $"a.x" && $"b.y" === $"a.y", 1L)
          .otherwise(0L)).as("q_ee"))
      .select(
        (lit(2L) + lit(2L) * $"cx_lt" + $"cx_eq").as("r2"),
        (lit(2L) + lit(2L) * $"cy_lt" + $"cy_eq").as("s2"),
        (lit(4L) + lit(4L) * $"q_ll" + lit(2L) * $"q_el"
          + lit(2L) * $"q_le" + $"q_ee").as("q4"))
    per.agg(
        count(lit(1)).as("n"),
        sum(($"q4" - 4L) * ($"q4" - 8L)).as("d1_16"),
        sum(($"r2" - 2L) * ($"r2" - 4L) * ($"s2" - 2L) * ($"s2" - 4L))
          .as("d2_16"),
        sum(($"r2" - 4L) * ($"s2" - 4L) * ($"q4" - 4L)).as("d3_16"))
      .select($"n", $"d1_16", $"d2_16", $"d3_16",
        (($"n" - 2L) * ($"n" - 3L) * $"d1_16" + $"d2_16"
          - lit(2L) * ($"n" - 2L) * $"d3_16").as("num16"),
        ($"n" * ($"n" - 1L) * ($"n" - 2L) * ($"n" - 3L) * ($"n" - 4L))
          .as("den"))
      .select($"n", $"d1_16", $"d2_16", $"d3_16", $"num16", $"den",
        round((lit(30L) * $"num16").cast("double")
          / (lit(16L) * $"den").cast("double"), 6).as("d_r6"))
  }

  val defs: Map[String, Q] = Map(
    "q_stat_jonckheere" -> (qStatJonckheere(_, _)),
    "q_stat_hoeffding" -> (qStatHoeffding(_, _)),
    "q_stat_mood" -> (qStatMood(_, _)),
    "q_stat_page" -> (qStatPage(_, _)),
    "q_stat_hodges" -> (qStatHodges(_, _)),
    "q_stat_hodges_grouped" -> (qStatHodgesGrouped(_, _)),
    "q_stat_hodges_grouped_exec" -> (qStatHodgesGroupedExec(_, _)),
    "q_stat_qn" -> (qStatQn(_, _)),
    "q_stat_qn_grouped" -> (qStatQnGrouped(_, _)),
    "q_stat_grubbs" -> (qStatGrubbs(_, _)),
    "q_stat_cochranq" -> (qStatCochranq(_, _)),
    "q_stat_dw" -> (qStatDw(_, _)),
    "q_stat_kendall_full" -> (qStatKendallFull(_, _)),
    "q_stat_kendall_grid" -> (qStatKendallGrid(_, _)),
    "q_stat_wilcoxon" -> (qStatWilcoxon(_, _)),
    "q_stat_friedman" -> (qStatFriedman(_, _)),
    "q_stat_fdr" -> (qStatFdr(_, _)),
    "q_stat_pca2" -> (qStatPca2(_, _)),
    "q_stat_power" -> (qStatPower(_, _)),
    "q_stat_corrmat" -> (qStatCorrmat(_, _)),
    "q_stat_fisher" -> (qStatFisher(_, _)),
    "q_time_dtw" -> (qTimeDtw(_, _)),
    "q_stat_mcnemar" -> (qStatMcnemar(_, _)),
    "q_time_xcorr" -> (qTimeXcorr(_, _)),
    "q_stat_ols2" -> (qStatOls2(_, _)),
    "q_stat_kruskal" -> (qStatKruskal(_, _)),
    "q_stat_kendall" -> (qStatKendall(_, _)),
    "q_stat_spearman" -> (qStatSpearman(_, _)),
    "q_stat_runs" -> (qStatRuns(_, _)),
    "q_stat_mannkendall" -> (qStatMannKendall(_, _)),
    "q_agg_moments" -> (qAggMoments(_, _)),
    "q_stat_cramers" -> (qStatCramers(_, _)),
    "q_stat_jarque" -> (qStatJarque(_, _)),
    "q_stat_ansari" -> (qStatAnsari(_, _)),
    "q_stat_lepage" -> (qStatLepage(_, _)),
    "q_stat_moodscale" -> (qStatMoodScale(_, _)),
    "q_stat_levene" -> (qStatLevene(_, _)),
    "q_stat_mannwhitney" -> (qStatMannwhitney(_, _)),
    "q_stat_cliffs" -> (qStatCliffs(_, _)),
    "q_stat_iqr" -> (qStatIqr(_, _)),
    "q_stat_psi" -> (qStatPsi(_, _)),
    "q_stat_anova" -> (qStatAnova(_, _)),
    "q_stat_benford" -> (qStatBenford(_, _)),
    "q_stat_gini" -> (qStatGini(_, _)),
    "q_stat_bootstrap" -> (qStatBootstrap(_, _)),
    "q_stat_ks" -> (qStatKs(_, _)),
    "q_stat_chi2" -> (qStatChi2(_, _)),
    "q_agg_equidepth" -> (qAggEquidepth(_, _)),
    "q_stat_winsorized" -> (qStatWinsorized(_, _)),
    "q_stat_mad" -> (qStatMad(_, _)),
    "q_agg_corr" -> (qAggCorr(_, _)),
    "q_agg_mode" -> (qAggMode(_, _)),
    "q_agg_listagg" -> (qAggListagg(_, _)),
    "q_agg_histogram" -> (qAggHistogram(_, _)),
    "q_agg_bool_bits" -> (qAggBoolBits(_, _))
  )

  private val equidepthBoundsSql = (1 to 9)
    .map(i => s"quantile_cont(o_totalprice, 0.$i) AS b$i")
    .mkString(",\n        |    ")
  private val equidepthBucketSql = (1 to 9)
    .map(i => s"(CASE WHEN o_totalprice > b$i THEN 1 ELSE 0 END)")
    .mkString(" + ")

  private val poissonCaseSql: String = poissonCdf.zipWithIndex
    .map { case (c, k) => s"WHEN u < $c THEN $k" }
    .mkString("CASE ", " ", " ELSE 7 END")

  private val benfordProbsSql: String = (1 to 9)
    .map(d => s"${math.log10(1.0 + 1.0 / d)}")
    .mkString("[", ",", "]")

  val oracles: Map[String, String] = Map(
    // identical pivoted cumulants + the same three-term tie-corrected
    // variance as one fixed-shape double expression
    "q_stat_jonckheere" ->
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x
        |  FROM orders),
        |hv AS (SELECT x,
        |    CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN g = '2-HIGH' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2,
        |    CAST(SUM(CASE WHEN g = '3-MEDIUM' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c3,
        |    CAST(SUM(CASE WHEN g = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c4,
        |    CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c5,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM v GROUP BY x),
        |cum AS (SELECT x, t, c1, c2, c3, c4, c5,
        |    COALESCE(CAST(SUM(c1) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS f1,
        |    COALESCE(CAST(SUM(c2) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS f2,
        |    COALESCE(CAST(SUM(c3) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS f3,
        |    COALESCE(CAST(SUM(c4) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS f4,
        |    COALESCE(CAST(SUM(c5) OVER (ORDER BY x ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS f5
        |  FROM hv),
        |perv AS (SELECT
        |    c2 * (2 * f1 + c1) AS j2_,
        |    c3 * ((2 * f1 + c1) + (2 * f2 + c2)) AS j3_,
        |    c4 * ((2 * f1 + c1) + (2 * f2 + c2) + (2 * f3 + c3))
        |      AS j4_,
        |    c5 * ((2 * f1 + c1) + (2 * f2 + c2) + (2 * f3 + c3)
        |      + (2 * f4 + c4)) AS j5_,
        |    t * (t - 1) * (2 * t + 5) AS ta_v,
        |    t * (t - 1) * (t - 2) AS tb_v,
        |    t * (t - 1) AS tc_v
        |  FROM cum),
        |s AS (SELECT CAST(SUM(j2_ + j3_ + j4_ + j5_) AS BIGINT) AS j2,
        |    CAST(SUM(ta_v) AS BIGINT) AS ta,
        |    CAST(SUM(tb_v) AS BIGINT) AS tb,
        |    CAST(SUM(tc_v) AS BIGINT) AS tc
        |  FROM perv),
        |gg AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(ng * ng) AS BIGINT) AS sn2,
        |    CAST(SUM(ng * (ng - 1) * (2 * ng + 5)) AS BIGINT) AS ga,
        |    CAST(SUM(ng * (ng - 1) * (ng - 2)) AS BIGINT) AS gb,
        |    CAST(SUM(ng * (ng - 1)) AS BIGINT) AS gc
        |  FROM (SELECT g, CAST(count(*) AS BIGINT) AS ng
        |    FROM v GROUP BY g)),
        |f AS (SELECT * FROM s CROSS JOIN gg)
        |SELECT n, j2, n * n - sn2 AS e4, ga, gb, gc, ta, tb, tc,
        |  round(CAST(2 * j2 - (n * n - sn2) AS DOUBLE)
        |    / (4.0 * sqrt(
        |      CAST(n * (n - 1) * (2 * n + 5) - ga - ta AS DOUBLE) / 72.0
        |      + CAST(gb * tb AS DOUBLE)
        |        / (36.0 * CAST(n * (n - 1) * (n - 2) AS DOUBLE))
        |      + CAST(gc * tc AS DOUBLE)
        |        / (8.0 * CAST(n * (n - 1) AS DOUBLE)))), 6) AS z_r6,
        |  (CAST(2 * j2 - (n * n - sn2) AS DOUBLE)
        |    / (4.0 * sqrt(
        |      CAST(n * (n - 1) * (2 * n + 5) - ga - ta AS DOUBLE) / 72.0
        |      + CAST(gb * tb AS DOUBLE)
        |        / (36.0 * CAST(n * (n - 1) * (n - 2) AS DOUBLE))
        |      + CAST(gc * tc AS DOUBLE)
        |        / (8.0 * CAST(n * (n - 1) AS DOUBLE))))
        |    > 1.644853626951472) AS reject
        |FROM f""".stripMargin,
    // identical doubled/quadrupled integer ranks over the day pairs
    "q_stat_hoeffding" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |per AS (SELECT a.d,
        |    2 + 2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS r2,
        |    2 + 2 * SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS s2,
        |    4 + 4 * SUM(CASE WHEN b.x < a.x AND b.y < a.y THEN 1
        |        ELSE 0 END)
        |      + 2 * SUM(CASE WHEN b.x = a.x AND b.y < a.y THEN 1
        |        ELSE 0 END)
        |      + 2 * SUM(CASE WHEN b.x < a.x AND b.y = a.y THEN 1
        |        ELSE 0 END)
        |      + SUM(CASE WHEN b.x = a.x AND b.y = a.y THEN 1
        |        ELSE 0 END) AS q4
        |  FROM daily a JOIN daily b ON a.d <> b.d GROUP BY a.d),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM((q4 - 4) * (q4 - 8)) AS BIGINT) AS d1_16,
        |    CAST(SUM((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4))
        |      AS BIGINT) AS d2_16,
        |    CAST(SUM((r2 - 4) * (s2 - 4) * (q4 - 4)) AS BIGINT)
        |      AS d3_16
        |  FROM per),
        |nm AS (SELECT n, d1_16, d2_16, d3_16,
        |    (n - 2) * (n - 3) * d1_16 + d2_16 - 2 * (n - 2) * d3_16
        |      AS num16,
        |    n * (n - 1) * (n - 2) * (n - 3) * (n - 4) AS den
        |  FROM ag)
        |SELECT n, d1_16, d2_16, d3_16, num16, den,
        |  round(CAST(30 * num16 AS DOUBLE)
        |    / CAST(16 * den AS DOUBLE), 6) AS d_r6
        |FROM nm""".stripMargin,
    // same pivoted fixed-order five-term χ² fold on exact counts
    "q_stat_mood" ->
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x
        |  FROM orders),
        |m AS (SELECT quantile_cont(x, 0.5) AS med FROM v),
        |byg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CASE WHEN x > m.med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a_g,
        |    MIN(m.med) AS med
        |  FROM v CROSS JOIN m GROUP BY g),
        |w AS (SELECT MIN(med) AS med, CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(a_g) AS BIGINT) AS n_above,
        |    MAX(CASE WHEN g = '1-URGENT' THEN a_g END) AS a_urgent,
        |    MAX(CASE WHEN g = '1-URGENT' THEN n_g END) AS n_urgent,
        |    MAX(CASE WHEN g = '2-HIGH' THEN a_g END) AS a_high,
        |    MAX(CASE WHEN g = '2-HIGH' THEN n_g END) AS n_high,
        |    MAX(CASE WHEN g = '3-MEDIUM' THEN a_g END) AS a_medium,
        |    MAX(CASE WHEN g = '3-MEDIUM' THEN n_g END) AS n_medium,
        |    MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN a_g END)
        |      AS a_notspec,
        |    MAX(CASE WHEN g = '4-NOT SPECIFIED' THEN n_g END)
        |      AS n_notspec,
        |    MAX(CASE WHEN g = '5-LOW' THEN a_g END) AS a_low,
        |    MAX(CASE WHEN g = '5-LOW' THEN n_g END) AS n_low
        |  FROM byg),
        |c AS (SELECT *,
        |    (a_urgent - n_urgent * n_above / n)
        |      * (a_urgent - n_urgent * n_above / n)
        |      * (1.0 / (n_urgent * n_above / n)
        |        + 1.0 / (n_urgent - n_urgent * n_above / n))
        |    + (a_high - n_high * n_above / n)
        |      * (a_high - n_high * n_above / n)
        |      * (1.0 / (n_high * n_above / n)
        |        + 1.0 / (n_high - n_high * n_above / n))
        |    + (a_medium - n_medium * n_above / n)
        |      * (a_medium - n_medium * n_above / n)
        |      * (1.0 / (n_medium * n_above / n)
        |        + 1.0 / (n_medium - n_medium * n_above / n))
        |    + (a_notspec - n_notspec * n_above / n)
        |      * (a_notspec - n_notspec * n_above / n)
        |      * (1.0 / (n_notspec * n_above / n)
        |        + 1.0 / (n_notspec - n_notspec * n_above / n))
        |    + (a_low - n_low * n_above / n)
        |      * (a_low - n_low * n_above / n)
        |      * (1.0 / (n_low * n_above / n)
        |        + 1.0 / (n_low - n_low * n_above / n)) AS chi2
        |  FROM w)
        |SELECT med, n, n_above, a_urgent, n_urgent, a_high, n_high,
        |  a_medium, n_medium, a_notspec, n_notspec, a_low, n_low,
        |  round(chi2, 6) AS chi2_r6,
        |  chi2 > 9.487729036781154 AS reject
        |FROM c""".stripMargin,
    // identical doubled-rank grid as q_stat_friedman + the Page weights
    "q_stat_page" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_type AS g
        |  FROM events),
        |counts AS (SELECT d, g, CAST(count(*) AS BIGINT) AS v
        |  FROM ev GROUP BY 1, 2),
        |grid AS (SELECT dd.d, gg.g, COALESCE(c.v, 0) AS v
        |  FROM (SELECT DISTINCT d FROM ev) dd
        |  CROSS JOIN (SELECT DISTINCT g FROM ev) gg
        |  LEFT JOIN counts c ON c.d = dd.d AND c.g = gg.g),
        |bv AS (SELECT d, v, CAST(count(*) AS BIGINT) AS t
        |  FROM grid GROUP BY 1, 2),
        |r2v AS (SELECT d, v,
        |    2 * COALESCE(SUM(t) OVER (PARTITION BY d ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r2
        |  FROM bv),
        |ranked AS (SELECT grid.d, grid.g, r2
        |  FROM grid JOIN r2v ON grid.d = r2v.d AND grid.v = r2v.v),
        |wj AS (SELECT g, CAST(row_number() OVER (ORDER BY g) AS BIGINT)
        |    AS wj
        |  FROM (SELECT DISTINCT g FROM ranked)),
        |perT AS (SELECT r.g, wj.wj, CAST(SUM(r2) AS BIGINT) AS s2
        |  FROM ranked r JOIN wj ON r.g = wj.g GROUP BY 1, 2),
        |l AS (SELECT CAST(SUM(wj * s2) AS BIGINT) AS l2,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM perT),
        |bb AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS b
        |  FROM ranked)
        |SELECT k, b, l2, b * k * (k + 1) * (k + 1) AS e_l4,
        |  round(CAST(l2 * 2 - b * k * (k + 1) * (k + 1) AS DOUBLE)
        |    / (4.0 * sqrt(CAST(b * k * k * (k + 1) * (k + 1) * (k - 1)
        |        AS DOUBLE) / 144.0)), 6) AS z_r6,
        |  (l2 * 2 > b * k * (k + 1) * (k + 1) AND
        |   9000000 * (l2 * 2 - b * k * (k + 1) * (k + 1))
        |     * (l2 * 2 - b * k * (k + 1) * (k + 1))
        |   > 2705543 * b * k * k * (k + 1) * (k + 1) * (k - 1))
        |    AS reject
        |FROM l CROSS JOIN bb""".stripMargin,
    // explicit Walsh-pair enumeration; engine counts, never enumerates
    "q_stat_hodges" ->
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderkey) AS rn
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
        |p AS (SELECT a.g, a.x + b.x AS s FROM v a
        |  JOIN v b ON a.g = b.g AND a.rn <= b.rn),
        |r AS (SELECT g, s,
        |    row_number() OVER (PARTITION BY g ORDER BY s) AS r FROM p)
        |SELECT n.g AS o_orderpriority, n.n,
        |  n.n * (n.n + 1) // 2 AS n_pairs,
        |  (n.n * (n.n + 1) // 2 + 1) // 2 AS k,
        |  r.s AS hl_cents2, r.s / 200.0 AS hl
        |FROM n JOIN r ON n.g = r.g
        |  AND r.r = (n.n * (n.n + 1) // 2 + 1) // 2
        |ORDER BY o_orderpriority""".stripMargin,
    // same Walsh-sum enumeration, per (nation, month) — ~2k groups of
    // bounded size, so the quadratic twin stays feasible at oracle sf
    "q_stat_hodges_grouped" ->
      """WITH v AS (SELECT
        |    CAST(c.c_nationkey AS VARCHAR) || '|' ||
        |      strftime(o.o_orderdate, '%Y-%m') AS g,
        |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY c.c_nationkey,
        |      strftime(o.o_orderdate, '%Y-%m')
        |      ORDER BY o.o_orderkey) AS rn
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
        |p AS (SELECT a.g, a.x + b.x AS s FROM v a
        |  JOIN v b ON a.g = b.g AND a.rn <= b.rn),
        |r AS (SELECT g, s,
        |    row_number() OVER (PARTITION BY g ORDER BY s) AS r FROM p)
        |SELECT n.g AS nation_month, n.n,
        |  n.n * (n.n + 1) // 2 AS n_pairs,
        |  (n.n * (n.n + 1) // 2 + 1) // 2 AS k,
        |  r.s AS hl_cents2, r.s / 200.0 AS hl
        |FROM n JOIN r ON n.g = r.g
        |  AND r.r = (n.n * (n.n + 1) // 2 + 1) // 2
        |ORDER BY nation_month""".stripMargin,
    // identical answer to q_stat_hodges_grouped — the engine pair
    // differs only in TIER (probe loop vs executor-local); one twin
    // text keeps the oracle honest about that
    "q_stat_hodges_grouped_exec" ->
      """WITH v AS (SELECT
        |    CAST(c.c_nationkey AS VARCHAR) || '|' ||
        |      strftime(o.o_orderdate, '%Y-%m') AS g,
        |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY c.c_nationkey,
        |      strftime(o.o_orderdate, '%Y-%m')
        |      ORDER BY o.o_orderkey) AS rn
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
        |p AS (SELECT a.g, a.x + b.x AS s FROM v a
        |  JOIN v b ON a.g = b.g AND a.rn <= b.rn),
        |r AS (SELECT g, s,
        |    row_number() OVER (PARTITION BY g ORDER BY s) AS r FROM p)
        |SELECT n.g AS nation_month, n.n,
        |  n.n * (n.n + 1) // 2 AS n_pairs,
        |  (n.n * (n.n + 1) // 2 + 1) // 2 AS k,
        |  r.s AS hl_cents2, r.s / 200.0 AS hl
        |FROM n JOIN r ON n.g = r.g
        |  AND r.r = (n.n * (n.n + 1) // 2 + 1) // 2
        |ORDER BY nation_month""".stripMargin,
    // explicit |x_i − x_j| enumeration at the published rank C(h,2)
    "q_stat_qn" ->
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderkey) AS rn
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
        |kk AS (SELECT g, n,
        |    (n // 2 + 1) * (n // 2) // 2 AS k FROM n),
        |p AS (SELECT a.g, abs(a.x - b.x) AS dd FROM v a
        |  JOIN v b ON a.g = b.g AND a.rn < b.rn),
        |r AS (SELECT g, dd,
        |    row_number() OVER (PARTITION BY g ORDER BY dd) AS r FROM p)
        |SELECT kk.g AS o_orderpriority, kk.n, kk.k,
        |  r.dd AS qn_cents, r.dd / 100.0 AS qn,
        |  round(2.2219 * (r.dd / 100.0), 6) AS qn_scaled_r6
        |FROM kk JOIN r ON kk.g = r.g AND r.r = kk.k
        |ORDER BY o_orderpriority""".stripMargin,
    // grouped Qn: per-group |xi - xj| enumeration (bounded groups at
    // oracle sf); singleton groups yield no pairs and drop
    "q_stat_qn_grouped" ->
      """WITH v AS (SELECT
        |    CAST(c.c_nationkey AS VARCHAR) || '|' ||
        |      strftime(o.o_orderdate, '%Y-%m') AS g,
        |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY c.c_nationkey,
        |      strftime(o.o_orderdate, '%Y-%m')
        |      ORDER BY o.o_orderkey) AS rn
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY g),
        |kk AS (SELECT g, n,
        |    (n // 2 + 1) * (n // 2) // 2 AS k FROM n),
        |p AS (SELECT a.g, abs(a.x - b.x) AS dd FROM v a
        |  JOIN v b ON a.g = b.g AND a.rn < b.rn),
        |r AS (SELECT g, dd,
        |    row_number() OVER (PARTITION BY g ORDER BY dd) AS r FROM p)
        |SELECT kk.g AS nation_month, kk.n, kk.k,
        |  r.dd AS qn_cents, r.dd / 100.0 AS qn,
        |  round(2.2219 * (r.dd / 100.0), 6) AS qn_scaled_r6
        |FROM kk JOIN r ON kk.g = r.g AND r.r = kk.k
        |ORDER BY nation_month""".stripMargin,
    "q_stat_grubbs" ->
      """WITH x AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
        |  FROM orders),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS t,
        |    SUM(CAST(c AS HUGEINT) * c) AS q
        |  FROM x),
        |d AS (SELECT o_orderkey, c, n, t, q,
        |    abs(CAST(n AS HUGEINT) * c - t) AS dev
        |  FROM x CROSS JOIN st),
        |m AS (SELECT * FROM d ORDER BY dev DESC, o_orderkey LIMIT 1),
        |f AS (SELECT n, o_orderkey AS outlier_key,
        |    c AS outlier_cents,
        |    CAST(n - 1 AS HUGEINT) * dev * dev AS num,
        |    CAST(n AS HUGEINT) * (n * q - CAST(t AS HUGEINT) * t)
        |      AS den
        |  FROM m)
        |SELECT n, outlier_key, outlier_cents,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |    AS g2_r6,
        |  (num > 9 * den) AS reject
        |FROM f""".stripMargin,
    "q_stat_cochranq" ->
      """WITH rows_ AS (SELECT o_custkey,
        |    CAST(MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
        |      THEN 1 ELSE 0 END) AS BIGINT) AS t1,
        |    CAST(MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
        |      THEN 1 ELSE 0 END) AS BIGINT) AS t2,
        |    CAST(MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998
        |      THEN 1 ELSE 0 END) AS BIGINT) AS t3
        |  FROM orders
        |  WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997, 1998)
        |  GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(t1) AS BIGINT) AS g1,
        |    CAST(SUM(t2) AS BIGINT) AS g2,
        |    CAST(SUM(t3) AS BIGINT) AS g3,
        |    CAST(SUM(t1 + t2 + t3) AS BIGINT) AS t,
        |    CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS l2
        |  FROM rows_),
        |f AS (SELECT n, g1, g2, g3,
        |    2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3) - t * t) AS num,
        |    3 * t - l2 AS den
        |  FROM ag)
        |SELECT n, g1, g2, g3, num, den,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS q_r6,
        |  (1000 * num > 5991 * den) AS reject
        |FROM f""".stripMargin,
    // exact BIGINT moments -> one double slope/intercept -> ordered
    // residual folds mirrored expression-for-expression
    "q_stat_dw" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |d0 AS (SELECT MIN(day) AS d0 FROM daily),
        |pts AS (SELECT CAST(date_diff('day', d0, day) AS BIGINT) AS x,
        |    y
        |  FROM daily CROSS JOIN d0),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    list(x ORDER BY x) AS lx, list(y ORDER BY x) AS ly
        |  FROM pts),
        |b AS (SELECT n, lx, ly,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      AS b1, sx, sy
        |  FROM s),
        |c AS (SELECT n, lx, ly, b1,
        |    (CAST(sy AS DOUBLE) - b1 * sx) / n AS b0
        |  FROM b),
        |e AS (SELECT n,
        |    list_transform(generate_series(1, CAST(n AS INT)),
        |      i -> CAST(ly[CAST(i AS INT)] AS DOUBLE) - b0
        |        - b1 * CAST(lx[CAST(i AS INT)] AS DOUBLE)) AS es
        |  FROM c),
        |f AS (SELECT n,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(es, x -> x * x)), (a, v) -> a + v) AS den,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(generate_series(2, CAST(n AS INT)),
        |        i -> (es[CAST(i AS INT)] - es[CAST(i - 1 AS INT)])
        |          * (es[CAST(i AS INT)] - es[CAST(i - 1 AS INT)]))),
        |      (a, v) -> a + v) AS num
        |  FROM e)
        |SELECT n, round(num / den, 6) AS dw_r6,
        |  round(1.0 - (num / den) / 2.0, 6) AS rho_r6
        |FROM f""".stripMargin,
    // INDEPENDENT-ALGORITHM twin: the O(M²) cell-pair identity (range
    // join), checking the engine's grid decomposition against a
    // different computation, not a replay
    "q_stat_kendall_grid" ->
      """WITH h AS (SELECT
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT
        |    CAST(SUM(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END)
        |      AS BIGINT) AS conc,
        |    CAST(SUM(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END)
        |      AS BIGINT) AS disc
        |  FROM h a JOIN h b ON a.x < b.x),
        |m AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS txy FROM h),
        |txc AS (SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS tx
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS m FROM h GROUP BY x)),
        |tyc AS (SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS ty
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS m FROM h GROUP BY y)),
        |w AS (SELECT n, n * (n - 1) // 2 AS n0, conc, disc, tx, ty,
        |    txy
        |  FROM p CROSS JOIN m CROSS JOIN txc CROSS JOIN tyc)
        |SELECT n, n0, conc, disc, tx, ty, txy,
        |  round(CAST(conc - disc AS DOUBLE)
        |    / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)),
        |    6) AS tau_b_r6
        |FROM w""".stripMargin,
    // joint-histogram identity: the only data-sized scan is the
    // GROUP BY (x, y); all pair statistics come from the ≤550-row
    // histogram self-join (a.x < b.x)
    "q_stat_kendall_full" ->
      """WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_discount * 100, 0) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT
        |    CAST(SUM(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END)
        |      AS BIGINT) AS conc,
        |    CAST(SUM(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END)
        |      AS BIGINT) AS disc
        |  FROM h a JOIN h b ON a.x < b.x),
        |m AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
        |txc AS (SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS tx
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS m FROM h GROUP BY x)),
        |tyc AS (SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS ty
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS m FROM h GROUP BY y)),
        |w AS (SELECT n, n * (n - 1) // 2 AS n0, conc, disc, tx, ty
        |  FROM p CROSS JOIN m CROSS JOIN txc CROSS JOIN tyc)
        |SELECT n, n0, conc, disc, tx, ty,
        |  round(CAST(conc - disc AS DOUBLE)
        |    / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)),
        |    6) AS tau_b_r6,
        |  round(CAST(conc - disc AS DOUBLE)
        |    / CAST(conc + disc AS DOUBLE), 6) AS gamma_r6,
        |  round(CAST(conc - disc AS DOUBLE)
        |    / CAST(n0 - tx AS DOUBLE), 6) AS somers_yx_r6
        |FROM w""".stripMargin,
    // doubled-rank histogram over |d| (the mannwhitney doctrine);
    // zero differences excluded (classic Wilcoxon, not Pratt)
    "q_stat_wilcoxon" ->
      """WITH arms AS (SELECT o_custkey,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS co,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS cf,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS no,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nf
        |  FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY 1),
        |nz AS (SELECT abs(co - cf) AS v, (co - cf > 0) AS pos
        |  FROM arms WHERE no > 0 AND nf > 0 AND co - cf <> 0),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS a
        |  FROM nz GROUP BY v),
        |sc AS (SELECT t, a, COALESCE(SUM(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cumt
        |  FROM bv),
        |ag AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
        |    CAST(SUM(a * (2 * cumt + t + 1)) AS BIGINT) AS w2_pos,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        |  FROM sc)
        |SELECT n, w2_pos, tie_term,
        |  (CAST(7500 AS HUGEINT)
        |     * (2 * w2_pos - n * (n + 1)) * (2 * w2_pos - n * (n + 1))
        |   > CAST(9604 AS HUGEINT)
        |     * (CAST(2 AS HUGEINT) * n * (n + 1) * (2 * n + 1)
        |        - tie_term)) AS reject
        |FROM ag""".stripMargin,
    // day×type grid completed with zeros; within-block doubled ranks
    // from the per-(block, value) histogram; tie-corrected ratio form
    "q_stat_friedman" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_type AS g
        |  FROM events),
        |counts AS (SELECT d, g, CAST(count(*) AS BIGINT) AS v
        |  FROM ev GROUP BY 1, 2),
        |grid AS (SELECT dd.d, gg.g, COALESCE(c.v, 0) AS v
        |  FROM (SELECT DISTINCT d FROM ev) dd
        |  CROSS JOIN (SELECT DISTINCT g FROM ev) gg
        |  LEFT JOIN counts c ON c.d = dd.d AND c.g = gg.g),
        |bv AS (SELECT d, v, CAST(count(*) AS BIGINT) AS t
        |  FROM grid GROUP BY 1, 2),
        |r2v AS (SELECT d, v,
        |    2 * COALESCE(SUM(t) OVER (PARTITION BY d ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r2
        |  FROM bv),
        |ranked AS (SELECT grid.d, grid.g, r2
        |  FROM grid JOIN r2v ON grid.d = r2v.d AND grid.v = r2v.v),
        |perT AS (SELECT g, CAST(SUM(r2) AS BIGINT) AS s2
        |  FROM ranked GROUP BY g),
        |sq AS (SELECT CAST(SUM(r2 * r2) AS BIGINT) AS sr2,
        |    CAST(COUNT(DISTINCT d) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT g) AS BIGINT) AS k
        |  FROM ranked),
        |ag AS (SELECT n, k, sr2,
        |    CAST(SUM((s2 - n * (k + 1)) * (s2 - n * (k + 1)))
        |      AS BIGINT) AS num
        |  FROM perT CROSS JOIN sq GROUP BY 1, 2, 3),
        |f AS (SELECT k, n, (k - 1) * num AS num,
        |    sr2 - n * k * (k + 1) * (k + 1) AS den
        |  FROM ag)
        |SELECT k, n, num, den,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS q_r6,
        |  (1000 * num > (CASE WHEN k = 2 THEN 3841
        |     WHEN k = 3 THEN 5991 WHEN k = 4 THEN 7815
        |     WHEN k = 5 THEN 9488 WHEN k = 6 THEN 11070
        |     ELSE 12592 END) * den) AS reject
        |FROM f""".stripMargin,
    // identical expression tree on the exact arm counts; the
    // zero-effect guard is the exact integer cross-product test
    "q_stat_power" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY user_id),
        |arms AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS s
        |  FROM u GROUP BY arm),
        |ab AS (
        |  SELECT a.n AS n1, a.s AS s1, b.n AS n2, b.s AS s2,
        |    CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS p1,
        |    CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS p2
        |  FROM arms a, arms b WHERE a.arm = 'A' AND b.arm = 'B')
        |SELECT n1, s1, n2, s2,
        |  round(p1, 6) AS p1_r6, round(p2, 6) AS p2_r6,
        |  CASE WHEN s1 * n2 = s2 * n1 THEN NULL ELSE
        |    CAST(ceil(
        |      (1.959963985 + 0.8416212336)
        |        * (1.959963985 + 0.8416212336)
        |        * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
        |        / ((p1 - p2) * (p1 - p2))) AS BIGINT) END AS n_per_arm
        |FROM ab""".stripMargin,
    // exact BIGINT moments, HUGEINT discriminant, IEEE sqrt on the
    // identical exact inputs — bit-equal eigen doubles
    "q_stat_pca2" ->
      """WITH m AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_discount * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT flag, count(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx0,
        |    CAST(SUM(y * y) AS BIGINT) AS syy0,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy0
        |  FROM m GROUP BY flag),
        |s AS (
        |  SELECT flag, n,
        |    n * sxx0 - sx * sx AS sxx,
        |    n * syy0 - sy * sy AS syy,
        |    n * sxy0 - sx * sy AS sxy
        |  FROM a),
        |e AS (
        |  SELECT *, sqrt(CAST(
        |      CAST(sxx - syy AS HUGEINT) * (sxx - syy)
        |        + 4 * CAST(sxy AS HUGEINT) * sxy AS DOUBLE)) AS sqd
        |  FROM s),
        |l AS (
        |  SELECT *,
        |    (CAST(sxx + syy AS DOUBLE) + sqd) / 2.0 AS lam1,
        |    (CAST(sxx + syy AS DOUBLE) - sqd) / 2.0 AS lam2
        |  FROM e)
        |SELECT flag, n, sxx, syy, sxy,
        |  lam1, lam2,
        |  round(lam1 / CAST(sxx + syy AS DOUBLE), 6) AS evr_r6,
        |  CASE WHEN sxy <> 0 THEN
        |    round((lam1 - CAST(sxx AS DOUBLE)) / CAST(sxy AS DOUBLE), 6)
        |  END AS dir_r6
        |FROM l ORDER BY flag""".stripMargin,
    // per-row BIGINT products, HUGEINT sums, one double sqrt step
    "q_stat_corrmat" -> {
      def s2(saa: String, sa: String) = s"(n * $saa - $sa * $sa)"
      def s11(sab: String, sa: String, sb: String) =
        s"(n * $sab - $sa * $sb)"
      def r(sab: String, sa: String, sb: String,
            saa: String, sbb: String) =
        s"round(CAST(${s11(sab, sa, sb)} AS DOUBLE) / sqrt(" +
          s"CAST(${s2(saa, sa)} AS DOUBLE) *" +
          s" CAST(${s2(sbb, sb)} AS DOUBLE)), 6)"
      s"""WITH m AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS q,
         |    CAST(round(l_discount * 100) AS BIGINT) AS d,
         |    CAST(round(l_tax * 100) AS BIGINT) AS t,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
         |  FROM lineitem),
         |a AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    SUM(CAST(q AS HUGEINT)) AS sq, SUM(CAST(d AS HUGEINT)) AS sd,
         |    SUM(CAST(t AS HUGEINT)) AS st, SUM(CAST(p AS HUGEINT)) AS sp,
         |    SUM(CAST(q * q AS HUGEINT)) AS sqq,
         |    SUM(CAST(d * d AS HUGEINT)) AS sdd,
         |    SUM(CAST(t * t AS HUGEINT)) AS stt,
         |    SUM(CAST(p * p AS HUGEINT)) AS spp,
         |    SUM(CAST(q * d AS HUGEINT)) AS sqd,
         |    SUM(CAST(q * t AS HUGEINT)) AS sqt,
         |    SUM(CAST(q * p AS HUGEINT)) AS sqp,
         |    SUM(CAST(d * t AS HUGEINT)) AS sdt,
         |    SUM(CAST(d * p AS HUGEINT)) AS sdp,
         |    SUM(CAST(t * p AS HUGEINT)) AS stp
         |  FROM m),
         |pairs AS (
         |  SELECT CAST(n AS BIGINT) AS n, unnest([
         |    struct_pack(var_a := 'qty', var_b := 'disc',
         |      r_r6 := ${r("sqd", "sq", "sd", "sqq", "sdd")}),
         |    struct_pack(var_a := 'qty', var_b := 'tax',
         |      r_r6 := ${r("sqt", "sq", "st", "sqq", "stt")}),
         |    struct_pack(var_a := 'qty', var_b := 'price',
         |      r_r6 := ${r("sqp", "sq", "sp", "sqq", "spp")}),
         |    struct_pack(var_a := 'disc', var_b := 'tax',
         |      r_r6 := ${r("sdt", "sd", "st", "sdd", "stt")}),
         |    struct_pack(var_a := 'disc', var_b := 'price',
         |      r_r6 := ${r("sdp", "sd", "sp", "sdd", "spp")}),
         |    struct_pack(var_a := 'tax', var_b := 'price',
         |      r_r6 := ${r("stp", "st", "sp", "stt", "spp")})]) AS pair
         |  FROM a)
         |SELECT pair.var_a AS var_a, pair.var_b AS var_b, n,
         |  pair.r_r6 AS r_r6
         |FROM pairs ORDER BY var_a, var_b""".stripMargin
    },
    // exact BIGINT hypergeometric tails per nation panel; step-up by
    // the cross-multiplied 500·num ≤ k·den rule; collision-free
    // HUGEINT sort key num·10^14 // den
    "q_stat_fdr" -> {
      def binom(m: String, j: String) =
        s"CASE WHEN ($j) <= 0 THEN CAST(1 AS BIGINT) ELSE" +
          s" list_reduce(list_concat([CAST(1 AS BIGINT)]," +
          s" generate_series(CAST(1 AS BIGINT), $j))," +
          s" (p, i) -> p * ($m - $j + i) // i) END"
      val num = "list_reduce(list_concat([CAST(0 AS BIGINT)]," +
        " generate_series(a, least(r1, c1))), (acc, k) -> acc" +
        s" + ${binom("r1", "k")} * ${binom("r2", "(c1 - k)")})"
      val den = binom("n", "c1")
      s"""WITH panel AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY s_nationkey ORDER BY s_suppkey) AS prk
         |  FROM supplier),
         |cells AS (
         |  SELECT s_nationkey AS nation,
         |    SUM(CASE WHEN s_acctbal >= 0 AND s_suppkey % 2 = 0
         |      THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN s_acctbal >= 0 AND s_suppkey % 2 <> 0
         |      THEN 1 ELSE 0 END) AS b,
         |    SUM(CASE WHEN s_acctbal < 0 AND s_suppkey % 2 = 0
         |      THEN 1 ELSE 0 END) AS c,
         |    SUM(CASE WHEN s_acctbal < 0 AND s_suppkey % 2 <> 0
         |      THEN 1 ELSE 0 END) AS d
         |  FROM panel WHERE prk <= 24 GROUP BY 1),
         |mm AS (
         |  SELECT nation, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         |    CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         |    CAST(a + b AS BIGINT) AS r1, CAST(c + d AS BIGINT) AS r2,
         |    CAST(a + c AS BIGINT) AS c1,
         |    CAST(a + b + c + d AS BIGINT) AS n
         |  FROM cells),
         |t AS (SELECT *, $num AS num, $den AS den FROM mm),
         |rk AS (
         |  SELECT *, row_number() OVER (ORDER BY
         |    (CAST(num AS HUGEINT) * 100000000000000)
         |      // CAST(den AS HUGEINT), nation) AS rk
         |  FROM t),
         |ks AS (SELECT max(CASE WHEN num * 500 <= rk * den
         |    THEN rk END) AS k_star FROM rk)
         |SELECT nation, a, b, c, d,
         |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS p_r6,
         |  CAST(rk AS BIGINT) AS rk,
         |  rk <= COALESCE(k_star, 0) AS reject
         |FROM rk, ks ORDER BY nation""".stripMargin
    },
    // exact multiplicative binomial folds; HUGEINT tail sum; integer
    // cross-multiplied verdict — same zero-float tail as the engine
    "q_stat_fisher" -> {
      def binom(m: String, j: String) =
        s"list_reduce(list_concat([CAST(1 AS BIGINT)]," +
          s" generate_series(CAST(1 AS BIGINT), $j))," +
          s" (p, i) -> p * ($m - $j + i) // i)"
      // the HUGEINT accumulator seed promotes the concat list (and so
      // the lambda's k) to HUGEINT — normalize k back to BIGINT at its
      // uses so the binomial folds stay in 64-bit integers
      val num = "list_reduce(list_concat([CAST(0 AS HUGEINT)]," +
        " generate_series(a, least(r1, c1))), (acc, k) -> acc" +
        s" + CAST(${binom("r1", "CAST(k AS BIGINT)")} AS HUGEINT)" +
        s" * ${binom("r2", "(c1 - CAST(k AS BIGINT))")})"
      val den = binom("n", "c1")
      s"""WITH cells AS (
         |  SELECT
         |    SUM(CASE WHEN s_nationkey < 12 AND s_acctbal >= 0
         |      THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN s_nationkey < 12 AND s_acctbal < 0
         |      THEN 1 ELSE 0 END) AS b,
         |    SUM(CASE WHEN s_nationkey >= 12 AND s_acctbal >= 0
         |      THEN 1 ELSE 0 END) AS c,
         |    SUM(CASE WHEN s_nationkey >= 12 AND s_acctbal < 0
         |      THEN 1 ELSE 0 END) AS d
         |  FROM supplier WHERE s_suppkey <= 50),
         |m AS (
         |  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         |    CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         |    CAST(a + b AS BIGINT) AS r1, CAST(c + d AS BIGINT) AS r2,
         |    CAST(a + c AS BIGINT) AS c1,
         |    CAST(a + b + c + d AS BIGINT) AS n
         |  FROM cells),
         |t AS (SELECT a, b, c, d, $num AS num, $den AS den FROM m)
         |SELECT a, b, c, d,
         |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS p_r6,
         |  num * 20 < CAST(den AS HUGEINT) AS reject
         |FROM t""".stripMargin
    },
    // flattened (i, j) recursion over the DP grid; prev/cur rows as
    // LISTs; cell order identical to the engine's nested fold
    "q_time_dtw" -> {
      val v = "abs(xs[(t // len(ys)) + 1] - ys[(t % len(ys)) + 1])" +
        " + least(prev[(t % len(ys)) + 2], prev[(t % len(ys)) + 1]," +
        " cur[(t % len(ys)) + 1])"
      s"""WITH RECURSIVE daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |series AS (
         |  SELECT event_type, list(n ORDER BY day) AS s
         |  FROM daily GROUP BY event_type),
         |pairs AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb,
         |    a.s AS xs, b.s AS ys
         |  FROM series a JOIN series b ON a.event_type < b.event_type),
         |r(ta, tb, xs, ys, t, prev, cur) AS (
         |  SELECT ta, tb, xs, ys, 0,
         |    list_concat([CAST(0 AS BIGINT)],
         |      list_transform(generate_series(1, len(ys)),
         |        j -> CAST(1000000000000 AS BIGINT))),
         |    [CAST(1000000000000 AS BIGINT)]
         |  FROM pairs
         |  UNION ALL
         |  SELECT ta, tb, xs, ys, t + 1,
         |    CASE WHEN (t % len(ys)) + 1 = len(ys)
         |      THEN list_append(cur, $v) ELSE prev END,
         |    CASE WHEN (t % len(ys)) + 1 = len(ys)
         |      THEN [CAST(1000000000000 AS BIGINT)]
         |      ELSE list_append(cur, $v) END
         |  FROM r WHERE t < len(xs) * len(ys))
         |SELECT ta AS type_a, tb AS type_b,
         |  CAST(len(xs) AS BIGINT) AS n_a, CAST(len(ys) AS BIGINT) AS n_b,
         |  prev[len(ys) + 1] AS dtw
         |FROM r WHERE t = len(xs) * len(ys)
         |ORDER BY type_a, type_b""".stripMargin
    },
    "q_stat_mcnemar" ->
      """WITH f AS (
        |  SELECT o_custkey,
        |    MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS a,
        |    MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS b
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY o_custkey),
        |p AS (
        |  SELECT COALESCE(f.a, 0) AS a, COALESCE(f.b, 0) AS b
        |  FROM customer c LEFT JOIN f ON c.c_custkey = f.o_custkey),
        |s AS (
        |  SELECT COUNT(*) AS n_pairs,
        |    SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n_both,
        |    SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS b_disc,
        |    SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS c_disc
        |  FROM p)
        |SELECT n_pairs, CAST(n_both AS BIGINT) AS n_both,
        |  CAST(b_disc AS BIGINT) AS b_disc, CAST(c_disc AS BIGINT) AS c_disc,
        |  round(CAST(b_disc - c_disc AS DOUBLE) * (b_disc - c_disc)
        |    / (b_disc + c_disc), 6) AS chi2_r6,
        |  round(CAST(abs(b_disc - c_disc) - 1 AS DOUBLE)
        |    * (abs(b_disc - c_disc) - 1)
        |    / (b_disc + c_disc), 6) AS chi2_cc_r6,
        |  1000000 * (abs(b_disc - c_disc) - 1) * (abs(b_disc - c_disc) - 1)
        |    > 3841459 * (b_disc + c_disc) AS reject
        |FROM s""".stripMargin,
    "q_time_xcorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di
        |  FROM events GROUP BY 1, 2, 4),
        |x AS (SELECT di, n AS x FROM daily WHERE event_type = 'click'),
        |y AS (SELECT di AS ydi, n AS y FROM daily
        |      WHERE event_type = 'purchase'),
        |lagged AS (
        |  SELECT l.lag, x.x, y.y
        |  FROM x, (SELECT unnest(generate_series(-7, 7)) AS lag) l, y
        |  WHERE y.ydi = x.di + l.lag),
        |s AS (
        |  SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM lagged GROUP BY lag)
        |SELECT lag, n,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
        |    6) AS r_r6
        |FROM s ORDER BY lag""".stripMargin,
    "q_stat_ols2" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01', day) AS BIGINT)
        |      AS x1,
        |    CAST(((date_diff('day', DATE '1995-01-02', day) % 7 + 7) % 7)
        |      >= 5 AS BIGINT) AS x2,
        |    y
        |  FROM daily),
        |s AS (
        |  SELECT COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2,
        |    SUM(y) AS sy, SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
        |    SUM(x2 * x2) AS s22, SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y,
        |    SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        |  FROM d),
        |dd AS (
        |  SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
        |    CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
        |    CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
        |    CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y,
        |    CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy,
        |    CAST(n AS BIGINT) AS n_days
        |  FROM s),
        |b AS (
        |  SELECT n_days, sy, s1y, s2y, syy, n,
        |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y))
        |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |        + s2 * (s1 * s12 - s11 * s2)) AS b0,
        |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2))
        |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |        + s2 * (s1 * s12 - s11 * s2)) AS b1,
        |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2))
        |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |        + s2 * (s1 * s12 - s11 * s2)) AS b2
        |  FROM dd)
        |SELECT n_days, round(b0, 6) AS beta0_r6, round(b1, 6) AS beta1_r6,
        |  round(b2, 6) AS beta2_r6,
        |  round(1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y))
        |    / (syy - sy * sy / n), 6) AS r2_r6
        |FROM b""".stripMargin,
    // identical doubled-rank integers; HUGEINT cross-multiplied verdict
    // with the same common denominator P = Πn_g; group-ordered double
    // fold for the r6 views
    "q_stat_kruskal" ->
      """WITH obs AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
        |    count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |bv AS (SELECT v, count(*) AS t FROM obs GROUP BY v),
        |r2t AS (SELECT v, t,
        |    2 * COALESCE(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r2
        |  FROM bv),
        |ties AS (SELECT CAST(SUM(t*t*t - t) AS BIGINT) AS tie_term
        |  FROM r2t),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(SUM(r2) AS BIGINT) AS s2
        |  FROM obs JOIN r2t ON obs.v = r2t.v GROUP BY g),
        |f1 AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    list_reduce(list_prepend(CAST(1 AS HUGEINT),
        |      list(CAST(ng AS HUGEINT) ORDER BY g)), (a, b) -> a * b)
        |      AS p,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(s2 AS DOUBLE) * s2 / ng / 4.0 ORDER BY g)),
        |      (a, b) -> a + b) AS rsum
        |  FROM grp),
        |f2 AS (SELECT k, n, p, rsum,
        |    (SELECT SUM(CAST(s2 AS HUGEINT) * s2 * (p // ng)) FROM grp)
        |      AS qp
        |  FROM f1)
        |SELECT k, n, tie_term,
        |  round(12.0 * rsum / (n * (n + 1.0)) - 3.0 * (n + 1), 6)
        |    AS h_r6,
        |  round((12.0 * rsum / (n * (n + 1.0)) - 3.0 * (n + 1))
        |    * (CAST(n AS DOUBLE) * n * n - n)
        |    / (CAST(n AS DOUBLE) * n * n - n - tie_term), 6) AS hc_r6,
        |  (CAST(3000 AS HUGEINT) * (n - 1) * qp
        |     - CAST(3000 AS HUGEINT) * (n + 1)
        |       * (CAST(n AS HUGEINT) * n * n - n) * p
        |   > CAST(CASE WHEN k = 2 THEN 3841 WHEN k = 3 THEN 5991
        |          WHEN k = 4 THEN 7815 WHEN k = 5 THEN 9488
        |          WHEN k = 6 THEN 11070 ELSE 12592 END AS HUGEINT)
        |     * (CAST(n AS HUGEINT) * n * n - n - tie_term) * p)
        |    AS reject
        |FROM f2, ties""".stripMargin,
    // identical doubled ranks → exact Pearson moments; z = ρ√(n−1)
    // verdict as HUGEINT cross-multiplication
    "q_stat_spearman" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |rx AS (SELECT v AS x, 2 * COALESCE(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r_x
        |  FROM (SELECT x AS v, count(*) AS t FROM daily GROUP BY x)),
        |ry AS (SELECT v AS y, 2 * COALESCE(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r_y
        |  FROM (SELECT y AS v, count(*) AS t FROM daily GROUP BY y)),
        |j AS (SELECT r_x, r_y FROM daily
        |  JOIN rx ON daily.x = rx.x JOIN ry ON daily.y = ry.y),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(r_x) AS BIGINT) AS sx,
        |    CAST(SUM(r_y) AS BIGINT) AS sy,
        |    CAST(SUM(r_x * r_y) AS BIGINT) AS sxy,
        |    CAST(SUM(r_x * r_x) AS BIGINT) AS sxx,
        |    CAST(SUM(r_y * r_y) AS BIGINT) AS syy
        |  FROM j),
        |c AS (SELECT n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny
        |  FROM ag)
        |SELECT n, num, denx, deny,
        |  round(CAST(num AS DOUBLE)
        |    / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE))),
        |    6) AS rho_r6,
        |  (CAST(2500 AS HUGEINT) * num * num * (n - 1)
        |   > CAST(9604 AS HUGEINT) * denx * deny) AS reject
        |FROM c""".stripMargin,
    // identical lower-median signs, run count via lag, HUGEINT verdict
    "q_stat_runs" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |med AS (SELECT v AS median_v FROM
        |  (SELECT v, row_number() OVER (ORDER BY v, d) AS rn
        |   FROM daily) t, (SELECT count(*) AS n_all FROM daily) nn
        |  WHERE rn = (n_all + 1) // 2),
        |sg AS (SELECT d, CASE WHEN v > median_v THEN 1 ELSE -1 END AS s
        |  FROM daily, med WHERE v <> median_v),
        |ch AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
        |      OR lag(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS chg
        |  FROM sg),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(SUM(chg) AS BIGINT) AS runs
        |  FROM ch)
        |SELECT n, n_pos, n_neg, runs,
        |  (CAST(2500 AS HUGEINT)
        |     * (n * runs - 2 * n_pos * n_neg - n)
        |     * (n * runs - 2 * n_pos * n_neg - n) * (n - 1)
        |   > CAST(9604 AS HUGEINT) * 2 * n_pos * n_neg
        |     * (2 * n_pos * n_neg - n)) AS reject
        |FROM ag""".stripMargin,
    // identical lower medians, exact |z| integers, common-denominator
    // HUGEINT verdict, group-ordered double fold for f_r6
    // same histogram/cum-window machinery as ansari; every sum a plain
    // exact-integer SUM (q4 in HUGEINT ≡ the engine's DECIMAL(38,0)),
    // ONE double division in the z
    "q_stat_moodscale" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |s AS (SELECT 'a' AS g, x AS v FROM daily
        |  UNION ALL SELECT 'b', y FROM daily),
        |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca
        |  FROM s GROUP BY v),
        |b AS (SELECT *, COALESCE(SUM(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cumt FROM hist),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
        |    CAST(SUM(ca) AS BIGINT) AS m FROM b),
        |s4b AS (SELECT t, ca, nn, m,
        |    (2 * cumt + t - nn) * (2 * cumt + t - nn) AS s4
        |  FROM b CROSS JOIN tot),
        |f AS (SELECT nn, m,
        |    CAST(SUM(ca * s4) AS BIGINT) AS t4,
        |    CAST(SUM(t * s4) AS BIGINT) AS sum4,
        |    SUM(CAST(t * s4 AS HUGEINT) * s4) AS q4
        |  FROM s4b GROUP BY nn, m)
        |SELECT nn, m, nn - m AS n_b, t4, sum4,
        |  round((CAST(t4 AS DOUBLE) - CAST(m * sum4 AS DOUBLE)
        |    / CAST(nn AS DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE)
        |    / CAST(nn * (nn - 1) AS DOUBLE) * (CAST(q4 AS DOUBLE)
        |    - CAST(sum4 AS DOUBLE) * sum4 / nn)), 6) AS z_r6,
        |  abs((CAST(t4 AS DOUBLE) - CAST(m * sum4 AS DOUBLE)
        |    / CAST(nn AS DOUBLE)) / sqrt(CAST(m * (nn - m) AS DOUBLE)
        |    / CAST(nn * (nn - 1) AS DOUBLE) * (CAST(q4 AS DOUBLE)
        |    - CAST(sum4 AS DOUBLE) * sum4 / nn)))
        |    > 1.959963984540054 AS reject
        |FROM f""".stripMargin,
    // same block integers (running-count window + per-position
    // explode), same ordered list_sum folds, same one-expression z
    // same histogram as q_stat_ansari; Wilcoxon half fully integer
    // (HUGEINT = the engine's DECIMAL(38,0)); chi2(2) gate
    "q_stat_lepage" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |s AS (SELECT 'a' AS g, x AS v FROM daily
        |  UNION ALL SELECT 'b', y FROM daily),
        |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca
        |  FROM s GROUP BY v),
        |b AS (SELECT *, COALESCE(SUM(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cumt FROM hist),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
        |    CAST(SUM(ca) AS BIGINT) AS m FROM b),
        |wilcox AS (SELECT nn, m,
        |    CAST(SUM(ca * (2 * cumt + t + 1)) AS BIGINT) AS w2,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
        |  FROM b CROSS JOIN tot GROUP BY nn, m),
        |pos AS (SELECT v, t, ca, nn, m,
        |    cumt + unnest(generate_series(1, t)) AS p
        |  FROM b CROSS JOIN tot),
        |s2b AS (SELECT v, t, ca, nn, m,
        |    CAST(SUM(2 * LEAST(p, nn + 1 - p)) AS BIGINT) AS s2
        |  FROM pos GROUP BY v, t, ca, nn, m),
        |l AS (SELECT nn, m,
        |    list(struct_pack(t := t, ca := ca, s2 := s2)
        |      ORDER BY v) AS arr,
        |    CAST(SUM(s2) AS BIGINT) AS sum2
        |  FROM s2b GROUP BY nn, m),
        |f AS (SELECT nn, m, sum2,
        |    list_sum(list_transform(arr, x ->
        |      CAST(x.ca AS DOUBLE) * (CAST(x.s2 AS DOUBLE)
        |        / CAST(x.t AS DOUBLE)))) AS t2,
        |    list_sum(list_transform(arr, x ->
        |      CAST(x.s2 AS DOUBLE) * (CAST(x.s2 AS DOUBLE)
        |        / CAST(x.t AS DOUBLE)))) AS q2
        |  FROM l),
        |zz AS (SELECT w.nn, w.m, w.nn - w.m AS n_b, w.w2, w.tsum,
        |    f.sum2, round(f.t2, 6) AS t2_r6,
        |    CAST(CAST(3 AS HUGEINT) * w.nn * (w.nn - 1)
        |        * (w.w2 - w.m * (w.nn + 1))
        |        * (w.w2 - w.m * (w.nn + 1)) AS DOUBLE)
        |      / CAST(CAST(w.m AS HUGEINT) * (w.nn - w.m)
        |        * (w.nn * w.nn * w.nn - w.nn - w.tsum) AS DOUBLE)
        |      AS zw2,
        |    (f.t2 - CAST(f.m * f.sum2 AS DOUBLE)
        |        / CAST(f.nn AS DOUBLE))
        |      / sqrt(CAST(f.m * (f.nn - f.m) AS DOUBLE)
        |        / CAST(f.nn * (f.nn - 1) AS DOUBLE)
        |        * (f.q2 - CAST(f.sum2 AS DOUBLE) * f.sum2 / f.nn))
        |      AS zab
        |  FROM wilcox w JOIN f ON w.nn = f.nn AND w.m = f.m)
        |SELECT nn, m, n_b, w2, tsum, sum2, t2_r6,
        |  round(zw2, 6) AS zw2_r6,
        |  round(zab * zab, 6) AS zab2_r6,
        |  round(zw2 + zab * zab, 6) AS d_r6,
        |  (zw2 + zab * zab) > 5.991465 AS reject
        |FROM zz""".stripMargin,
    "q_stat_ansari" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |s AS (SELECT 'a' AS g, x AS v FROM daily
        |  UNION ALL SELECT 'b', y FROM daily),
        |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca
        |  FROM s GROUP BY v),
        |b AS (SELECT *, COALESCE(SUM(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cumt FROM hist),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
        |    CAST(SUM(ca) AS BIGINT) AS m FROM b),
        |pos AS (SELECT v, t, ca, nn, m,
        |    cumt + unnest(generate_series(1, t)) AS p
        |  FROM b CROSS JOIN tot),
        |s2b AS (SELECT v, t, ca, nn, m,
        |    CAST(SUM(2 * LEAST(p, nn + 1 - p)) AS BIGINT) AS s2
        |  FROM pos GROUP BY v, t, ca, nn, m),
        |l AS (SELECT nn, m,
        |    list(struct_pack(t := t, ca := ca, s2 := s2)
        |      ORDER BY v) AS arr,
        |    CAST(SUM(s2) AS BIGINT) AS sum2
        |  FROM s2b GROUP BY nn, m),
        |f AS (SELECT nn, m, nn - m AS n_b, sum2,
        |    list_sum(list_transform(arr, x ->
        |      CAST(x.ca AS DOUBLE) * (CAST(x.s2 AS DOUBLE)
        |        / CAST(x.t AS DOUBLE)))) AS t2,
        |    list_sum(list_transform(arr, x ->
        |      CAST(x.s2 AS DOUBLE) * (CAST(x.s2 AS DOUBLE)
        |        / CAST(x.t AS DOUBLE)))) AS q2
        |  FROM l)
        |SELECT nn, m, n_b, sum2, round(t2, 6) AS t2_r6,
        |  round((t2 - CAST(m * sum2 AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / sqrt(CAST(m * (nn - m) AS DOUBLE) / CAST(nn * (nn - 1)
        |    AS DOUBLE) * (q2 - CAST(sum2 AS DOUBLE) * sum2 / nn)), 6)
        |    AS z_r6,
        |  abs((t2 - CAST(m * sum2 AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / sqrt(CAST(m * (nn - m) AS DOUBLE) / CAST(nn * (nn - 1)
        |    AS DOUBLE) * (q2 - CAST(sum2 AS DOUBLE) * sum2 / nn)))
        |    > 1.959963984540054 AS reject
        |FROM f""".stripMargin,
    "q_stat_levene" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT g, v AS m FROM
        |  (SELECT g, v,
        |     row_number() OVER (PARTITION BY g ORDER BY v, d) AS rn,
        |     COUNT(*) OVER (PARTITION BY g) AS nn
        |   FROM daily) t
        |  WHERE rn = (nn + 1) // 2),
        |z AS (SELECT daily.g, abs(v - m) AS z
        |  FROM daily JOIN med ON daily.g = med.g),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(SUM(z) AS BIGINT) AS tg,
        |    CAST(SUM(z * z) AS BIGINT) AS qg
        |  FROM z GROUP BY g),
        |f1 AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(tg) AS BIGINT) AS t,
        |    CAST(SUM(qg) AS BIGINT) AS s2,
        |    list_reduce(list_prepend(CAST(1 AS HUGEINT),
        |      list(CAST(ng AS HUGEINT) ORDER BY g)), (a, b) -> a * b)
        |      AS p,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(tg AS DOUBLE) * tg / ng ORDER BY g)),
        |      (a, b) -> a + b) AS qd
        |  FROM grp),
        |f2 AS (SELECT k, n, t, s2, p, qd,
        |    (SELECT SUM(CAST(tg AS HUGEINT) * tg * (p // ng)) FROM grp)
        |      AS q
        |  FROM f1)
        |SELECT k, n,
        |  round(((qd - CAST(t AS DOUBLE) * t / n) / (k - 1))
        |    / ((s2 - qd) / (n - k)), 6) AS f_r6,
        |  ((CAST(q AS HUGEINT) * n - CAST(t AS HUGEINT) * t * p)
        |     * (n - k) * 1000
        |   > CAST(CASE WHEN k = 2 THEN 3841 WHEN k = 3 THEN 2996
        |          WHEN k = 4 THEN 2605 WHEN k = 5 THEN 2372
        |          WHEN k = 6 THEN 2214 ELSE 2099 END AS HUGEINT)
        |     * (CAST(s2 AS HUGEINT) * p - q) * n * (k - 1)) AS reject
        |FROM f2""".stripMargin,
    // identical n-scaled central moments; HUGEINT verdict, one
    // double formula for the r6 view
    "q_stat_jarque" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s1,
        |    CAST(SUM(x * x) AS BIGINT) AS s2,
        |    CAST(SUM(x * x * x) AS BIGINT) AS s3,
        |    CAST(SUM(x * x * x * x) AS BIGINT) AS s4
        |  FROM daily GROUP BY event_type),
        |m AS (SELECT event_type, n,
        |    CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS m2,
        |    CAST(n AS HUGEINT) * n * s3
        |      - 3 * CAST(n AS HUGEINT) * s1 * s2
        |      + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS m3,
        |    CAST(n AS HUGEINT) * n * n * s4
        |      - 4 * CAST(n AS HUGEINT) * n * s1 * s3
        |      + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
        |      - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1 AS m4
        |  FROM g)
        |SELECT event_type, n,
        |  round(CAST(n AS DOUBLE)
        |    * (4.0 * CAST(m3 AS DOUBLE) * m3 * m2
        |       + (CAST(m4 AS DOUBLE) - 3.0 * CAST(m2 AS DOUBLE) * m2)
        |         * (CAST(m4 AS DOUBLE) - 3.0 * CAST(m2 AS DOUBLE) * m2))
        |    / (24.0 * CAST(m2 AS DOUBLE) * m2 * m2 * m2), 6) AS jb_r6,
        |  (CAST(1000 AS HUGEINT) * n
        |     * (4 * m3 * m3 * m2 + (m4 - 3 * m2 * m2)
        |        * (m4 - 3 * m2 * m2))
        |   > CAST(143784 AS HUGEINT) * m2 * m2 * m2 * m2) AS reject
        |FROM m ORDER BY event_type""".stripMargin,
    // identical cell contributions, cell-ordered fold, one sqrt
    "q_stat_cramers" ->
      """WITH o AS (SELECT o_orderstatus AS status,
        |    o_orderpriority AS priority FROM orders),
        |obs AS (SELECT status, priority, CAST(count(*) AS BIGINT)
        |    AS obs FROM o GROUP BY 1, 2),
        |rt AS (SELECT status, CAST(count(*) AS BIGINT) AS row_n
        |  FROM o GROUP BY 1),
        |ct AS (SELECT priority, CAST(count(*) AS BIGINT) AS col_n
        |  FROM o GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |grid AS (SELECT rt.status, ct.priority, rt.row_n, ct.col_n,
        |    COALESCE(obs.obs, 0) AS obs
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN obs ON obs.status = rt.status
        |    AND obs.priority = ct.priority),
        |cells AS (SELECT grid.status, grid.priority, nn.n,
        |    (obs - CAST(row_n * col_n AS DOUBLE) / n)
        |      * (obs - CAST(row_n * col_n AS DOUBLE) / n)
        |      / (CAST(row_n * col_n AS DOUBLE) / n) AS contrib
        |  FROM grid, nn),
        |f AS (SELECT MIN(n) AS n,
        |    CAST(COUNT(DISTINCT status) AS BIGINT) AS r,
        |    CAST(COUNT(DISTINCT priority) AS BIGINT) AS c,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(contrib ORDER BY status, priority)),
        |      (a, b) -> a + b) AS chi2
        |  FROM cells)
        |SELECT n, r, c, round(chi2, 6) AS chi2_r6,
        |  round(sqrt(chi2 / CAST(n * (least(r, c) - 1) AS DOUBLE)), 6)
        |    AS v_r6
        |FROM f""".stripMargin,
    // identical raw-moment sums; σ³ written v·√v (pow is not
    // correctly rounded), same formula text
    "q_agg_moments" ->
      """WITH g AS (SELECT l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, s1, s2, s3, s4,
        |  round(((CAST(s3 AS DOUBLE) / n)
        |    - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
        |    + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      * (CAST(s1 AS DOUBLE) / n))
        |  / ((CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |    * sqrt(CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
        |    6) AS g1_r6,
        |  round(((CAST(s4 AS DOUBLE) / n)
        |    - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
        |    + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      * (CAST(s2 AS DOUBLE) / n)
        |    - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |  / ((CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |    * (CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
        |  - 3.0, 6) AS kurt_r6
        |FROM g ORDER BY l_returnflag""".stripMargin,
    // identical pairwise signs per type; continuity-corrected verdict
    "q_stat_mannkendall" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |pr AS (SELECT a.event_type AS g,
        |    CAST(SUM(CASE WHEN b.v > a.v THEN 1
        |      WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.d < b.d
        |  GROUP BY 1),
        |ti AS (SELECT g, CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(SUM(t) AS BIGINT) AS n,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT event_type AS g, v, CAST(count(*) AS BIGINT)
        |      AS t FROM daily GROUP BY 1, 2)
        |  GROUP BY g)
        |SELECT pr.g AS event_type, ti.n, pr.s, ti.tie_term,
        |  ti.n * (ti.n - 1) * (2 * ti.n + 5) - ti.tie_term
        |    AS var_num18,
        |  (pr.s <> 0 AND
        |   45000 * (abs(pr.s) - 1) * (abs(pr.s) - 1)
        |   > 9604 * (ti.n * (ti.n - 1) * (2 * ti.n + 5) - ti.tie_term))
        |    AS reject
        |FROM pr JOIN ti ON pr.g = ti.g
        |ORDER BY event_type""".stripMargin,
    // identical integer sign classification over the bounded day pairs
    "q_stat_kendall" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pr AS (SELECT
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0
        |      END AS sx,
        |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0
        |      END AS sy
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conc,
        |    CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS disc,
        |    CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_x,
        |    CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_y
        |  FROM pr),
        |wn AS (SELECT n0, conc, disc, ties_x, ties_y,
        |    round(CAST(conc - disc AS DOUBLE)
        |      / sqrt(CAST((n0 - ties_x) * (n0 - ties_y) AS DOUBLE)), 6)
        |      AS tau_r6,
        |    (1 + CAST(sqrt(1.0 + 8.0 * n0) AS BIGINT)) // 2 AS n
        |  FROM ag)
        |SELECT n, n0, conc, disc, ties_x, ties_y, tau_r6,
        |  (45000 * (conc - disc) * (conc - disc)
        |   > 9604 * n * (n - 1) * (2 * n + 5)) AS reject
        |FROM wn""".stripMargin,
    "q_stat_iqr" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
        |  FROM lineitem),
        |st AS (
        |  SELECT flag, quantile_cont(c, 0.25) AS q1_c,
        |    quantile_cont(c, 0.75) AS q3_c
        |  FROM li GROUP BY flag),
        |f AS (
        |  SELECT flag, q1_c, q3_c,
        |    q1_c - 1.5 * (q3_c - q1_c) AS lo,
        |    q3_c + 1.5 * (q3_c - q1_c) AS hi
        |  FROM st)
        |SELECT li.flag, count(*) AS n, f.q1_c, f.q3_c,
        |  CAST(SUM(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(SUM(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high
        |FROM li JOIN f ON li.flag = f.flag
        |GROUP BY li.flag, f.q1_c, f.q3_c
        |ORDER BY li.flag""".stripMargin,
    // exact dominance counts off the shared value histogram; one
    // double division; Romano et al. 2006 magnitude bands
    "q_stat_cliffs" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2),
        |h AS (SELECT v,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM daily GROUP BY v),
        |c AS (SELECT v, ca, cb,
        |    COALESCE(SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      CAST(0 AS BIGINT)) AS cuma,
        |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        |  FROM h),
        |t AS (SELECT CAST(max(na) AS BIGINT) AS n_a,
        |    CAST(max(nb) AS BIGINT) AS n_b,
        |    CAST(SUM(cb * (na - cuma - ca)) AS BIGINT) AS gt,
        |    CAST(SUM(cb * cuma) AS BIGINT) AS lt
        |  FROM c),
        |d AS (SELECT *, CAST(gt - lt AS DOUBLE)
        |    / CAST(n_a * n_b AS DOUBLE) AS delta FROM t)
        |SELECT n_a, n_b, gt, lt, round(delta, 6) AS delta_r6,
        |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |    WHEN abs(delta) < 0.33 THEN 'small'
        |    WHEN abs(delta) < 0.474 THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,
    "q_stat_mannwhitney" ->
      """WITH s AS (
        |  SELECT (o_orderstatus = 'O') AS isa,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
        |bv AS (
        |  SELECT v, SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS a,
        |    SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS b
        |  FROM s GROUP BY v),
        |sc AS (
        |  SELECT a, b, COALESCE(SUM(b) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |  FROM bv),
        |ag AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS n_a,
        |    CAST(SUM(b) AS BIGINT) AS n_b,
        |    CAST(SUM(a * (2 * cumb + b)) AS BIGINT) AS u_x2,
        |    CAST(SUM((a+b)*(a+b)*(a+b) - (a+b)) AS BIGINT) AS tie_term
        |  FROM sc)
        |SELECT n_a, n_b, u_x2, tie_term,
        |  (CAST(u_x2 - n_a * n_b AS HUGEINT) * (u_x2 - n_a * n_b)
        |     * 7500 * (n_a + n_b) * (n_a + n_b - 1)
        |   > CAST(9604 AS HUGEINT) * n_a * n_b
        |     * (CAST(n_a + n_b + 1 AS HUGEINT)
        |        * (n_a + n_b) * (n_a + n_b - 1) - tie_term)) AS reject
        |FROM ag""".stripMargin,
    // identical sorted-group T²/n fold over exact integer moments
    "q_stat_anova" ->
      """WITH g AS (SELECT event_type,
        |    count(*) AS ng,
        |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS tg,
        |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)
        |      * CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS qg
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(tg) AS BIGINT) AS t,
        |    CAST(SUM(qg) AS BIGINT) AS q,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(tg AS DOUBLE) * tg / ng ORDER BY event_type)),
        |      (a, b) -> a + b) AS sst
        |  FROM g)
        |SELECT k, n,
        |  round(sst - CAST(t AS DOUBLE) * t / n, 6) AS ssb_r6,
        |  round(q - sst, 6) AS ssw_r6,
        |  round(((sst - CAST(t AS DOUBLE) * t / n) / (k - 1))
        |    / ((q - sst) / (n - k)), 6) AS f_r6
        |FROM s""".stripMargin,
    "q_stat_psi" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v,
        |    date_diff('day',
        |      MIN(CAST(ts AS DATE)) OVER (PARTITION BY event_type),
        |      CAST(ts AS DATE)) < 15 AS is_ref
        |  FROM events WHERE value IS NOT NULL),
        |rr AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v)
        |      AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev WHERE is_ref),
        |bounds AS (SELECT event_type,
        |    list_sort(list_distinct(list(v))) AS bs
        |  FROM rr
        |  WHERE rk = CAST(ceil(n * 1 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 2 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 3 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 4 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 5 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 6 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 7 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 8 / 10.0) AS BIGINT)
        |     OR rk = CAST(ceil(n * 9 / 10.0) AS BIGINT)
        |  GROUP BY event_type),
        |bk AS (SELECT ev.event_type,
        |    len(list_filter(b.bs, x -> ev.v > x)) AS bucket,
        |    COUNT(*) FILTER (WHERE is_ref) AS cr,
        |    COUNT(*) FILTER (WHERE NOT is_ref) AS cf
        |  FROM ev JOIN bounds b USING (event_type)
        |  GROUP BY 1, 2),
        |tt AS (SELECT event_type, SUM(cr) AS tr, SUM(cf) AS tf,
        |    COUNT(*) AS nb
        |  FROM bk GROUP BY 1),
        |pq AS (SELECT bk.event_type,
        |    CAST(bk.cr + 1 AS DOUBLE) / (tt.tr + tt.nb) AS p,
        |    CAST(bk.cf + 1 AS DOUBLE) / (tt.tf + tt.nb) AS q,
        |    tt.tr, tt.tf
        |  FROM bk JOIN tt USING (event_type))
        |SELECT event_type, CAST(MAX(tr) AS BIGINT) AS n_ref,
        |  CAST(MAX(tf) AS BIGINT) AS n_fresh,
        |  round(SUM((p - q) * ln(p / q)), 6) AS psi_r6,
        |  CASE WHEN round(SUM((p - q) * ln(p / q)), 6) < 0.1
        |    THEN 'stable'
        |    WHEN round(SUM((p - q) * ln(p / q)), 6) < 0.25
        |    THEN 'watch' ELSE 'action' END AS verdict
        |FROM pq GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_stat_benford" ->
      s"""WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |obs AS (SELECT digit, COUNT(*) AS obs FROM d
        |        WHERE digit >= 1 GROUP BY digit),
        |t AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM obs)
        |SELECT digit, obs,
        |  round($benfordProbsSql[digit] * n, 6) AS expected_r6,
        |  round((CAST(obs AS DOUBLE) - $benfordProbsSql[digit] * n)
        |    * (CAST(obs AS DOUBLE) - $benfordProbsSql[digit] * n)
        |    / ($benfordProbsSql[digit] * n), 6) AS chi2_contrib_r6
        |FROM obs CROSS JOIN t
        |ORDER BY digit""".stripMargin,
    "q_stat_gini" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment,
        |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
        |    o.o_orderkey
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |r AS (SELECT c_mktsegment, cents,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents, o_orderkey) AS i
        |  FROM o)
        |SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) / 100.0 AS revenue_usd,
        |  (2.0 * CAST(SUM(i * cents) AS BIGINT)
        |    - CAST(COUNT(*) + 1 AS DOUBLE) * CAST(SUM(cents) AS BIGINT))
        |    / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS BIGINT))
        |    AS gini
        |FROM r GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_stat_bootstrap" ->
      s"""WITH r AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    unnest(generate_series(0, 31)) AS rep
        |  FROM events WHERE value IS NOT NULL),
        |uu AS (
        |  SELECT event_type, cents, rep,
        |    CAST(list_sum(list_transform(generate_series(1, 8), d ->
        |      CAST(strpos('0123456789abcdef', substring(
        |        md5(CAST(event_id AS VARCHAR) || ':'
        |          || CAST(rep AS VARCHAR)), d, 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) / 4294967296.0 AS u
        |  FROM r),
        |w AS (SELECT event_type, rep, cents,
        |    $poissonCaseSql AS w
        |  FROM uu),
        |m AS (SELECT event_type, rep,
        |    CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
        |      AS m
        |  FROM w GROUP BY 1, 2),
        |s AS (SELECT event_type, m,
        |    row_number() OVER (PARTITION BY event_type ORDER BY m)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS k
        |  FROM m)
        |SELECT event_type, CAST(MAX(k) AS BIGINT) AS n_reps,
        |  round(MAX(CASE WHEN rn = 2 THEN m END), 6) AS boot_lo_r6,
        |  round(MAX(CASE WHEN rn = 31 THEN m END), 6) AS boot_hi_r6
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stat_ks" ->
      """WITH ev AS (SELECT event_type AS t,
        |    CAST(round(value * 100, 0) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |n AS (SELECT t, COUNT(*) AS n FROM ev GROUP BY t),
        |cells AS (SELECT t, v, COUNT(*) AS c FROM ev GROUP BY t, v),
        |pairs AS (SELECT a.t AS ta, a.n AS na, b.t AS tb, b.n AS nb
        |          FROM n a JOIN n b ON a.t < b.t),
        |merged AS (
        |  SELECT p.ta, p.na, p.tb, p.nb, c.v,
        |    SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
        |    SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
        |  FROM pairs p JOIN cells c ON c.t IN (p.ta, p.tb)
        |  GROUP BY p.ta, p.na, p.tb, p.nb, c.v),
        |cum AS (SELECT ta, na, tb, nb, v,
        |    abs(SUM(ca) OVER (PARTITION BY ta, tb ORDER BY v) * nb
        |      - SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v) * na)
        |      AS dn
        |  FROM merged),
        |mx AS (SELECT ta, na, tb, nb, MAX(dn) AS d_num
        |       FROM cum GROUP BY ta, na, tb, nb)
        |SELECT m.ta AS type_a, m.tb AS type_b,
        |  m.na AS n_a, m.nb AS n_b, CAST(m.d_num AS BIGINT) AS d_num,
        |  MIN(c.v) AS ks_at_cents,
        |  CAST(m.d_num AS DOUBLE) / (CAST(m.na AS DOUBLE) * m.nb) AS ks_d
        |FROM mx m JOIN cum c
        |  ON c.ta = m.ta AND c.tb = m.tb AND c.dn = m.d_num
        |GROUP BY m.ta, m.tb, m.na, m.nb, m.d_num
        |ORDER BY type_a, type_b""".stripMargin,
    "q_stat_chi2" ->
      """WITH o AS (SELECT o_orderstatus AS status,
        |    o_orderpriority AS priority FROM orders),
        |obs AS (SELECT status, priority, count(*) AS obs
        |  FROM o GROUP BY status, priority),
        |rt AS (SELECT status, count(*) AS row_n FROM o GROUP BY status),
        |ct AS (SELECT priority, count(*) AS col_n
        |  FROM o GROUP BY priority),
        |n AS (SELECT count(*) AS n FROM o)
        |SELECT status, priority, obs,
        |  CAST(row_n * col_n AS DOUBLE) / n AS expected,
        |  (obs - CAST(row_n * col_n AS DOUBLE) / n)
        |    * (obs - CAST(row_n * col_n AS DOUBLE) / n)
        |    / (CAST(row_n * col_n AS DOUBLE) / n) AS chi2_contrib
        |FROM obs JOIN rt USING (status) JOIN ct USING (priority)
        |  CROSS JOIN n
        |ORDER BY status, priority""".stripMargin,
    "q_agg_equidepth" ->
      s"""WITH b AS (SELECT
        |    $equidepthBoundsSql
        |  FROM orders)
        |SELECT CAST(1 + $equidepthBucketSql AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders CROSS JOIN b
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_stat_winsorized" ->
      """WITH e AS (SELECT event_type, value FROM events
        |           WHERE value IS NOT NULL),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY value) AS rk,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM e),
        |b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        |      FROM r
        |      WHERE rk = CAST(ceil(n * 0.05) AS BIGINT)
        |         OR rk = CAST(ceil(n * 0.95) AS BIGINT)
        |      GROUP BY event_type)
        |SELECT e.event_type, b.lo, b.hi, count(*) AS n,
        |  CAST(SUM(CAST(round(least(greatest(e.value, b.lo), b.hi)
        |    * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_w,
        |  count(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 END)
        |    AS n_clamped
        |FROM e JOIN b USING (event_type)
        |GROUP BY e.event_type, b.lo, b.hi
        |ORDER BY e.event_type""".stripMargin,
    "q_stat_mad" ->
      """WITH med AS (SELECT event_type,
        |    quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_type, med.med,
        |    abs(e.value - med.med) AS adev
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, min(med) AS med,
        |    quantile_cont(adev, 0.5) AS mad, count(*) AS n
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, m.med, m.mad,
        |  count(*) FILTER (d.adev > 3.0 * m.mad) AS n_outliers, m.n AS n
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type, m.med, m.mad, m.n
        |ORDER BY d.event_type""".stripMargin,
    "q_agg_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |    SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |          CAST(round(l_discount*100, 0) AS BIGINT) AS y
        |        FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS covar_samp,
        |  (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
        |    / (sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
        |       * sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)) AS corr_qd,
        |  (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
        |    / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) AS regr_slope,
        |  (CAST(sy AS DOUBLE)
        |    - ((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
        |       / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)) * sx)
        |    / CAST(n AS DOUBLE) AS regr_intercept
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  arg_max(q, cnt*100 - q) AS mode_qty,
        |  MAX(cnt) AS mode_count,
        |  COUNT(*) AS n_distinct
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_listagg" ->
      """SELECT r.r_name,
        |  string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
        |  COUNT(*) AS n_nations
        |FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    "q_agg_histogram" ->
      """SELECT bucket, bucket * 50000 AS bucket_lo_usd,
        |  COUNT(*) AS n, round(SUM(o_totalprice), 2) AS sum_price
        |FROM (SELECT least(CAST(round(o_totalprice*100, 0) AS BIGINT)
        |               // 5000000, 11) AS bucket, o_totalprice
        |      FROM orders)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_agg_bool_bits" ->
      """SELECT l_returnflag,
        |  bool_and(l_discount <= 0.10) AS all_disc_le10,
        |  bool_or(q >= 50) AS any_qty_50,
        |  COUNT(*) FILTER (WHERE l_tax = 0.0) AS n_tax_free,
        |  bit_and(q) AS qty_bit_and,
        |  bit_or(q) AS qty_bit_or,
        |  bit_xor(q) AS qty_bit_xor
        |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |        l_discount, l_tax
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
