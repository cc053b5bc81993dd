package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ORDER-STATISTIC SELECTION over IMPLICIT pairwise multisets.
  *
  * Robust estimators are defined as order statistics of all-pairs derived
  * values — the Hodges–Lehmann pseudomedian is the median of the n(n+1)/2
  * Walsh sums x_i + x_j (i ≤ j) (Hodges & Lehmann 1963), and the
  * Rousseeuw–Croux Qn scale estimator is the C(h,2)-th smallest pairwise
  * distance |x_i − x_j| (i < j), h = ⌊n/2⌋ + 1 (Rousseeuw & Croux, JASA
  * 1993). Materializing the pairs is O(N²) and dies long before 100 TB;
  * this operator never enumerates a pair. It follows the classic
  * counting-selection scheme (the same search used by Johnson & Mishra
  * 1978 for X+Y selection): binary-search the integer VALUE range, and at
  * each probe t count the pairs with derived value ≤ t from the VALUE
  * HISTOGRAM alone via the prefix-count identity
  *
  *   ordered pairs:  Σ_v c_v · F(ub(v,t)),   F(u) = #{x ≤ u}
  *
  * with ub = t − v (Walsh sums) or the [v−t, v+t] band (distances), then
  * correct for the diagonal and unordered double count. Each ROUND is ONE
  * job evaluating a K-ARY probe grid — up to `probesPerRound` equally
  * spaced thresholds per active group at once: histogram ⨝
  * broadcast(per-group probe grid) → a union of provider rows (v, c) and
  * per-probe query rows (key = ub) → one per-group running sum (providers
  * sort before queries at equal key, so F is inclusive) → one (g, t)
  * aggregate. The interval shrinks ≥ (P+1)× per round, so the search
  * needs ⌈log_{P+1} range⌉ driver-synchronized rounds (~7 at P = 15 over
  * a 10⁸ cents domain) — a function of the VALUE DOMAIN, never of N, and
  * P trades per-round histogram traffic (P query rows per histogram row)
  * against barrier count: on a 1000-executor cluster the barriers are
  * what hurt, so multi-probe is the right default shape.
  *
  * Scale shape (100 TB): the raw scan collapses to the (group, value)
  * histogram once (map-side combine; for fixed-point currency the domain
  * bounds the histogram regardless of row count); every probe shuffles
  * only histogram rows. Driver work per probe: one count per active
  * group (bounded-collect class, `maxGroups`-guarded). The driver-round
  * loop is the BPE-round exception class: O(log range) actions total,
  * each justified by an adaptive lo/hi update that must observe the
  * previous count.
  */
object Selection {

  /** Which implicit pairwise multiset to select from. */
  sealed trait PairMode
  /** {x_i + x_j : i ≤ j} — Walsh sums (pseudomedian = median/2). */
  case object WalshSums extends PairMode
  /** {|x_i − x_j| : i < j} — pairwise distances (Qn, Sn family). */
  case object AbsDiffs extends PairMode

  /** Result of one per-group selection. */
  private case class Sel(g: String, n: Long, m: Long, k: Long, value: Long)

  /** Exact-arithmetic ceiling: probe sums Σ qc·F are bounded by n² and
    * the pair count by n(n+1)/2, both held in Longs — so a group may
    * hold at most ⌊√Long.Max⌋ rows before either silently wraps. At
    * 3.04e9 rows/group this is a documentation of the Long envelope,
    * not a practical limit (a 100 TB run groups by a profiled
    * dimension); past it, fail loudly rather than corrupt k. */
  private val maxGroupRows = 3037000499L

  private def pairCount(n: Long, mode: PairMode): Long = {
    require(n <= maxGroupRows,
      s"kthPairwise: group of $n rows exceeds the exact-Long envelope " +
        s"($maxGroupRows); pair counts/probe sums would overflow")
    mode match {
      case WalshSums => n * (n + 1) / 2
      case AbsDiffs  => n * (n - 1) / 2
    }
  }

  /** k-th smallest (1-based) of the implicit pairwise multiset, per group.
    *
    * Three tiers, cheapest applicable wins:
    *  1. DRIVER tier — the whole histogram fits `smallHistLimit`: one
    *     bounded collect, the search runs locally, zero per-probe jobs.
    *  2. EXECUTOR-LOCAL GROUP tier — every single group's histogram
    *     fits `perGroupHistLimit` even though the total doesn't: ONE
    *     shuffle on the group key and each task runs the exact local
    *     counting search over its groups' histograms (the common
    *     100 TB shape: thousands-to-millions of medium groups; no
    *     barrier rounds, no driver state, group count unbounded).
    *  3. DISTRIBUTED PROBE LOOP — some single group's histogram is
    *     itself too big for one task: k-ary counting search, one
    *     shared probe job per round (⌈log_{P+1} range⌉ barriers).
    *
    * @param values frame with columns `g` (string group) and `v` (long)
    * @param mode   [[WalshSums]] or [[AbsDiffs]]
    * @param kOf    (n, m) ⇒ k: rank to select given the group's row count
    *               n and pair count m; must return 1 ≤ k ≤ m. Groups with
    *               m = 0 (singletons under [[AbsDiffs]]) are dropped.
    * @param perGroupHistLimit executor-tier gate: max distinct values
    *               per group solvable inside one task (bounds per-task
    *               memory at ~16 B per histogram row); 0 forces the
    *               probe loop (the benched q_stat_hodges_grouped path)
    * @return (g, n, m, k, value) — `value` is the exact k-th pairwise
    *         sum/distance (an achieved value by construction)
    */
  def kthPairwise(
      values: DataFrame,
      mode: PairMode,
      kOf: (Long, Long) => Long,
      maxGroups: Int = 1000,
      maxRounds: Int = 72,
      smallHistLimit: Long = 1L << 20,
      probesPerRound: Int = 15,
      perGroupHistLimit: Long = 1L << 16): DataFrame = {
    require(probesPerRound >= 1 && probesPerRound <= 255,
      "probesPerRound 1..255")
    val spark = values.sparkSession
    import spark.implicits._

    val hist = CacheScope.cached(
      values.groupBy($"g", $"v").agg(count(lit(1)).as("c")))

    // Probe-bounded driver tier (the boruvkaForest / dedupComponentsAuto
    // discipline): when the HISTOGRAM fits the driver — and for
    // fixed-point currency domains it usually does, regardless of row
    // count — the whole binary search runs locally against the sorted
    // cumulative counts: ONE distributed aggregate, one bounded
    // collect, zero per-probe jobs. The distributed probe loop below
    // remains the path for domains that blow the probe.
    val histProbe = hist.select($"g", $"v", $"c")
      .limit((smallHistLimit + 1).toInt).collect()
    if (histProbe.length <= smallHistLimit)
      return kthPairwiseLocal(spark, histProbe.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))), mode, kOf,
        maxGroups)

    // Executor-local group tier: the tier decision is ONE one-row
    // aggregate (max per-group histogram width); inside it, the same
    // solver as the driver tier runs per group in flatMapGroups —
    // one exchange + sort on g, each group's work O(H log H + H log
    // range), per-task memory bounded by perGroupHistLimit rows. No
    // maxGroups guard needed: no driver-side per-group state exists.
    if (perGroupHistLimit > 0) {
      val maxHr = hist.groupBy($"g").agg(count(lit(1)).as("hr"))
        .agg(max($"hr")).head().getLong(0)
      if (maxHr <= perGroupHistLimit) {
        val solved = hist.select($"g", $"v", $"c")
          .as[(String, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (g, it) =>
            solveGroup(g, it.map(r => (r._2, r._3)).toArray, mode,
              kOf).iterator
          }
        return solved.toDF()
          .select($"g", $"n", $"m", $"k", $"value")
      }
    }

    // One row per group: bounded by construction (grouping column of a
    // profiled dimension), maxGroups-guarded against misuse.
    val stats = hist.groupBy($"g")
      .agg(sum($"c").as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .collect()
    require(stats.length <= maxGroups,
      s"kthPairwise: ${stats.length} groups exceed maxGroups=$maxGroups")

    // Dense INT surrogate for the group key: every probe round
    // exchanges + sorts histogram rows keyed by group, and an int key
    // cuts that per-row cost vs an arbitrary string (the mapping is
    // maxGroups-bounded, built from the stats we already collected,
    // and joined back to the histogram ONCE).
    val giOf: Map[String, Int] = stats.map(_.getString(0)).sorted
      .zipWithIndex.toMap
    val histI = CacheScope.cached(
      hist.join(broadcast(giOf.toSeq.toDF("g", "gi")), Seq("g"))
        .select($"gi", $"v", $"c"))

    final case class St(n: Long, var lo: Long, var hi: Long, k: Long)
    val state = scala.collection.mutable.LinkedHashMap.empty[String, St]
    for (r <- stats.sortBy(_.getString(0))) {
      val (g, n) = (r.getString(0), r.getLong(1))
      val (mn, mx) = (r.getLong(2), r.getLong(3))
      val m = pairCount(n, mode)
      if (m > 0) {
        val k = kOf(n, m)
        require(k >= 1 && k <= m, s"kthPairwise: k=$k outside 1..$m for $g")
        val (lo, hi) = mode match {
          case WalshSums => (2 * mn, 2 * mx)
          case AbsDiffs  => (0L, mx - mn)
        }
        state += g -> St(n, lo, hi, k)
      }
    }

    var rounds = 0
    while (state.valuesIterator.exists(s => s.lo < s.hi)) {
      rounds += 1
      require(rounds <= maxRounds,
        s"kthPairwise: no convergence in $maxRounds rounds " +
          s"(range ${state.valuesIterator.map(s => s.hi - s.lo).max})")
      val active = state.filter { case (_, s) => s.lo < s.hi }
      // k-ary probe grid: ≤ probesPerRound equally spaced thresholds
      // inside [lo, hi); when the interval is narrower than the grid
      // the probes cover it exhaustively and the round is final for
      // that group. BigInt driver-side so i·width never wraps.
      val probes: Map[Int, Seq[Long]] = active.iterator.map {
        case (g, s) =>
          val width = BigInt(s.hi) - BigInt(s.lo)
          val p = width.min(BigInt(probesPerRound)).toLong
          giOf(g) -> (1L to p).map(i =>
            (BigInt(s.lo) + BigInt(i) * width / (p + 1)).toLong)
            .distinct
      }.toMap
      // ONE job per round: (Σ qc·F, Σ diag·F) per (group, probe) —
      // collect is Σ|probes| rows, ≤ maxGroups·probesPerRound; the
      // mode's unordered-count arithmetic happens driver-side
      val gOf = giOf.map(_.swap)
      val raw = countPairsLE(histI, probes, mode,
          restrictProviders = active.size * 2 < state.size)
        .collect().map(r =>
          (r.getInt(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
      val counts = raw.map { case ((gi, t), (s, d)) =>
        (gi, t) -> (mode match {
          case WalshSums => (s + d) / 2
          case AbsDiffs  => (s - state(gOf(gi)).n) / 2
        })
      }
      for ((g, s) <- active) {
        // Invariant: count(lo − 1) < k ≤ count(hi); converge to the
        // smallest t with count(t) ≥ k = the k-th pairwise value.
        // Bracket k between adjacent probes: the smallest probe with
        // count ≥ k caps hi, the largest with count < k lifts lo.
        val ts = probes(giOf(g))
        val geK = ts.filter(t => counts((giOf(g), t)) >= s.k)
        val ltK = ts.filter(t => counts((giOf(g), t)) < s.k)
        if (geK.nonEmpty) s.hi = geK.min
        if (ltK.nonEmpty) s.lo = ltK.max + 1
      }
    }

    val out = state.iterator.map { case (g, s) =>
      Sel(g, s.n, pairCount(s.n, mode), s.k, s.lo)
    }.toSeq
    spark.createDataFrame(out).select("g", "n", "m", "k", "value")
  }

  /** Driver tier: the same counting binary search against local sorted
    * cumulative counts — semantics identical to the distributed loop
    * by construction (same identities, same lo/hi updates), parity
    * pinned in SelectionSpec. */
  private def kthPairwiseLocal(
      spark: SparkSession,
      rows: Array[(String, Long, Long)],
      mode: PairMode,
      kOf: (Long, Long) => Long,
      maxGroups: Int): DataFrame = {
    val grouped = rows.groupBy(_._1).toSeq.sortBy(_._1)
    require(grouped.length <= maxGroups,
      s"kthPairwise: ${grouped.length} groups exceed maxGroups=$maxGroups")
    val out = grouped.flatMap { case (g, rs) =>
      solveGroup(g, rs.map(r => (r._2, r._3)).toArray, mode, kOf)
    }
    spark.createDataFrame(out).select("g", "n", "m", "k", "value")
  }

  /** ONE group's exact counting selection over its (value, count)
    * histogram — the solver shared verbatim by the driver tier and
    * the executor-local group tier, so their parity holds by
    * construction (pinned in SelectionSpec regardless). O(H log H)
    * sort + O(H) per probe × O(log range) probes, H = histogram
    * rows. */
  private def solveGroup(g: String, rs: Array[(Long, Long)],
      mode: PairMode, kOf: (Long, Long) => Long): Option[Sel] = {
    val sorted = rs.sortBy(_._1)
    val vals = sorted.map(_._1)
    val cum = sorted.scanLeft(0L)(_ + _._2).tail
    val n = cum.last
    val m = pairCount(n, mode)
    if (m == 0) None
    else {
      val k = kOf(n, m)
      require(k >= 1 && k <= m,
        s"kthPairwise: k=$k outside 1..$m for $g")
      def fle(u: Long): Long = { // #values ≤ u
        var lo = 0; var hi = vals.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (vals(mid) <= u) lo = mid + 1 else hi = mid
        }
        if (lo == 0) 0L else cum(lo - 1)
      }
      def countLE(t: Long): Long = mode match {
        case WalshSums =>
          val a = sorted.iterator.map { case (v, c) =>
            c * fle(t - v) }.sum
          val d = sorted.iterator.filter(_._1 * 2 <= t)
            .map(_._2).sum
          (a + d) / 2
        case AbsDiffs =>
          val s = sorted.iterator.map { case (v, c) =>
            c * (fle(v + t) - fle(v - t - 1)) }.sum
          (s - n) / 2
      }
      var (lo, hi) = mode match {
        case WalshSums => (2 * vals.head, 2 * vals.last)
        case AbsDiffs  => (0L, vals.last - vals.head)
      }
      while (lo < hi) {
        val mid = lo + (hi - lo) / 2
        if (countLE(mid) >= k) hi = mid else lo = mid + 1
      }
      Some(Sel(g, n, m, k, lo))
    }
  }

  /** Per-(group, probe) (Σ qc·F, Σ diag·F) for a probe grid
    * t ∈ ts(g), in ONE job of exactly two shuffles (the union window,
    * the final aggregate) — the caller applies the mode's
    * unordered-count identity on the two sums per probe. Package-
    * private so PlanSpec can pin the plan shape (broadcast probe join,
    * single window, no cartesian). */
  private[graft] def countPairsLE(
      hist: DataFrame,
      tByG: Map[Int, Seq[Long]],
      mode: PairMode,
      restrictProviders: Boolean = false): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val tdf = tByG.toSeq.flatMap { case (gi, ts) =>
      ts.map(t => (gi, t, Math.floorDiv(t, 2L))) }.toDF("gi", "t", "th")
    // When MOST groups have converged, only the round's ACTIVE groups
    // should contribute histogram mass — without the semi-join their
    // inert rows ride the window sort only to be filtered after the
    // running sum. The semi-join itself costs a broadcast probe pass
    // over the cached histogram, which LOSES while most groups are
    // still active (early rounds — measured at sf0.1/32 threads), so
    // the caller flips it on once active < half the groups.
    val activeHist =
      if (restrictProviders)
        hist.join(broadcast(tdf.select($"gi").distinct()), Seq("gi"),
          "left_semi")
      else hist
    val h = hist.join(broadcast(tdf), Seq("gi"))
    // Providers carry the histogram mass ONCE (never replicated per
    // probe); queries ask for the inclusive prefix count F at their
    // probe-specific key. Provider tag 0 sorts BEFORE query tag 1 at
    // an equal key, making F(u) = #{x ≤ u} inclusive; equal-key query
    // rows all read the same F because their own adds are zero. The
    // Walsh diagonal is ONE query row per (g, t) reading
    // F(⌊t/2⌋) = #{x : 2x ≤ t} (floorDiv driver-side keeps negative
    // thresholds exact).
    val providers = activeHist.select($"gi", $"v".as("key"), $"c".as("add"),
      lit(0).as("tag"), lit(0L).as("t"), lit(0L).as("qc"),
      lit(0L).as("dq"))
    val queries = mode match {
      case WalshSums =>
        h.select($"gi", ($"t" - $"v").as("key"), lit(0L).as("add"),
            lit(1).as("tag"), $"t", $"c".as("qc"), lit(0L).as("dq"))
          .unionAll(tdf.select($"gi", $"th".as("key"),
            lit(0L).as("add"), lit(1).as("tag"), $"t",
            lit(0L).as("qc"), lit(1L).as("dq")))
      case AbsDiffs =>
        h.select($"gi", ($"v" + $"t").as("key"), lit(0L).as("add"),
            lit(1).as("tag"), $"t", $"c".as("qc"), lit(0L).as("dq"))
          .unionAll(h.select($"gi", ($"v" - $"t" - 1).as("key"),
            lit(0L).as("add"), lit(1).as("tag"), $"t",
            (-$"c").as("qc"), lit(0L).as("dq")))
    }
    val w = Window.partitionBy($"gi").orderBy($"key", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    providers.unionAll(queries)
      .withColumn("f", sum($"add").over(w))
      .filter($"tag" === 1)
      .groupBy($"gi", $"t")
      .agg(sum($"qc" * $"f").as("s"), sum($"dq" * $"f").as("d"))
  }
}
