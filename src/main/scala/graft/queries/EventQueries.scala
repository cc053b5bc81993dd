package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Product-analytics battery over the event stream: retention cohorts,
  * top event paths, and cumulative-distinct-user growth — the standard
  * read-side queries of an event-ingesting ETL service (the reference
  * ingests events as opaque uploads; these are the queries its users run
  * downstream). All three reduce events FIRST (per-user min, per-user
  * dedup, or per-day aggregate) so every shuffle carries users/days, not
  * raw events.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Weekly retention triangle: users grouped by first-seen week
    * (cohort), counted per subsequent active week. Week arithmetic is
    * integer days div 7 over date_trunc'd Mondays — exact cross-engine.
    */
  def qRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val firsts = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = e.select(col("user_id"),
      date_trunc("week", col("ts")).as("act_week")).distinct()
    active.join(firsts, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(act_week, cohort_week) div 7").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Top-10 three-step event-type paths (per-user consecutive triples
    * by (ts, event_id) — a total order, so the lead() windows are
    * deterministic). The per-user window partitions by user_id: state
    * is one user's events, never global.
    */
  def qEventPaths(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_type").as("step1"),
        lead(col("event_type"), 1).over(w).as("step2"),
        lead(col("event_type"), 2).over(w).as("step3"))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"),
        col("step3"))
      .limit(10)
  }

  /** Monthly first-shipment counts + cumulative distinct parts shipped:
    * running count-distinct decomposed as first-occurrence marking
    * (per-part min) + monthly aggregate + running sum — each phase
    * distributed; the final window runs over the ~|months| aggregated
    * rows only, never the fact table.
    */
  def qRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val firstShip = l.groupBy(col("l_partkey"))
      .agg(date_trunc("month", min(col("l_shipdate"))).as("month"))
    val monthly = firstShip.groupBy(col("month"))
      .agg(count(lit(1)).as("new_parts"))
    val cum = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, 0)
    monthly
      .withColumn("cum_parts", sum(col("new_parts")).over(cum))
      .orderBy(col("month"))
  }

  /** WINDOWED (per-day) heavy-hitter users — the Misra-Gries
    * sketch-then-exact-recount discipline applied per TIME BUCKET: for
    * each day, users whose event share exceeds n_day/(k+1). One MG
    * sketch per day (≤ k counters cross the shuffle per bucket),
    * candidates re-attach by equi-join (no driver collect at any
    * bucket count), exact recount certifies — so the output equals the
    * plain per-day frequency filter the twin runs. The streaming-ops
    * monitoring staple ("who dominated traffic each day").
    */
  def qEventHeavyUsers(spark: SparkSession, dir: String): DataFrame = {
    val k = 30
    // individual users are uniform (~0.1% of a day each — vacuous), so
    // the monitored key is the 50-way user COHORT (~2% expected share
    // vs the 1/31 ≈ 3.2% threshold): skewed days surface their hot
    // cohorts, quiet days emit nothing — a discriminating filter
    def ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"),
        (col("user_id") % 50).cast("string").as("cohort"))
    val mg = new graft.functions.MisraGriesAgg(k).asUdaf
    val cands = ev.groupBy(col("day"))
      .agg(mg(col("cohort")).as("cands"), count(lit(1)).as("n"))
    val candRows = cands.select(col("day"),
      explode(col("cands")).as("cohort"), col("n"))
    ev.join(candRows, Seq("day", "cohort"))
      .groupBy(col("day"), col("cohort"))
      .agg(count(lit(1)).as("cnt"), min(col("n")).as("n"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("day"), col("cohort").cast("long").as("cohort"),
        col("cnt"), col("n"))
      .orderBy(col("day"), col("cnt").desc, col("cohort"))
  }

  /** Ordered three-step conversion funnel (view → click → purchase):
    * per user, the first `view`, the first `click` strictly after it,
    * the first `purchase` strictly after that. Counts + ppm conversion
    * vs the top of the funnel. Each phase is one key-partitioned
    * aggregate on user_id; the step-(i+1) scan joins the step-i
    * timestamps BEFORE aggregating, so events that can't convert are
    * dropped map-side and no per-user event list is ever materialized
    * — at 100 TB the shuffles carry one row per (user, step), never
    * raw events.
    */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    def ev = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("step", lit(1))
      .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("step", lit(2)))
      .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("step", lit(3)))
    val top = s1.agg(count(lit(1)).as("n1"))
    counts.crossJoin(broadcast(top))
      .select(col("step"), col("n"),
        expr("n * 1000000 div n1").as("conv_ppm"))
      .orderBy(col("step"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next | current) as integer ppm of each row's outgoing mass. The
    * lag window partitions by user (bounded state); the transition count
    * is one hash aggregate over (from, to) — 25 cells here, |types|²
    * generally — so the matrix itself is broadcast-sized at any corpus
    * scale.
    */
  def qEventMarkov(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = e.select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val row = Window.partitionBy(col("from_type"))
    trans.withColumn("row_total", sum(col("cnt")).over(row))
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("cnt * 1000000 div row_total").as("p_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Linear multi-touch attribution: every click a user made in the
    * 24 h before one of their purchases shares that purchase's value
    * equally — the credit model marketing warehouses run nightly
    * (linear is the fully-relational member of the first/last/U-shaped
    * family). Exactness: value splits in INTEGER CENTS with the
    * remainder assigned to the LAST touch before the purchase — a
    * deterministic rule both engines replay exactly (floating credit
    * = v/n would drift in the re-aggregation order).
    *
    * Shape: the touch join is TIME-BUCKETED (the q_join_range_bucketed
    * pattern): clicks key on their 24 h bucket, each purchase probes
    * its own bucket and the one before (any click in (buy−24h, buy]
    * lives in one of the two), so the join is a pure equi-join on
    * (user, bucket) and the exact 24 h predicate only prunes within
    * same-bucket matches. Without the bucket key a user with C clicks
    * and P purchases materializes C·P rows before the filter —
    * per-key quadratic for power users at 100 TB (VERDICT r8 finding
    * #4); with it, each purchase meets only clicks from a ≤ 48 h
    * window. Then one window over each purchase's touch list + one
    * aggregate to the per-day credit report; AQE skew handling covers
    * the remaining hot (user, bucket) cells.
    */
  def qEventAttribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketSec = 86400L // = the 24 h attribution horizon
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("bkt"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"),
        col("event_id").as("buy_id"),
        Exact.e2(col("value")).as("cents"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("bkt0"))
      // a click has exactly ONE bucket, so the two probe rows can never
      // both match the same click — no post-join dedup needed
      .withColumn("bkt", explode(array(col("bkt0"), col("bkt0") - 1)))
    val touched = buys.join(clicks, Seq("user_id", "bkt"))
      .filter(col("click_ts") <= col("buy_ts") &&
        col("click_ts") > col("buy_ts") - expr("INTERVAL 24 HOURS"))
    val w = Window.partitionBy(col("buy_id"))
    val ranked = touched
      .withColumn("n_touch", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("click_ts").desc, col("click_id").desc)))
    ranked
      .withColumn("credit",
        expr("cents div n_touch") +
          when(col("rk") === 1, col("cents") % col("n_touch"))
            .otherwise(0L))
      .groupBy(to_date(col("click_ts")).as("day"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("buy_id")).as("n_purchases"),
        sum(col("credit")).as("credit_cents"))
      .orderBy(col("day"))
  }

  /** INTERVAL-UNION COVERAGE — "how long was each user actually
    * engaged": every event opens a 10-minute exposure window
    * [ts, ts+600 s) on exact MICROSECOND integers (unix_micros /
    * epoch_us — the q_window_sessionize portability lesson: this
    * fixture's timestamps are sub-second), and overlapping windows
    * merge before summing, so
    * burst activity doesn't double-count (the classic
    * union-of-intervals problem; the complement of sessionization,
    * which reports boundaries — this reports covered TIME). Running-max
    * interval merge (the scrubSpans device on the time axis): one
    * window pass flags gap starts, a
    * running sum numbers the islands, one aggregate sums island
    * extents.
    *
    * Scale: one hash exchange on user_id feeds both window passes and
    * the aggregates; state per user is its own event list.
    */
  def qEventCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("unix_micros(ts)").as("s"),
        (expr("unix_micros(ts)") + 600000000L).as("e"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("maxe", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ng", when(col("maxe").isNull ||
        col("s") > col("maxe"), 1).otherwise(0))
      .withColumn("grp", sum(col("ng")).over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("s")).as("gs"), max(col("e")).as("ge"),
        count(lit(1)).as("nev"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("nev")).as("n_events"),
        count(lit(1)).as("n_intervals"),
        sum(col("ge") - col("gs")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** COMPLEX EVENT PROCESSING pattern match (the MATCH_RECOGNIZE /
    * Flink-CEP class, strict-contiguity mode): each user's event
    * history becomes an ordered one-char-per-event string (c/e/p/s/v
    * initials are unique on this fixture), and the pattern
    * click (view)* purchase — `cv*p` — is matched as a regex:
    * non-overlapping match count, first match position and length.
    * Regex-over-sequence IS the standard CEP compilation (both
    * engines' regex teams — Java util.regex here, RE2 in the twin —
    * agree on this pattern class: greedy star over a single literal
    * can't backtrack into ambiguity).
    *
    * Scale: one per-user ordered aggregation (the q_event_markov
    * shuffle class) then map-side regex; per-user sequences are
    * bounded by per-user activity, never corpus size. first_pos
    * exploits leftmost-match semantics: the first regex match's text
    * cannot occur earlier as a substring (it would itself be a match),
    * so instr(seq, match) is exactly the match start in both engines.
    */
  def qEventCep(spark: SparkSession, dir: String): DataFrame = {
    val seqs = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(ts, event_id, substring(event_type, 1, 1) AS c)))," +
        " x -> x.c), '')").as("seq"))
    seqs
      .withColumn("m", regexp_extract(col("seq"), "cv*p", 0))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        regexp_count(col("seq"), lit("cv*p")).cast("long")
          .as("n_matches"),
        when(col("m") === "", lit(0L))
          .otherwise(instr(col("seq"), col("m")).cast("long"))
          .as("first_pos"),
        length(col("m")).cast("long").as("first_len"))
      .orderBy(col("user_id"))
  }

  /** RFM SEGMENTATION (recency / frequency / monetary) of purchasing
    * users — the classic behavioral scoring every CRM warehouse runs:
    * each metric becomes a rank-based quintile score
    * (1 + 5·(rank−1) div n with a unique (metric, user) ordering key —
    * ntile() ties are engine-arbitrary, rank arithmetic is not), and
    * score triples map to named segments. Recency ranks DESCENDING so
    * the most recent buyer scores 5; monetary is exact integer cents.
    *
    * Shape: one purchase aggregate per user, three windows over the
    * per-user table (150 rows here; at 100 TB the per-user table is
    * the small output of the big aggregate — windows partition by
    * nothing but run on users, not events; for billions of users,
    * swap rank windows for KLL quantile boundaries).
    */
  def qEventRfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buys = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        Exact.e2(col("value")).as("cents"))
    val perUser = buys.groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .withColumn("max_day",
        max(col("last_day")).over(Window.partitionBy()))
      .withColumn("recency_days",
        datediff(col("max_day"), col("last_day")).cast("long"))
    val n = Window.partitionBy()
    perUser
      .withColumn("rr", row_number().over(
        Window.orderBy(col("recency_days").desc, col("user_id"))))
      .withColumn("rf", row_number().over(
        Window.orderBy(col("frequency"), col("user_id"))))
      .withColumn("rm", row_number().over(
        Window.orderBy(col("monetary_cents"), col("user_id"))))
      .withColumn("nu", count(lit(1)).over(n))
      .withColumn("r_score", expr("1 + (5 * (rr - 1)) div nu"))
      .withColumn("f_score", expr("1 + (5 * (rf - 1)) div nu"))
      .withColumn("m_score", expr("1 + (5 * (rm - 1)) div nu"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4, "recent")
          .when(col("f_score") >= 4, "loyal")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "at_risk")
          .otherwise("regular"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"), col("segment"))
      .orderBy(col("user_id"))
  }

  /** PEAK CONCURRENCY per day — the classic sweep-line over interval
    * endpoints (the "max simultaneous sessions" load metric): every
    * event opens a 30-minute presence interval; +1/−1 endpoint deltas
    * sorted by (t, delta) — ends sort before coincident starts, so
    * touching intervals never count as overlapping — and a running sum
    * gives the live concurrency at every boundary; max per day of the
    * boundary's date. Exact integers end to end; the RANGE window frame
    * (peer rows share the cumulative value) is the default in BOTH
    * engines, so ties resolve identically.
    *
    * Shape: one union of two projections, one prefix sum, one
    * aggregate. The global-order prefix sum range-partitions on t with
    * a two-level carry at 100 TB (the q_curate_shard pattern); fixture
    * scale runs it as one window.
    */
  def qEventConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).select(col("ts"))
    val pts = ev.select(col("ts").as("t"), lit(1L).as("d"))
      .unionByName(ev.select(
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("t"),
        lit(-1L).as("d")))
    pts.withColumn("c", sum(col("d")).over(Window.orderBy(col("t"),
        col("d"))))
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("c")).as("peak_concurrency"),
        count(lit(1)).as("n_boundaries"))
      .orderBy(col("day"))
  }

  /** MARKOV STATIONARY DISTRIBUTION — q_event_markov's transition
    * matrix taken to its fixed point by THREE integer power-iteration
    * rounds under the pagerank floor-division doctrine: each round is
    * π'_j = Σ_i (π_i · n_ij) div n_i on the |states|² transition
    * frame (25 rows — the iteration is dimension-bounded; only the
    * one pass that builds n_ij sees the corpus). The long-run
    * state mix is what capacity planning reads off a session model.
    * Twin replays all three rounds bit-for-bit.
    */
  def qEventStationary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scale = 1000000000L
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = e
      .select(col("event_type").as("i"),
        lead(col("event_type"), 1).over(w).as("j"))
      .filter(col("j").isNotNull)
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n_ij"))
    val rowTot = pairs.groupBy(col("i")).agg(sum(col("n_ij")).as("n_i"))
    val trans = pairs.join(rowTot, "i")
    val states = graft.ops.CacheScope.cached(
      trans.select(col("i").as("s"))
        .unionAll(trans.select(col("j").as("s"))).distinct())
    val k = states.count() // eager |S|: tiny, the pagerank precedent
    var pi = states.select(col("s"), lit(scale / k).as("pi"))
    for (_ <- 1 to 3) {
      val in = trans.join(pi, trans("i") === pi("s"))
        .select(col("j"), expr("(pi * n_ij) div n_i").as("c"))
        .groupBy(col("j")).agg(sum(col("c")).as("pin"))
      pi = states.join(in, states("s") === in("j"), "left")
        .select(col("s"), coalesce(col("pin"), lit(0L)).as("pi"))
    }
    pi.select(col("s").as("event_type"), col("pi").as("pi_scaled"))
      .orderBy(col("event_type"))
  }

  /** DAU/WAU STICKINESS per week — the engagement ratio product
    * analytics tracks (how much of the weekly audience shows up on an
    * average day): Σ(daily distinct users)·10⁶ div (days·WAU), exact
    * PPM integers. Two distinct-aggregates joined on the week — both
    * are map-side-combinable distincts at scale (partial
    * HyperLogLog-style exactness is NOT needed: the distinct keys are
    * (day, user) and (week, user) — bounded by activity, shuffled
    * once).
    */
  def qEventStickiness(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
      .select(date_trunc("week", col("ts")).as("week"),
        to_date(col("ts")).as("d"), col("user_id"))
    val daily = e.groupBy(col("week"), col("d"))
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val weekly = e.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("wau"))
    daily.join(weekly, "week")
      .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
        expr("sum_dau * 1000000L div (n_days * wau)")
          .as("stickiness_ppm"))
      .orderBy(col("week"))
  }

  /** TWO-PROPORTION A/B TEST — the experimentation primitive: users
    * split by the deterministic hash parity of user_id (the assignment
    * rule a real experiment framework persists), conversion = "has a
    * purchase event". The pooled two-proportion z-test at α=0.05 is
    * ONE cross-multiplied integer comparison
    * (s₁n₂ − s₂n₁)²·N·2500 > 9604·S(N−S)·n₁n₂  (S = s₁+s₂, N = n₁+n₂)
    * — algebraically |z| > 1.96 with the pooled variance, no float in
    * the verdict. Rates are also reported as exact PPM integers.
    * Shape: one per-user aggregate, one 2-row group, one 1-row
    * verdict.
    */
  def qEventAbtest(spark: SparkSession, dir: String): DataFrame = {
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
      .select(col("n1"), col("s1"), col("n2"), col("s2"),
        expr("s1 * 1000000L div n1").as("rate_a_ppm"),
        expr("s2 * 1000000L div n2").as("rate_b_ppm"),
        expr("""cast(2500 as decimal(38,0))
               |  * (s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1)
               |  * (n1 + n2)
               |> cast(9604 as decimal(38,0)) * (s1 + s2)
               |  * (n1 + n2 - s1 - s2) * n1 * n2"""
          .stripMargin.replace('\n', ' ')).as("reject"))
  }

  /** COHORT LTV CURVES — q_retention_cohort's revenue twin: per
    * (first-activity week cohort, weeks-since-cohort age), purchase
    * revenue in exact cents, the running cumulative, and cumulative
    * LTV per cohort member (floor-divided cents — a report of exact
    * integers end to end). The curve is sampled at ages where revenue
    * exists (a gapless curve is a trivial calendar left-join away —
    * same convention as the retention query). Shape: one per-user
    * min-aggregate, one broadcastable cohort-size frame, one keyed
    * aggregate + per-cohort window over ≤ weeks rows.
    */
  def qEventLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val firsts = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    val rev = e.filter(col("event_type") === "purchase"
        && col("value").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"),
        Exact.e2(col("value")).as("cents"))
    val byAge = rev.join(firsts, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(w, cohort_week) div 7").as("age_week"))
      .agg(sum(col("cents")).as("rev_cents"))
    byAge
      .withColumn("cum_cents", sum(col("rev_cents")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("age_week"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("age_week"), col("n_cohort"),
        col("rev_cents"), col("cum_cents"),
        expr("cum_cents div n_cohort").as("ltv_cents_per_user"))
      .orderBy(col("cohort_week"), col("age_week"))
  }

  /** KAPLAN–MEIER SURVIVAL (Kaplan & Meier 1958) of user lifetimes:
    * lifetime = days between a user's first and last event; users
    * whose last event falls on the corpus's final day are
    * RIGHT-CENSORED (still active at the observation edge — the
    * distinction that separates KM from a naive lifetime histogram).
    * At each distinct lifetime t: n_risk = users with lifetime ≥ t,
    * d = observed churns, c = censored exits; Ŝ(t) = Π_{s≤t}
    * (1 − d_s/n_s). Counts and at-risk sets are exact integers; the
    * product is ONE ordered prefix fold per row over the ≤|days|
    * factor list (identical left fold both engines — the q_stat_anova
    * discipline), so Ŝ is bit-identical cross-engine.
    *
    * Scale shape: the corpus reduces to one row per user (min/max
    * aggregate), then one row per distinct lifetime — calendar-
    * bounded; the factor list is a 1-row broadcast.
    */
  def qEventSurvival(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val span = ev.groupBy(col("user_id"))
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
    val mx = ev.agg(max(col("d")).as("maxd"))
    val lt = span.crossJoin(broadcast(mx))
      .select(datediff(col("l"), col("f")).cast("long").as("t"),
        when(col("l") < col("maxd"), 1L).otherwise(0L).as("e"))
    val grp = lt.groupBy(col("t"))
      .agg(sum(col("e")).as("d_churn"),
        sum(lit(1L) - col("e")).as("c_cens"))
      .withColumn("n_risk", sum(col("d_churn") + col("c_cens")).over(
        Window.orderBy(col("t")).rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(Window.orderBy(col("t"))))
    val fct = grp
      .select(col("t"),
        (lit(1.0) - col("d_churn").cast("double") / col("n_risk"))
          .as("f"))
      .groupBy()
      .agg(expr("transform(sort_array(collect_list(struct(t, f)))," +
        " x -> x.f)").as("fct"))
    grp.crossJoin(broadcast(fct))
      .select(col("t"), col("n_risk"), col("d_churn"), col("c_cens"),
        round(expr(
          "aggregate(slice(fct, 1, rn), 1.0d, (a, b) -> a * b)"), 6)
          .as("s_r6"))
      .orderBy(col("t"))
  }

  /** SEQUENTIAL PATTERN SUPPORT, GSP level 2 (Srikant & Agrawal, EDBT
    * 1996): for every ordered event-type pair ⟨a → b⟩, how many users'
    * histories CONTAIN the subsequence — some a strictly before some b
    * (any gap; the sequence-contains semantics that distinguishes
    * pattern mining from q_event_markov's adjacent transitions and
    * q_event_paths' contiguous n-grams). Existential containment
    * reduces exactly to span arithmetic: a user contains ⟨a → b⟩ iff
    * min_ts(a) < max_ts(b), so the raw scan collapses to ONE (user,
    * type) min/max aggregate and candidate pairs join k² bounded rows
    * per user — never the event list squared. `supp_r6` = containing
    * users / all users with events.
    */
  def qEventSeqpat(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val spans = e.groupBy(col("user_id"), col("event_type").as("t"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    seqpatFromSpans(spans)
  }

  /** Pattern supports from a (user_id, t, mn, mx) span table — see
    * [[qEventSeqpat]]; shared with the incremental path. */
  private[queries] def seqpatFromSpans(spans: DataFrame): DataFrame = {
    val users = spans.select(countDistinct(col("user_id")).as("u"))
    val pairs = spans.as("a").join(spans.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.t") =!= col("b.t"))
      .select(col("a.t").as("a"), col("b.t").as("b"),
        (col("a.mn") < col("b.mx")).as("seq"))
    pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_both"),
        sum(when(col("seq"), 1L).otherwise(0L)).as("n_seq"))
      .crossJoin(broadcast(users))
      .select(col("a"), col("b"), col("n_both"), col("n_seq"),
        round(col("n_seq") / col("u"), 6).as("supp_r6"))
      .orderBy(col("a"), col("b"))
  }

  /** INCREMENTAL sequential-pattern maintenance: the span table behind
    * [[qEventSeqpat]] is a DECOMPOSABLE (min, max) aggregate, so an
    * arrival batch folds into the standing spans by one
    * (user, type)-keyed merge — the historical event log is never
    * re-read (the q_dedup_incremental / q_graph_mst_incremental
    * arrival-batch discipline). Here the log splits at a fixed date
    * (< / ≥ 2024-01-25); the oracle is the FROM-SCRATCH twin verbatim —
    * equality with it IS the correctness claim.
    *
    * Scale shape: per batch, cost is one min/max aggregate over the
    * batch + an equi-join merge against the |users|×|types|-bounded
    * standing span table; supports recompute on the merged spans
    * (metadata-sized), with the raw corpus untouched.
    */
  def qEventSeqpatIncremental(spark: SparkSession, dir: String)
      : DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val cut = lit("2024-01-25").cast("timestamp")
    def spansOf(part: DataFrame): DataFrame = part
      .groupBy(col("user_id"), col("event_type").as("t"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    val standing = spansOf(e.filter(col("ts") < cut))
    val batch = spansOf(e.filter(col("ts") >= cut))
    val merged = standing.unionByName(batch)
      .groupBy(col("user_id"), col("t"))
      .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    seqpatFromSpans(merged)
  }

  val defs: Map[String, Q] = Map(
    "q_event_seqpat" -> (qEventSeqpat(_, _)),
    "q_event_seqpat_incremental" -> (qEventSeqpatIncremental(_, _)),
    "q_event_survival" -> (qEventSurvival(_, _)),
    "q_event_ltv" -> (qEventLtv(_, _)),
    "q_event_abtest" -> (qEventAbtest(_, _)),
    "q_event_stickiness" -> (qEventStickiness(_, _)),
    "q_event_stationary" -> (qEventStationary(_, _)),
    "q_event_concurrency" -> (qEventConcurrency(_, _)),
    "q_event_rfm" -> (qEventRfm(_, _)),
    "q_event_cep" -> (qEventCep(_, _)),
    "q_event_coverage" -> (qEventCoverage(_, _)),
    "q_event_attribution" -> (qEventAttribution(_, _)),
    "q_event_funnel" -> (qEventFunnel(_, _)),
    "q_event_markov" -> (qEventMarkov(_, _)),
    "q_event_heavy_users" -> (qEventHeavyUsers(_, _)),
    "q_retention_cohort" -> (qRetentionCohort(_, _)),
    "q_event_paths" -> (qEventPaths(_, _)),
    "q_running_distinct" -> (qRunningDistinct(_, _))
  )

  private val seqpatSql: String =
    """WITH e AS (SELECT user_id, event_type, ts FROM events
      |  WHERE user_id IS NOT NULL),
      |spans AS (SELECT user_id, event_type AS t,
      |    MIN(ts) AS mn, MAX(ts) AS mx
      |  FROM e GROUP BY 1, 2),
      |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u
      |  FROM e),
      |p AS (SELECT a.t AS a, b.t AS b,
      |    CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END AS seq
      |  FROM spans a JOIN spans b
      |    ON a.user_id = b.user_id AND a.t <> b.t)
      |SELECT a, b, CAST(count(*) AS BIGINT) AS n_both,
      |  CAST(SUM(seq) AS BIGINT) AS n_seq,
      |  round(CAST(SUM(seq) AS BIGINT) / u.u, 6) AS supp_r6
      |FROM p CROSS JOIN u GROUP BY a, b, u.u
      |ORDER BY a, b""".stripMargin

  val oracles: Map[String, String] = Map(
    // same span-arithmetic containment on the (user, type) min/max
    "q_event_seqpat" -> seqpatSql,
    // the incremental merge must equal the from-scratch supports —
    // same twin verbatim (the q_graph_mst_incremental convention)
    "q_event_seqpat_incremental" -> seqpatSql,
    // three unrolled integer power rounds, same floor divisions
    "q_event_stationary" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |pr AS (SELECT event_type AS i,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS j
        |  FROM e),
        |pairs AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n_ij
        |  FROM pr WHERE j IS NOT NULL GROUP BY i, j),
        |rt AS (SELECT i, CAST(SUM(n_ij) AS BIGINT) AS n_i
        |  FROM pairs GROUP BY i),
        |tr AS (SELECT pairs.i, pairs.j, n_ij, n_i
        |  FROM pairs JOIN rt ON pairs.i = rt.i),
        |st AS (SELECT DISTINCT s FROM
        |  (SELECT i AS s FROM tr UNION ALL SELECT j AS s FROM tr)),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
        |p0 AS (SELECT s, CAST(1000000000 // k.k AS BIGINT) AS pi
        |  FROM st, k),
        |p1 AS (SELECT st.s, CAST(COALESCE(SUM((pi * n_ij) // n_i), 0)
        |    AS BIGINT) AS pi
        |  FROM st LEFT JOIN (SELECT tr.j, p0.pi, tr.n_ij, tr.n_i
        |    FROM tr JOIN p0 ON tr.i = p0.s) x ON st.s = x.j
        |  GROUP BY st.s),
        |p2 AS (SELECT st.s, CAST(COALESCE(SUM((pi * n_ij) // n_i), 0)
        |    AS BIGINT) AS pi
        |  FROM st LEFT JOIN (SELECT tr.j, p1.pi, tr.n_ij, tr.n_i
        |    FROM tr JOIN p1 ON tr.i = p1.s) x ON st.s = x.j
        |  GROUP BY st.s),
        |p3 AS (SELECT st.s, CAST(COALESCE(SUM((pi * n_ij) // n_i), 0)
        |    AS BIGINT) AS pi
        |  FROM st LEFT JOIN (SELECT tr.j, p2.pi, tr.n_ij, tr.n_i
        |    FROM tr JOIN p2 ON tr.i = p2.s) x ON st.s = x.j
        |  GROUP BY st.s)
        |SELECT s AS event_type, pi AS pi_scaled
        |FROM p3 ORDER BY event_type""".stripMargin,
    // identical week/day truncation, exact distinct counts, PPM ratio
    "q_event_stickiness" ->
      """WITH e AS (SELECT date_trunc('week', ts) AS week,
        |    CAST(ts AS DATE) AS d, user_id
        |  FROM events WHERE user_id IS NOT NULL),
        |daily AS (SELECT week, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(SUM(dau) AS BIGINT) AS sum_dau
        |  FROM (SELECT week, d, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |      AS dau FROM e GROUP BY week, d)
        |  GROUP BY week),
        |weekly AS (SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS wau FROM e GROUP BY week)
        |SELECT daily.week, n_days, sum_dau, wau,
        |  sum_dau * 1000000 // (n_days * wau) AS stickiness_ppm
        |FROM daily JOIN weekly ON daily.week = weekly.week
        |ORDER BY daily.week""".stripMargin,
    // identical parity assignment, pooled-variance HUGEINT verdict
    "q_event_abtest" ->
      """WITH u AS (SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS converted
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |arms AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B'
        |      END AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS s
        |  FROM u GROUP BY 1),
        |j AS (SELECT a.n AS n1, a.s AS s1, b.n AS n2, b.s AS s2
        |  FROM (SELECT n, s FROM arms WHERE arm = 'A') a,
        |       (SELECT n, s FROM arms WHERE arm = 'B') b)
        |SELECT n1, s1, n2, s2,
        |  s1 * 1000000 // n1 AS rate_a_ppm,
        |  s2 * 1000000 // n2 AS rate_b_ppm,
        |  (CAST(2500 AS HUGEINT)
        |     * (s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1) * (n1 + n2)
        |   > CAST(9604 AS HUGEINT) * (s1 + s2)
        |     * (n1 + n2 - s1 - s2) * n1 * n2) AS reject
        |FROM j""".stripMargin,
    // identical week truncation, exact cents, floor-div per-user LTV
    "q_event_ltv" ->
      """WITH e AS (SELECT user_id, ts, event_type, value FROM events
        |  WHERE user_id IS NOT NULL),
        |firsts AS (SELECT user_id,
        |    date_trunc('week', MIN(ts)) AS cohort_week
        |  FROM e GROUP BY user_id),
        |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT)
        |    AS n_cohort
        |  FROM firsts GROUP BY cohort_week),
        |rev AS (SELECT user_id, date_trunc('week', ts) AS w,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM e WHERE event_type = 'purchase' AND value IS NOT NULL),
        |byage AS (SELECT f.cohort_week,
        |    date_diff('day', f.cohort_week, r.w) // 7 AS age_week,
        |    CAST(SUM(r.cents) AS BIGINT) AS rev_cents
        |  FROM rev r JOIN firsts f ON r.user_id = f.user_id
        |  GROUP BY 1, 2),
        |cum AS (SELECT cohort_week, age_week, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week
        |      ORDER BY age_week ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM byage)
        |SELECT c.cohort_week, CAST(c.age_week AS BIGINT) AS age_week,
        |  s.n_cohort, c.rev_cents, c.cum_cents,
        |  c.cum_cents // s.n_cohort AS ltv_cents_per_user
        |FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
        |ORDER BY c.cohort_week, c.age_week""".stripMargin,
    // identical censoring rule and t-ordered prefix product
    "q_event_survival" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL),
        |span AS (SELECT user_id, MIN(d) AS f, MAX(d) AS l
        |  FROM ev GROUP BY user_id),
        |mx AS (SELECT MAX(d) AS maxd FROM ev),
        |lt AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
        |    CASE WHEN l < maxd THEN 1 ELSE 0 END AS e
        |  FROM span, mx),
        |grp AS (SELECT t, CAST(SUM(e) AS BIGINT) AS d_churn,
        |    CAST(SUM(1 - e) AS BIGINT) AS c_cens
        |  FROM lt GROUP BY t),
        |rk AS (SELECT t, d_churn, c_cens,
        |    CAST(SUM(d_churn + c_cens) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS BIGINT) AS n_risk,
        |    row_number() OVER (ORDER BY t) AS rn
        |  FROM grp),
        |fl AS (SELECT list(1.0 - CAST(d_churn AS DOUBLE) / n_risk
        |    ORDER BY t) AS fct FROM rk)
        |SELECT t, n_risk, d_churn, c_cens,
        |  round(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |    list_slice(fct, 1, rn)), (a, b) -> a * b), 6) AS s_r6
        |FROM rk, fl
        |ORDER BY t""".stripMargin,
    "q_event_concurrency" ->
      """WITH pts AS (
        |  SELECT ts AS t, CAST(1 AS BIGINT) AS d FROM events
        |  UNION ALL
        |  SELECT ts + INTERVAL 30 MINUTE, CAST(-1 AS BIGINT) FROM events),
        |sw AS (
        |  SELECT t, SUM(d) OVER (ORDER BY t, d) AS c FROM pts)
        |SELECT CAST(t AS DATE) AS day,
        |  CAST(max(c) AS BIGINT) AS peak_concurrency,
        |  count(*) AS n_boundaries
        |FROM sw GROUP BY CAST(t AS DATE)
        |ORDER BY day""".stripMargin,
    // same running-max interval merge on exact epoch seconds
    "q_event_coverage" ->
      """WITH iv AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e
        |  FROM events WHERE user_id IS NOT NULL),
        |m AS (SELECT user_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        |  FROM iv),
        |f AS (SELECT user_id, s, e,
        |    CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END AS ng
        |  FROM m),
        |g AS (SELECT user_id, s, e,
        |    SUM(ng) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM f),
        |isl AS (SELECT user_id, grp, MIN(s) AS gs, MAX(e) AS ge,
        |    COUNT(*) AS nev
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, CAST(SUM(nev) AS BIGINT) AS n_events,
        |  COUNT(*) AS n_intervals,
        |  CAST(SUM(ge - gs) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same one-char sequence (ORDER BY ts, event_id) + RE2 regex over it
    "q_event_cep" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'cv*p')) AS BIGINT)
        |    AS n_matches,
        |  CAST(CASE WHEN regexp_extract(seq, 'cv*p') = '' THEN 0
        |    ELSE strpos(seq, regexp_extract(seq, 'cv*p')) END AS BIGINT)
        |    AS first_pos,
        |  CAST(length(regexp_extract(seq, 'cv*p')) AS BIGINT)
        |    AS first_len
        |FROM s ORDER BY user_id""".stripMargin,
    "q_event_rfm" ->
      """WITH buys AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |pu AS (SELECT user_id, MAX(day) AS last_day,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |  FROM buys GROUP BY user_id),
        |r AS (SELECT *,
        |    date_diff('day', last_day, MAX(last_day) OVER ())
        |      AS recency_days
        |  FROM pu),
        |rk AS (SELECT *,
        |    row_number() OVER (ORDER BY recency_days DESC, user_id)
        |      AS rr,
        |    row_number() OVER (ORDER BY frequency, user_id) AS rf,
        |    row_number() OVER (ORDER BY monetary_cents, user_id)
        |      AS rm,
        |    COUNT(*) OVER () AS nu
        |  FROM r),
        |sc AS (SELECT user_id, recency_days, frequency, monetary_cents,
        |    CAST(1 + (5 * (rr - 1)) // nu AS BIGINT) AS r_score,
        |    CAST(1 + (5 * (rf - 1)) // nu AS BIGINT) AS f_score,
        |    CAST(1 + (5 * (rm - 1)) // nu AS BIGINT) AS m_score
        |  FROM rk)
        |SELECT *,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
        |    WHEN r_score >= 4 THEN 'recent'
        |    WHEN f_score >= 4 THEN 'loyal'
        |    WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
        |    ELSE 'regular' END AS segment
        |FROM sc ORDER BY user_id""".stripMargin,
    "q_event_attribution" ->
      """WITH clicks AS (SELECT user_id, ts AS click_ts,
        |    event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |buys AS (SELECT user_id, ts AS buy_ts, event_id AS buy_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |touched AS (SELECT b.buy_id, b.cents, c.click_ts, c.click_id
        |  FROM buys b JOIN clicks c ON b.user_id = c.user_id
        |  WHERE c.click_ts <= b.buy_ts
        |    AND c.click_ts > b.buy_ts - INTERVAL 24 HOURS),
        |ranked AS (SELECT *,
        |    COUNT(*) OVER (PARTITION BY buy_id) AS n_touch,
        |    row_number() OVER (PARTITION BY buy_id
        |      ORDER BY click_ts DESC, click_id DESC) AS rk
        |  FROM touched)
        |SELECT CAST(click_ts AS DATE) AS day,
        |  COUNT(*) AS n_touches,
        |  COUNT(DISTINCT buy_id) AS n_purchases,
        |  CAST(SUM(cents // n_touch
        |    + CASE WHEN rk = 1 THEN cents % n_touch ELSE 0 END)
        |    AS BIGINT) AS credit_cents
        |FROM ranked GROUP BY day ORDER BY day""".stripMargin,
    "q_event_funnel" ->
      """WITH e AS (SELECT * FROM events WHERE user_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY e.user_id),
        |c AS (SELECT 1 AS step, count(*) AS n FROM s1
        |      UNION ALL SELECT 2, count(*) FROM s2
        |      UNION ALL SELECT 3, count(*) FROM s3)
        |SELECT step, n, CAST(n * 1000000 // (SELECT count(*) FROM s1)
        |    AS BIGINT) AS conv_ppm
        |FROM c ORDER BY step""".stripMargin,
    "q_event_markov" ->
      """WITH s AS (SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events WHERE user_id IS NOT NULL),
        |t AS (SELECT from_type, to_type, count(*) AS cnt
        |      FROM s WHERE to_type IS NOT NULL
        |      GROUP BY from_type, to_type)
        |SELECT from_type, to_type, cnt,
        |  CAST(cnt * 1000000 // (sum(cnt) OVER (PARTITION BY from_type))
        |    AS BIGINT) AS p_ppm
        |FROM t ORDER BY from_type, to_type""".stripMargin,
    // The sketch pass is invisible to the oracle: the exact recount
    // makes the output equal a plain per-day frequency filter.
    "q_event_heavy_users" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |             user_id % 50 AS cohort
        |           FROM events WHERE user_id IS NOT NULL),
        |n AS (SELECT day, count(*) AS n FROM e GROUP BY day),
        |c AS (SELECT day, cohort, count(*) AS cnt
        |      FROM e GROUP BY day, cohort)
        |SELECT c.day, c.cohort, c.cnt, n.n
        |FROM c JOIN n USING (day)
        |WHERE c.cnt * 31 > n.n
        |ORDER BY c.day, c.cnt DESC, c.cohort""".stripMargin,
    "q_retention_cohort" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts))
        |             AS cohort_week
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
        |      FROM events)
        |SELECT cohort_week,
        |  date_diff('day', cohort_week, act_week) // 7 AS week_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_event_paths" ->
      """WITH s AS (SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, count(*) AS n_paths
        |FROM s WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n_paths DESC, step1, step2, step3
        |LIMIT 10""".stripMargin,
    "q_running_distinct" ->
      """WITH f AS (SELECT l_partkey,
        |    date_trunc('month', min(l_shipdate)) AS month
        |  FROM lineitem GROUP BY l_partkey),
        |d AS (SELECT month, count(*) AS new_parts FROM f GROUP BY month)
        |SELECT month, new_parts,
        |  CAST(sum(new_parts) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_parts
        |FROM d ORDER BY month""".stripMargin
  )
}
