package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Window-function battery (SURVEY.md §2-B "Window functions").
  *
  * Every window spec carries a full tiebreak (value, key) so ranking is
  * total — required both for oracle determinism and for sane semantics at
  * scale. Running/moving sums are rounded at the fixed-point precision of
  * the inputs: Spark accumulates linearly while DuckDB uses a segment
  * tree, so raw doubles can differ in the last ulp even on identical rows.
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Top-3 orders per customer (row_number pattern). */
  def qWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank / dense_rank / ntile per brand over part prices. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    p.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  /** lag / lead / first / last across each customer's order history. */
  def qWindowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderkey")).over(wFull).as("first_order"),
        last(col("o_orderkey")).over(wFull).as("last_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Running total + 3-row moving average of daily order volume. */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val daily = o.groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("day_total"),
        count(lit(1)).as("day_n"))
    val w = Window.orderBy(col("day"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = w.rowsBetween(-2, Window.currentRow)
    daily.select(col("day"), col("day_total"),
        round(sum(col("day_total")).over(running), 2).as("running_total"),
        (round(sum(col("day_total")).over(moving), 2)
          / count(lit(1)).over(moving)).as("moving_avg3"))
      .orderBy(col("day"))
  }

  /** RANGE frame: per brand, parts within ±10.0 retail price of each row. */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice"))
      .rangeBetween(-10L, 10L)
    p.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        count(lit(1)).over(w).as("n_close"))
      .orderBy(col("p_brand"), col("p_retailprice"), col("p_partkey"))
  }

  /** TIME-INTERVAL RANGE frame — the rolling-window shape numeric
    * rangeBetween (q_window_range_frame) can't express: each event
    * sees its user's trailing CLOSED 1-hour window [t−1h, t] of
    * activity (count + exact cents). The real-time-analytics
    * primitive (rate limiting, velocity features) as one window —
    * no self-join, no explode; per-user partitions keep frame state
    * local at scale.
    */
  def qWindowTimeRange(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        Exact.e2(col("value")).as("cents"))
      .selectExpr("user_id", "event_id",
        "count(*) OVER (PARTITION BY user_id ORDER BY ts" +
          " RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)" +
          " AS n_1h",
        "sum(cents) OVER (PARTITION BY user_id ORDER BY ts" +
          " RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)" +
          " AS cents_1h")
      .orderBy(col("user_id"), col("event_id"))

  /** nth_value over a full frame + lag with an explicit default — the
    * analytic accessors q_window_lag_lead doesn't cover.
    */
  def qWindowNth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    o.select(col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"),
        nth_value(col("o_orderkey"), 3).over(wFull).as("third_order"),
        lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** IGNORE NULLS analytics — the gap-fill idiom: carry each user's
    * most recent purchase value forward across non-purchase events
    * (last_value IGNORE NULLS), plus the first and second purchase seen
    * so far. Same one-shuffle window shape as the rest of the battery;
    * the NULL-skipping happens inside the frame evaluator, not as an
    * extra pass.
    */
  def qWindowIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchase = when(col("event_type") === "purchase", col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"), col("event_type"),
        last(purchase, ignoreNulls = true).over(w).as("last_purchase"),
        first(purchase, ignoreNulls = true).over(w).as("first_purchase"),
        nth_value(purchase, 2, ignoreNulls = true).over(w)
          .as("second_purchase"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Exact rolling LOWER median of a customer's trailing 7 order totals —
    * a HOLISTIC window aggregate (needs the whole frame, unlike
    * sum/avg's constant state). Formulated explicitly — sort the bounded
    * frame, pick element (n+1) div 2 — so it is pure element selection
    * with zero arithmetic: bit-exact cross-engine on doubles, and the
    * DuckDB twin's `quantile_disc(0.5)` picks the identical element.
    * Frame cost is O(w log w) per row with w bounded by the frame spec
    * (7) — the scale contract for any holistic rolling statistic.
    */
  def qWindowMedian(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-6, 0)
    o.withColumn("__arr", sort_array(collect_list(col("o_totalprice")).over(w)))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("element_at(__arr, int((size(__arr) + 1) div 2))")
          .as("rolling_median"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Batch sessionization by gaps-and-islands — the window-function twin
    * of q_stream_session's `session_window` operator (two idioms, one
    * semantics): a session starts where the gap from the user's previous
    * event exceeds 30 minutes; session id = running count of starts.
    * Gap compare is on exact MICROSECOND integers (unix_micros /
    * epoch_us) — a seconds-truncated or float-epoch compare could split
    * differently at the boundary cross-engine. One shuffle on user_id;
    * both window passes and the final aggregate reuse that partitioning.
    */
  def qWindowSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull
          || col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  val defs: Map[String, Q] = Map(
    "q_window_time_range" -> (qWindowTimeRange(_, _)),
    "q_window_sessionize" -> (qWindowSessionize(_, _)),
    "q_window_median" -> (qWindowMedian(_, _)),
    "q_window_ignore_nulls" -> (qWindowIgnoreNulls(_, _)),
    "q_window_nth" -> (qWindowNth(_, _)),
    "q_window_topk" -> (qWindowTopk(_, _)),
    "q_window_rank" -> (qWindowRank(_, _)),
    "q_window_lag_lead" -> (qWindowLagLead(_, _)),
    "q_window_running" -> (qWindowRunning(_, _)),
    "q_window_range_frame" -> (qWindowRangeFrame(_, _))
  )

  val oracles: Map[String, String] = Map(
    // identical closed [t−1h, t] RANGE frame semantics
    "q_window_time_range" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS sess_id
        |  FROM m)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events, round(SUM(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    "q_window_median" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  quantile_disc(o_totalprice, 0.5) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // CAST(ts AS TIMESTAMP) truncates DuckDB's nanos to Spark's micros
    // so the window order matches; (ts, event_id) is a total order.
    "q_window_ignore_nulls" ->
      """SELECT user_id, event_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER w AS last_purchase,
        |  first_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER w AS first_purchase,
        |  nth_value(CASE WHEN event_type = 'purchase' THEN value END, 2
        |    IGNORE NULLS) OVER w AS second_purchase
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  nth_value(o_orderkey, 2) OVER wf AS second_order,
        |  nth_value(o_orderkey, 3) OVER wf AS third_order,
        |  lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand
        |  ORDER BY p_retailprice DESC, p_partkey)
        |ORDER BY p_brand, rnk, p_partkey""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_running" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    round(SUM(o_totalprice), 2) AS day_total, COUNT(*) AS day_n
        |  FROM orders GROUP BY 1)
        |SELECT day, day_total,
        |  round(SUM(day_total) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total,
        |  round(SUM(day_total) OVER (ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
        |  / COUNT(*) OVER (ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
        |FROM daily ORDER BY day""".stripMargin,
    "q_window_range_frame" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |    RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING) AS n_close
        |FROM part ORDER BY p_brand, p_retailprice, p_partkey""".stripMargin
  )
}
