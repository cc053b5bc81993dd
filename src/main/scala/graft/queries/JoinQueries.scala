package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.AsOf
import Exact._

/** Join battery (SURVEY.md §2-B "Joins"). Dimension joins broadcast
  * explicitly — at 100 TB the fact side never shuffles for a dim join;
  * the only shuffling joins here are fact-to-fact (orders⋈lineitem) and
  * the as-of timeline union.
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fact → 3 broadcast dims: revenue per region. */
  def qJoinRegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val su = Tables.supplier(spark, dir)
    val na = Tables.nation(spark, dir)
    val re = Tables.region(spark, dir)
    li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
      .groupBy(re("r_name").as("region_name"))
      .agg(
        (sum(e2(col("l_extendedprice")) * (lit(100L) - e2(col("l_discount"))))
          / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("region_name"))
  }

  /** Left outer: every customer, with order count / spend (null-safe). */
  def qJoinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey").as("custkey"))
      .agg(count(o("o_orderkey")).as("n_orders"),
        round(sum(o("o_totalprice")), 2).as("sum_spend"))
      .orderBy(col("custkey"))
  }

  /** Right outer: orders → customer with the fact side on the LEFT — every
    * customer survives even with zero orders (the mirror of qJoinLeftOuter,
    * exercising Spark's RightOuter join type; same null-safe aggregation).
    */
  def qJoinRightOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
      .groupBy(c("c_custkey").as("custkey"))
      .agg(count(o("o_orderkey")).as("n_orders"),
        round(max(o("o_totalprice")), 2).as("max_spend"))
      .orderBy(col("custkey"))
  }

  /** Full outer over per-side aggregates: nations seen from the customer
    * vs supplier side.
    */
  def qJoinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.withColumnRenamed("nk", "nk_c")
      .join(s.withColumnRenamed("nk", "nk_s"),
        col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Left semi: customers having at least one big order (EXISTS). */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left anti: customers with no high-value order (NOT EXISTS). */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 450000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Cross join (small × small): region × order status. */
  def qJoinCross(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).select(col("r_name"))
    val s = Tables.orders(spark, dir).select(col("o_orderstatus")).distinct()
    r.crossJoin(s).orderBy(col("r_name"), col("o_orderstatus"))
  }

  /** Non-equi (range) join against literal price buckets: broadcast
    * nested loop on a tiny build side — the documented perf cliff; the
    * scalable alternative for monotone buckets is `width_bucket`-style
    * arithmetic (see SQL twin comment).
    */
  def qJoinRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = Seq(
      (0L, 150000L), (150000L, 300000L), (300000L, 450000L),
      (450000L, 600000L))
      .toDF("lo", "hi")
    val o = Tables.orders(spark, dir)
    o.join(broadcast(buckets),
        o("o_totalprice") >= buckets("lo") && o("o_totalprice") < buckets("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("lo"))
  }

  /** Salted join (skew shape): same results as a plain equi-join — the
    * oracle IS the plain join — but executed with the left side salted
    * into 8 sub-keys and the right side replicated per salt, the shape
    * for pathological hot keys AQE's skew split can't fix. Salt never
    * escapes the operator, so results are salt- and partitioning-
    * independent (the determinism sweep covers this query too).
    */
  def qJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    graft.ops.Joins.saltedJoin(o, c, "custkey", buckets = 8)
      .groupBy(col("custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_spend"))
      .orderBy(col("custkey"))
  }

  /** Scalable twin of qJoinRange: assign the price bucket ARITHMETICALLY
    * (integer cents div width — O(1) per row, exact in both engines),
    * then aggregate and broadcast-join the bucket dimension for labels.
    * Same result set as the theta join, no nested loop anywhere.
    */
  def qJoinRangeBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = Seq(
      (0L, 0L, 150000L), (1L, 150000L, 300000L), (2L, 300000L, 450000L),
      (3L, 450000L, 600000L)).toDF("bucket", "lo", "hi")
    val o = Tables.orders(spark, dir)
      .withColumn("bucket",
        expr("cast(round(o_totalprice * 100, 0) as bigint) div 15000000"))
    o.join(broadcast(buckets), "bucket")
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("lo"))
  }

  /** As-of join: latest order (per user key) at or before each event's
    * timestamp — union-timeline implementation (graft.ops.AsOf), verified
    * against DuckDB's native ASOF JOIN.
    */
  def qJoinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
    AsOf.asOfJoin(ev, right,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = Seq("asof_orderkey"))
      .filter(col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"), col("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  /** POINT-IN-TIME multi-feature enrichment — the feature-store
    * correctness pattern (no leakage: every event sees exactly the
    * feature version valid AT its timestamp, never a later one): two
    * slowly-changing feature histories derived deterministically from
    * customer — segment (v2 'SEG_V2' for custkey%3==0 effective
    * Jan 16) and balance cents (first valid Jan 5 — so the first four
    * days of events legitimately carry NULL — +10000 for custkey%4==0
    * effective Jan 20) — CHAINED through two as-of joins onto the
    * event stream, then summarized per (type, segment).
    *
    * Scale shape: each AsOf.asOfJoin is the union-timeline form — ONE
    * shuffle on the key + a per-partition sort, never a range join;
    * chaining features = chaining one-shuffle passes (and at 100 TB
    * both chains partition on the same user key, so AQE/exchange reuse
    * keeps the second pass cheap).
    */
  def qJoinAsofFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment"),
        Exact.e2(col("c_acctbal")).as("bal0"))
    def t(s: String) = lit(s).cast("timestamp")
    val seg = cust.select(col("k"), t("2024-01-01 00:00:00").as("vt"),
        col("c_mktsegment").as("segment"))
      .unionByName(cust.filter(col("k") % 3 === 0)
        .select(col("k"), t("2024-01-16 00:00:00").as("vt"),
          lit("SEG_V2").as("segment")))
    val bal = cust.select(col("k"), t("2024-01-05 00:00:00").as("vt"),
        col("bal0").as("bal"))
      .unionByName(cust.filter(col("k") % 4 === 0)
        .select(col("k"), t("2024-01-20 00:00:00").as("vt"),
          (col("bal0") + 10000L).as("bal")))
    val e1 = graft.ops.AsOf.asOfJoin(ev, seg, "user_id", "k",
      "ts", "vt", Seq("segment"))
    val e2 = graft.ops.AsOf.asOfJoin(e1, bal, "user_id", "k",
      "ts", "vt", Seq("bal"))
    e2.groupBy(col("event_type"), col("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("bal").isNotNull, 1L).otherwise(0L))
          .as("n_with_bal"),
        sum(col("bal")).as("bal_cents_sum"))
      .orderBy(col("event_type"), col("segment"))
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other — the join SQL's `=` silently drops. Both sides
    * aggregate to bucket counts first (the idiomatic pre-join reduce),
    * with bucket 7 mapped to NULL on each side so the null↔null match
    * is load-bearing in the output.
    */
  def qJoinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.orders(spark, dir)
      .select(nullif(col("o_custkey") % 50, lit(7)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_orders"))
    val r = Tables.customer(spark, dir)
      .select(nullif(col("c_custkey") % 50, lit(7)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_customers"))
    l.as("l").join(r.as("r"), col("l.bucket") <=> col("r.bucket"))
      .select(col("l.bucket").as("bucket"), col("n_orders"),
        col("n_customers"))
      .orderBy(col("bucket").asc_nulls_first)
  }

  /** GRID-BUCKETED SPATIAL JOIN: all point pairs within a radius, via
    * the canonical distributed pattern — assign each point to a
    * radius-sized grid cell, explode one side to its 3×3 neighborhood,
    * equi-join on the cell, verify the true distance on candidates
    * only. Never an all-pairs product: at 100 TB the work is
    * |points| × 9 candidate rows against local cell populations, and
    * each qualifying pair is produced exactly once (the left point's
    * nine DISTINCT neighbor cells meet the right point's single home
    * cell at most once; cell size = radius makes adjacency sufficient).
    *
    * Geometry is integer micro-degrees under an equirectangular
    * projection: the cos(37°) ≈ 0.79 longitude shrink is folded into
    * the projected coordinate ONCE (·79 div 100, exact integer), so
    * the same metric drives both the grid and the verify — keeping the
    * adjacency proof valid. Coordinates here are synthesized
    * deterministically per customer (md5 % box) into a ~11 km city
    * box; the oracle replays the derivation and checks the exact
    * integer distances all-pairs.
    */
  def qJoinSpatial(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = 2000L // micro-degrees ≈ 222 m; cell size = r
    def h(prefix: String) =
      conv(substring(md5(concat(lit(prefix),
        $"c_custkey".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100000L
    val pts = Tables.customer(spark, dir).select(
      $"c_custkey".as("id"),
      (lit(37000000L) + h("lat:")).as("lat"),
      expr("(57900000 + CAST(conv(substring(md5(concat('lon:', " +
        "CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) " +
        "% 100000) * 79 div 100").as("lon_s"))
      .withColumn("cx", expr(s"lat div $r"))
      .withColumn("cy", expr(s"lon_s div $r"))
    val a = pts.select($"id".as("id_a"), $"lat".as("lat_a"),
        $"lon_s".as("lon_a"),
        explode(expr(
          """flatten(transform(sequence(-1, 1), dx ->
            |  transform(sequence(-1, 1), dy ->
            |    struct(cx + dx AS jx, cy + dy AS jy))))""".stripMargin))
          .as("n"))
      .select($"id_a", $"lat_a", $"lon_a",
        $"n.jx".as("cx"), $"n.jy".as("cy"))
    val b = pts.select($"id".as("id_b"), $"lat".as("lat_b"),
      $"lon_s".as("lon_b"), $"cx", $"cy")
    a.join(b, Seq("cx", "cy"))
      .filter($"id_a" < $"id_b")
      .withColumn("d2",
        ($"lat_a" - $"lat_b") * ($"lat_a" - $"lat_b") +
          ($"lon_a" - $"lon_b") * ($"lon_a" - $"lon_b"))
      .filter($"d2" <= lit(r * r))
      .select($"id_a", $"id_b", $"d2")
      .orderBy($"id_a", $"id_b")
  }

  /** CO-LOCATED BUCKETED JOIN — the zero-shuffle fact join: both
    * tables are written `bucketBy(8, custkey)` + sorted, so the
    * sort-merge join reads bucket i against bucket i with NO exchange
    * on either side (PlanSpec asserts it). This is the prepared-layout
    * pattern for a fact table joined on the same key every day at
    * 100 TB: pay the bucketed write once, skip the join shuffle
    * forever after; the merge hint pins SMJ so the demonstration
    * doesn't silently degrade to broadcast at fixture scale.
    *
    * The bucketed layout is a FIXTURE, not per-query work: it
    * materializes once per (session, source dir) via
    * [[BucketedFixture.ensure]] — the prepared-layout analogy holds
    * only if preparing it isn't repeated — so registry construction
    * after the first is job-free (PlanSpec asserts it with the same
    * sentinel as q_dedup_ngram_jaccard), runs no DROPs, and leaks no
    * temp dirs (one JVM-lifetime scratch root, fixed per-dir paths,
    * VERDICT r8 finding #5).
    */
  def qJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BucketedFixture.ensure(spark, dir)
    val bo = spark.table("g_bkt_orders")
    val bc = spark.table("g_bkt_cust").hint("merge")
    bo.join(bc, bo("o_custkey") === bc("c_custkey"))
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum($"cents").as("revenue_cents"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** Once-per-(session, dir) materialization of the bucketed join
    * fixture: both sides written `bucketBy(8, custkey)` + sorted into a
    * single JVM-lifetime scratch root. Re-entry with the same dir is a
    * no-op (no write jobs, no DROP/recreate, no new temp dir); a dir
    * switch (tests at sf0.001, Verify at sf0.01) rebuilds under the
    * dir's own path. */
  private[queries] object BucketedFixture {
    import scala.collection.mutable
    private val current = mutable.Map.empty[String, String] // app → dir
    private lazy val root =
      java.nio.file.Files.createTempDirectory("bucketed").toString

    def ensure(spark: SparkSession, dir: String): Unit = synchronized {
      import spark.implicits._
      val app = spark.sparkContext.applicationId
      if (!current.get(app).contains(dir)) {
        val tag = java.lang.Integer.toHexString(dir.hashCode)
        spark.sql("DROP TABLE IF EXISTS g_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS g_bkt_cust")
        Tables.orders(spark, dir)
          .select($"o_orderkey", $"o_custkey", e2($"o_totalprice")
            .as("cents"))
          .write.mode("overwrite").option("path", s"$root/o_$tag")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable("g_bkt_orders")
        Tables.customer(spark, dir)
          .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
          .write.mode("overwrite").option("path", s"$root/c_$tag")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable("g_bkt_cust")
        current(app) = dir
      }
    }
  }

  val defs: Map[String, Q] = Map(
    "q_join_bucketed" -> (qJoinBucketed(_, _)),
    "q_join_spatial" -> (qJoinSpatial(_, _)),
    "q_join_null_safe" -> (qJoinNullSafe(_, _)),
    "q_join_region_revenue" -> (qJoinRegionRevenue(_, _)),
    "q_join_left_outer" -> (qJoinLeftOuter(_, _)),
    "q_join_right_outer" -> (qJoinRightOuter(_, _)),
    "q_join_full_outer" -> (qJoinFullOuter(_, _)),
    "q_join_semi" -> (qJoinSemi(_, _)),
    "q_join_anti" -> (qJoinAnti(_, _)),
    "q_join_cross" -> (qJoinCross(_, _)),
    "q_join_range" -> (qJoinRange(_, _)),
    "q_join_range_bucketed" -> (qJoinRangeBucketed(_, _)),
    "q_join_salted" -> (qJoinSalted(_, _)),
    "q_join_asof" -> (qJoinAsof(_, _)),
    "q_join_asof_features" -> (qJoinAsofFeatures(_, _)),
    "q_join_asof_native" -> (qJoinAsofNative(_, _))
  )

  /** The SAME as-of query through the custom physical operator
    * (graft.plans.SortMergeAsOfJoinExec — logical node + strategy +
    * exec): one co-partitioned shuffle+sort per side, single-pass
    * merge with O(1) state. Shares q_join_asof's DuckDB ASOF JOIN
    * twin — the custom operator is held to the identical oracle.
    */
  def qJoinAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = Tables.orders(spark, dir)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
    AsOf.asOfJoinNative(ev, right,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .filter(col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"), col("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    // the bucketed layout is an execution strategy, not semantics —
    // the twin is the plain join+aggregate
    "q_join_bucketed" ->
      """SELECT c.c_nationkey, c.c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS revenue_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey, c.c_mktsegment
        |ORDER BY c.c_nationkey, c.c_mktsegment""".stripMargin,
    // all-pairs replay of the same md5-derived coordinates + exact
    // integer distances (the engine's grid is a candidate pruning, not
    // a semantics change — result sets must be identical)
    "q_join_spatial" ->
      """WITH p AS (SELECT c_custkey AS id,
        |    37000000 + CAST(list_sum(list_transform(
        |      generate_series(1, 8), d ->
        |        CAST(strpos('0123456789abcdef', substring(
        |          md5('lat:' || CAST(c_custkey AS VARCHAR)), d, 1)) - 1
        |          AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) % 100000 AS lat,
        |    (57900000 + CAST(list_sum(list_transform(
        |      generate_series(1, 8), d ->
        |        CAST(strpos('0123456789abcdef', substring(
        |          md5('lon:' || CAST(c_custkey AS VARCHAR)), d, 1)) - 1
        |          AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) % 100000) * 79 // 100 AS lon_s
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon_s - b.lon_s) * (a.lon_s - b.lon_s) AS d2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon_s - b.lon_s) * (a.lon_s - b.lon_s) <= 4000000
        |ORDER BY id_a, id_b""".stripMargin,
    "q_join_null_safe" ->
      """WITH l AS (SELECT nullif(o_custkey % 50, 7) AS bucket,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY bucket),
        |r AS (SELECT nullif(c_custkey % 50, 7) AS bucket,
        |    count(*) AS n_customers
        |  FROM customer GROUP BY bucket)
        |SELECT l.bucket, n_orders, n_customers
        |FROM l JOIN r ON l.bucket IS NOT DISTINCT FROM r.bucket
        |ORDER BY l.bucket ASC NULLS FIRST""".stripMargin,
    "q_join_region_revenue" ->
      """SELECT r_name AS region_name,
        |  CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY region_name""".stripMargin,
    "q_join_left_outer" ->
      """SELECT c_custkey AS custkey, COUNT(o_orderkey) AS n_orders,
        |  round(SUM(o_totalprice), 2) AS sum_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY custkey""".stripMargin,
    "q_join_right_outer" ->
      """SELECT c_custkey AS custkey, COUNT(o_orderkey) AS n_orders,
        |  round(MAX(o_totalprice), 2) AS max_spend
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY custkey""".stripMargin,
    "q_join_full_outer" ->
      """WITH c AS (SELECT c_nationkey nk, COUNT(*) n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey nk, COUNT(*) n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q_join_range" ->
      """SELECT lo, hi, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |JOIN (VALUES (CAST(0 AS BIGINT), CAST(150000 AS BIGINT)),
        |             (150000, 300000), (300000, 450000),
        |             (450000, 600000)) AS b(lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY lo, hi ORDER BY lo""".stripMargin,
    // oracle = the PLAIN join: salting must be invisible in results
    "q_join_salted" ->
      """SELECT o_custkey AS custkey, c_name, COUNT(*) AS n_orders,
        |  round(SUM(o_totalprice), 2) AS sum_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY custkey, c_name ORDER BY custkey""".stripMargin,
    "q_join_range_bucketed" ->
      """SELECT lo, hi, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS sum_price
        |FROM (SELECT o_totalprice,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) // 15000000
        |          AS bucket
        |      FROM orders)
        |JOIN (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(150000 AS BIGINT)),
        |             (1, 150000, 300000), (2, 300000, 450000),
        |             (3, 450000, 600000)) AS b(bucket, lo, hi) USING (bucket)
        |GROUP BY lo, hi ORDER BY lo""".stripMargin,
    // identical twin: the custom physical operator must reproduce the
    // compositional operator's oracle bit-for-bit
    "q_join_asof_native" ->
      """WITH r AS (SELECT o_custkey, o_orderdate,
        |             MAX(o_orderkey) AS asof_orderkey
        |           FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, r.asof_orderkey
        |FROM events e ASOF JOIN r
        |  ON e.user_id = r.o_custkey AND CAST(e.ts AS TIMESTAMP) >= r.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    // two chained DuckDB native ASOF JOINs — the leakage-free PIT twin
    "q_join_asof_features" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type
        |  FROM events),
        |cust AS (
        |  SELECT c_custkey AS k, c_mktsegment,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal0
        |  FROM customer),
        |seg AS (
        |  SELECT k, TIMESTAMP '2024-01-01 00:00:00' AS vt,
        |    c_mktsegment AS segment
        |  FROM cust
        |  UNION ALL
        |  SELECT k, TIMESTAMP '2024-01-16 00:00:00', 'SEG_V2'
        |  FROM cust WHERE k % 3 = 0),
        |bal AS (
        |  SELECT k, TIMESTAMP '2024-01-05 00:00:00' AS vt, bal0 AS bal
        |  FROM cust
        |  UNION ALL
        |  SELECT k, TIMESTAMP '2024-01-20 00:00:00', bal0 + 10000
        |  FROM cust WHERE k % 4 = 0),
        |e1 AS (
        |  SELECT ev.event_id, ev.user_id, ev.ts, ev.event_type,
        |    seg.segment
        |  FROM ev ASOF LEFT JOIN seg
        |    ON ev.user_id = seg.k AND ev.ts >= seg.vt),
        |e2 AS (
        |  SELECT e1.*, bal.bal
        |  FROM e1 ASOF LEFT JOIN bal
        |    ON e1.user_id = bal.k AND e1.ts >= bal.vt)
        |SELECT event_type, segment, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN bal IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_with_bal,
        |  CAST(SUM(bal) AS BIGINT) AS bal_cents_sum
        |FROM e2 GROUP BY event_type, segment
        |ORDER BY event_type, segment""".stripMargin,
    "q_join_asof" ->
      """WITH r AS (SELECT o_custkey, o_orderdate,
        |             MAX(o_orderkey) AS asof_orderkey
        |           FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, r.asof_orderkey
        |FROM events e ASOF JOIN r
        |  ON e.user_id = r.o_custkey AND CAST(e.ts AS TIMESTAMP) >= r.o_orderdate
        |ORDER BY e.event_id""".stripMargin
  )
}
