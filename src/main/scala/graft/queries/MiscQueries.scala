package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{LakeIO, Tables}

/** Sort/limit and control-plane-analog queries. */
object MiscQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Global top-k: Catalyst plans TakeOrderedAndProject — no full sort,
    * each partition keeps k rows, driver merges. The only sane global-sort
    * shape at 100 TB.
    */
  def qSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Multi-key sort with explicit null ordering (nulls manufactured via
    * NULLIF since the fixtures are null-free).
    */
  def qSortNulls(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        col("o_orderpriority"))
      .groupBy(col("status_or_null"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status_or_null").desc_nulls_last,
        col("o_orderpriority").asc_nulls_first)

  /** Extension-dispatch ingest (reference semantics: type = lower-cased
    * filename extension, /root/reference/app/routes.py:116-117) — reads
    * through LakeIO.readAuto and must agree with the direct table scan.
    */
  def qIngestDispatch(spark: SparkSession, dir: String): DataFrame =
    LakeIO.readAuto(spark, s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Lake listing (name/size over the sf dir) — A13 semantics with the
    * tenant prefix filter applied. NOT registered as a query: the live
    * sf dir's file sizes are generation-dependent, so no static oracle
    * exists (it sat permanently `no_oracle` in the gate). The operator
    * stays covered two ways: LakeIOSpec exercises the live path (local
    * FS + s3a mock, prefix filter), and q_lake_listing_pinned runs the
    * SAME distributed listing over a deterministic fixture set with a
    * hard VALUES oracle.
    */
  def qLakeListing(spark: SparkSession, dir: String): DataFrame =
    LakeIO.listing(spark, dir)
      .select(col("name"), col("size"))
      .orderBy(col("name"))

  /** The SAME distributed listing path over a deterministic fixture
    * set, WITH the tenant prefix filter the reference commented out
    * (`minio_client.py:52`) actually exercised — names and sizes are
    * pure functions of the fixture bytes, so this variant carries a
    * hard VALUES oracle where the live-dir q_lake_listing (driver-
    * generated parquet, unknowable sizes) can only be rows-only.
    */
  def qLakeListingPinned(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("lake-pin")
    CustomQueries.mediaFixtureSet.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    LakeIO.listing(spark, scratch.toString, prefix = "img")
      .select(col("name"), col("size"))
      .orderBy(col("name"))
  }

  /** ORC round-trip: documents → ORC sink → ORC scan (both through
    * LakeIO's extension dispatch) → projection. Puts the SECOND columnar
    * format under the hash gate end-to-end: every value — including the
    * full text payload, certified by an md5 computed AFTER the round
    * trip — must survive parquet → ORC → scan bit-exactly. The write is
    * an eager bounded job at construction (a round-trip IS a job — the
    * same construction contract as the streaming queries). Scale shape:
    * format conversion is one map-only pass, no shuffle; the ORC scan
    * has the same pushdown/pruning contract as the parquet scans.
    */
  def qSourceOrc(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_source_orc")
    LakeIO.writeAuto(Tables.documents(spark, dir), s"$tmp/docs.orc")
    LakeIO.readAuto(spark, s"$tmp/docs.orc")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /** FOOTER-ONLY ROW COUNTING — the metadata-path proof: row counts
    * come from parquet footers alone (ParquetFileReader over the
    * file listing — the same driver-side metadata class as
    * Skipping's sidecar and Compaction's manifest; zero data pages
    * read), and the oracle certifies they equal the actual scan
    * count. At 100 TB this is the difference between a catalog
    * stats refresh that takes seconds and one that re-reads the
    * lake. Footers are read sequentially here (file count bounded);
    * a million-file table distributes the listing exactly as
    * LakeIO.listing does.
    */
  def qLakeFooterCount(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val counts = files.map { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
      try (r.getRowGroups.size.toLong, r.getRecordCount)
      finally r.close()
    }
    import spark.implicits._
    Seq((files.size.toLong, counts.map(_._1).sum, counts.map(_._2).sum))
      .toDF("n_files", "n_row_groups", "n_rows_footer")
      .crossJoin(Tables.documents(spark, dir)
        .agg(count(lit(1)).as("n_rows_scan")))
      .select(col("n_files"), col("n_row_groups"),
        col("n_rows_footer"), col("n_rows_scan"),
        (col("n_rows_footer") === col("n_rows_scan")).as("consistent"))
  }

  /** DYNAMIC PARTITION PRUNING demo — the scale feature that makes
    * star joins against partitioned facts affordable: the fact is
    * written partitioned by event_type (run-time write, the
    * q_source_orc discipline), the dim side arrives as a FILE-backed
    * table (a literal IN-list would constant-fold — no DPP), and the
    * selective dim filter prunes fact partitions AT RUNTIME through
    * the join. PlanSpec asserts the `dynamicpruning` subquery on the
    * fact scan; the oracle certifies the join result.
    */
  def qJoinDpp(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_join_dpp")
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      // one file per event_type directory (repartition by the
      // partition column before a partitionBy write, guide §8)
      .repartition(col("event_type"))
      .write.partitionBy("event_type").parquet(s"$tmp/fact")
    import spark.implicits._
    Seq(("click", 1), ("purchase", 1), ("view", 0), ("error", 0),
      ("signup", 0)).toDF("event_type", "keep")
      .coalesce(1).write.parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").filter(col("keep") === 1)
    fact.join(dim, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Exact.e2(col("value"))).as("cents"))
      .orderBy(col("event_type"))
  }

  /** CSV QUOTING FIDELITY round trip — the ingest trap every CSV
    * pipeline hits once: payloads carrying the delimiter, the quote
    * character, AND embedded newlines must survive write→read intact
    * (RFC 4180 quoting + multiLine read). The tricky payload is
    * constructed deterministically from customer names; the oracle
    * reconstructs it directly — the CSV round trip itself is the
    * operator under test, and md5 pins byte fidelity. Note multiLine
    * reads are NOT splittable (a file parses as one unit) — the lake
    * convention is quoted-newline CSVs stay small or become parquet
    * at the front door; documented here because at 100 TB that
    * difference is the whole game.
    */
  def qSourceCsvQuotes(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_csv_quotes")
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        concat(col("c_name"), lit(", \"quoted\"\nline2: ;|\t end"))
          .as("payload"))
      .write.option("quoteAll", "true").option("header", "true")
      .csv(s"$tmp/t")
    spark.read
      .schema("c_custkey LONG, payload STRING")
      .option("header", "true").option("multiLine", "true")
      .csv(s"$tmp/t")
      .select(col("c_custkey"),
        length(col("payload")).cast("long").as("len"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("c_custkey"))
  }

  /** SCHEMA EVOLUTION round trip — the lake's additive-column reality:
    * batch 1 lands (key, price), batch 2 lands (key, price, status);
    * a `mergeSchema` read must surface the union schema with NULLs
    * where history predates the column (the Parquet schema-merge
    * contract every table format builds on). The oracle replays the
    * batch rule from the source table. Same run-time-write discipline
    * as q_source_orc (the write IS the operator under test).
    */
  def qLakeSchemaMerge(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_lake_schevo")
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("append").parquet(s"$tmp/t")
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .write.mode("append").parquet(s"$tmp/t")
    spark.read.option("mergeSchema", "true").parquet(s"$tmp/t")
      .select(col("o_orderkey"),
        graft.queries.Exact.e2(col("o_totalprice")).as("cents"),
        col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** Per-column data-quality profile of an ingested table — the
    * admission check an ETL service runs on every upload (ops.Profile).
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.exactProfile(Tables.documents(spark, dir),
      Seq("doc_id", "lang", "source", "n_chars"))

  /** Per-group z-score outlier detection with EXACT moments: mean and
    * variance derived from integer-cents sums (s1, s2 — exact in both
    * engines: Spark sums s2 in decimal(38,0), DuckDB in HUGEINT), so
    * the z threshold compares bit-identical doubles and the outlier
    * counts can't flip at the boundary. Two passes over a (flag, cents)
    * projection; group stats broadcast back.
    */
  def qStatZscore(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        Exact.e2(col("l_extendedprice")).as("c"))
    val stats = li.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      .withColumn("mean_c", col("s1").cast("double") / col("n"))
      .withColumn("std_c", sqrt(col("s2").cast("double") / col("n") -
        col("mean_c") * col("mean_c")))
      .select(col("flag"), col("mean_c"), col("std_c"))
    li.join(broadcast(stats), "flag")
      .withColumn("z",
        (col("c").cast("double") - col("mean_c")) / col("std_c"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy(col("flag"))
  }

  /** Welch's two-sample t-test between every pair of event types —
    * the A/B-readout statistic over a metric column. All moments are
    * integer cent power sums (Exact.scala), so the final t / degrees
    * of freedom are one identical double expression on both engines,
    * rounded to 6 decimals. One aggregate over events + a 5×5 self
    * cross of the 1-row-per-type stats frame (broadcast, trivially
    * small at any corpus scale).
    */
  def qStatTtest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), Exact.e2(col("value")).as("c"))
      .filter(col("c").isNotNull)
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      .withColumn("m", col("s1").cast("double") / col("n"))
      // unbiased sample variance from integer sums
      .withColumn("v",
        (col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("n"))
          / (col("n") - 1))
      .select(col("event_type"), col("n"), col("m"), col("v"))
    val a = stats.select(col("event_type").as("type_a"),
      col("n").as("na"), col("m").as("ma"), col("v").as("va"))
    val b = stats.select(col("event_type").as("type_b"),
      col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .withColumn("se2", col("va") / col("na") + col("vb") / col("nb"))
      .select(col("type_a"), col("type_b"),
        round((col("ma") - col("mb")) / sqrt(col("se2")), 6).as("t_stat"),
        // Welch–Satterthwaite degrees of freedom
        round(col("se2") * col("se2") /
          (col("va") * col("va") / (col("na") * col("na")
              * (col("na") - 1))
            + col("vb") * col("vb") / (col("nb") * col("nb")
              * (col("nb") - 1))), 6).as("df"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** PSI drift monitor: value distribution per event type, first half
    * of January (reference) vs second half (current) — the snapshot
    * pair every production drift check compares. Integer-cent bins
    * from the reference range; see Profile.psiDrift.
    */
  def qProfileDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"),
        Exact.e2(col("value")).as("cents"))
    val split = lit("2024-01-16").cast("timestamp")
    graft.ops.Profile.psiDrift(
      ev.filter(col("ts") < split), ev.filter(col("ts") >= split),
      "event_type", "cents")
  }

  /** Funnel conversion over the event stream: users who clicked; users
    * whose first purchase follows their first click; users with repeat
    * (≥2) post-click purchases. Three counts from two small aggregates —
    * the per-user reductions are the only passes over events.
    */
  def qFunnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
    val postClickPurchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
      .join(firstClick, "user_id")
      .filter(col("pts") >= col("first_click"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_p"))
    firstClick.agg(count(lit(1)).as("n_users"))
      .select(lit("1_clicked").as("step"), col("n_users"))
      .unionAll(postClickPurchases.agg(count(lit(1)).as("n_users"))
        .select(lit("2_purchased_after_click").as("step"), col("n_users")))
      .unionAll(postClickPurchases.filter(col("n_p") >= 2)
        .agg(count(lit(1)).as("n_users"))
        .select(lit("3_repeat_purchaser").as("step"), col("n_users")))
      .orderBy(col("step"))
  }

  /** Shuffle-key skew diagnosis on the lineitem supplier key: top-10
    * heaviest keys + skew ratio vs the mean (ops.Profile.keySkew) — the
    * report that decides between a plain join, AQE skew handling, and
    * an explicit salted join.
    */
  def qProfileSkew(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.keySkew(Tables.lineitem(spark, dir), "l_suppkey",
      k = 10)

  /** Z-order (Morton) clustering key over (custkey, orderkey) low bits —
    * verifies the bit-interleave arithmetic the clusterByZ layout pass
    * sorts by (ops.ZOrder).
    */
  def qLakeZorder(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        (col("o_custkey") % 256).as("x"),
        (col("o_orderkey") % 256).as("y"))
      .withColumn("z", graft.ops.ZOrder.morton2(col("x"), col("y"), 8))
      .orderBy(col("z"), col("o_orderkey"))
      .limit(100)

  /** Quarantine ingest: every 13th event's JSON props deterministically
    * corrupted (malformed PREFIX — Spark's Jackson tolerates trailing
    * garbage after a complete value, DuckDB's json_valid doesn't, so
    * prefix corruption is the cross-engine-unambiguous form), parsed
    * against the schema with the bad-records flag, then good/bad
    * accounting per event type in one shuffle. Repartition after the
    * scan — events is a single row group, and per-row JSON parsing on
    * one task serializes the map side (the q_func_json lesson).
    */
  def qIngestQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).repartition(col("event_id"))
      .withColumn("p", when(col("event_id") % 13 === 0,
        concat(lit("{"), col("props"))).otherwise(col("props")))
    LakeIO.parseWithQuarantine(ev, "p",
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(!col("_quarantined"), 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_quarantined"), 1L).otherwise(0L)).as("n_bad"),
        sum(when(!col("_quarantined"), col("parsed.k"))).as("k_sum"))
      .orderBy(col("event_type"))
  }

  /** Batch MERGE (SCD-1 upsert): a deterministic changes batch — every
    * 5th order mutated (status 'U', price bumped by an exact +1.0),
    * every 97th re-keyed as an insert — applied onto the orders
    * snapshot via one full-outer join (ops.Merge).
    */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
    val mods = base.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val inserts = base.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    graft.ops.Merge.upsert(base, mods.unionByName(inserts), "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /** SCD type-2 merge: customer snapshot (plus a pre-closed history
    * version for every 11th key) receives a changes batch — every 6th
    * key's segment actually changes (→ close + new version), every
    * 3rd-but-not-6th key arrives identical (→ no-op), every 10th key
    * re-keyed as a fresh insert.
    */
  private def scd2Table(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val current = cust
      .withColumn("valid_from", lit("2024-01-01").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val closedOld = cust.filter(col("c_custkey") % 11 === 0)
      .withColumn("c_mktsegment", lit("OLD"))
      .withColumn("valid_from", lit("2023-01-01").cast("timestamp"))
      .withColumn("valid_to", lit("2024-01-01").cast("timestamp"))
    val updates = cust.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 6 === 0, lit("SEG_V2"))
          .otherwise(col("c_mktsegment")))
      .unionByName(cust.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(500000L))
        .withColumn("c_mktsegment", lit("NEW")))
      .withColumn("eff", lit("2024-06-01").cast("timestamp"))
    graft.ops.Merge
      .scd2(current.unionByName(closedOld), updates, "c_custkey", "eff")
  }

  def qMergeScd2(spark: SparkSession, dir: String): DataFrame =
    scd2Table(spark, dir)
      .orderBy(col("c_custkey"), col("valid_from"))

  /** POINT-IN-TIME read over the SCD2 dimension: state AS OF an
    * instant t = rows with valid_from ≤ t < valid_to (open intervals
    * count). Probed at two instants whose answers are ANALYTIC — as of
    * 2023-06-01 only the closed 'OLD' history rows were live, and as
    * of 2024-03-15 the dimension must reconstruct the original
    * customer table exactly (the June updates not yet effective) — so
    * the oracle is the clean expectation, not a pipeline replay: any
    * interval-bookkeeping bug in the MERGE surfaces as a diff.
    */
  def qMergeScd2Asof(spark: SparkSession, dir: String): DataFrame = {
    val t = scd2Table(spark, dir)
    def asOf(ts: String) = t
      .filter(col("valid_from") <= lit(ts).cast("timestamp") &&
        (col("valid_to").isNull ||
          col("valid_to") > lit(ts).cast("timestamp")))
      .select(lit(ts).as("as_of"), col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal"))
    asOf("2023-06-01").unionByName(asOf("2024-03-15"))
      .orderBy(col("as_of"), col("c_custkey"))
  }

  /** Snapshot diff (batch CDC): orders vs a next version with every
    * 7th key deleted, every surviving 5th key's priority mutated, and
    * every 101st key re-keyed as an insert.
    */
  def qCdcDiff(spark: SparkSession, dir: String): DataFrame = {
    val prev = Tables.orders(spark, dir)
    val next = prev.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 5 === 0, lit("X-DIFF"))
          .otherwise(col("o_orderpriority")))
      .unionByName(prev.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(20000000L)))
    graft.ops.Merge.snapshotDiff(prev, next, "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /** Out-of-order CDC log compaction: a synthetic debezium-style log
    * derived deterministically from orders (insert all, update every
    * 3rd key at seq 2, delete every 5th at seq 3), applied by SEQUENCE
    * — the union's arrival order is deliberately shuffled away.
    */
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val ins = o.select(col("o_orderkey").as("k"), lit(1L).as("seq"),
      lit("I").as("op"), col("o_totalprice").as("price"))
    val upd = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), lit(2L).as("seq"),
        lit("U").as("op"), (col("o_totalprice") + 10.0).as("price"))
    val del = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), lit(3L).as("seq"),
        lit("D").as("op"), lit(null).cast("double").as("price"))
    graft.ops.Merge.cdcApply(ins.unionByName(upd).unionByName(del),
        "k", "seq", "op")
      .orderBy(col("k"))
  }

  /** Time travel over the versioned-publish lake layer
    * (LakeIO.writeVersioned — Delta-style snapshot isolation from
    * directories + one atomic rename): v1 = the orders snapshot,
    * v2 = the q_merge_upsert changes applied; BOTH versions then read
    * back BY PIN and summarized. The point under the hash gate: a
    * published version is immutable — v1's numbers survive v2's
    * publish untouched. Publishes are eager bounded jobs at
    * construction (a publish IS a job — the streaming-query
    * construction contract).
    */
  /** PARQUET CODEC roundtrip fidelity — the codec-selection check an
    * ETL service runs before flipping a table's compression default:
    * the same projection written under gzip / none / snappy / zstd
    * (all bundled with Spark) and read back, each certified against
    * the direct scan by exact integer content fingerprints (row
    * count, total cents, and an order-independent SUM of the portable
    * 32-bit key hash — n·2³² bounded, BIGINT-exact). Four identical
    * output rows = four lossless roundtrips; the oracle computes the
    * expected fingerprint once from the source table and fans it
    * across the codec labels, so any codec-induced corruption or row
    * loss hash-fails.
    *
    * Scale: each write/read is one map-side pass over a 2-column
    * projection; fingerprints are single aggregates. Codec choice at
    * 100 TB is a scan-speed/size tradeoff — this query is the
    * correctness gate in front of that tuning, not the tuning itself.
    */
  def qLakeCodecs(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_lake_codecs")
    val src = Tables.orders(spark, dir).select(col("o_orderkey"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val frames = Seq("gzip", "none", "snappy", "zstd").map { c =>
      val path = s"$tmp/$c"
      src.write.mode("overwrite").option("compression", c).parquet(path)
      spark.read.parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("sum_cents"),
          sum(expr("cast(conv(substring(" +
            "md5(cast(o_orderkey as string)), 1, 8), 16, 10)" +
            " as bigint)")).as("key_hashsum"))
        .select(lit(c).as("codec"), col("n_rows"), col("sum_cents"),
          col("key_hashsum"))
    }
    frames.reduce(_ unionByName _).orderBy(col("codec"))
  }

  def qLakeTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_lake_time_travel")
    val table = s"$tmp/orders_t"
    val base = Tables.orders(spark, dir)
    LakeIO.writeVersioned(base, table)
    val mods = base.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val inserts = base.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    LakeIO.writeVersioned(
      graft.ops.Merge.upsert(base, mods.unionByName(inserts),
        "o_orderkey"), table)
    Seq(1, 2).map { v =>
      LakeIO.readVersion(spark, table, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(Exact.e2(col("o_totalprice"))).as("sum_price_cents"))
        .select(lit(v.toLong).as("version"), col("n_rows"),
          col("sum_price_cents"))
    }.reduce(_ unionByName _)
      .orderBy(col("version"))
  }

  /** SNAPSHOT DIFF (change data feed) between two published versions
    * of a versioned lake table — the "what changed between v1 and v2"
    * query every lakehouse CDC consumer runs: v2 is an
    * upsert+insert+delete evolution of v1 (updates = +1.00 on every
    * 5th order, inserts = every 97th re-keyed, deletes = every 101st
    * key), both published through [[graft.io.LakeIO.writeVersioned]]'s
    * atomic-rename snapshots, then the diff READS THE VERSIONS BACK —
    * the lake path, not the in-memory frames — and classifies each key
    * via one full-outer join on exact cents. Unchanged rows emit
    * nothing.
    *
    * Scale: the diff is one co-partitioned full-outer equi-join of two
    * snapshots carrying (key, cents) — at 100 TB both sides prune to
    * key+compared columns at the scan, and a partition-bucketed layout
    * makes it exchange-free (q_join_bucketed's pattern).
    */
  def qLakeSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.streaming.StreamOps.scratchDir("q_lake_snapshot_diff")
    val table = s"$tmp/orders_t"
    val base = Tables.orders(spark, dir)
    LakeIO.writeVersioned(base, table)
    val mods = base.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val inserts = base.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    LakeIO.writeVersioned(
      graft.ops.Merge.upsert(base, mods.unionByName(inserts),
          "o_orderkey")
        .filter(col("o_orderkey") % 101 =!= 0), table)
    def snap(v: Int, kc: String, cc: String) =
      LakeIO.readVersion(spark, table, Some(v))
        .select(col("o_orderkey").as(kc),
          Exact.e2(col("o_totalprice")).as(cc))
    snap(1, "k1", "old_cents")
      .join(snap(2, "k2", "new_cents"),
        col("k1") === col("k2"), "full_outer")
      .withColumn("change",
        when(col("k2").isNull, "delete")
          .when(col("k1").isNull, "insert")
          .when(col("old_cents") =!= col("new_cents"), "update"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("k1"), col("k2")).as("o_orderkey"),
        col("change"), col("old_cents"), col("new_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** INCREMENTAL MATERIALIZED-VIEW REFRESH ([[graft.ops.Merge.refreshAgg]]
    * — Gupta & Mumick's delta rules for distributive aggregates): the
    * per-customer (n_orders, sum_cents) view is STORED (written to
    * parquet and read back — the MV is a table, not a plan), then a CDC
    * batch (delete every 13th order, +1.00 reprice every remaining 7th,
    * insert a +0.50 copy of every 11th) is folded in WITHOUT rescanning
    * the base table: one aggregation over the signed delta rows + one
    * keyed outer merge into the stored view, groups reaching count 0
    * vanish. The oracle is the FULL RECOMPUTE over the evolved table —
    * hash-equality here is precisely the view-maintenance correctness
    * theorem, checked on every customer.
    *
    * Scale: refresh cost is O(delta) + O(view); the 100 TB base table
    * would never be read. All arithmetic in exact integer cents, so the
    * incremental and recomputed paths agree bit-for-bit in both engines.
    */
  def qCdcMvRefresh(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        Exact.e2(col("o_totalprice")).as("cents"))
    val tmp = graft.streaming.StreamOps.scratchDir("q_cdc_mv_refresh")
    o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .write.mode("overwrite").parquet(s"$tmp/mv")
    val stored = spark.read.parquet(s"$tmp/mv")
    val dels = o.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_custkey"), lit(-1L).as("dn"),
        (-col("cents")).as("dc"))
    val upds = o.filter(col("o_orderkey") % 13 =!= 0 &&
        col("o_orderkey") % 7 === 0)
      .select(col("o_custkey"), lit(0L).as("dn"), lit(100L).as("dc"))
    val ins = o.filter(col("o_orderkey") % 11 === 0)
      .select(col("o_custkey"), lit(1L).as("dn"),
        (col("cents") + lit(50L)).as("dc"))
    graft.ops.Merge.refreshAgg(stored,
        dels.unionByName(upds).unionByName(ins),
        "o_custkey", "n_orders", "dn", Seq(("sum_cents", "dc")))
      .orderBy(col("o_custkey"))
  }

  /** DATA-SKIPPING LOOKUPS over a zone-map + Bloom indexed lake layout
    * ([[graft.io.Skipping]]): orders clustered into `o_orderkey div 2048`
    * bucket directories with a per-bucket sidecar of (min, max, 16380-bit
    * Bloom over o_custkey). Three probes run THROUGH the pruned read
    * path — a key-range lookup (zone-map prune), a present point lookup
    * on the non-clustered customer column (Bloom prune), and an ABSENT
    * point lookup (Bloom prunes everything except deterministic false
    * positives). Each row carries the pruning decision itself
    * (buckets_scanned vs buckets_total) next to the exact answer, and
    * the DuckDB twin replays the bucket stats AND the Bloom construction
    * position-by-position — the oracle certifies that pruning is sound
    * (answers equal the full scan's) and that the index arithmetic is
    * engine-portable, not just that some rows came back.
    *
    * Scale: the sidecar is one row per bucket (KBs at any layout size),
    * the prune is a driver-side metadata read, and the scan touches only
    * surviving buckets — a point lookup on a 100 TB table reads one or
    * two bucket directories instead of the table. The layout is a
    * FIXTURE (once per session+dir, q_join_bucketed's pattern): the
    * clustered write is paid once, every later lookup is metadata + a
    * pruned scan.
    */
  def qLakeSkipping(spark: SparkSession, dir: String): DataFrame = {
    SkipFixture.ensure(spark, dir)
    val table = SkipFixture.path(dir)
    def probe(name: String, t: Long, s: Long, rows: DataFrame) =
      rows.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(Exact.e2(col("o_totalprice"))), lit(0L))
            .as("sum_cents"))
        .select(lit(name).as("probe"), lit(t).as("buckets_total"),
          lit(s).as("buckets_scanned"), col("n_rows"), col("sum_cents"))
    val (t1, s1, r1) =
      graft.io.Skipping.lookupRange(spark, table, "o_orderkey", 3000L, 3499L)
    val (t2, s2, r2) =
      graft.io.Skipping.lookupPoint(spark, table, "o_custkey", 42L)
    val (t3, s3, r3) =
      graft.io.Skipping.lookupPoint(spark, table, "o_custkey", 10000019L)
    probe("point_cust_42", t2, s2, r2)
      .unionByName(probe("point_cust_absent", t3, s3, r3))
      .unionByName(probe("range_key_3000_3499", t1, s1, r1))
      .orderBy(col("probe"))
  }

  /** Once-per-(session, dir) skipping-index layout over orders
    * (key/bloom/price columns only — the lookup's read schema), under a
    * JVM-lifetime scratch root: re-entry with the same dir runs no jobs
    * (the BucketedFixture discipline, VERDICT r8 finding #5). */
  private[queries] object SkipFixture {
    import scala.collection.mutable
    private val built = mutable.Map.empty[String, Set[String]] // app → dirs
    private lazy val root =
      java.nio.file.Files.createTempDirectory("skipidx").toString

    def path(dir: String): String =
      s"$root/orders_${java.lang.Integer.toHexString(dir.hashCode)}"

    def ensure(spark: SparkSession, dir: String): Unit = synchronized {
      val app = spark.sparkContext.applicationId
      if (!built.getOrElse(app, Set.empty).contains(dir)) {
        graft.io.Skipping.writeIndexed(
          Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice")),
          path(dir), "o_orderkey", "o_custkey", 2048L)
        built(app) = built.getOrElse(app, Set.empty) + dir
      }
    }
  }

  /** Z-ORDER BOX LOOKUPS over a Morton-clustered lake layout
    * ([[graft.io.ZOrder]]): orders clustered on the interleaved bits of
    * (price cents, order-day index) into 16 rectangle buckets, each with
    * a TWO-dimension zone-map sidecar. Three probes run THROUGH the
    * pruned read path — a genuine 2-D box (price band × calendar year),
    * a thin price slice over all days, and a thin day slice over all
    * prices: the last two are exactly the probes a single-key clustered
    * layout can only half-serve, and BOTH prune here because every
    * bucket is a rectangle. Each row carries the pruning decision
    * (buckets_scanned vs buckets_total) next to the exact answer; the
    * DuckDB twin replays the quantization, the closed-form interleaved
    * bucket id, the per-bucket stats, and the survivor arithmetic — the
    * oracle certifies the pruning is sound AND the Morton layout math is
    * engine-portable.
    *
    * Scale: sidecar is one row per rectangle (driver-side metadata
    * read); a selective box on a 100 TB table reads the overlapping
    * rectangles' directories only. Layout is a once-per-(session, dir)
    * fixture (the SkipFixture discipline).
    */
  def qLakeZbox(spark: SparkSession, dir: String): DataFrame = {
    ZFixture.ensure(spark, dir)
    val table = ZFixture.path(dir)
    def probe(name: String, t: Long, s: Long, rows: DataFrame) =
      rows.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("o_cents")), lit(0L)).as("sum_cents"))
        .select(lit(name).as("probe"), lit(t).as("buckets_total"),
          lit(s).as("buckets_scanned"), col("n_rows"), col("sum_cents"))
    val (t1, s1, r1) = graft.io.ZIndex.boxLookup(spark, table,
      "o_cents", "o_day", 10000000L, 19999999L, 365L, 729L)
    val (t2, s2, r2) = graft.io.ZIndex.boxLookup(spark, table,
      "o_cents", "o_day", 45000000L, 49999999L, 0L, 100000L)
    val (t3, s3, r3) = graft.io.ZIndex.boxLookup(spark, table,
      "o_cents", "o_day", 0L, 1000000000L, 1200L, 1229L)
    probe("box_price_day", t1, s1, r1)
      .unionByName(probe("slice_day_thin", t3, s3, r3))
      .unionByName(probe("slice_price_thin", t2, s2, r2))
      .orderBy(col("probe"))
  }

  /** Once-per-(session, dir) Z-order layout over orders (key, exact
    * price cents, day index), SkipFixture's discipline. */
  private[queries] object ZFixture {
    import scala.collection.mutable
    private val built = mutable.Map.empty[String, Set[String]] // app → dirs
    private lazy val root =
      java.nio.file.Files.createTempDirectory("zorderidx").toString

    def path(dir: String): String =
      s"$root/orders_${java.lang.Integer.toHexString(dir.hashCode)}"

    def ensure(spark: SparkSession, dir: String): Unit = synchronized {
      val app = spark.sparkContext.applicationId
      if (!built.getOrElse(app, Set.empty).contains(dir)) {
        graft.io.ZIndex.writeZOrdered(
          Tables.orders(spark, dir)
            .select(col("o_orderkey"),
              Exact.e2(col("o_totalprice")).as("o_cents"),
              datediff(to_date(col("o_orderdate")),
                lit("1995-01-01").cast("date")).cast("long").as("o_day")),
          path(dir), "o_cents", "o_day", 50000000L, 2500L)
        built(app) = built.getOrElse(app, Set.empty) + dir
      }
    }
  }

  /** Inclusion-dependency (FK-discovery) profile over the star schema:
    * three true FK edges plus one deliberately-partial pair
    * (part.p_size ⊆? nation keys) whose containment is fractional.
    */
  def qProfileInclusion(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    graft.ops.Profile.inclusion("lineitem.partkey->part.partkey",
        li, "l_partkey", Tables.part(spark, dir), "p_partkey")
      .unionByName(graft.ops.Profile.inclusion(
        "lineitem.suppkey->supplier.suppkey",
        li, "l_suppkey", Tables.supplier(spark, dir), "s_suppkey"))
      .unionByName(graft.ops.Profile.inclusion(
        "orders.custkey->customer.custkey",
        o, "o_custkey", Tables.customer(spark, dir), "c_custkey"))
      .unionByName(graft.ops.Profile.inclusion(
        "part.size->nation.nationkey",
        Tables.part(spark, dir), "p_size",
        Tables.nation(spark, dir), "n_nationkey"))
      .orderBy(col("pair"))
  }

  /** COMPACTION PLAN over a synthetic micro-batch manifest: one
    * "file" per (event_type, day) partition with its payload bytes —
    * the small-file population a month of 5-type streaming ingest
    * leaves behind — packed into 64 KiB rewrite bins by
    * [[graft.io.Compaction.plan]] (streaming next-fit on the
    * size-descending manifest; see that scaladoc for the overflow
    * bound and the 100 TB manifest argument). The REAL-directory
    * variant (`Compaction.planDirectory`, driver-side FS listing) is
    * exercised by CompactionSpec; this query pins the planner's
    * arithmetic against the oracle on an engine-independent manifest.
    */
  def qLakeCompaction(spark: SparkSession, dir: String): DataFrame = {
    val manifest = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(length(col("props")).cast("long")) + lit(64L)
        * count(lit(1))).as("len"))
    graft.io.Compaction.plan(manifest, Seq("event_type", "day"), "len",
      target = 65536L)
  }

  /** CLUSTERING-DEPTH METRIC (the Delta-Lake OPTIMIZE / Iceberg
    * table-maintenance statistic): how many file zone-map intervals
    * overlap any point of the probe column — the number that predicts
    * data-skipping effectiveness BEFORE running a query. Two simulated
    * 2000-row-file layouts of the same orders rows: `ingest` (files
    * cut by arrival key — each file spans nearly the whole price
    * range, so a point lookup must open ~every file) vs `clustered`
    * (files cut by price rank — near-disjoint ranges, depth ~1). Per
    * layout: per-file min/max of price cents, then the interval sweep
    * — starts (+1) and ends (−1) ordered by (value, kind) with depth
    * read at start events — max and mean depth over files.
    *
    * Scale: row→file assignment rides [[graft.ops.Prefix.denseRank]]
    * (distributed two-pass rank — no corpus-sized window), and the
    * sweep rides [[graft.ops.Prefix.runningSumInclusive]] over the
    * FILE-count-sized event list (metadata-sized at any data scale,
    * 2·F rows); nothing is ever all-pairs, unlike the naive
    * files×boundaries depth join.
    */
  def qLakeClusterDepth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        Exact.e2(col("o_totalprice")).as("c"))
    def depthOf(name: String, order: Seq[org.apache.spark.sql.Column])
        : DataFrame = {
      val files = graft.ops.Prefix.denseRank(o, order, "rn")
        .withColumn("fid", expr("(rn - 1) div 2000"))
        .groupBy(col("fid"))
        .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
      depthSweep(files).select(lit(name).as("layout"), col("n_files"),
        col("max_depth"), col("sum_depth"), col("avg_depth_r6"))
    }
    depthOf("ingest", Seq(col("o_orderkey")))
      .unionByName(depthOf("clustered", Seq(col("c"), col("o_orderkey"))))
      .orderBy(col("layout"))
  }

  /** Interval-overlap depth sweep over a (fid, lo, hi) zone-map frame
    * — see [[qLakeClusterDepth]]. Depth is read at start events, so a
    * file whose lo equals another's hi overlaps it (closed
    * intervals). */
  private[queries] def depthSweep(files: DataFrame): DataFrame = {
    val ev = files.select(col("fid"), col("lo").as("v"),
        lit(0L).as("kind"), lit(1L).as("delta"))
      .unionByName(files.select(col("fid"), col("hi").as("v"),
        lit(1L).as("kind"), lit(-1L).as("delta")))
    graft.ops.Prefix.runningSumInclusive(ev,
        Seq(col("v"), col("kind"), col("fid")), col("delta"), "depth")
      .filter(col("kind") === 0L)
      .agg(count(lit(1)).as("n_files"),
        max(col("depth")).as("max_depth"),
        sum(col("depth")).as("sum_depth"))
      .select(col("n_files"), col("max_depth"), col("sum_depth"),
        round(col("sum_depth").cast("double") / col("n_files"), 6)
          .as("avg_depth_r6"))
  }

  val defs: Map[String, Q] = Map(
    "q_lake_cluster_depth" -> (qLakeClusterDepth(_, _)),
    "q_lake_compaction" -> (qLakeCompaction(_, _)),
    "q_lake_schema_merge" -> (qLakeSchemaMerge(_, _)),
    "q_source_csv_quotes" -> (qSourceCsvQuotes(_, _)),
    "q_lake_footer_count" -> (qLakeFooterCount(_, _)),
    "q_join_dpp" -> (qJoinDpp(_, _)),
    "q_cdc_apply" -> (qCdcApply(_, _)),
    "q_profile_inclusion" -> (qProfileInclusion(_, _)),
    "q_merge_scd2" -> (qMergeScd2(_, _)),
    "q_merge_scd2_asof" -> (qMergeScd2Asof(_, _)),
    "q_cdc_diff" -> (qCdcDiff(_, _)),
    "q_stat_zscore" -> (qStatZscore(_, _)),
    "q_stat_ttest" -> (qStatTtest(_, _)),
    "q_profile_drift" -> (qProfileDrift(_, _)),
    "q_funnel_conversion" -> (qFunnelConversion(_, _)),
    "q_profile_skew" -> (qProfileSkew(_, _)),
    "q_lake_zorder" -> (qLakeZorder(_, _)),
    "q_ingest_quarantine" -> (qIngestQuarantine(_, _)),
    "q_merge_upsert" -> (qMergeUpsert(_, _)),
    "q_profile" -> (qProfile(_, _)),
    "q_sort_limit" -> (qSortLimit(_, _)),
    "q_sort_nulls" -> (qSortNulls(_, _)),
    "q_ingest_dispatch" -> (qIngestDispatch(_, _)),
    "q_source_orc" -> (qSourceOrc(_, _)),
    "q_lake_time_travel" -> (qLakeTimeTravel(_, _)),
    "q_lake_codecs" -> (qLakeCodecs(_, _)),
    "q_lake_snapshot_diff" -> (qLakeSnapshotDiff(_, _)),
    "q_lake_skipping" -> (qLakeSkipping(_, _)),
    "q_lake_zbox" -> (qLakeZbox(_, _)),
    "q_cdc_mv_refresh" -> (qCdcMvRefresh(_, _)),
    "q_lake_listing_pinned" -> (qLakeListingPinned(_, _))
  )

  private val zExprSql = (0 until 8).map(b =>
    s"(((x >> $b) & 1) * ${1L << (2 * b)} + " +
      s"((y >> $b) & 1) * ${1L << (2 * b + 1)})").mkString(" + ")

  val oracles: Map[String, String] = Map(
    // identical size-desc next-fit: bin = (inclusive running sum −
    // own size) // target, then per-bin windows
    // layouts replayed as rank windows; the sweep as one running sum
    "q_lake_cluster_depth" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
        |  FROM orders),
        |l AS (
        |  SELECT 'ingest' AS layout,
        |    (row_number() OVER (ORDER BY o_orderkey) - 1) // 2000
        |      AS fid, c
        |  FROM o
        |  UNION ALL
        |  SELECT 'clustered',
        |    (row_number() OVER (ORDER BY c, o_orderkey) - 1) // 2000, c
        |  FROM o),
        |f AS (SELECT layout, fid, CAST(MIN(c) AS BIGINT) AS lo,
        |    CAST(MAX(c) AS BIGINT) AS hi
        |  FROM l GROUP BY 1, 2),
        |ev AS (SELECT layout, fid, lo AS v, 0 AS kind, 1 AS delta
        |  FROM f
        |  UNION ALL
        |  SELECT layout, fid, hi, 1, -1 FROM f),
        |d AS (SELECT layout, kind,
        |    CAST(SUM(delta) OVER (PARTITION BY layout
        |      ORDER BY v, kind, fid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS depth
        |  FROM ev)
        |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(MAX(depth) AS BIGINT) AS max_depth,
        |  CAST(SUM(depth) AS BIGINT) AS sum_depth,
        |  round(CAST(SUM(depth) AS DOUBLE) / count(*), 6)
        |    AS avg_depth_r6
        |FROM d WHERE kind = 0 GROUP BY layout
        |ORDER BY layout""".stripMargin,
    "q_lake_compaction" ->
      """WITH mf AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(length(props)) + 64 * count(*) AS BIGINT)
        |      AS size_bytes
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, day, size_bytes,
        |    CAST((SUM(size_bytes) OVER (ORDER BY size_bytes DESC,
        |        event_type, day) - size_bytes) // 65536 AS BIGINT)
        |      AS bin
        |  FROM mf)
        |SELECT event_type, day, size_bytes, bin,
        |  COUNT(*) OVER (PARTITION BY bin) AS bin_files,
        |  CAST(SUM(size_bytes) OVER (PARTITION BY bin) AS BIGINT)
        |    AS bin_bytes
        |FROM rt
        |ORDER BY bin, size_bytes DESC, event_type, day""".stripMargin,
    // replay quantization → closed-form interleaved bucket → per-bucket
    // 2-D zone maps → survivor count per probe; answers from the exact
    // predicate (pruning soundness: pruned scan == full filter)
    "q_lake_zbox" ->
      """WITH base AS (
        |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      AS d
        |  FROM orders),
        |q AS (
        |  SELECT c, d,
        |    least(c * 4096 // 50000000, 4095) AS xq,
        |    least(d * 4096 // 2500, 4095) AS yq
        |  FROM base),
        |b AS (
        |  SELECT c, d,
        |    8 * ((yq >> 11) & 1) + 4 * ((xq >> 11) & 1)
        |      + 2 * ((yq >> 10) & 1) + ((xq >> 10) & 1) AS bk
        |  FROM q),
        |st AS (
        |  SELECT bk, min(c) AS x_min, max(c) AS x_max,
        |    min(d) AS y_min, max(d) AS y_max
        |  FROM b GROUP BY bk),
        |probes(probe, xlo, xhi, ylo, yhi) AS (VALUES
        |  ('box_price_day', 10000000, 19999999, 365, 729),
        |  ('slice_price_thin', 45000000, 49999999, 0, 100000),
        |  ('slice_day_thin', 0, 1000000000, 1200, 1229)),
        |pruned AS (
        |  SELECT p.probe,
        |    (SELECT count(*) FROM st) AS buckets_total,
        |    (SELECT count(*) FROM st
        |     WHERE st.x_max >= p.xlo AND st.x_min <= p.xhi
        |       AND st.y_max >= p.ylo AND st.y_min <= p.yhi)
        |      AS buckets_scanned,
        |    (SELECT count(*) FROM b
        |     WHERE b.c >= p.xlo AND b.c <= p.xhi
        |       AND b.d >= p.ylo AND b.d <= p.yhi) AS n_rows,
        |    (SELECT COALESCE(CAST(sum(b.c) AS BIGINT), 0) FROM b
        |     WHERE b.c >= p.xlo AND b.c <= p.xhi
        |       AND b.d >= p.ylo AND b.d <= p.yhi) AS sum_cents
        |  FROM probes p)
        |SELECT probe, buckets_total, buckets_scanned, n_rows, sum_cents
        |FROM pruned ORDER BY probe""".stripMargin,
    // footer metadata must agree with the actual scan
    "q_lake_footer_count" ->
      """SELECT CAST(1 AS BIGINT) AS n_files,
        |  CAST(1 AS BIGINT) AS n_row_groups,
        |  CAST(count(*) AS BIGINT) AS n_rows_footer,
        |  CAST(count(*) AS BIGINT) AS n_rows_scan,
        |  TRUE AS consistent
        |FROM documents""".stripMargin,
    // the dim filter replayed as a literal predicate
    "q_join_dpp" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events
        |WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // the payload reconstructed directly — the CSV round trip is the
    // operator under test; md5 pins byte fidelity through quoting
    "q_source_csv_quotes" ->
      """SELECT c_custkey,
        |  CAST(length(c_name || ', "quoted"' || chr(10)
        |    || 'line2: ;|' || chr(9) || ' end') AS BIGINT) AS len,
        |  md5(c_name || ', "quoted"' || chr(10)
        |    || 'line2: ;|' || chr(9) || ' end') AS payload_md5
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    // the batch rule replayed: odd keys carry status, even keys NULL
    "q_lake_schema_merge" ->
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |  CASE WHEN o_orderkey % 2 <> 0 THEN o_orderstatus
        |       ELSE NULL END AS o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // full recompute over the evolved table == the incremental refresh
    "q_cdc_mv_refresh" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |ev AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN cents + 100
        |         ELSE cents END AS cents
        |  FROM c WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_custkey, cents + 50 FROM c WHERE o_orderkey % 11 = 0)
        |SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM ev GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q_lake_skipping" -> {
      // 60-bit md5-prefix pair replay (h1 = hex chars 1-15, h2 = chars
      // 17-31 forced odd) — identical arithmetic to Skipping.writeIndexed
      // and Skipping.probePositions; positions land in a SET per bucket,
      // which is bit-for-bit the packed bitset's membership relation.
      def hexVal(src: String, off: Int) =
        s"""CAST(list_sum(list_transform(generate_series(1, 15),
           |      dd -> CAST(strpos('0123456789abcdef',
           |          substring(md5($src), $off + dd, 1)) - 1 AS BIGINT)
           |        * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT)"""
          .stripMargin
      s"""WITH b AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice,
         |    o_orderkey // 2048 AS bucket FROM orders),
         |mm AS (
         |  SELECT bucket, min(o_orderkey) AS mn, max(o_orderkey) AS mx
         |  FROM b GROUP BY bucket),
         |hv AS (
         |  SELECT DISTINCT bucket, CAST(o_custkey AS VARCHAR) AS g
         |  FROM b),
         |hh AS (SELECT bucket, ${hexVal("g", 0)} AS h1,
         |         ${hexVal("g", 16)} | 1 AS h2 FROM hv),
         |pos AS (
         |  SELECT DISTINCT bucket, (h1 + i * h2) % 16380 AS p
         |  FROM hh, (SELECT unnest(generate_series(0, 1)) AS i)),
         |pr AS (
         |  SELECT v, (h1 + i * h2) % 16380 AS p, i
         |  FROM (SELECT v, ${hexVal("v", 0)} AS h1,
         |          ${hexVal("v", 16)} | 1 AS h2
         |        FROM (VALUES ('42'), ('10000019')) AS t(v)),
         |       (SELECT unnest(generate_series(0, 1)) AS i)),
         |hitb AS (
         |  SELECT pr.v, pos.bucket
         |  FROM pr JOIN pos ON pos.p = pr.p
         |  GROUP BY pr.v, pos.bucket
         |  HAVING count(DISTINCT pr.i) = 2)
         |SELECT 'point_cust_42' AS probe,
         |  (SELECT count(*) FROM mm) AS buckets_total,
         |  (SELECT count(*) FROM hitb WHERE v = '42') AS buckets_scanned,
         |  count(*) AS n_rows,
         |  CAST(COALESCE(sum(CAST(round(o_totalprice * 100, 0)
         |    AS BIGINT)), 0) AS BIGINT) AS sum_cents
         |FROM orders WHERE o_custkey = 42
         |UNION ALL
         |SELECT 'point_cust_absent',
         |  (SELECT count(*) FROM mm),
         |  (SELECT count(*) FROM hitb WHERE v = '10000019'),
         |  count(*),
         |  CAST(COALESCE(sum(CAST(round(o_totalprice * 100, 0)
         |    AS BIGINT)), 0) AS BIGINT)
         |FROM orders WHERE o_custkey = 10000019
         |UNION ALL
         |SELECT 'range_key_3000_3499',
         |  (SELECT count(*) FROM mm),
         |  (SELECT count(*) FROM mm WHERE mx >= 3000 AND mn <= 3499),
         |  count(*),
         |  CAST(COALESCE(sum(CAST(round(o_totalprice * 100, 0)
         |    AS BIGINT)), 0) AS BIGINT)
         |FROM orders WHERE o_orderkey BETWEEN 3000 AND 3499
         |ORDER BY probe""".stripMargin
    },
    // the analytic expectation, not a pipeline replay — see scaladoc
    "q_merge_scd2_asof" ->
      """SELECT * FROM (
        |  SELECT '2023-06-01' AS as_of, c_custkey,
        |    'OLD' AS c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 11 = 0
        |  UNION ALL
        |  SELECT '2024-03-15', c_custkey, c_mktsegment, c_acctbal
        |  FROM customer)
        |ORDER BY as_of, c_custkey""".stripMargin,
    "q_merge_scd2" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    TIMESTAMP '2024-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer),
        |closedhist AS (
        |  SELECT c_custkey, 'OLD' AS c_mktsegment, c_acctbal,
        |    TIMESTAMP '2023-01-01' AS valid_from,
        |    TIMESTAMP '2024-01-01' AS valid_to
        |  FROM customer WHERE c_custkey % 11 = 0),
        |upd AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 6 = 0 THEN 'SEG_V2'
        |         ELSE c_mktsegment END AS c_mktsegment,
        |    c_acctbal, TIMESTAMP '2024-06-01' AS eff
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 500000, 'NEW', c_acctbal,
        |    TIMESTAMP '2024-06-01'
        |  FROM customer WHERE c_custkey % 10 = 0),
        |j AS (
        |  SELECT c.c_custkey AS bk, c.c_mktsegment AS bs,
        |    c.c_acctbal AS bb, c.valid_from AS bvf,
        |    u.c_custkey AS uk, u.c_mktsegment AS us,
        |    u.c_acctbal AS ub, u.eff
        |  FROM cur c FULL OUTER JOIN upd u ON c.c_custkey = u.c_custkey),
        |emitted AS (
        |  SELECT bk AS c_custkey, bs AS c_mktsegment, bb AS c_acctbal,
        |    bvf AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM j WHERE uk IS NULL
        |    OR (bk IS NOT NULL AND us IS NOT DISTINCT FROM bs
        |        AND ub IS NOT DISTINCT FROM bb)
        |  UNION ALL
        |  SELECT bk, bs, bb, bvf, eff
        |  FROM j WHERE bk IS NOT NULL AND uk IS NOT NULL
        |    AND (us IS DISTINCT FROM bs OR ub IS DISTINCT FROM bb)
        |  UNION ALL
        |  SELECT uk, us, ub, eff, CAST(NULL AS TIMESTAMP)
        |  FROM j WHERE uk IS NOT NULL
        |    AND (bk IS NULL OR us IS DISTINCT FROM bs
        |         OR ub IS DISTINCT FROM bb))
        |SELECT * FROM emitted
        |UNION ALL SELECT * FROM closedhist
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
        |    o_totalprice AS price FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', o_totalprice + 10.0
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', NULL
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |r AS (SELECT k, op, price,
        |    row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM log)
        |SELECT k, price FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY k""".stripMargin,
    "q_profile_inclusion" ->
      """WITH
        |p1 AS (SELECT count(*) AS nc, count(*) FILTER (m) AS nm FROM (
        |  SELECT a.v, EXISTS (SELECT 1 FROM part WHERE p_partkey = a.v)
        |    AS m
        |  FROM (SELECT DISTINCT l_partkey AS v FROM lineitem
        |        WHERE l_partkey IS NOT NULL) a)),
        |p2 AS (SELECT count(*) AS nc, count(*) FILTER (m) AS nm FROM (
        |  SELECT a.v, EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = a.v)
        |    AS m
        |  FROM (SELECT DISTINCT l_suppkey AS v FROM lineitem
        |        WHERE l_suppkey IS NOT NULL) a)),
        |p3 AS (SELECT count(*) AS nc, count(*) FILTER (m) AS nm FROM (
        |  SELECT a.v, EXISTS (SELECT 1 FROM customer WHERE c_custkey = a.v)
        |    AS m
        |  FROM (SELECT DISTINCT o_custkey AS v FROM orders
        |        WHERE o_custkey IS NOT NULL) a)),
        |p4 AS (SELECT count(*) AS nc, count(*) FILTER (m) AS nm FROM (
        |  SELECT a.v, EXISTS (SELECT 1 FROM nation WHERE n_nationkey = a.v)
        |    AS m
        |  FROM (SELECT DISTINCT p_size AS v FROM part
        |        WHERE p_size IS NOT NULL) a))
        |SELECT pair, n_child_distinct, n_matched,
        |  n_matched * 1000000 // n_child_distinct AS containment_ppm
        |FROM (
        |  SELECT 'lineitem.partkey->part.partkey' AS pair,
        |    nc AS n_child_distinct, nm AS n_matched FROM p1
        |  UNION ALL SELECT 'lineitem.suppkey->supplier.suppkey', nc, nm
        |  FROM p2
        |  UNION ALL SELECT 'orders.custkey->customer.custkey', nc, nm
        |  FROM p3
        |  UNION ALL SELECT 'part.size->nation.nationkey', nc, nm FROM p4)
        |ORDER BY pair""".stripMargin,
    // Pinned listing: the prefix filter drops clip.mp4; sizes are the
    // fixture byte lengths (see CustomQueries.mediaFixtures scaladoc).
    "q_lake_listing_pinned" ->
      """SELECT * FROM (VALUES
        |  ('img.bmp', CAST(70 AS BIGINT)),
        |  ('img.pgm', CAST(13 AS BIGINT)),
        |  ('img.png', CAST(100 AS BIGINT)),
        |  ('img.ppm', CAST(23 AS BIGINT)))
        |  AS t(name, size)
        |ORDER BY name""".stripMargin,
    "q_profile_drift" ->
      """WITH e AS (
        |  SELECT event_type AS k,
        |    CAST(round(value * 100, 0) AS BIGINT) AS c, ts
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT k, c FROM e WHERE ts < TIMESTAMP '2024-01-16'),
        |u AS (SELECT k, c FROM e WHERE ts >= TIMESTAMP '2024-01-16'),
        |edges AS (SELECT k, min(c) AS lo, max(c) AS hi,
        |            count(*) AS n_ref FROM r GROUP BY k),
        |ncur AS (SELECT k, count(*) AS n_cur FROM u GROUP BY k),
        |rb AS (SELECT r.k,
        |    ((least(hi, greatest(lo, c)) - lo) * 10) // (hi - lo + 1)
        |      AS bin
        |  FROM r JOIN edges USING (k)),
        |ub AS (SELECT u.k,
        |    ((least(hi, greatest(lo, c)) - lo) * 10) // (hi - lo + 1)
        |      AS bin
        |  FROM u JOIN edges USING (k)),
        |rc AS (SELECT k, bin, count(*) AS ref_cnt FROM rb GROUP BY k, bin),
        |uc AS (SELECT k, bin, count(*) AS cur_cnt FROM ub GROUP BY k, bin),
        |grid AS (
        |  SELECT e.k, e.n_ref, n.n_cur, b.bin
        |  FROM edges e JOIN ncur n USING (k)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b),
        |j AS (
        |  SELECT g.k, g.bin,
        |    coalesce(rc.ref_cnt, 0) AS ref_cnt,
        |    coalesce(uc.cur_cnt, 0) AS cur_cnt,
        |    CAST(coalesce(rc.ref_cnt, 0) + 1 AS DOUBLE)
        |      / (g.n_ref + 10) AS p,
        |    CAST(coalesce(uc.cur_cnt, 0) + 1 AS DOUBLE)
        |      / (g.n_cur + 10) AS q
        |  FROM grid g
        |  LEFT JOIN rc ON rc.k = g.k AND rc.bin = g.bin
        |  LEFT JOIN uc ON uc.k = g.k AND uc.bin = g.bin),
        |cb AS (SELECT k, bin, ref_cnt, cur_cnt,
        |         (p - q) * ln(p / q) AS contrib FROM j),
        |tot AS (SELECT k,
        |          list_reduce(list(contrib ORDER BY bin),
        |            (x, y) -> x + y) AS psi
        |        FROM cb GROUP BY k)
        |SELECT cb.k AS event_type, cb.bin,
        |  CAST(ref_cnt AS BIGINT) AS ref_cnt,
        |  CAST(cur_cnt AS BIGINT) AS cur_cnt,
        |  round(contrib, 6) AS contrib_r6, round(psi, 6) AS psi_r6
        |FROM cb JOIN tot USING (k)
        |ORDER BY event_type, bin""".stripMargin,
    "q_stat_ttest" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(SUM(c) AS DOUBLE) AS s1d,
        |    CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE) AS s2d
        |  FROM (SELECT event_type,
        |          CAST(round(value * 100, 0) AS BIGINT) AS c
        |        FROM events WHERE value IS NOT NULL)
        |  GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, s1d / n AS m,
        |    (s2d - s1d * s1d / n) / (n - 1) AS v
        |  FROM s)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
        |  round((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) /
        |    (a.v * a.v / (a.n * a.n * (a.n - 1))
        |      + b.v * b.v / (b.n * b.n * (b.n - 1))), 6) AS df
        |FROM m a JOIN m b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "q_cdc_diff" ->
      """WITH nxt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'X-DIFF'
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |j AS (
        |  SELECT p.o_orderkey AS pk, n.o_orderkey AS nk,
        |    p.o_custkey AS p_ck, p.o_orderstatus AS p_st,
        |    p.o_totalprice AS p_tp, p.o_orderdate AS p_od,
        |    p.o_orderpriority AS p_pr,
        |    n.o_custkey AS n_ck, n.o_orderstatus AS n_st,
        |    n.o_totalprice AS n_tp, n.o_orderdate AS n_od,
        |    n.o_orderpriority AS n_pr
        |  FROM orders p FULL OUTER JOIN nxt n
        |    ON p.o_orderkey = n.o_orderkey)
        |SELECT
        |  CASE WHEN pk IS NULL THEN 'insert'
        |       WHEN nk IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  COALESCE(nk, pk) AS o_orderkey,
        |  CASE WHEN nk IS NOT NULL THEN n_ck ELSE p_ck END AS o_custkey,
        |  CASE WHEN nk IS NOT NULL THEN n_st ELSE p_st END AS o_orderstatus,
        |  CASE WHEN nk IS NOT NULL THEN n_tp ELSE p_tp END AS o_totalprice,
        |  CASE WHEN nk IS NOT NULL THEN n_od ELSE p_od END AS o_orderdate,
        |  CASE WHEN nk IS NOT NULL THEN n_pr ELSE p_pr END AS o_orderpriority
        |FROM j
        |WHERE pk IS NULL OR nk IS NULL
        |  OR (n_ck IS DISTINCT FROM p_ck OR n_st IS DISTINCT FROM p_st
        |      OR n_tp IS DISTINCT FROM p_tp OR n_od IS DISTINCT FROM p_od
        |      OR n_pr IS DISTINCT FROM p_pr)
        |ORDER BY o_orderkey""".stripMargin,
    "q_stat_zscore" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
        |  FROM lineitem),
        |st AS (
        |  SELECT flag, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
        |  FROM li GROUP BY flag),
        |st2 AS (
        |  SELECT flag, CAST(s1 AS DOUBLE) / n AS mean_c,
        |    sqrt(CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |      AS std_c
        |  FROM st)
        |SELECT flag, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN abs((CAST(c AS DOUBLE) - mean_c) / std_c)
        |    > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(MAX(abs((CAST(c AS DOUBLE) - mean_c) / std_c)), 6)
        |    AS max_abs_z
        |FROM li JOIN st2 USING (flag)
        |GROUP BY flag ORDER BY flag""".stripMargin,
    "q_funnel_conversion" ->
      """WITH fc AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_click
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |pp AS (
        |  SELECT e.user_id, COUNT(*) AS n_p
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(e.ts AS TIMESTAMP) >= fc.first_click
        |  GROUP BY e.user_id)
        |SELECT '1_clicked' AS step, COUNT(*) AS n_users FROM fc
        |UNION ALL
        |SELECT '2_purchased_after_click', COUNT(*) FROM pp
        |UNION ALL
        |SELECT '3_repeat_purchaser', COUNT(*) FROM pp WHERE n_p >= 2
        |ORDER BY step""".stripMargin,
    "q_profile_skew" ->
      """WITH c AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n FROM c)
        |SELECT key, n, CAST(n AS DOUBLE) / mean_n AS skew_ratio
        |FROM c, s ORDER BY n DESC, key LIMIT 10""".stripMargin,
    "q_lake_zorder" ->
      s"""WITH t AS (
         |  SELECT o_orderkey, o_custkey % 256 AS x, o_orderkey % 256 AS y
         |  FROM orders)
         |SELECT o_orderkey, x, y, ($zExprSql) AS z
         |FROM t ORDER BY z, o_orderkey LIMIT 100""".stripMargin,
    "q_ingest_quarantine" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 13 = 0 THEN '{' || props
        |         ELSE props END AS p
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN json_valid(p) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_good,
        |  CAST(SUM(CASE WHEN json_valid(p) THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_bad,
        |  CAST(SUM(CASE WHEN json_valid(p)
        |    THEN CAST(json_extract_string(p, '$.k') AS INTEGER) END)
        |    AS BIGINT) AS k_sum
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_merge_upsert" -> {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val picks = cols.map(c =>
        s"CASE WHEN u.o_orderkey IS NOT NULL THEN u.$c ELSE b.$c END AS $c")
        .mkString(",\n  ")
      s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         |    o_totalprice + 1.0 AS o_totalprice, o_orderdate,
         |    o_orderpriority
         |  FROM orders WHERE o_orderkey % 5 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
         |    o_totalprice, o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 97 = 0)
         |SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
         |  $picks
         |FROM orders b FULL OUTER JOIN upd u
         |  ON b.o_orderkey = u.o_orderkey
         |ORDER BY o_orderkey""".stripMargin
    },
    "q_profile" ->
      """WITH stacked AS (
        |  SELECT 'doc_id' AS column, CAST(doc_id AS VARCHAR) AS value FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents)
        |SELECT "column", COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  COUNT(DISTINCT value) AS n_distinct,
        |  MIN(value) AS min_str, MAX(value) AS max_str
        |FROM stacked GROUP BY "column" ORDER BY "column"""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_sort_nulls" ->
      """SELECT NULLIF(o_orderstatus, 'O') AS status_or_null,
        |  o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY status_or_null, o_orderpriority
        |ORDER BY status_or_null DESC NULLS LAST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_ingest_dispatch" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // The oracle reads the ORIGINAL parquet — equality certifies the
    // engine's parquet→ORC→scan round trip preserved every value.
    "q_source_orc" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // expected fingerprint computed ONCE from the source table, fanned
    // across codec labels — a lossy roundtrip hash-fails
    "q_lake_codecs" ->
      """WITH agg AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS sum_cents,
        |    CAST(SUM(CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef', substring(
        |             md5(CAST(o_orderkey AS VARCHAR)), d, 1)) - 1
        |           AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT)) AS BIGINT) AS key_hashsum
        |  FROM orders)
        |SELECT codec, n_rows, sum_cents, key_hashsum
        |FROM (SELECT unnest(['gzip', 'none', 'snappy', 'zstd'])
        |        AS codec), agg
        |ORDER BY codec""".stripMargin,
    // v1 = the untouched snapshot; v2 = the q_merge_upsert result —
    // equality certifies version immutability under the later publish.
    "q_lake_time_travel" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |v2 AS (
        |  SELECT CASE WHEN u.o_orderkey IS NOT NULL
        |           THEN u.o_totalprice ELSE b.o_totalprice END AS price
        |  FROM orders b FULL OUTER JOIN upd u
        |    ON b.o_orderkey = u.o_orderkey)
        |SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS sum_price_cents
        |FROM orders
        |UNION ALL
        |SELECT 2, COUNT(*),
        |  CAST(SUM(CAST(round(price * 100, 0) AS BIGINT)) AS BIGINT)
        |FROM v2
        |ORDER BY version""".stripMargin,
    // v1 = orders; v2 rebuilt by the same update/insert/delete rules;
    // the diff classification must match the engine's read-back of the
    // two published snapshots
    "q_lake_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p
        |  FROM orders),
        |v1 AS (SELECT k, CAST(round(p * 100, 0) AS BIGINT) AS cents
        |  FROM base),
        |v2a AS (
        |  SELECT k, CAST(round((CASE WHEN k % 5 = 0 THEN p + 1.0
        |    ELSE p END) * 100, 0) AS BIGINT) AS cents
        |  FROM base
        |  UNION ALL
        |  SELECT k + 10000000 AS k,
        |    CAST(round(p * 100, 0) AS BIGINT) AS cents
        |  FROM base WHERE k % 97 = 0),
        |v2 AS (SELECT * FROM v2a WHERE k % 101 <> 0)
        |SELECT coalesce(v1.k, v2.k) AS o_orderkey,
        |  CASE WHEN v2.k IS NULL THEN 'delete'
        |       WHEN v1.k IS NULL THEN 'insert'
        |       ELSE 'update' END AS change,
        |  v1.cents AS old_cents, v2.cents AS new_cents
        |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        |WHERE v2.k IS NULL OR v1.k IS NULL OR v1.cents <> v2.cents
        |ORDER BY o_orderkey""".stripMargin
  )
}
