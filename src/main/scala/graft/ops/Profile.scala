package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column stats in ONE pass over the data
  * (single aggregate, no per-column jobs) — the check an ETL service runs
  * on every ingested file before admitting it to the lake.
  */
object Profile {

  /** One row per column: rows, nulls, approx distinct, min/max as
    * strings (type-erased for a uniform report schema).
    */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        approx_count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val total = df.count()
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    df.columns.toSeq.map { c =>
      (c,
        total,
        total - row.getAs[Long](s"${c}__nonnull"),
        row.getAs[Long](s"${c}__distinct"),
        row.getAs[String](s"${c}__min"),
        row.getAs[String](s"${c}__max"))
    }.toDF("column", "n_rows", "n_nulls", "approx_distinct", "min", "max")
  }

  /** Inline pipeline metrics via Spark's Observation API: attach
    * row-count / null-count / sum metrics to ANY DataFrame; they're
    * collected DURING the action at zero extra passes — the scale-correct
    * way to monitor a 100 TB pipeline (vs a second profiling scan).
    * Usage: val (df2, obs) = observed(df, "stage1", keyCol); run an
    * action on df2; obs.get holds the metrics map.
    */
  def observed(df: DataFrame, name: String, keyCol: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val out = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"),
      approx_count_distinct(col(keyCol)).as("approx_keys"))
    (out, obs)
  }

  /** Join/aggregation-key skew diagnosis: per-key counts reduced to the
    * top-`k` heaviest keys plus the skew ratio (heaviest key ÷ mean
    * rows per key) — the number that says whether a shuffle on this key
    * needs salting (`ops.Joins.saltedJoin`) or AQE skew handling.
    * Two chained aggregates on already-reduced data: the per-key count
    * is the only pass over the table; the stats reduce counts, not rows.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = CacheScope.cached(
      df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n")))
    val stats = counts.agg(
      max(col("n")).as("max_n"),
      (sum(col("n")).cast("double") / count(lit(1))).as("mean_n"))
    counts.crossJoin(broadcast(stats))
      .select(col("key").cast("string").as("key"), col("n"),
        (col("n").cast("double") / col("mean_n")).as("skew_ratio"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }

  /** Inclusion-dependency profiling (the foreign-key-discovery metric of
    * Bauckmann et al.'s SPIDER / De Marchi's IND mining): what fraction
    * of `child.childCol`'s DISTINCT values appear in
    * `parent.parentCol`? containment_ppm = 10⁶ means A ⊆ B — a
    * candidate FK edge. Exact integer ppm so the verdict is
    * engine-independent.
    *
    * Shape: distinct-reduce the child column (map-side partial), then
    * ONE semi-join against the parent column for the matched count —
    * O(distinct A + distinct B), never row×row.
    */
  def inclusion(name: String, child: DataFrame, childCol: String,
                parent: DataFrame, parentCol: String): DataFrame = {
    val a = child.select(col(childCol).as("__a"))
      .filter(col("__a").isNotNull).distinct()
    val aCnt = a.agg(count(lit(1)).as("n_child_distinct"))
    val matched = a.join(parent.select(col(parentCol).as("__b")),
        col("__a") === col("__b"), "left_semi")
      .agg(count(lit(1)).as("n_matched"))
    aCnt.crossJoin(broadcast(matched))
      .select(lit(name).as("pair"), col("n_child_distinct"),
        col("n_matched"),
        // Empty/all-null child column → vacuous containment (1e6), not
        // a divide-by-zero (NULL in non-ANSI mode, error under ANSI).
        expr("CASE WHEN n_child_distinct = 0 THEN 1000000L" +
            " ELSE n_matched * 1000000L div n_child_distinct END")
          .as("containment_ppm"))
  }

  /** Exact per-column null/distinct profile as a pure plan (no driver
    * loop) for oracle-checked use: unpivots the listed columns.
    */
  def exactProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val stacked = cols.map { c =>
      df.select(lit(c).as("column"),
        col(c).cast("string").as("value"))
    }.reduce(_ unionAll _)
    stacked.groupBy(col("column"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_str"),
        max(col("value")).as("max_str"))
      .orderBy(col("column"))
  }

  /** Population Stability Index drift between a REFERENCE and a
    * CURRENT snapshot of an integer-valued metric, per key — the
    * standard ML-ops distribution-shift monitor (PSI < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 major shift).
    *
    * Everything up to the final ln is integer arithmetic: bins are
    * equal-width over the reference [lo, hi] via ((c−lo)·bins) div
    * (hi−lo+1) (current values clamp into the edge bins), counts get
    * +1 Laplace smoothing so empty bins stay defined, and the total
    * folds per-bin contributions in bin order — bit-identical
    * cross-engine.
    *
    * Scale shape: two grouped aggregates over (key, cents)
    * projections + a broadcast of the per-key edges; the bin grid is
    * |keys|·bins rows. Nothing holistic, no sort of the data.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, keyCol: String,
               centsCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "psiDrift needs at least 2 bins")
    val r = ref.select(col(keyCol).as("k"), col(centsCol).as("c"))
    val u = cur.select(col(keyCol).as("k"), col(centsCol).as("c"))
    val edges = r.groupBy(col("k"))
      .agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
        count(lit(1)).as("n_ref"))
    val nCur = u.groupBy(col("k")).agg(count(lit(1)).as("n_cur"))
    def binOf(df: DataFrame): DataFrame =
      df.join(broadcast(edges.select(col("k"), col("lo"), col("hi"))), "k")
        .select(col("k"), expr(
          s"((least(hi, greatest(lo, c)) - lo) * $bins)" +
            " div (hi - lo + 1)").as("bin"))
    val refCnt = binOf(r).groupBy(col("k"), col("bin"))
      .agg(count(lit(1)).as("ref_cnt"))
    val curCnt = binOf(u).groupBy(col("k"), col("bin"))
      .agg(count(lit(1)).as("cur_cnt"))
    val grid = edges.select(col("k"), col("n_ref"),
        explode(expr(s"sequence(0, ${bins - 1})")).as("bin"))
      .join(broadcast(nCur), "k")
    val binRows = grid
      .join(refCnt, Seq("k", "bin"), "left")
      .join(curCnt, Seq("k", "bin"), "left")
      .select(col("k"), col("bin"),
        coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"),
        col("n_ref"), col("n_cur"))
      .withColumn("p", (col("ref_cnt") + 1).cast("double")
        / (col("n_ref") + bins))
      .withColumn("q", (col("cur_cnt") + 1).cast("double")
        / (col("n_cur") + bins))
      .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
    val totals = binRows.groupBy(col("k"))
      .agg(expr("aggregate(array_sort(collect_list(struct(bin, contrib)))," +
        " 0D, (acc, s) -> acc + s.contrib)").as("psi"))
    binRows.join(broadcast(totals), "k")
      .select(col("k").as(keyCol), col("bin").cast("long").as("bin"),
        col("ref_cnt"), col("cur_cnt"),
        round(col("contrib"), 6).as("contrib_r6"),
        round(col("psi"), 6).as("psi_r6"))
      .orderBy(col(keyCol), col("bin"))
  }
}
