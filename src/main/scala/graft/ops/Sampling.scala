package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Both samplers key off an md5-derived uniform instead of `rand()`:
  * the sample is a pure function of the row id, so it is reproducible
  * across runs, partitionings, engines (the DuckDB oracle recomputes it
  * exactly), and incremental reruns over grown data — the property a
  * 100 TB curation pipeline needs for auditability. md5 is a fine
  * uniform: the first 8 hex digits give 32 i.i.d.-enough bits per id.
  *
  * Scale shapes: `stratifiedSample` is a pure map-side filter (no
  * shuffle, composes with scan pushdown). `quotaSample` needs a per-
  * stratum top-N — one shuffle on the stratum key with a pre-shuffle
  * WindowGroupLimit, the same shape as any top-k per group.
  */
object Sampling {

  /** Uniform in [0, 1): first 32 bits of md5(id), scaled. */
  def hashUniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Keep each row with its stratum's probability (`default` for strata
    * not in the map), deterministically by id hash.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       default: Double): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(col(stratumCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol)) < frac)
  }

  /** Exactly min(quota, |stratum|) rows per stratum: the `quota` rows
    * with the smallest id-hash (ties by id). Deterministic fixed-size
    * variant of `stratifiedSample` for "N docs per language/source"
    * mixture specs.
    */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String,
                  quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_qrn", row_number().over(w))
      .filter(col("_qrn") <= quota)
      .drop("_qrn")
  }

  /** Re-weight a corpus toward target mixture shares (static domain
    * balancing, the fixed-weight half of DoReMi-style mixture tuning):
    * for target share w_s of domain s with observed count n_s, the
    * output totals T = min_s(n_s / w_s) rows — the largest corpus for
    * which every domain reaches its share WITHOUT upsampling — and each
    * domain keeps rows at rate w_s·T / n_s (≤ 1 by construction) via
    * the deterministic id-hash uniform. Domains without a target are
    * dropped.
    *
    * Scale shape: one count aggregate reduced to |domains| rows,
    * broadcast back; the keep decision is then a map-side filter.
    * Rates are doubles derived from exact counts and shared literals —
    * cross-engine deterministic, so the sample is oracle-checkable.
    */
  def remixToTarget(df: DataFrame, idCol: String, domainCol: String,
                    targets: Seq[(String, Double)]): DataFrame = {
    val weight = targets.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col("_dom") === s, lit(w)).otherwise(acc)
    }
    val counts = df.groupBy(col(domainCol).as("_dom"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_w", weight)
      .filter(col("_w") > 0)
    val t = counts.agg(
      min(col("_n").cast("double") / col("_w")).as("_T"))
    df.join(broadcast(counts), df(domainCol) === col("_dom"))
      .crossJoin(broadcast(t))
      .filter(hashUniform(col(idCol)) <
        col("_w") * col("_T") / col("_n").cast("double"))
      .drop("_dom", "_n", "_w", "_T")
  }

  /** Weighted sampling without replacement (top-k), integer weights:
    * Efraimidis–Spirakis assigns each row key u^(1/w) and keeps the k
    * largest; u^(1/w) is distributed EXACTLY as the max of w iid
    * uniforms (both CDFs are x^w), so for integer weights the key is
    * expressible as `max_{i≤w} hash(id:i)` — pure integer arithmetic on
    * the portable md5 family, no pow/log whose last-ulp behavior could
    * differ across engines' libm.
    *
    * Scale shape: the priority is a map-side array expression (no row
    * explosion — `transform` over a generated sequence); global top-k
    * plans as TakeOrderedAndProject (per-partition heaps, k rows to the
    * driver-side merge, never a full sort). Weights are capped by
    * contract, not clamped: huge weights belong in the caller's score
    * design, not a 10⁶-element array per row.
    *
    * @param weightCol integer weight ≥ 1 (keep small, ≤ ~100).
    */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: Column,
                   k: Int): DataFrame = {
    val priority = array_max(transform(
      sequence(lit(1), weightCol.cast("int")),
      i => conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":"), i.cast("string"))), 1, 8), 16, 10).cast("long")))
    df.withColumn("priority", priority)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic train/val/test assignment: split = a pure function
    * of the row id's hash, so membership is stable across runs,
    * engines, repartitions, and dataset growth (a grown corpus only
    * ADDS rows to splits — existing assignments never churn, which is
    * what keeps eval sets honest over time). Map-side, no shuffle.
    */
  def assignSplit(df: DataFrame, idCol: String, valFrac: Double,
                  testFrac: Double): DataFrame = {
    val u = hashUniform(col(idCol))
    df.withColumn("split",
      when(u < testFrac, lit("test"))
        .when(u < testFrac + valFrac, lit("val"))
        .otherwise(lit("train")))
  }

  /** DuckDB-side twin of the integer hash inside [[weightedTopK]] —
    * digit-sum parse of the first 8 md5 hex digits of `e` (no hex→int
    * conv in DuckDB), as a BIGINT in [0, 2³²).
    */
  def hashIntSql(e: String): String = {
    val digits = (1 to 8).map { d =>
      val pow = math.pow(16, 8 - d).toLong
      s"(strpos('0123456789abcdef', substring(md5($e), $d, 1)) - 1) * ${pow}"
    }
    s"(${digits.mkString(" + ")})"
  }

  /** DuckDB-side twin of `hashUniform` over column expression `e` —
    * kept next to the Spark form so the two stay in lockstep. (Digit-sum
    * parse of the first 8 md5 hex digits; DuckDB lacks a hex→int conv.)
    */
  def hashUniformSql(e: String): String = {
    val digits = (1 to 8).map { d =>
      val pow = math.pow(16, 8 - d).toLong
      s"(strpos('0123456789abcdef', substring(md5(CAST($e AS VARCHAR)), $d, 1)) - 1) * ${pow}"
    }
    s"((${digits.mkString(" + ")}) / 4294967296.0)"
  }
}
