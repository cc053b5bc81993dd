package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact ranking-quality metrics. */
object Ranking {

  /** EXACT tie-aware AUC via the Mann–Whitney identity AUC = U/(n₁n₀)
    * (Hanley & McNeil, Radiology 1982): scores group to distinct
    * values, average ranks are DOUBLED to stay integer (a tie group
    * entered at prefix count c with t members has 2·r̄ = 2c + t + 1),
    * so U₂ = 2U = Σ_pos 2r̄ − n₁(n₁+1) is an exact BIGINT and the one
    * division is correctly rounded — no per-row rank window, no float
    * rank arithmetic.
    *
    * Scale: input reduces to the distinct-score table in one
    * aggregate; the global prefix sum runs through [[Prefix]]'s
    * two-pass range-partitioned scan (no single-partition window).
    *
    * @param scored frame with a numeric score column and a boolean
    *               label column (true = positive class)
    * @return one row: (n_pos, n_neg, u2, auc_r6)
    */
  def aucExact(scored: DataFrame, score: String, label: String)
      : DataFrame = {
    val byScore = scored.select(col(score).as("__s"),
        col(label).as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("ct"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("cp"))
    val pref = Prefix.runningSumInclusive(
      byScore, Seq(col("__s")), col("ct"), "cum")
    pref.agg(
        sum(col("cp") * (lit(2L) * (col("cum") - col("ct"))
          + col("ct") + 1L)).as("two_rank_sum"),
        sum(col("cp")).as("n_pos"),
        sum(col("ct") - col("cp")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        (col("two_rank_sum") - col("n_pos") * (col("n_pos") + 1L))
          .as("u2"),
        round((col("two_rank_sum")
          - col("n_pos") * (col("n_pos") + 1L)).cast("double")
          / (lit(2L) * col("n_pos") * col("n_neg")), 6).as("auc_r6"))
  }
}
