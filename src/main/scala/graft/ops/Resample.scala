package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling with forward fill — the gap-filling step every
  * time-series ETL needs: aggregate events onto a fixed step grid, emit
  * a row for EVERY step in each key's observed span, and carry the last
  * observed aggregate forward through empty steps.
  *
  * Scale shape: per-key spans come from one aggregate; the grid is a
  * per-key `sequence` explode (rows = span/step per key, generated, not
  * shuffled); the join back to observed buckets is an equi-join on
  * (key, bucket); the forward fill is one window per key. Nothing here
  * is driver-side and the only shuffles are the two keyed aggregates +
  * the window — all on (key, bucket)-sized rows, never raw events
  * beyond the first bucketing aggregate.
  */
object Resample {

  /** @param step a duration literal both `window()` and `sequence()`
    *             accept, e.g. "1 hour".
    * @return DataFrame[key, bucket, n (0 on empty steps),
    *         sum_ffill (last observed per-bucket sum carried forward)]
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, step: String): DataFrame = {
    val b = events
      .groupBy(col(keyCol),
        window(col(tsCol), step).getField("start").as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sv"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr(s"INTERVAL $step")))
          .as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sv"), ignoreNulls = true).over(w).as("sum_ffill"))
  }

  /** Linear interpolation through empty grid steps — the other standard
    * gap-fill policy: a missing bucket gets the straight line between its
    * nearest observed neighbors (observed buckets keep their value; a
    * leading/trailing gap falls back to nearest-neighbor fill).
    *
    * Cross-engine exactness: the observed per-bucket value `sv` is
    * already exact (2-dp rounded sum, see [[graft.queries.Exact]]); the
    * time fraction divides two exact epoch-second BIGINTs; and the
    * interpolation formula `pv + (nv − pv)·frac` is applied in the same
    * operation order in the DuckDB twin, so identical IEEE doubles come
    * out of both engines.
    *
    * Scale shape identical to [[resampleFfill]] plus one more window pass
    * over the same (key, bucket-order) sort — Catalyst computes both
    * direction windows from a single exchange+sort.
    */
  def resampleInterpolate(events: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, step: String): DataFrame = {
    val b = events
      .groupBy(col(keyCol),
        window(col(tsCol), step).getField("start").as("bucket"))
      .agg(round(sum(col(valueCol)), 2).as("sv"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr(s"INTERVAL $step")))
          .as("bucket"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the "nearest following observation" is a running frame over the
    // REVERSED order — NOT first() over (currentRow, unboundedFollowing):
    // Spark's UnboundedFollowingWindowFunctionFrame recomputes its
    // aggregate from scratch at every row (O(n²) per partition; measured
    // 23 s vs 3 s at sf0.1 on this very query). Two O(n log n) sorted
    // passes over the same hash partitioning instead.
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = col("bucket").cast("long")
    val joined = grid.join(b, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"), col("sv"), t.as("t"),
        when(col("sv").isNotNull, t).as("obs_t"))
    val pv = last(col("sv"), ignoreNulls = true).over(wPrev)
    val pt = last(col("obs_t"), ignoreNulls = true).over(wPrev)
    val nv = last(col("sv"), ignoreNulls = true).over(wNext)
    val nt = last(col("obs_t"), ignoreNulls = true).over(wNext)
    joined
      .select(col(keyCol), col("bucket"), col("sv"), col("t"),
        pv.as("pv"), pt.as("pt"), nv.as("nv"), nt.as("nt"))
      .select(col(keyCol), col("bucket"),
        when(col("sv").isNotNull, col("sv"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * ((col("t") - col("pt")).cast("double")
              / (col("nt") - col("pt")).cast("double")))
          .as("sv_interp"))
  }
}
