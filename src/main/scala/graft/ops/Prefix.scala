package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL running aggregates (prefix sum / prefix max)
  * over a total order — the replacement for the single-partition
  * `Window.orderBy(...)` scan, which serializes the whole input
  * through one task (VERDICT r9 finding #4: WindowExec's
  * "moving all data to a single partition" warning).
  *
  * Shape (the q_curate_shard two-level pattern, generalized to
  * arbitrary orderings where no dense integer bucket key exists):
  *
  *  1. range-partition the input on the order columns — the same
  *     sampled `rangepartitioning` exchange a global `orderBy` plans,
  *     so partition i holds an order-contiguous slice and partition
  *     ids ascend with the order;
  *  2. per-partition running aggregate — an ordinary PARTITIONED
  *     window (distributed, one state per partition);
  *  3. per-partition totals (P rows, one per partition) get an
  *     exclusive running aggregate over partition id — the only
  *     unpartitioned window left, and its input is bounded by the
  *     PARTITION COUNT, not the data;
  *  4. the carry-in broadcasts back and merges with the local running
  *     value.
  *
  * The result is identical to the single-partition window on any
  * input (the range exchange keeps equal order-keys in one partition,
  * and sum/max are associative), but every data-sized step is
  * distributed. Output row order is unspecified, as with any shuffle.
  */
object Prefix {

  /** Exclusive global running MAX of `value` in `order`: for each row,
    * max over all strictly-preceding rows (null when none — `greatest`
    * semantics propagate through the merge). Appended as `out`. */
  def runningMaxExclusive(df: DataFrame, order: Seq[Column],
      value: Column, out: String): DataFrame =
    running(df, order, value, out, isSum = false, inclusive = false)

  /** Inclusive global running SUM of `value` in `order` (the manifest
    * cumsum shape). `value` must be non-null. Appended as `out`. */
  def runningSumInclusive(df: DataFrame, order: Seq[Column],
      value: Column, out: String): DataFrame =
    running(df, order, value, out, isSum = true, inclusive = true)

  /** Distributed GLOBAL dense rank by `order` (1-based), appended as
    * `out` — the same two-pass shape as the running aggregates: a
    * range exchange keeps equal keys in one partition (partition ids
    * ascend with the order), a PARTITIONED dense_rank window ranks
    * locally, per-partition DISTINCT-KEY counts (P rows) get the
    * exclusive prefix sum, and the carry-in broadcasts back. Output is
    * identical to `dense_rank().over(Window.orderBy(order))` with no
    * single-partition window anywhere. Rank VALUES depend only on the
    * key's position in the global key order, so they are
    * partitioning-invariant.
    *
    * `partitions` sizes the range exchange (0 = the session's shuffle
    * partitions). AQE cannot coalesce an explicit repartitionByRange,
    * so a caller that KNOWS its input is small (e.g. a cached cell
    * table it just counted) should pass ⌈rows/64k⌉-ish to avoid paying
    * 32-task dispatch overhead per stage on a 100k-row frame — the
    * r11 q_stat_kendall_grid local[32] wall doubling was exactly this
    * constant, not the algorithm. Rank values are partition-count
    * invariant, so the choice affects only cost. */
  def denseRank(df: DataFrame, order: Seq[Column], out: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = CacheScope.cached(
      df.repartitionByRange(p, order: _*)
        .withColumn("__pid", spark_partition_id()))
    val lw = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = ranged.withColumn("__local",
      dense_rank().over(lw).cast("long"))
    // per-partition distinct KEY count — via distinct-then-count, NOT
    // countDistinct: COUNT(DISTINCT ...) drops rows with any NULL order
    // key while dense_rank ranks the NULL group, so the countDistinct
    // carry would undercount by one and shift every rank after the first
    // partition containing nulls (ADVICE r10, medium). DISTINCT treats
    // NULLs null-safely (one group), matching dense_rank exactly.
    val totals = ranged.select(col("__pid") +: order: _*).distinct()
      .groupBy(col("__pid")).agg(count(lit(1)).as("__pt"))
    val cw = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = totals
      .withColumn("__carry", sum(col("__pt")).over(cw))
      .select(col("__pid"), col("__carry"))
    local.join(broadcast(carry), Seq("__pid"))
      .withColumn(out, col("__local") + coalesce(col("__carry"), lit(0L)))
      .drop("__pid", "__local", "__carry")
  }

  private def running(df: DataFrame, order: Seq[Column], value: Column,
      out: String, isSum: Boolean, inclusive: Boolean): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    def agg(c: Column) = if (isSum) sum(c) else max(c)
    // cached: `local` and `totals` must see the SAME partition ids, and
    // the range exchange + upstream plan should run once, not twice
    val ranged = CacheScope.cached(
      df.repartitionByRange(p, order: _*)
        .withColumn("__pid", spark_partition_id()))
    val lw = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    val local = ranged.withColumn("__local", agg(value).over(lw))
    val totals = ranged.groupBy(col("__pid")).agg(agg(value).as("__pt"))
    val cw = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = totals
      .withColumn("__carry", agg(col("__pt")).over(cw))
      .select(col("__pid"), col("__carry"))
    val merged =
      if (isSum)
        coalesce(col("__local"), lit(0L)) + coalesce(col("__carry"), lit(0L))
      else greatest(col("__local"), col("__carry"))
    local.join(broadcast(carry), Seq("__pid"))
      .withColumn(out, merged)
      .drop("__pid", "__local", "__carry")
  }
}
