package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * the lake-maintenance op that makes parquet min/max statistics prune
  * on TWO filter columns at once: rows sorted by the bit-interleaved
  * key are locally close in both dimensions, so a range predicate on
  * either column touches a small band of files instead of all of them.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns: bit b of
    * `x` lands at position 2b, bit b of `y` at 2b+1. Pure codegen'd
    * arithmetic (sum of shift/mask terms — no UDF, no loop at runtime);
    * `bits ≤ 31` keeps the result under 2^62 in a long.
    */
  def morton2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Cluster a table for 2-D data skipping: range-partition by the
    * Morton key, sort within partitions, key kept as `_z` for the
    * writer. One shuffle (the range exchange); at 100 TB this is the
    * standard OPTIMIZE-ZORDER layout pass run per partition of the
    * lake, not over the whole lake at once.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 16, partitions: Int = 0): DataFrame = {
    val z = morton2(col(xCol).cast("long"), col(yCol).cast("long"), bits)
    val withZ = df.withColumn("_z", z)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("_z"))
      else withZ.repartitionByRange(col("_z"))
    parted.sortWithinPartitions(col("_z"))
  }
}
