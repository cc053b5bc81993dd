package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustered lake layout — multi-dimensional
  * data skipping, the `OPTIMIZE ZORDER BY` class of Delta/Iceberg
  * maintenance re-expressed over plain parquet directories (Morton
  * 1966; the curve interleaves the bits of the dimensions so points
  * close in BOTH dimensions land close on the curve).
  *
  * Why a second layout next to [[Skipping]]: a 1-D clustered layout
  * prunes range predicates on its single clustering key only — a box
  * query `x ∈ [a,b] AND y ∈ [c,d]` over a layout clustered on y scans
  * every bucket the y-slice touches no matter how thin the x-slice is.
  * Z-order buckets subdivide BOTH dimensions at once (each bucket is a
  * rectangle in (x, y) space), so per-bucket min/max zone maps on the
  * two dimensions both prune, and a thin slice in EITHER dimension
  * skips most of the layout.
  *
  * Geometry: each dimension is quantized to 12 bits against a declared
  * domain bound (`xq = least(x·4096 div xDomain, 4095)` — values past
  * the bound clamp; clamping only affects LOCALITY, never soundness,
  * because the sidecar stats are computed from the data actually
  * written). The bucket is the TOP TWO interleaved bits of each
  * dimension — 16 rectangles — in closed form
  * `8·y₁₁ + 4·x₁₁ + 2·y₁₀ + x₁₀` (= z div 2²⁰, engine-portable integer
  * arithmetic, no fold). Rows sort by the full 24-bit Morton value
  * WITHIN each bucket file so parquet row-group stats inherit the
  * locality too.
  *
  * Scale: the sidecar is one row per bucket; the prune is a bounded
  * driver-side metadata read (the [[Skipping]] discipline), and a box
  * lookup reads only the rectangles the box overlaps — on a 100 TB
  * table a selective 2-D box touches a handful of bucket directories
  * instead of the table.
  */
object ZIndex {

  /** Quantization width per dimension (12 bits → 4096 cells). */
  val Bits = 12

  private[graft] def dataDir(tableDir: String) = s"$tableDir/data"
  private[graft] def statsDir(tableDir: String) = s"$tableDir/_zstats"

  /** 12-bit quantization of a non-negative column against its declared
    * domain bound (clamped). Integer `div` throughout — both engines
    * truncate non-negative quotients identically. */
  private[graft] def quant(cName: String, domain: Long)
      : org.apache.spark.sql.Column =
    expr(s"least(cast($cName as bigint) * 4096 div $domain," +
      " cast(4095 as bigint))")

  /** Bucket = top two interleaved bits of each quantized dim (16
    * rectangles); identical to `morton div 2^20`, written in the
    * closed form every engine can replay. */
  private[graft] def bucket(xq: String, yq: String) = expr(
    s"8 * (shiftright($yq, 11) & 1) + 4 * (shiftright($xq, 11) & 1)" +
      s" + 2 * (shiftright($yq, 10) & 1) + (shiftright($xq, 10) & 1)")

  final case class ZStats(bucket: Long, xMin: Long, xMax: Long,
                          yMin: Long, yMax: Long, nRows: Long)

  /** Write `df` Z-order-clustered on (`xCol`, `yCol`) and build the
    * two-dimension zone-map sidecar FROM THE WRITTEN LAYOUT (read-back
    * certifies what is on disk). */
  def writeZOrdered(df: DataFrame, tableDir: String, xCol: String,
      yCol: String, xDomain: Long, yDomain: Long): Unit = {
    require(xDomain > 0 && yDomain > 0,
      s"domains must be positive: $xDomain, $yDomain")
    df.withColumn("_xq", quant(xCol, xDomain))
      .withColumn("_yq", quant(yCol, yDomain))
      .withColumn("_zbucket", bucket("_xq", "_yq"))
      .withColumn("_z",
        graft.ops.ZOrder.morton2(col("_xq"), col("_yq"), Bits))
      .repartition(col("_zbucket")).sortWithinPartitions(col("_z"))
      .drop("_xq", "_yq", "_z")
      .write.mode("overwrite").partitionBy("_zbucket")
      .parquet(dataDir(tableDir))
    val spark = df.sparkSession
    spark.read.parquet(dataDir(tableDir))
      .groupBy(col("_zbucket"))
      .agg(min(col(xCol)).cast("long").as("x_min"),
        max(col(xCol)).cast("long").as("x_max"),
        min(col(yCol)).cast("long").as("y_min"),
        max(col(yCol)).cast("long").as("y_max"),
        count(lit(1)).as("n_rows"))
      .select(col("_zbucket").cast("long").as("bucket"), col("x_min"),
        col("x_max"), col("y_min"), col("y_max"), col("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir(tableDir))
  }

  /** The sidecar as a DataFrame (inspection / tests). */
  def stats(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(statsDir(tableDir))

  private def loadStats(spark: SparkSession,
      tableDir: String): Seq[ZStats] =
    stats(spark, tableDir)
      .select("bucket", "x_min", "x_max", "y_min", "y_max", "n_rows")
      .collect()
      .map(r => ZStats(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

  private def readBuckets(spark: SparkSession, tableDir: String,
      buckets: Seq[Long]): DataFrame =
    if (buckets.isEmpty)
      spark.read.parquet(dataDir(tableDir)).filter(lit(false))
        .drop("_zbucket")
    else
      spark.read.parquet(
        buckets.sorted.map(b => s"${dataDir(tableDir)}/_zbucket=$b"): _*)

  /** 2-D box lookup: prune by BOTH dimensions' zone maps driver-side,
    * then the exact predicate over surviving rectangles only. Returns
    * (buckets_total, buckets_scanned, rows). */
  def boxLookup(spark: SparkSession, tableDir: String, xCol: String,
      yCol: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long)
      : (Long, Long, DataFrame) = {
    val st = loadStats(spark, tableDir)
    val hit = st.filter(s => s.xMax >= xLo && s.xMin <= xHi
      && s.yMax >= yLo && s.yMin <= yHi).map(_.bucket)
    val rows = readBuckets(spark, tableDir, hit)
      .filter(col(xCol) >= xLo && col(xCol) <= xHi
        && col(yCol) >= yLo && col(yCol) <= yHi)
    (st.size.toLong, hit.size.toLong, rows)
  }
}
