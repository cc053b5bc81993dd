package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical loaders for the driver-generated fixture tables
  * (`/root/repo/TESTDATA.md`). The reference treats data files as untyped
  * blobs keyed by filename (`/root/reference/app/routes.py:115-125`); our
  * engine's analog of its "bucket" is a scale-factor directory of Parquet
  * tables, loaded lazily so Catalyst sees the full plan (pushdown + pruning
  * reach the scan).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else parallelized(spark, spark.read.parquet(s"$dir/$name.parquet"),
      s"$dir/$name.parquet")

  /** Scale-adaptive scan parallelization (optimization guide §2.2/§6).
    *
    * The fixture parquet files are single-row-group and far below
    * `spark.sql.files.maxPartitionBytes`, so every scan plans as ONE
    * task — and with it the whole map-side pipeline above the first
    * exchange (explode / shingle / hash / partial-aggregate, where
    * most of this fleet's per-query CPU lives) serializes onto one of
    * the 32 cores: measured wall ≈ total CPU on the map-heavy queries
    * (q_text_heavy_hitters 5.5 s wall / 5.8 s CPU before; 0.9 s
    * after). A round-robin repartition of the few-MB base table costs
    * one tiny exchange and unlocks full-core map parallelism.
    *
    * The rule is derived from the data, not a constant tuned to
    * local[32]: it fires only when the PLANNED scan parallelism
    * (which already reflects file count, row-group splits and
    * maxPartitionBytes) is under half the cluster's default
    * parallelism AND the table's on-disk size is below a small-table
    * ceiling (default 1 GiB compressed, `SPARK_GRAFT_REPART_MAX_MB`).
    * At 100 TB both guards fail — big tables split natively into
    * thousands of scan tasks and never reach the repartition — so the
    * production plan is byte-identical to the unhooked read; tiny
    * dimension tables (region/nation/…) stay untouched too (they
    * broadcast; an exchange would be pure overhead). Filters and
    * column pruning push through Repartition (PushPredicateThroughNonJoin
    * /ColumnPruning), so PushedFilters/ReadSchema at the scan are
    * unchanged — asserted in PlanSpec.
    */
  private val repartMaxBytes: Long =
    sys.env.getOrElse("SPARK_GRAFT_REPART_MAX_MB", "1024").toLong << 20
  // floor: sub-256KB tables are broadcast-bound dimensions — an extra
  // exchange is pure overhead there. Env-tunable so the sf0.01 oracle
  // gate can be run with the floor lowered, exercising the repartition
  // on EVERY table at the scale the DuckDB compare certifies.
  private val repartMinBytes: Long =
    sys.env.getOrElse("SPARK_GRAFT_REPART_MIN_KB", "256").toLong << 10

  private[io] def parallelized(spark: SparkSession, df: DataFrame,
      path: String): DataFrame =
    try {
      val bytes = {
        import org.apache.hadoop.fs.Path
        val p = new Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      }
      val cores = spark.sparkContext.defaultParallelism
      if (bytes >= repartMinBytes && bytes <= repartMaxBytes &&
          df.rdd.getNumPartitions * 2 < cores)
        df.repartition(cores)
      else df
    } catch { case scala.util.control.NonFatal(_) => df }

  /** The producer has shipped `events.ts` under more than one physical
    * parquet type (TIMESTAMP(NANOS) historically, timestamp-micros today),
    * so the loader dispatches on the *observed* schema instead of
    * hard-coding one encoding — the engine analog of the reference typing
    * blobs only at read time (`/root/reference/app/routes.py:115-125`):
    *
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]), so retry the read with
    *     `spark.sql.legacy.parquet.nanosAsLong` (set only on this branch;
    *     it must stay set for the scan's runtime) and truncate Long nanos
    *     to microseconds — the same truncation DuckDB applies casting
    *     TIMESTAMP_NS → TIMESTAMP, so oracle comparisons line up.
    *   - timestamp-micros without timezone arrives as TIMESTAMP_NTZ: cast
    *     to session-TZ TIMESTAMP (exact under the engine's UTC session TZ,
    *     and DuckDB reads the same file natively).
    *   - anything else (already TIMESTAMP, or a future encoding): pass
    *     through untouched.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    parallelized(spark, eventsFrom(spark, s"$dir/events.parquet"),
      s"$dir/events.parquet")

  private[io] def eventsFrom(spark: SparkSession, path: String): DataFrame =
    normalizeEventTs(eventsRawRead(spark, path))

  /** Batch read of the events file, set up under the nanos-as-long
    * legacy conf when the footer carries TIMESTAMP(NANOS). The conf is
    * touched ONLY when the footer really is nanos and must remain set for
    * the scan's runtime (the vectorized reader re-checks the type per row
    * group). Detection reads the parquet footer's logical type directly —
    * no matching on exception-message text, which drifts across Spark
    * versions and locales.
    */
  private[io] def eventsRawRead(spark: SparkSession, path: String): DataFrame = {
    if (footerTsIsNanos(spark, path))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  /** Driver-side footer probe: does `ts` in `path` (one parquet file, or
    * the first data file of a directory) carry TIMESTAMP with NANOS unit?
    * Probe failures (missing path, non-parquet bytes) return false — the
    * actual `spark.read` that follows surfaces the genuine error with its
    * normal shape, so nothing is swallowed.
    */
  private[io] def footerTsIsNanos(spark: SparkSession, path: String): Boolean =
    try {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .find(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
            .getOrElse(return false)
        else p
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") && {
          schema.getFields.get(schema.getFieldIndex("ts"))
            .getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          }
        }
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Driver-side footer statistic: total UNCOMPRESSED byte size of one
    * column across all row groups of `path` (single file or directory
    * of parquet parts). No Spark job runs — this is the lazy
    * alternative to a `count()` when a plan needs a cheap UPPER bound
    * at construction time (e.g. `Dedup.ngramJaccardPairs`' vocabulary
    * regime: distinct k-shingles ≤ shingle occurrences ≤ text bytes).
    * None when the path/column can't be probed — callers fall back to
    * their eager path.
    */
  def columnUncompressedBytes(spark: SparkSession, path: String,
                              column: String): Option[Long] =
    try {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => !f.getName.startsWith("_") &&
              !f.getName.startsWith("."))
            .toSeq
        else Seq(p)
      var total = 0L
      files.foreach { f =>
        val reader =
          ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getFooter.getBlocks.asScala.foreach { bl =>
          bl.getColumns.asScala
            .filter(_.getPath.toDotString == column)
            .foreach(c => total += c.getTotalUncompressedSize)
        } finally reader.close()
      }
      if (total > 0) Some(total) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Normalize `ts` to session-TZ TIMESTAMP whatever physical type the
    * producer shipped (works on batch and streaming frames alike). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long path; integral `div`, NOT `/`: Column./ is double
        // division and doubles can't hold epoch-nanos exactly
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Streaming twin of [[events]]: a file-stream source over the single
    * events fixture file, with the same observed-schema ts dispatch as the
    * batch loader (the file-stream source monitors directories, hence the
    * one-file glob).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRawRead(spark, s"$dir/events.parquet")
    normalizeEventTs(
      spark.readStream.schema(raw.schema)
        .option("basePath", dir)
        .parquet(s"$dir/{events.parquet}"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
