package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index: per-bucket min/max zone maps plus a
  * per-bucket Bloom filter sidecar, with lookups that PRUNE the file
  * listing before any scan — the Delta/Iceberg "data skipping" layer
  * re-expressed over plain parquet directories.
  *
  * The reference exposes its lake as flat object listings
  * (/root/reference/app/utils/minio_client.py:40-52) and leaves every
  * read a full scan; at 100 TB a point lookup that touches every object
  * is the difference between seconds and hours. The layout here is the
  * standard remedy: cluster on the key at write time (bucket = key div
  * step, so bucket ranges are disjoint BY CONSTRUCTION — no sampling,
  * deterministic at any scale), and keep a sidecar of per-bucket stats:
  *
  *  - `min_key`/`max_key` zone map → range predicates prune to the
  *    overlapping buckets only;
  *  - a 16380-bit Bloom bitset (260 × 63-bit cells so the shift arithmetic is
  *    portable to engines that reject 1<<63; Kirsch-Mitzenmacher double
  *    hashing from one md5, the repo's standard portable hash family) over
  *    a SECONDARY column → point lookups on a non-clustered column prune
  *    to the Bloom-positive buckets (false positives cost a scan of one
  *    extra bucket; false negatives are impossible).
  *
  * Scale: the sidecar is O(buckets) rows of ~Words longs — KBs for a
  * layout whose data is TBs — so the driver-side prune is a bounded
  * metadata read (one row per bucket), never a data scan. Lookups then
  * read ONLY the surviving bucket directories; the scan cost is
  * proportional to the selectivity of the zone map / Bloom, not to the
  * table.
  */
object Skipping {

  /** Bloom geometry: 16380 = 260 × 63-bit cells (portable shifts — no
    * engine sees a 1<<63), k = 2. ~2 KB per bucket buys ≈9 bits per
    * distinct key at a few thousand keys/bucket → ~4% false-positive
    * buckets on absent-key probes; an undersized filter (the first cut
    * here was 504 bits) saturates and prunes nothing. */
  val M = 16380
  val K = 2
  val Words: Int = M / 63

  final case class BucketStats(bucket: Long, minKey: Long, maxKey: Long,
                               nRows: Long, bloom: Array[Long])

  private[graft] def dataDir(tableDir: String) = s"$tableDir/data"
  private[graft] def statsDir(tableDir: String) = s"$tableDir/_skip"

  /** Per-bucket stats of a frame that already carries `_bucket`:
    * (bucket, min_key, max_key, n_rows, bloom array<bigint>). The ONE
    * definition both the batch layout build and the streaming
    * incremental maintenance derive from. */
  private[graft] def statsFor(df: DataFrame, keyCol: String,
                              bloomCol: String): DataFrame = {
    val mm = df.groupBy(col("_bucket"))
      .agg(min(col(keyCol)).cast("long").as("min_key"),
        max(col(keyCol)).cast("long").as("max_key"),
        count(lit(1)).as("n_rows"))
    val bl = df
      .select(col("_bucket"), col(bloomCol).cast("string").as("_g"))
      .withColumn("_md5", md5(col("_g")))
      .withColumn("_h1",
        expr("cast(conv(substring(_md5, 1, 15), 16, 10) as bigint)"))
      .withColumn("_h2",
        expr("cast(conv(substring(_md5, 17, 15), 16, 10) as bigint) | 1"))
      .select(col("_bucket"), explode(expr(
        s"transform(sequence(0, ${K - 1}), i -> (_h1 + i * _h2) % $M)"))
        .as("p"))
      .groupBy(col("_bucket"), expr("p div 63").as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint)," +
        " cast(p % 63 as int)))").as("bits"))
      .groupBy(col("_bucket"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("mp"))
      .select(col("_bucket"), expr(
        s"transform(sequence(cast(0 as bigint), cast(${Words - 1} as" +
          " bigint)), w -> coalesce(element_at(mp, w)," +
          " cast(0 as bigint)))").as("bloom"))
    mm.join(bl, "_bucket")
      .select(col("_bucket").cast("long").as("bucket"), col("min_key"),
        col("max_key"), col("n_rows"), col("bloom"))
  }

  /** Merge two stats frames: min/max/count/bloom-OR are all associative
    * and commutative, so incremental maintenance is EXACT — merged
    * sidecar == a from-scratch build over the union (SkippingSpec /
    * FileStreamSpec pin it). */
  private[graft] def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket"))
      .agg(min(col("min_key")).as("min_key"),
        max(col("max_key")).as("max_key"),
        sum(col("n_rows")).as("n_rows"),
        expr(s"""aggregate(collect_list(bloom),
                |  transform(sequence(1, $Words), x -> cast(0 as bigint)),
                |  (acc, x) -> zip_with(acc, x, (u, v) -> u | v))"""
          .stripMargin.replace('\n', ' ')).as("bloom"))

  /** Write `df` clustered into `bucket = keyCol div step` directories and
    * build the stats sidecar FROM THE WRITTEN LAYOUT (read-back, so the
    * sidecar certifies what is actually on disk, not what was intended).
    * Two bounded jobs — a layout write and an O(buckets) stats
    * aggregation — the "pay the clustered write once" trade of every
    * prepared lake layout.
    */
  def writeIndexed(df: DataFrame, tableDir: String, keyCol: String,
                   bloomCol: String, step: Long): Unit = {
    require(step > 0, s"step must be positive, got $step")
    // repartition BY THE LAYOUT KEY before the partitioned write
    // (guide §8 step 4): each bucket directory then receives exactly
    // one file from exactly one task. Without it every input partition
    // writes its own file into every bucket it touches — with a
    // parallelized scan feeding this, that's inputPartitions × buckets
    // small files, and the read-back/stats pass pays for all of them.
    df.withColumn("_bucket", expr(s"$keyCol div $step"))
      .repartition(col("_bucket"))
      .write.mode("overwrite").partitionBy("_bucket")
      .parquet(dataDir(tableDir))
    val spark = df.sparkSession
    // stats from the WRITTEN layout (read-back) via the ONE shared
    // per-bucket recipe (statsFor) — one md5 per row, positions
    // bit-packed per (bucket, word), densified to a fixed array
    statsFor(spark.read.parquet(dataDir(tableDir)), keyCol, bloomCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir(tableDir))
  }

  /** The sidecar as a DataFrame (inspection / tests). */
  def stats(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(statsDir(tableDir))

  /** Bounded collect: one row per bucket — the sidecar IS the metadata,
    * reading it driver-side is the skipping design (same class as a
    * parquet footer probe, not a data scan). */
  private def loadStats(spark: SparkSession,
                        tableDir: String): Seq[BucketStats] =
    stats(spark, tableDir)
      .select("bucket", "min_key", "max_key", "n_rows", "bloom")
      .collect()
      .map(r => BucketStats(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getSeq[Long](4).toArray))
      .toSeq

  /** The engine-side twin of the relational probe arithmetic: one md5 of
    * the value's string form, 60-bit hex-prefix pair, k strided positions
    * mod M. MUST stay in lockstep with [[writeIndexed]]'s SQL (and with
    * every DuckDB twin replaying it). */
  private[graft] def probePositions(value: String): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(value.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(16, 31), 16) | 1L
    (0 until K).map(i => ((h1 + i * h2) % M).toInt)
  }

  private[graft] def bloomMightContain(bloom: Array[Long],
                                       value: String): Boolean =
    probePositions(value).forall { p =>
      ((bloom(p / 63) >> (p % 63)) & 1L) == 1L
    }

  /** Read ONLY the given buckets' directories; empty selection degrades
    * to a footer-only read of the full layout filtered to nothing (keeps
    * the schema without scanning data). */
  private def readBuckets(spark: SparkSession, tableDir: String,
                          buckets: Seq[Long]): DataFrame =
    if (buckets.isEmpty)
      // root-dir read surfaces the _bucket partition column that
      // bucket-dir reads don't — drop it so both paths share a schema
      spark.read.parquet(dataDir(tableDir)).filter(lit(false))
        .drop("_bucket")
    else
      spark.read.parquet(
        buckets.sorted.map(b => s"${dataDir(tableDir)}/_bucket=$b"): _*)

  /** Range lookup on the clustering key: zone-map prune, then the exact
    * predicate over the surviving buckets only. Returns
    * (buckets_total, buckets_scanned, rows). */
  def lookupRange(spark: SparkSession, tableDir: String, keyCol: String,
                  lo: Long, hi: Long): (Long, Long, DataFrame) = {
    val st = loadStats(spark, tableDir)
    val hit = st.filter(s => s.maxKey >= lo && s.minKey <= hi)
      .map(_.bucket)
    val rows = readBuckets(spark, tableDir, hit)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
    (st.size.toLong, hit.size.toLong, rows)
  }

  /** Point lookup on the Bloom-indexed secondary column: Bloom prune,
    * then the exact predicate over Bloom-positive buckets only. Returns
    * (buckets_total, buckets_scanned, rows). */
  def lookupPoint(spark: SparkSession, tableDir: String, bloomCol: String,
                  value: Long): (Long, Long, DataFrame) = {
    val st = loadStats(spark, tableDir)
    val hit = st.filter(s => bloomMightContain(s.bloom, value.toString))
      .map(_.bucket)
    val rows = readBuckets(spark, tableDir, hit)
      .filter(col(bloomCol) === value)
    (st.size.toLong, hit.size.toLong, rows)
  }
}
