package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Small-file COMPACTION PLANNER — the maintenance pass every lake
  * needs once streaming ingest (StreamOps.dedupIngest and friends)
  * has appended a few thousand micro-batch part-files: group small
  * files into target-size rewrite bins so a later rewrite job reads
  * each bin and writes one right-sized file.
  *
  * The packing rule is streaming next-fit over the size-descending
  * manifest: with running total RT (inclusive), a file starts bin
  * ⌊(RT − size)/target⌋ — every bin except possibly the last is
  * filled to ≥ target once its first file lands, and overflows by at
  * most one file (the Hive/Iceberg bin-pack compaction heuristic
  * class; exact bin packing is NP-hard and pointless here — bins are
  * free to overflow slightly because the rewrite splits row groups).
  * Descending order keeps the oversized files alone in their own
  * bins instead of straggling small files behind them.
  *
  * Scale shape: the planner runs on the MANIFEST (one row per file —
  * metadata, not data; millions of rows at 100 TB), and the global
  * size-ordered running sum runs as the range-partitioned two-pass
  * prefix sum ([[graft.ops.Prefix]]): per-range local cumsums plus a
  * carry-in over per-partition totals, so a million-file manifest
  * never serializes through one window task. The plan itself is the
  * output — the rewrite jobs it drives are embarrassingly parallel
  * per bin.
  */
object Compaction {

  /** Assign each manifest row to a compaction bin.
    *
    * @param files   manifest with `idCols` identifying a file and
    *                `sizeCol` its byte size
    * @param target  bin target size in bytes
    * @return one row per file: idCols, size_bytes, bin, bin_files,
    *         bin_bytes — ordered by (bin, size desc, idCols)
    */
  def plan(files: DataFrame, idCols: Seq[String], sizeCol: String,
      target: Long): DataFrame = {
    require(target > 0, s"target must be positive: $target")
    val ord = col(sizeCol).desc +: idCols.map(col)
    val binned = graft.ops.Prefix.runningSumInclusive(
      files.withColumn("size_bytes", col(sizeCol).cast("long")),
      ord, col("size_bytes"), "rt")
      .withColumn("bin", expr(s"(rt - size_bytes) div $target"))
    val wb = Window.partitionBy(col("bin"))
    binned
      .withColumn("bin_files", count(lit(1)).over(wb))
      .withColumn("bin_bytes", sum(col("size_bytes")).over(wb))
      .select((idCols.map(col) ++ Seq(col("size_bytes"), col("bin"),
        col("bin_files"), col("bin_bytes"))): _*)
      .orderBy((col("bin") +: ord): _*)
  }

  /** Plan over a real directory's part-files: a driver-side FS
    * listing (metadata only — no data is read) feeding [[plan]].
    * Listing cost is one NameNode/object-store LIST per directory —
    * the same call any table format's manifest scan makes.
    */
  def planDirectory(spark: SparkSession, path: String, target: Long)
  : DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.getName, s.getLen))
    import spark.implicits._
    plan(files.toDF("file", "len"), Seq("file"), "len", target)
  }
}
