package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}

/** Lake-facing I/O: the Spark-native analog of the reference's blob
  * ingest + object-store surface.
  *
  * The reference accepts any byte stream and types it purely by lower-cased
  * filename extension, `'unknown'` if none
  * (/root/reference/app/routes.py:115-125); its lake listing returns
  * `{name, size, last_modified}` triples (/root/reference/app/utils/
  * minio_client.py:50-62) with the per-tenant prefix filter commented out
  * (minio_client.py:52) — a bug we fix by actually applying the prefix.
  */
object LakeIO {

  /** Lower-cased filename extension, `"unknown"` when absent — the
    * reference's exact typing rule (/root/reference/app/routes.py:116-117).
    */
  def extensionOf(filename: String): String = {
    val base = filename.substring(filename.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot <= 0 || dot == base.length - 1) "unknown"
    else base.substring(dot + 1).toLowerCase
  }

  /** Extension-dispatch reader. Formats Spark reads natively map 1:1;
    * anything unrecognized falls back to `binaryFile` (opaque blob +
    * metadata), mirroring the reference's "any file is accepted" contract.
    */
  def readAuto(spark: SparkSession, path: String): DataFrame =
    extensionOf(path) match {
      case "parquet" => spark.read.parquet(path)
      case "csv"     => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(path)
      case "json" | "jsonl" | "ndjson" => spark.read.json(path)
      case "txt" | "text" | "log" => spark.read.text(path)
      case "orc"     => spark.read.orc(path)
      case _         => spark.read.format("binaryFile").load(path)
    }

  /** Row-level quarantine for semi-structured ingest: parse a JSON
    * string column against a schema and FLAG unparseable rows instead
    * of dropping or poisoning the batch — the standard bad-records
    * side-channel every ingest service needs. One pass, pure column
    * expressions; callers split with `.filter(col("_quarantined"))` /
    * its negation, or aggregate good/bad in a single shuffle (see
    * q_ingest_quarantine). A null input is NOT quarantined (absent ≠
    * malformed).
    */
  def parseWithQuarantine(df: DataFrame, jsonCol: String,
                          schema: org.apache.spark.sql.types.StructType,
                          parsedCol: String = "parsed"): DataFrame = {
    // PERMISSIVE from_json yields a struct of NULL FIELDS for malformed
    // input (not a null struct) — the corrupt-record column is the only
    // reliable malformed signal
    val withCorrupt = schema.add("_corrupt",
      org.apache.spark.sql.types.StringType)
    df.withColumn(parsedCol, from_json(col(jsonCol), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .withColumn("_quarantined",
        col(s"$parsedCol._corrupt").isNotNull)
  }

  /** Sink with the same extension dispatch. `partitionBy` produces
    * hive-style partition directories — the 100 TB layout: partition
    * pruning turns a full-lake scan into a directory lookup for any
    * query filtering on the partition columns.
    */
  def writeAuto(df: DataFrame, path: String,
                mode: SaveMode = SaveMode.Overwrite,
                partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode).partitionBy(partitionBy: _*)
    extensionOf(path) match {
      case "csv"  => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "orc"  => w.orc(path)
      case _      => w.parquet(path)
    }
  }

  /** Sink write with PIGGYBACKED accounting: the supplied metric
    * expressions ride the write job itself via `Dataset.observe`
    * (CollectMetrics), so admission stats — row count, null counts,
    * min/max — cost ZERO extra passes over the data. At 100 TB the
    * alternative is a second full-corpus scan per ingest; here the
    * aggregation happens inside the same tasks that write the files.
    * Returns the observed metrics row as a name → value map.
    */
  def writeObserved(df: DataFrame, path: String,
                    metrics: Seq[org.apache.spark.sql.Column],
                    mode: SaveMode = SaveMode.Overwrite)
      : Map[String, Any] = {
    require(metrics.nonEmpty, "at least one metric expression")
    val obs = org.apache.spark.sql.Observation()
    writeAuto(df.observe(obs, metrics.head, metrics.tail: _*), path, mode)
    obs.get
  }

  /** Configure a session for an S3-compatible object store (MinIO-style
    * endpoint, path-style access) — the reference's data plane
    * (/root/reference/app/utils/minio_client.py:9-15). Credentials come
    * from the environment/instance profile, never hard-coded (the
    * reference hard-codes them — app/config.py:19-21 — a bug class we
    * don't reproduce).
    *
    * The full object-store surface (this config + readAuto / writeAuto /
    * listing / compact over `s3a://` URIs) is integration-tested in
    * LakeIOSpec against a mock FileSystem registered under the s3a
    * scheme — the strongest evidence a zero-egress environment admits
    * (no endpoint, and no hadoop-aws jar on the classpath); S3A wire
    * behavior itself (multipart, committers, credentials) needs a real
    * endpoint + the hadoop-aws artifact.
    */
  def configureS3a(spark: SparkSession, endpoint: String,
                   pathStyle: Boolean = true): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.path.style.access", pathStyle.toString)
    conf.set("fs.s3a.connection.ssl.enabled",
      endpoint.startsWith("https").toString)
  }

  /** JDBC catalog source/sink (the reference's MySQL metadata store,
    * /root/reference/app/config.py:16). Partitioned reads via
    * (column, bounds, numPartitions) keep large catalog scans parallel.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties())
      : DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned JDBC read: `numPartitions` parallel range queries over
    * `[lower, upper]` of a numeric `column` — the form that keeps a large
    * catalog scan parallel instead of single-connection. (Integration-
    * tested against embedded Derby in JdbcSpec; the same call works for
    * any JDBC URL.)
    */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          column: String, lower: Long, upper: Long,
                          numPartitions: Int,
                          props: java.util.Properties =
                            new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, column, lower, upper, numPartitions, props)

  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append,
                props: java.util.Properties = new java.util.Properties())
      : Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Small-file compaction: rewrite a dataset directory into
    * `targetFiles` parquet files. The lake-maintenance op every
    * streaming/append pipeline needs — thousands of tiny files destroy
    * scan throughput (footer+task overhead per file) at scale.
    *
    * Swap discipline: the live directory is renamed ASIDE first, the
    * staged copy renamed into place, and only then is the old copy
    * deleted — a crash mid-swap leaves either the old or the new complete
    * table on disk (never neither), and every `rename` return value is
    * checked (HDFS-style filesystems report failure as `false`, not an
    * exception).
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val dest = new Path(path)
    val tmp = new Path(path.stripSuffix("/") + "._compacting")
    val old = new Path(path.stripSuffix("/") + "._pre_compact")
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a crashed run
    if (!fs.rename(dest, old))
      throw new java.io.IOException(s"compact: rename $dest -> $old failed")
    if (!fs.rename(tmp, dest)) {
      fs.rename(old, dest) // roll the live table back
      throw new java.io.IOException(s"compact: rename $tmp -> $dest failed")
    }
    fs.delete(old, true)
  }

  /** Versioned table publish — Delta-style time travel with nothing but
    * directories and an atomic rename: each publish stages into
    * `_staging`, then renames to `v=<n+1>` (rename is the commit point —
    * readers either see the complete new version or don't see it at
    * all; a crashed publish leaves only `_staging` garbage that the
    * next publish clears). Returns the committed version number.
    *
    * At 100 TB this is the snapshot-isolation layer an ETL service
    * publishes through: writers never mutate a live version, readers
    * pin a version for a whole job, retention is `delete v=k`. (A real
    * object store without atomic rename swaps a manifest file instead —
    * same contract, one indirection more.)
    */
  def writeVersioned(df: DataFrame, tableDir: String): Int = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val staging = new Path(root, "_staging")
    if (fs.exists(staging)) fs.delete(staging, true) // crashed publish
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val next = latestVersion(fs, root).getOrElse(0) + 1
    val dest = new Path(root, s"v=$next")
    if (!fs.rename(staging, dest))
      throw new java.io.IOException(
        s"writeVersioned: commit rename $staging -> $dest failed")
    next
  }

  /** Read a published version (`Some(n)`) or the latest (`None`).
    * Fails loudly on an empty table or a missing pinned version —
    * silently reading nothing would defeat the snapshot contract.
    */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Option[Int] = None): DataFrame = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = version.orElse(latestVersion(fs, root)).getOrElse(
      throw new java.util.NoSuchElementException(
        s"readVersion: no published versions under $tableDir"))
    val dest = new Path(root, s"v=$v")
    if (!fs.exists(dest))
      throw new java.util.NoSuchElementException(
        s"readVersion: version $v not found under $tableDir")
    spark.read.parquet(dest.toString)
  }

  /** Version history → (version, n_files, bytes) per published version. */
  def versions(spark: SparkSession, tableDir: String): Seq[(Int, Int, Long)] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versionDirs(fs, root).sorted.map { v =>
      val files = fs.listStatus(new Path(root, s"v=$v"))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      (v, files.length, files.map(_.getLen).sum)
    }
  }

  /** Retention vacuum for a versioned table: delete every published
    * version older than the newest `keep` (time-travel horizon =
    * storage cost — the Delta/Iceberg VACUUM trade). Guard rails:
    * `keep ≥ 1` always (the current version is never collectable),
    * `_staging` is untouched (an in-flight publish must survive a
    * concurrent vacuum — the rename commit decides its fate), and
    * deletion walks OLDEST-FIRST so a crash mid-vacuum leaves a
    * contiguous recent suffix, never a hole between surviving
    * versions.
    *
    * @return the version numbers actually deleted, ascending.
    */
  def vacuumVersions(spark: SparkSession, tableDir: String,
                     keep: Int): Seq[Int] = {
    require(keep >= 1, "vacuum must keep at least the current version")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionDirs(fs, root).sorted
    val victims = vs.dropRight(keep)
    victims.foreach { v =>
      if (!fs.delete(new Path(root, s"v=$v"), true))
        throw new java.io.IOException(
          s"vacuumVersions: delete of v=$v under $tableDir failed")
    }
    victims
  }

  private def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
                          root: Path): Seq[Int] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toInt }

  private def latestVersion(fs: org.apache.hadoop.fs.FileSystem,
                            root: Path): Option[Int] =
    versionDirs(fs, root).maxOption

  /** Lake listing → DataFrame[name, size, last_modified], recursive, with
    * the per-tenant `prefix` filter the reference intended but disabled.
    *
    * Implemented over the `binaryFile` source selecting METADATA columns
    * only — `content` is pruned, so no file byte is ever read. This is
    * the 100 TB shape: Spark's file index parallelizes the directory walk
    * across the cluster once the leaf count passes
    * `spark.sql.sources.parallelPartitionDiscovery.threshold` (a
    * driver-side `fs.listFiles` loop over millions of objects was the
    * previous, non-scalable form). Note the data-source convention:
    * `_`/`.`-prefixed files (e.g. `_SUCCESS`) are treated as hidden and
    * excluded, which is what a lake catalog wants anyway.
    */
  def listing(spark: SparkSession, dir: String,
              prefix: String = ""): DataFrame = {
    import org.apache.spark.sql.functions.{col, substring}
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPrefix = fs.makeQualified(root).toString + "/"
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        substring(col("path"), rootPrefix.length + 1, Int.MaxValue)
          .as("name"),
        col("length").as("size"),
        col("modificationTime").as("last_modified"))
      .filter(col("name").startsWith(prefix))
  }
}
