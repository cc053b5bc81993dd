package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Structured-Streaming operator surface (SURVEY.md §2-B "Streaming").
  *
  * Every transform here takes/returns DataFrame and works identically on a
  * batch frame or a `readStream` frame — the Spark-native way to keep one
  * operator library for both. Streaming-only pieces (watermark, stateful
  * dedup, arbitrary state) are thin named wrappers so pipelines declare
  * intent.
  */
object StreamOps {

  /** Tumbling-window aggregate: rows per (window, event_type) with count
    * and exact 2-decimal sum.
    */
  def tumblingCounts(events: DataFrame, tsCol: String,
                     width: String): DataFrame =
    events.groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Sliding-window aggregate. */
  def slidingCounts(events: DataFrame, tsCol: String,
                    width: String, slide: String): DataFrame =
    events.groupBy(window(col(tsCol), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows per user: gap-based sessionization. */
  def sessionCounts(events: DataFrame, tsCol: String,
                    gap: String): DataFrame =
    events.groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))

  /** Scratch dir for ephemeral streaming state/sinks (the registry's
    * self-contained streamed queries): prefers the tmpfs mount when
    * present — the state store fsyncs per batch, and on spinning /tmp
    * that IO dominates small runs. Durable pipelines must point
    * checkpoints at reliable storage instead; this is for
    * run-and-discard evaluation only.
    */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Stream-static (dimension) enrichment join — the canonical streaming
    * star-schema shape: each micro-batch of the stream hash-joins against
    * a broadcast of the static dimension, so the stream side never
    * shuffles and no streaming state is kept (stream-static inner joins
    * are stateless by construction). At cluster scale the dimension
    * broadcast is re-read per batch only when the underlying files
    * change.
    */
  def staticEnrich(stream: DataFrame, dim: DataFrame,
                   streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey))

  /** Watermarked variant of any of the above: call before aggregating. */
  def withLateness(events: DataFrame, tsCol: String,
                   lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)

  /** Streaming dedup on event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join on a key within an event-time interval:
    * right.ts ∈ [left.ts − lower, left.ts + upper]. Works identically on
    * batch frames (plain join) and on two `readStream` frames — in the
    * streaming case BOTH sides must be watermarked (see
    * `withLateness`), and it is exactly the watermark + interval bound
    * that lets Spark evict join state: a buffered row can be dropped once
    * the other side's watermark passes its ts + bound, so state is
    * O(rate × interval), not unbounded.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, leftTs: String, rightTs: String,
                   lower: String, upper: String): DataFrame = {
    val l = col(s"l.$leftTs")
    val r = col(s"r.$rightTs")
    left.alias("l").join(right.alias("r"),
      col(s"l.$key") === col(s"r.$key") &&
        r >= l - expr(s"INTERVAL $lower") &&
        r <= l + expr(s"INTERVAL $upper"))
  }

  // ---- arbitrary stateful processing (mapGroupsWithState) ----

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Running per-user totals via mapGroupsWithState — the exemplar for
    * custom state machines (processing-time timeout keeps state bounded).
    */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], st: GroupState[UserRunning]) =>
          val prev = st.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, total) = it.foldLeft((prev.n, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          val next = UserRunning(uid, n, total)
          st.update(next)
          next
      }
  }

  case class OpenSession(start: Long, end: Long, n: Long)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

  /** Custom sessionization via flatMapGroupsWithState + EventTimeTimeout —
    * the arbitrary-state surface `session_window` can't reach (emit
    * arbitrary rows per group per trigger, timeout-driven finalization).
    * A session closes either when a later event arrives past the gap
    * (emitted in that batch) or when the WATERMARK passes its end + gap
    * (the timeout fires with no new data — the part that needs
    * flatMapGroupsWithState). Input must be watermarked (`withLateness`)
    * for EventTimeTimeout to be legal. State per key is one open session:
    * O(keys), not O(events).
    *
    * All session arithmetic is in epoch MICROSECONDS (TimestampType's
    * native precision) — `Timestamp.getTime` is millis and would silently
    * truncate micro-precision event times, corrupting session bounds.
    * Only the timeout registration rounds to millis (GroupState's API
    * unit): it is set to the ms-floor of end + gap, and GroupState
    * event-time timeouts fire only when timeoutTimestamp < watermark
    * STRICTLY — so an idle session closes in the first batch whose
    * watermark ms-floor strictly exceeds end + gap's ms-floor (boundary
    * pinned by FileStreamSpec "timeout boundary"; that inequality is
    * what q_stream_session_state's oracle twin encodes).
    */
  def sessionizeWithState(events: Dataset[UserEvent],
                          gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapUs = gapMs * 1000L
    def toUs(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[UserEvent], st: GroupState[OpenSession]) =>
          def finish(s: OpenSession) = UserSession(uid,
            toTs(s.start), toTs(s.end), s.n)
          if (st.hasTimedOut) {
            val out = st.getOption.map(finish).iterator
            st.remove()
            out
          } else {
            // per-batch, per-key buffer: bounded by one key's batch volume
            val sorted = rows.toSeq.sortBy(e => toUs(e.ts))
            val closed = scala.collection.mutable.Buffer.empty[UserSession]
            var open = st.getOption
            for (e <- sorted) {
              val t = toUs(e.ts)
              open = open match {
                case Some(s) if t - s.end <= gapUs =>
                  Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += finish(s)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              st.update(s)
              // ms-floor of end+gap (timeouts fire strictly past it);
              // never at/behind the current watermark (Spark rejects it)
              st.setTimeoutTimestamp(
                math.max((s.end + gapUs) / 1000L,
                  st.getCurrentWatermarkMs + 1L))
            }
            closed.iterator
          }
      }
  }

  /** Streaming upsert into a keyed parquet table via foreachBatch: each
    * micro-batch is merged with the current table state — new keys
    * appended, existing keys replaced by the latest row (max ts wins).
    * The pattern for continuously-deduplicated lake ingest when the sink
    * format has no native MERGE.
    *
    * PARTITION-SCOPED at scale: the table is laid out as
    * `bucket=<hash(key) mod buckets>` partitions, and a batch rewrites
    * ONLY the partitions containing its keys — untouched buckets are
    * neither read (partition pruning on the bucket dirs) nor written.
    * Per-batch cost is O(affected buckets + batch), not O(table): the
    * property that keeps continuous ingest viable when the table is
    * 100 TB and a batch touches a sliver of the key space. Size
    * `buckets` so one bucket ≈ a comfortable rewrite unit (table size /
    * buckets); a table format with real transactions (row-level MERGE)
    * would replace the per-partition swap.
    */
  def upsertSink(df: DataFrame, keyCol: String, tsCol: String,
                 tablePath: String, checkpoint: String,
                 buckets: Int = 16): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, keyCol, tsCol, tablePath, buckets)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One partition-scoped upsert merge (the foreachBatch body of
    * `upsertSink`, exposed for direct batch use and tests).
    *
    * Every affected partition is swapped with the rename-aside
    * discipline (same as LakeIO.compact): the live partition is never
    * deleted before its replacement is in place, rename() returns are
    * checked, and a failed swap rolls the partition back — a crash
    * leaves every partition complete (old or new, never absent). The
    * replaced-aside dir is dot-prefixed so readers' partition discovery
    * never sees it.
    */
  def upsertBatch(rawBatch: DataFrame, keyCol: String, tsCol: String,
                  tablePath: String, buckets: Int): Unit = {
    val spark = rawBatch.sparkSession
    val batch = rawBatch.withColumn("bucket",
      pmod(xxhash64(col(keyCol)), lit(buckets)).cast("int"))
    // bucket ids present in the batch: ≤ `buckets` ints — a bounded
    // driver-side action (partition bookkeeping), not a data collect
    val affected = batch.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (affected.isEmpty) return
    val dest = new org.apache.hadoop.fs.Path(tablePath)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // read ONLY the affected bucket partitions of the current table
    val existingDirs = affected
      .map(b => new org.apache.hadoop.fs.Path(dest, s"bucket=$b"))
      .filter(fs.exists(_)).map(_.toString)
    val merged =
      if (existingDirs.isEmpty) batch
      else spark.read.option("basePath", tablePath)
        .parquet(existingDirs.toIndexedSeq: _*)
        .unionByName(batch, allowMissingColumns = true)
    import org.apache.spark.sql.expressions.Window
    val latest = merged.withColumn("_rn",
        row_number().over(Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val tmp = new org.apache.hadoop.fs.Path(
      tablePath.stripSuffix("/") + "._staged")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    latest.write.partitionBy("bucket").mode("overwrite")
      .parquet(tmp.toString)
    fs.mkdirs(dest)
    for (b <- affected) {
      val dPart = new org.apache.hadoop.fs.Path(dest, s"bucket=$b")
      val tPart = new org.apache.hadoop.fs.Path(tmp, s"bucket=$b")
      val oPart = new org.apache.hadoop.fs.Path(dest, s".replaced_bucket=$b")
      if (fs.exists(oPart)) fs.delete(oPart, true)
      val hadOld = fs.exists(dPart)
      if (hadOld && !fs.rename(dPart, oPart))
        throw new java.io.IOException(
          s"upsertBatch: rename $dPart -> $oPart failed")
      if (!fs.rename(tPart, dPart)) {
        if (hadOld) fs.rename(oPart, dPart) // roll back
        throw new java.io.IOException(
          s"upsertBatch: rename $tPart -> $dPart failed")
      }
      if (hadOld) fs.delete(oPart, true)
    }
    fs.delete(tmp, true)
    ()
  }

  /** Streaming corpus ingestion with cross-batch NEAR-dedup — the
    * LLM-training-data front door: each micro-batch of documents is
    * near-deduped (MinHash-LSH) against the already-accepted corpus AND
    * within itself, and only survivors append.
    *
    * Batch-internal policy is greedy by id (the smaller id of a dup
    * pair survives) — cheap and deterministic; chains collapse to their
    * min-id representative only when pairs overlap, which is the
    * standard streaming-ingest trade (full transitive clustering is the
    * batch `dedupComponents` operator).
    *
    * Scale shape: the accepted corpus's minhash SIGNATURES persist as
    * an incremental index (`<corpusPath>._sigs`, 32 longs per doc)
    * maintained in the same per-batch transaction — each batch pays
    * shingling only for ITSELF; the corpus side is a straight read of
    * the index, and the candidate join shuffles band keys and id
    * pairs, never documents.
    */
  def dedupIngest(stream: DataFrame, idCol: String, textCol: String,
                  corpusPath: String, checkpoint: String,
                  threshold: Double = 0.9): Unit = {
    val sigPath = corpusPath.stripSuffix("/") + "._sigs"
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        graft.ops.CacheScope.scoped {
          val bSigs = graft.ops.CacheScope.cached(
            graft.ops.Dedup.minhashSignatures(batch, idCol, textCol,
              k = 5, numHashes = 32))
          val cSigs =
            try spark.read.parquet(sigPath)
            catch { case _: Throwable => bSigs.limit(0) }
          val pairs = graft.ops.Dedup.minhashPairsFromSigs(
            cSigs, bSigs, bands = 8, rowsPerBand = 4,
            threshold = threshold)
          // id_b is always a batch doc (corpus-batch pairs), and the
          // larger id of a batch-batch pair — dropping id_b keeps the
          // accepted/earlier side. Anti-joins, never a driver collect.
          val dropIds = graft.ops.CacheScope.cached(
            pairs.select(col("id_b").as(idCol)).distinct())
          val survivors = batch.join(dropIds, Seq(idCol), "left_anti")
          survivors.write.mode("append").parquet(corpusPath)
          // the index update is the same transaction's second write
          bSigs.join(dropIds.select(col(idCol).as("id")), Seq("id"),
              "left_anti")
            .write.mode("append").parquet(sigPath)
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Default sink for bounded streaming runs in tests/pipelines:
    * AvailableNow trigger + append/update mode, checkpointed.
    */
  def boundedRun(df: DataFrame, checkpoint: String, queryName: String,
                 mode: OutputMode = OutputMode.Update()): Unit = {
    val q = df.writeStream
      .format("memory").queryName(queryName)
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
