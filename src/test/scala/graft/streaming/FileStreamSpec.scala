package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkTestBase

/** End-to-end file-source streaming: parquet-in → windowed agg →
  * parquet-out with checkpointing, bounded by Trigger.AvailableNow —
  * the §2-B "Streaming source/sink" row at integration level.
  */
class FileStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("file stream: parquet source → tumbling agg → parquet sink") {
    val in = Files.createTempDirectory("fs-in").toString
    val out = Files.createTempDirectory("fs-out").toString
    val cp = Files.createTempDirectory("fs-cp").toString

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 00:01:00"), "click", 1.0),
      (2L, ts("2024-01-01 00:04:00"), "click", 2.0),
      (3L, ts("2024-01-01 00:07:00"), "view", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val agg = StreamOps.tumblingCounts(
      StreamOps.withLateness(stream, "ts", "1 minute"), "ts", "5 minutes")

    val q = agg.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // Append mode only emits windows finalized by the watermark; the
    // last window (00:05) stays open → expect exactly the 00:00 window.
    val result = spark.read.parquet(out)
      .select($"window.start".cast("string"), $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(result == Set(("2024-01-01 00:00:00", "click", 2L)))

    // restart from the same checkpoint with no new data → no duplicates
    val q2 = agg.writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 1)
  }

  test("sliding and session windows run under readStream (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[graft.streaming.Ev](spark)
    mem.addData(
      graft.streaming.Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
      graft.streaming.Ev(2, ts("2024-01-01 00:40:00"), 1, "click", 1.0),
      graft.streaming.Ev(3, ts("2024-01-01 02:00:00"), 1, "click", 1.0))

    val cp1 = Files.createTempDirectory("cp-sl").toString
    val sliding = StreamOps.slidingCounts(mem.toDF(), "ts", "1 hour",
      "30 minutes")
    val q1 = sliding.writeStream.format("memory").queryName("sl")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", cp1)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    // event 1 ∈ windows [23:30,00:30) and [00:00,01:00); event 2 ∈
    // [00:00,01:00) and [00:30,01:30) → the 00:00 window holds both
    val sl = spark.sql("SELECT CAST(window.start AS STRING), n FROM sl")
      .as[(String, Long)].collect().toMap
    assert(sl("2024-01-01 00:00:00") == 2)
    assert(sl("2023-12-31 23:30:00") == 1)

    val cp2 = Files.createTempDirectory("cp-se").toString
    val session = StreamOps.sessionCounts(mem.toDF(), "ts", "45 minutes")
    val q2 = session.writeStream.format("memory").queryName("se")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", cp2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // events 1+2 merge (gap 30m < 45m); event 3 starts a new session
    val se = spark.sql("SELECT n_events FROM se").as[Long].collect().sorted
    assert(se.toSeq == Seq(1L, 2L))
  }

  test("file stream: session windows close at the watermark, survive restart") {
    val in = Files.createTempDirectory("se-in").toString
    val out = Files.createTempDirectory("se-out").toString
    val cp = Files.createTempDirectory("se-cp").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // batch 1: two events 9 min apart (one session, gap 30m) + one event
    // far enough ahead to push the watermark past that session's close
    Seq(
      (1L, ts("2024-01-01 00:01:00"), 7L, 1.0),
      (2L, ts("2024-01-01 00:10:00"), 7L, 2.0),
      (3L, ts("2024-01-01 02:00:00"), 7L, 3.0))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(in)

    val schema = spark.read.parquet(in).schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val agg = StreamOps.sessionCounts(
        StreamOps.withLateness(stream, "ts", "1 minute"), "ts", "30 minutes")
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    // watermark 01:59 closes session [00:01, 00:40); [02:00, …) stays open
    val first = spark.read.parquet(out)
      .select($"session_window.start".cast("string"), $"n_events")
      .as[(String, Long)].collect().toSet
    assert(first == Set(("2024-01-01 00:01:00", 2L)))

    // batch 2 (new file, SAME checkpoint): advances the watermark past the
    // second session's close → restart emits it exactly once
    Seq((4L, ts("2024-01-01 03:30:00"), 7L, 4.0))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("append").parquet(in)
    run()
    val second = spark.read.parquet(out)
      .select($"session_window.start".cast("string"), $"n_events")
      .as[(String, Long)].collect().toSet
    assert(second == Set(
      ("2024-01-01 00:01:00", 2L),
      ("2024-01-01 02:00:00", 1L)))
  }

  test("flatMapGroupsWithState sessionization: gap-close and timeout-close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[graft.streaming.StreamOps.UserEvent](spark)
    val sessions = StreamOps.sessionizeWithState(
      StreamOps.withLateness(mem.toDF(), "ts", "1 minute")
        .as[graft.streaming.StreamOps.UserEvent],
      gapMs = 30L * 60 * 1000)
    val cp = Files.createTempDirectory("fmgs-cp").toString
    val out = Files.createTempDirectory("fmgs-out").toString
    def drain(): Unit = {
      // parquet sink: supports checkpoint recovery (memory sink doesn't),
      // so the second drain resumes the same state store
      val q = sessions.writeStream.format("parquet")
        .option("path", out)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emitted() = spark.read.parquet(out)
      .select($"user_id", $"session_start".cast("string"), $"n_events")
      .as[(Long, String, Long)].collect().toSet

    // batch 1: user 1's third event is past the gap → first session
    // closes IN-BATCH; then AvailableNow's follow-up trigger sees the
    // watermark at 01:59, past user 2's 00:35 close → user 2's session
    // closes by TIMEOUT with no new events. User 1's second session
    // (ends 02:00, gap to 02:30) is still open.
    mem.addData(
      StreamOps.UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
      StreamOps.UserEvent(1L, ts("2024-01-01 00:10:00"), 1.0),
      StreamOps.UserEvent(1L, ts("2024-01-01 02:00:00"), 1.0),
      StreamOps.UserEvent(2L, ts("2024-01-01 00:05:00"), 1.0))
    drain()
    assert(emitted() == Set(
      (1L, "2024-01-01 00:00:00", 2L),
      (2L, "2024-01-01 00:05:00", 1L)))

    // batch 2: a far-future event advances the watermark past the last
    // open session's close → it too emits by timeout
    mem.addData(StreamOps.UserEvent(9L, ts("2024-01-01 10:00:00"), 1.0))
    drain()
    assert(emitted() == Set(
      (1L, "2024-01-01 00:00:00", 2L),
      (1L, "2024-01-01 02:00:00", 1L),
      (2L, "2024-01-01 00:05:00", 1L)))
  }

  test("sessionizeWithState timeout boundary: fires once watermark reaches the ms after end+gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[graft.streaming.StreamOps.UserEvent](spark)
    val sessions = StreamOps.sessionizeWithState(
      StreamOps.withLateness(mem.toDF(), "ts", "0 seconds")
        .as[graft.streaming.StreamOps.UserEvent],
      gapMs = 60L * 1000)
    val cp = Files.createTempDirectory("fmgs-b-cp").toString
    val out = Files.createTempDirectory("fmgs-b-out").toString
    def drain(): Unit = {
      val q = sessions.writeStream.format("parquet").option("path", out)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emittedA() = spark.read.parquet(out)
      .filter($"user_id" === 1L).count()

    // user 1 @ 00:00:00.000, gap 60 s → timeout registered at 60000 ms
    // (the ms-floor of end+gap). Watermark exactly 60000 (== end+gap)
    // must NOT close it: GroupState event-time timeouts fire only when
    // timeoutTimestamp < watermark STRICTLY...
    mem.addData(
      StreamOps.UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
      StreamOps.UserEvent(8L, ts("2024-01-01 00:01:00"), 1.0))
    drain()
    assert(emittedA() == 0, "watermark == end+gap must not close the session")

    // ...watermark 60001 (one ms past end+gap) MUST close it.
    val t2 = ts("2024-01-01 00:01:00"); t2.setNanos(1000000) // + 1 ms
    mem.addData(StreamOps.UserEvent(9L, t2, 1.0))
    drain()
    assert(emittedA() == 1, "watermark one ms past end+gap must close the session")
  }

  test("stream-stream interval join matches its batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // impressions and clicks; a click joins an impression of the same
    // user within [0, 10 minutes] after it
    val imps = Seq(
      (7L, ts("2024-01-01 00:00:00"), 100L),
      (7L, ts("2024-01-01 00:20:00"), 101L),
      (8L, ts("2024-01-01 00:00:00"), 102L))
    val clicks = Seq(
      (7L, ts("2024-01-01 00:05:00"), 900L),  // joins imp 100 only
      (7L, ts("2024-01-01 00:25:00"), 901L),  // joins imp 101 only
      (8L, ts("2024-01-01 00:30:00"), 902L))  // too late for imp 102

    val impDf = imps.toDF("user_id", "imp_ts", "imp_id")
    val clickDf = clicks.toDF("user_id", "click_ts", "click_id")
    val expected = StreamOps.intervalJoin(
        impDf, clickDf, "user_id", "imp_ts", "click_ts",
        lower = "0 minutes", upper = "10 minutes")
      .select($"l.imp_id", $"r.click_id").as[(Long, Long)].collect().toSet
    assert(expected == Set((100L, 900L), (101L, 901L)))

    val memI = MemoryStream[(Long, java.sql.Timestamp, Long)](spark)
    val memC = MemoryStream[(Long, java.sql.Timestamp, Long)](spark)
    memI.addData(imps: _*)
    memC.addData(clicks: _*)
    val joined = StreamOps.intervalJoin(
      StreamOps.withLateness(
        memI.toDF().toDF("user_id", "imp_ts", "imp_id"), "imp_ts", "1 minute"),
      StreamOps.withLateness(
        memC.toDF().toDF("user_id", "click_ts", "click_id"), "click_ts", "1 minute"),
      "user_id", "imp_ts", "click_ts", "0 minutes", "10 minutes")
    val cp = Files.createTempDirectory("ssj-cp").toString
    val q = joined.select($"l.imp_id", $"r.click_id")
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT * FROM ssj")
      .as[(Long, Long)].collect().toSet
    assert(streamed == expected)
  }

  test("upsertSink: latest row per key wins across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val table = Files.createTempDirectory("upsert-t").toString + "/t"
    val cp = Files.createTempDirectory("upsert-cp").toString

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val df = mem.toDF().toDF("k", "ts", "v")
    mem.addData((1L, ts("2024-01-01 00:00:00"), "old"),
      (2L, ts("2024-01-01 00:00:00"), "two"))
    StreamOps.upsertSink(df, "k", "ts", table, cp)
    mem.addData((1L, ts("2024-01-01 00:05:00"), "new"),
      (3L, ts("2024-01-01 00:06:00"), "three"))
    StreamOps.upsertSink(df, "k", "ts", table, cp)

    val out = spark.read.parquet(table)
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "new", 2L -> "two", 3L -> "three"))
  }

  test("versionedSink: each batch commits an immutable snapshot; " +
      "old versions survive new publishes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val table = Files.createTempDirectory("vsink-t").toString + "/t"
    val cp = Files.createTempDirectory("vsink-cp").toString

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val df = mem.toDF().toDF("k", "ts", "v")
    // batch 1 includes an in-batch stale duplicate for key 1
    mem.addData((1L, ts("2024-01-01 00:00:00"), "stale"),
      (1L, ts("2024-01-01 00:01:00"), "one"),
      (2L, ts("2024-01-01 00:00:00"), "two"))
    StreamOps.versionedSink(df, "k", "ts", table, cp)
    mem.addData((1L, ts("2024-01-01 00:05:00"), "new"),
      (3L, ts("2024-01-01 00:06:00"), "three"))
    StreamOps.versionedSink(df, "k", "ts", table, cp)

    def snap(v: Option[Int]) =
      graft.io.LakeIO.readVersion(spark, table, v)
        .select("k", "v").as[(Long, String)].collect().toMap
    // v1 is the first batch's latest-per-key — UNTOUCHED by v2
    assert(snap(Some(1)) == Map(1L -> "one", 2L -> "two"))
    // v2 merges: key 1 replaced, key 2 carried, key 3 appended
    assert(snap(Some(2)) == Map(1L -> "new", 2L -> "two", 3L -> "three"))
    assert(snap(None) == snap(Some(2)))
    assert(graft.io.LakeIO.versions(spark, table).map(_._1) == Seq(1, 2))
  }

  test("upsertBatch is partition-scoped: a 1-bucket batch rewrites 1 partition") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val table = Files.createTempDirectory("upsert-ps").toString + "/t"
    // seed keys 1..40 → with 8 buckets every bucket is occupied
    val seed = (1L to 40L).map(k =>
      (k, ts("2024-01-01 00:00:00"), s"v$k")).toDF("k", "ts", "v")
    StreamOps.upsertBatch(seed, "k", "ts", table, buckets = 8)
    val dirs = new java.io.File(table).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.toPath)
    assert(dirs.length == 8)
    def snapshot(): Map[String, Set[(String, Long)]] = dirs.map { d =>
      d.getFileName.toString -> java.nio.file.Files.list(d)
        .toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString,
          java.nio.file.Files.getLastModifiedTime(p).toMillis)).toSet
    }.toMap
    val before = snapshot()
    // one-key batch → exactly one affected bucket partition
    val oneKey = Seq((1L, ts("2024-01-01 00:05:00"), "updated"))
      .toDF("k", "ts", "v")
    val touchedBucket = "bucket=" + oneKey
      .select(pmod(xxhash64($"k"), lit(8)).cast("int")).as[Int].head()
    StreamOps.upsertBatch(oneKey, "k", "ts", table, buckets = 8)
    val after = snapshot()
    for (d <- before.keys) {
      if (d == touchedBucket)
        assert(before(d) != after(d), s"$d should have been rewritten")
      else
        assert(before(d) == after(d),
          s"$d was rewritten by a batch that never touched it")
    }
    // correctness unchanged: latest row per key
    val out = spark.read.parquet(table)
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out(1L) == "updated" && out.size == 40)
  }

  test("dedupIngest: streamed batches near-dedup vs corpus and in-batch") {
    val dir = Files.createTempDirectory("ingest").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different text about spark engines and shuffles"
    val t3 = "yet another unique document with its own words entirely"
    // batch file A: 1 (t1), 2 (t2), 3 (exact dup of 1 → in-batch drop)
    Seq((1L, t1), (2L, t2), (3L, t1)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    // batch file B: 4 (dup of accepted 2 → corpus drop), 5 (new)
    Seq((4L, t2), (5L, t3)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    // pin modification times so the file source processes A before B
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$src/b.parquet").setLastModified(now)

    val schema = spark.read.parquet(s"$src/a.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("basePath", src)
      .parquet(s"$src/*")
    StreamOps.dedupIngest(stream, "doc_id", "text", corpus,
      s"$dir/cp", threshold = 0.9)

    val ids = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L))
  }

  test("dedupIngest: batch N+1 reads ONLY the signature sidecar, " +
      "never the accepted corpus documents") {
    val dir = Files.createTempDirectory("ingest-sc").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val sidecar = s"$dir/corpus._sigs"
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different text about spark engines and shuffles"
    val t3 = "yet another unique document with its own words entirely"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // ---- batch A only: ids 1, 2 accepted into corpus + sidecar ----
    Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val schemaA = spark.read.parquet(s"$src/a.parquet").schema
    def runOnce(): Unit = StreamOps.dedupIngest(
      spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*"),
      "doc_id", "text", corpus, s"$dir/cp", threshold = 0.9)
    runOnce()
    assert(new java.io.File(sidecar).exists(),
      "batch 1 must materialize the signature sidecar")
    // ---- DESTROY the corpus document payloads (keep file names) ----
    // If the next batch re-signatured the accepted corpus, its parquet
    // read would fail; the sidecar alone must carry the dedup state.
    val corpusFiles = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(corpusFiles.nonEmpty)
    corpusFiles.foreach { f =>
      java.nio.file.Files.write(f.toPath,
        "NOT A PARQUET FILE".getBytes("UTF-8"))
    }
    val preNames = corpusFiles.map(_.getName).toSet
    // ---- batch B: 4 dups accepted id 2 (sidecar knowledge), 5 new ----
    Seq((4L, t2), (5L, t3)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    runOnce() // same checkpoint: AvailableNow drains just the new file
    // only the new-doc survivors were appended; read just those files
    // (the garbled batch-A payloads prove they were never opened)
    val appended = new java.io.File(corpus).listFiles()
      .filter(f => f.getName.endsWith(".parquet")
        && !preNames.contains(f.getName))
    assert(appended.nonEmpty, "batch B must append its survivors")
    val newIds = spark.read
      .parquet(appended.map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(newIds == Seq(5L),
      s"4 must be dropped via the sidecar alone; got $newIds")
    // sidecar tracks all accepted docs for the NEXT batch
    val sigIds = spark.read.parquet(sidecar)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(1L, 2L, 5L))
  }

  test("dedupIngest: a CORRUPT sidecar aborts the batch instead of " +
      "silently re-admitting duplicates") {
    val dir = Files.createTempDirectory("ingest-corrupt").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val sidecar = s"$dir/corpus._sigs"
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different text about spark engines and shuffles"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val schemaA = spark.read.parquet(s"$src/a.parquet").schema
    def runOnce(): Unit = StreamOps.dedupIngest(
      spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*"),
      "doc_id", "text", corpus, s"$dir/cp", threshold = 0.9)
    runOnce()
    // garble every sidecar parquet: the dedup state is now unreadable
    val sigFiles = new java.io.File(sidecar).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(sigFiles.nonEmpty)
    sigFiles.foreach { f =>
      java.nio.file.Files.write(f.toPath,
        "NOT A PARQUET FILE".getBytes("UTF-8"))
    }
    val preCorpus = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // batch B: id 4 duplicates accepted id 2 — with a readable sidecar it
    // would be dropped; with a corrupt one the ONLY safe outcome is abort
    Seq((4L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    val err = intercept[Exception](runOnce())
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(err).exists(c => c.getMessage != null &&
        (c.getMessage.toLowerCase.contains("parquet") ||
         c.getMessage.contains("footer"))),
      s"expected a parquet-read failure to surface, got $err")
    val appended = new java.io.File(corpus).listFiles()
      .filter(f => f.getName.endsWith(".parquet")
        && !preCorpus.contains(f.getName))
    assert(appended.isEmpty,
      "an aborted batch must not append potentially-duplicate survivors")
  }

  test("winnowIngest: batch N+1 drops char-level dups via the " +
      "fingerprint sidecar alone; corpus documents never reopen") {
    val dir = Files.createTempDirectory("wingest-sc").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val sidecar = s"$dir/corpus._wfps"
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different text about spark engines and shuffles"
    val t3 = "yet another unique document with its own words entirely"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val schemaA = spark.read.parquet(s"$src/a.parquet").schema
    // short fixture texts select ~a dozen fingerprints each, so the
    // report threshold drops from the corpus default (40) to 5
    def runOnce(): Unit = StreamOps.winnowIngest(
      spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*"),
      "doc_id", "text", corpus, s"$dir/cp", minSharedFp = 5)
    runOnce()
    assert(new java.io.File(sidecar).exists(),
      "batch 1 must materialize the fingerprint sidecar")
    val corpusFiles = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(corpusFiles.nonEmpty)
    corpusFiles.foreach { f =>
      java.nio.file.Files.write(f.toPath,
        "NOT A PARQUET FILE".getBytes("UTF-8"))
    }
    val preNames = corpusFiles.map(_.getName).toSet
    Seq((4L, t2), (5L, t3)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    runOnce()
    val appended = new java.io.File(corpus).listFiles()
      .filter(f => f.getName.endsWith(".parquet")
        && !preNames.contains(f.getName))
    assert(appended.nonEmpty, "batch B must append its survivors")
    val newIds = spark.read
      .parquet(appended.map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(newIds == Seq(5L),
      s"4 must be dropped via the sidecar alone; got $newIds")
    val fpIds = spark.read.parquet(sidecar)
      .select("id").as[Long].distinct().collect().sorted.toSeq
    assert(fpIds == Seq(1L, 2L, 5L))
  }

  test("winnowIngest: a CORRUPT sidecar aborts the batch instead of " +
      "silently re-admitting duplicates") {
    val dir = Files.createTempDirectory("wingest-corrupt").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val sidecar = s"$dir/corpus._wfps"
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different text about spark engines and shuffles"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val schemaA = spark.read.parquet(s"$src/a.parquet").schema
    def runOnce(): Unit = StreamOps.winnowIngest(
      spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*"),
      "doc_id", "text", corpus, s"$dir/cp", minSharedFp = 5)
    runOnce()
    val fpFiles = new java.io.File(sidecar).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(fpFiles.nonEmpty)
    fpFiles.foreach { f =>
      java.nio.file.Files.write(f.toPath,
        "NOT A PARQUET FILE".getBytes("UTF-8"))
    }
    val preCorpus = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    Seq((4L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    val err = intercept[Exception](runOnce())
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(err).exists(c => c.getMessage != null &&
        (c.getMessage.toLowerCase.contains("parquet") ||
         c.getMessage.contains("footer"))),
      s"expected a parquet-read failure to surface, got $err")
    val appended = new java.io.File(corpus).listFiles()
      .filter(f => f.getName.endsWith(".parquet")
        && !preCorpus.contains(f.getName))
    assert(appended.isEmpty,
      "an aborted batch must not append potentially-duplicate survivors")
  }

  test("dropDuplicatesWithinWatermark + session_window: a cross-batch " +
      "re-delivered event counts ONCE; a genuinely new event extends " +
      "the session") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = Files.createTempDirectory("sess-dedup").toString
    val src = s"$dir/src"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def ts(plusMin: Int) =
      new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    Seq((1L, 7L, ts(0)), (2L, 7L, ts(1)))
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    // batch b: event 2 RE-DELIVERED (within the 1 h watermark) + new 3
    Seq((2L, 7L, ts(1)), (3L, 7L, ts(2)))
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    val schema = spark.read.parquet(s"$src/a.parquet").schema
    val out = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("basePath", src).parquet(s"$src/*")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val q = out.writeStream.format("memory")
      .queryName("sess_dedup_spec_mem")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sess_dedup_spec_mem")
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSeq
    // ONE session of THREE events: e2's re-delivery vanished at the
    // dedup operator, e3 merged into the same 5-minute-gap session
    assert(got == Seq((7L, 3L)), s"got $got")
  }

  test("cepWithState: a partial match OPEN at the batch boundary " +
      "(click+view in batch A, view+purchase in batch B) completes " +
      "across it") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = Files.createTempDirectory("cep-state").toString
    val src = s"$dir/src"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq((9L, ts(0), 1L, "click"), (9L, ts(1), 2L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    Seq((9L, ts(2), 3L, "view"), (9L, ts(3), 4L, "purchase"),
        (9L, ts(4), 5L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    val schema = spark.read.parquet(s"$src/a.parquet").schema
    val updates = StreamOps.cepWithState(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*")
        .as[StreamOps.CepIn])
    val q = updates.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(s"$dir/out")
      .select("update_seq", "seq_len", "n_matches", "first_pos",
        "first_len")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // batch A: attempt open (c v…), nothing matched yet
    assert(rows(0) == ((1L, 2L, 0L, 0L, 0L)), s"got ${rows(0)}")
    // batch B: the held attempt completes — match spans positions 1..4
    assert(rows(1) == ((2L, 5L, 1L, 1L, 4L)), s"got ${rows(1)}")
  }

  test("psiIngest: batch 1 scores against batch 0's PERSISTED decile " +
      "sidecar (ref batch scores exactly 0.0); a CORRUPT sidecar " +
      "aborts instead of silently re-baselining the monitor") {
    val dir = Files.createTempDirectory("psi-ingest").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val sidecar = s"$dir/corpus._psiref"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // batch A: values 1..20 → 9 distinct decile boundaries {2,4,…,18}
    (1 to 20).map(i => ("x", i.toLong)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val schemaA = spark.read.parquet(s"$src/a.parquet").schema
    def runOnce(): Unit = StreamOps.psiIngest(
      spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*"),
      "k", "v", corpus, s"$dir/cp")
    runOnce()
    assert(new java.io.File(sidecar).exists(),
      "batch 0 must materialize the reference sidecar")
    // batch B: values 100..119 — everything lands past the last decile
    (100 to 119).map(i => ("x", i.toLong)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(System.currentTimeMillis())
    runOnce()
    val log = spark.read.parquet(s"$corpus._psilog")
      .select("batch_id", "k", "n_rows", "psi_r6", "verdict")
      .as[(Long, String, Long, Double, String)].collect()
      .sortBy(_._1).toSeq
    assert(log.map(r => (r._1, r._2, r._3, r._5)) ==
      Seq((0L, "x", 20L, "stable"), (1L, "x", 20L, "action")))
    assert(log(0)._4 == 0.0, "the reference batch scores exactly 0.0")
    // independent scalar replay of batch 1's PSI: bounds {2,4,…,18},
    // cr = [2]*10 cells, cf = [0]*9 ++ [20], add-one over 10 cells
    val cr = Seq.fill(10)(2L); val cf = Seq.fill(9)(0L) :+ 20L
    var want = 0.0
    (0 until 10).foreach { i =>
      val p = (cr(i) + 1) / 30.0; val q = (cf(i) + 1) / 30.0
      want += (p - q) * math.log(p / q)
    }
    assert(log(1)._4 == math.rint(want * 1e6) / 1e6 ||
      math.abs(log(1)._4 - want) < 1e-6,
      s"batch-1 PSI ${log(1)._4} must match the scalar replay $want")
    // corrupt the sidecar: the next batch must ABORT, not re-baseline
    val refFiles = new java.io.File(sidecar).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(refFiles.nonEmpty)
    refFiles.foreach { f =>
      java.nio.file.Files.write(f.toPath,
        "NOT A PARQUET FILE".getBytes("UTF-8"))
    }
    val preCorpus = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    (200 to 209).map(i => ("x", i.toLong)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/c.parquet")
    dataFile(s"$src/c.parquet")
      .setLastModified(System.currentTimeMillis() + 1000)
    val err = intercept[Exception](runOnce())
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(err).exists(c => c.getMessage != null &&
        (c.getMessage.toLowerCase.contains("parquet") ||
         c.getMessage.contains("footer"))),
      s"expected a parquet-read failure to surface, got $err")
    val appended = new java.io.File(corpus).listFiles()
      .filter(f => f.getName.endsWith(".parquet")
        && !preCorpus.contains(f.getName))
    assert(appended.isEmpty,
      "an aborted batch must not append rows the monitor never scored")
  }

  test("compactSidecar: N per-batch files collapse to one; dedup " +
      "state survives the swap; a half-swapped (missing) sidecar " +
      "ABORTS the next batch instead of re-admitting duplicates") {
    val dir = Files.createTempDirectory("ingest-compact").toString
    val src = s"$dir/src"
    val corpus = s"$dir/corpus"
    val sidecar = s"$dir/corpus._sigs"
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different text about spark engines and shuffles"
    val t3 = "yet another unique document with its own words entirely"
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val now = System.currentTimeMillis()
    Seq((1L, t1)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet").setLastModified(now - 120000)
    Seq((2L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(now - 60000)
    val schemaA = spark.read.parquet(s"$src/a.parquet").schema
    def runOnce(): Unit = StreamOps.dedupIngest(
      spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*"),
      "doc_id", "text", corpus, s"$dir/cp", threshold = 0.9)
    runOnce() // two batches → two sidecar appends
    assert(parquetFiles(sidecar).length >= 2,
      "per-batch appends must have produced multiple sidecar files")
    StreamOps.compactSidecar(spark, sidecar)
    assert(parquetFiles(sidecar).length == 1,
      "compaction must rewrite the sidecar as one file")
    // batch C: 4 duplicates accepted id 1 — ONLY the compacted sidecar
    // can know that; 5 is new
    Seq((4L, t1), (5L, t3)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/c.parquet")
    dataFile(s"$src/c.parquet").setLastModified(now)
    runOnce()
    val ids = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L),
      s"dedup state must survive compaction; got $ids")
    // ---- half-swapped state: sidecar gone, corpus present → abort ----
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(sidecar))
    val preCorpus = parquetFiles(corpus).map(_.getName).toSet
    Seq((6L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$src/d.parquet")
    dataFile(s"$src/d.parquet")
      .setLastModified(System.currentTimeMillis() + 1000)
    intercept[Exception](runOnce())
    val appended = parquetFiles(corpus)
      .filter(f => !preCorpus.contains(f.getName))
    assert(appended.isEmpty,
      "missing sidecar next to an existing corpus must abort the batch")
  }

  test("ewmaWithState: level carries across batches; in-batch fold " +
    "sorts by (ts, event_id) regardless of file row order") {
    val dir = Files.createTempDirectory("st-ewma").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // batch A, user 1: rows written OUT of time order — the fold must
    // process v=10 (t=1s) before v=20 (t=2s): seed 10, then 15.0
    Seq((1L, ts(2000), 4L, 20.0), (1L, ts(1000), 2L, 10.0))
      .toDF("user_id", "ts", "event_id", "value").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    // batch B: user 1 gets v=40 at an EARLIER event time (online
    // semantics: arrival batch order wins) → (15+40)/2 = 27.5;
    // user 2 is new → seeds at 8.0
    Seq((1L, ts(1500), 5L, 40.0), (2L, ts(9000), 7L, 8.0))
      .toDF("user_id", "ts", "event_id", "value").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    val out = StreamOps.ewmaWithState(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*")
        .as[StreamOps.EwmaIn])
    val q = out.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$dir/out")
      .as[StreamOps.EwmaUpdate].collect()
      .sortBy(u => (u.user_id, u.update_seq)).toSeq
    assert(got == Seq(
      StreamOps.EwmaUpdate(1L, 1L, 2L, 15.0),
      StreamOps.EwmaUpdate(1L, 2L, 3L, 27.5),
      StreamOps.EwmaUpdate(2L, 1L, 1L, 8.0)))
  }

  test("zscoreWithState: warmup suppresses early outliers; a post-" +
    "warmup outlier in batch 2 alerts off batch 1's carried moments") {
    val dir = Files.createTempDirectory("st-z").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // batch A, key 'k': 9 calm values 100±1 cents — the 9th is past
    // warmup (8 priors) but within 3σ → 0 alerts
    val calm = (1 to 9).map(i =>
      ("k", ts(i * 1000L), i.toLong, 100L + (i % 2)))
    calm.toDF("event_type", "ts", "event_id", "cents").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    // batch B: one wild value — alert requires batch A's moments in
    // state; a fresh state would still be in warmup (n=0 < 8)
    Seq(("k", ts(20000L), 20L, 100000L))
      .toDF("event_type", "ts", "event_id", "cents").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    val out = StreamOps.zscoreWithState(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*")
        .as[StreamOps.ZIn])
    val q = out.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$dir/out")
      .as[StreamOps.ZUpdate].collect()
      .sortBy(_.update_seq).toSeq
    val sumA = calm.map(_._4).sum
    assert(got == Seq(
      StreamOps.ZUpdate("k", 1L, 9L, sumA, 0L),
      StreamOps.ZUpdate("k", 2L, 10L, sumA + 100000L, 1L)))
  }

  test("streamAsOf: cross-batch out-of-order rights still match, " +
    "result equals batch as-of") {
    val dir = Files.createTempDirectory("st-asof").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // batch A: lefts at t=10s and 20s, right at 5s
    Seq((1L, ts(10000), 1, 100L), (1L, ts(20000), 1, 101L),
      (1L, ts(5000), 0, 500L))
      .toDF("k", "t", "side", "v").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    // batch B: a LATER-ARRIVING right at 15s — it must still match the
    // left at 20s, which the watermark releases only in this batch
    // (ingest-before-emit), plus a left at 30s and a fresh key
    Seq((1L, ts(15000), 0, 501L), (1L, ts(30000), 1, 102L),
      (2L, ts(30000), 1, 200L))
      .toDF("k", "t", "side", "v").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    val out = StreamOps.streamAsOf(
      StreamOps.withLateness(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .option("basePath", s"$dir/src").parquet(s"$dir/src/*"),
        "t", "0 seconds").as[StreamOps.AsOfIn])
    val q = out.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$dir/out")
      .select($"lv", $"rv").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(
      100L -> Some(500L), // t=10s → right at 5s
      101L -> Some(501L), // t=20s → the batch-B right at 15s
      102L -> Some(501L), // t=30s → still 15s (latest ≤)
      200L -> None))      // fresh key, no rights
  }

  test("streamAsOf: rights-only key arms NO timer — never re-touched " +
    "after its creating batch (state O(active keys), r6 GC fix)") {
    val dir = Files.createTempDirectory("st-asof-gc").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // batch A: key 1 is RIGHTS-ONLY; key 2 has a held left + a right
    Seq((1L, ts(5000), 0, 500L),
      (2L, ts(10000), 1, 100L), (2L, ts(6000), 0, 600L))
      .toDF("k", "t", "side", "v").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    // batches B and C: key 2 only, each advancing the watermark. If key 1
    // re-armed a timer every batch (pre-r6 bug), its timeout would fire
    // here and the state operator would report 2 updated rows per batch.
    Seq((2L, ts(60000), 1, 101L)).toDF("k", "t", "side", "v")
      .coalesce(1).write.parquet(s"$dir/src/b.parquet")
    Seq((2L, ts(120000), 1, 102L)).toDF("k", "t", "side", "v")
      .coalesce(1).write.parquet(s"$dir/src/c.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 120000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/c.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    val out = StreamOps.streamAsOf(
      StreamOps.withLateness(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .option("basePath", s"$dir/src").parquet(s"$dir/src/*"),
        "t", "0 seconds").as[StreamOps.AsOfIn])
    val q = out.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateBatches = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .sortBy(_.batchId)
      .map(p => p.batchId -> p.stateOperators.head)
    assert(stateBatches.nonEmpty)
    // batch A creates both keys' state (2 puts); afterwards ONLY the
    // active key 2 may be touched — key 1 has no timer and no data
    val first = stateBatches.head._2
    assert(first.numRowsUpdated == 2L,
      s"batch A should create 2 state rows, got ${first.numRowsUpdated}")
    stateBatches.tail.foreach { case (bid, s) =>
      assert(s.numRowsUpdated <= 1L,
        s"batch $bid updated ${s.numRowsUpdated} state rows — the " +
          "rights-only key was re-touched, so a timer re-armed for it")
    }
    // correctness unchanged: every left matched its latest ≤ right
    val got = spark.read.parquet(s"$dir/out")
      .select($"lv", $"rv").as[(Long, Option[Long])].collect().toMap
    assert(got.get(100L).contains(Some(600L)) &&
      got.get(101L).contains(Some(600L)))
  }

  test("cdcSink: streamed out-of-order log == batch cdcApply recompute") {
    val dir = Files.createTempDirectory("cdc-sink").toString
    val keys = (1L to 20L).toSeq
    val ins = keys.map(k => (k, 1L, "I", k * 10.0))
    val upd = keys.filter(_ % 3 == 0).map(k => (k, 2L, "U", k * 10.0 + 1))
    val del = keys.filter(_ % 5 == 0)
      .map(k => (k, 3L, "D", Option.empty[Double].getOrElse(0.0)))
    // batch 1 carries the LATER changes (seq 2/3) plus even-key inserts;
    // batch 2 delivers the odd-key seq-1 inserts LATE — they must lose
    // to already-applied higher-seq state, and deleted keys stay dead
    val b1 = ins.filter(_._1 % 2 == 0) ++ upd ++ del
    val b2 = ins.filter(_._1 % 2 == 1)
    b1.toDF("k", "seq", "op", "price").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    b2.toDF("k", "seq", "op", "price").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    StreamOps.cdcSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*"),
      "k", "seq", "op", s"$dir/table", s"$dir/cp", buckets = 4)

    val streamed = StreamOps.cdcState(spark, s"$dir/table", "seq", "op")
      .select("k", "price").as[(Long, Double)].collect().toSeq.sorted
    val full = (b1 ++ b2).toDF("k", "seq", "op", "price")
    val recomputed = graft.ops.Merge.cdcApply(full, "k", "seq", "op")
      .select("k", "price").as[(Long, Double)].collect().toSeq.sorted
    assert(streamed == recomputed,
      s"streamed=$streamed\nrecomputed=$recomputed")
    // spot semantics: %15 keys got U then D → dead; late insert of
    // key 5 (deleted at seq 3) must not resurrect it
    assert(!streamed.exists(_._1 == 5L))
    assert(streamed.exists { case (k, p) => k == 3L && p == 31.0 })
  }

  test("scd2Sink: streamed micro-batches == sequential batch scd2") {
    val dir = Files.createTempDirectory("scd2-sink").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: initial dim; batch 2: one real change (1), one no-op
    // (2), one fresh key (4)
    val b1 = Seq((1L, "gold", ts("2024-01-01 00:00:00")),
      (2L, "silver", ts("2024-01-01 00:00:00")),
      (3L, "bronze", ts("2024-01-01 00:00:00")))
    val b2 = Seq((1L, "platinum", ts("2024-06-01 00:00:00")),
      (2L, "silver", ts("2024-06-01 00:00:00")),
      (4L, "gold", ts("2024-06-01 00:00:00")))
    b1.toDF("k", "tier", "eff").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    b2.toDF("k", "tier", "eff").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    StreamOps.scd2Sink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*"),
      Seq("k"), "eff", s"$dir/table", s"$dir/cp", buckets = 4)

    type V = (Long, String, java.sql.Timestamp, Option[Long])
    def versions(df: org.apache.spark.sql.DataFrame): Seq[V] =
      df.select(col("k"), col("tier"), col("valid_from"),
          col("valid_to").cast("long"))
        .as[(Long, String, java.sql.Timestamp, Option[Long])]
        .collect().toSeq.sortBy(v => (v._1, v._3.getTime))
    val streamed = versions(
      spark.read.parquet(s"$dir/table").drop("bucket"))
    val empty = b1.toDF("k", "tier", "eff").limit(0).drop("eff")
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val afterB1 = graft.ops.Merge.scd2(empty,
      b1.toDF("k", "tier", "eff"), "k", "eff")
    val afterB2 = graft.ops.Merge.scd2(afterB1,
      b2.toDF("k", "tier", "eff"), "k", "eff")
    assert(streamed == versions(afterB2),
      s"streamed=$streamed\nbatch=${versions(afterB2)}")
    // key 1 has a closed + a current version; key 2 exactly one row
    assert(streamed.count(_._1 == 1L) == 2)
    assert(streamed.count(_._1 == 2L) == 1)
    assert(streamed.exists(v => v._1 == 4L && v._2 == "gold"))
  }

  test("cdcCompact: sub-horizon tombstones GC'd, live state untouched") {
    val dir = Files.createTempDirectory("cdc-gc").toString
    val log = Seq(
      (1L, 1L, "I", 10.0), (2L, 1L, "I", 20.0), (3L, 1L, "I", 30.0),
      (2L, 2L, "D", 0.0), (3L, 5L, "D", 0.0))
    StreamOps.cdcBatch(log.toDF("k", "seq", "op", "price"),
      "k", "seq", "op", s"$dir/table", buckets = 4)
    def ops() = spark.read.parquet(s"$dir/table")
      .select("k", "op").as[(Long, String)].collect().toSeq.sorted
    assert(ops() == Seq((1L, "I"), (2L, "D"), (3L, "D")))
    StreamOps.cdcCompact(spark, s"$dir/table", "seq", "op", horizon = 3L)
    // seq-2 tombstone is past the lateness horizon → gone; the seq-5
    // one is still fencing possible late arrivals → stays
    assert(ops() == Seq((1L, "I"), (3L, "D")))
    val live = StreamOps.cdcState(spark, s"$dir/table", "seq", "op")
      .select("k", "price").as[(Long, Double)].collect().toSeq.sorted
    assert(live == Seq((1L, 10.0)))
  }

  test("funnelBatch: cross-batch conversions complete; ordered batches " +
    "equal a full recompute") {
    val dir = Files.createTempDirectory("funnel-sink").toString
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // u1 converts ACROSS batches (view@1 | click@10, buy@20);
    // u2 has a click BEFORE its view (strict order must reject);
    // u3 views only; u4 never appears in batch 1
    val b1 = Seq((1L, ts(1), "view"), (2L, ts(2), "click"),
      (2L, ts(3), "view"), (3L, ts(4), "view"))
    val b2 = Seq((1L, ts(10), "click"), (1L, ts(20), "purchase"),
      (2L, ts(11), "click"), (4L, ts(12), "view"), (4L, ts(13), "click"))
    val steps = Seq("view", "click", "purchase")
    StreamOps.funnelBatch(b1.toDF("u", "ts", "et"), "u", "ts", "et",
      steps, s"$dir/table", buckets = 4)
    StreamOps.funnelBatch(b2.toDF("u", "ts", "et"), "u", "ts", "et",
      steps, s"$dir/table", buckets = 4)
    val st = spark.read.parquet(s"$dir/table")
      .select("user_id", "t1", "t2", "t3")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3))))).toMap
    assert(st(1L) == ((Some(ts(1)), Some(ts(10)), Some(ts(20)))))
    assert(st(2L) == ((Some(ts(3)), Some(ts(11)), None))) // click@2 too early
    assert(st(3L) == ((Some(ts(4)), None, None)))
    assert(st(4L) == ((Some(ts(12)), Some(ts(13)), None)))
    // rollup: n = (4, 3, 1); ppm floors of /4
    val roll = StreamOps.funnelRollup(spark, s"$dir/table")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(roll == List((1, 4L, 1000000L), (2, 3L, 750000L),
      (3, 1L, 250000L)))
  }

  test("funnelRunning: out-of-order cross-batch events still convert " +
    "(the case the ordered-contract summary form cannot handle)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = Files.createTempDirectory("funnel-running").toString
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // batch 1 delivers the LATER events (click@10, buy@20); the view@1
    // that anchors the funnel arrives in batch 2 — funnelBatch's
    // summary merge would leave t2/t3 unset (the click was discarded
    // before t1 existed); the buffering form must recover steps=3
    val b1 = Seq((1L, ts(10), "click"), (1L, ts(20), "purchase"))
    val b2 = Seq((1L, ts(1), "view"), (2L, ts(2), "view"))
    b1.toDF("user_id", "ts", "event_type").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    b2.toDF("user_id", "ts", "event_type").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    val updates = StreamOps.funnelRunning(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*")
        .as[StreamOps.FunnelEvent],
      Seq("view", "click", "purchase"))
    val q = updates.toDF().writeStream.format("memory")
      .queryName("funnel_running_spec")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val roll = StreamOps.funnelRunningRollup(
        spark.table("funnel_running_spec"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    // u1 fully converts despite the reorder; u2 views only
    assert(roll.map(_._2) == List(2L, 1L, 1L))
    // and the interim update (before the view arrived) showed steps=0
    val u1 = spark.table("funnel_running_spec")
      .filter(col("user_id") === 1L)
      .select("steps", "n_seen").as[(Int, Long)].collect().toSet
    assert(u1 == Set((0, 2L), (3, 3L)))
  }

  test("aggSink: incremental merge equals one-shot groupBy recompute") {
    val dir = Files.createTempDirectory("agg-sink").toString
    val rows = (1L to 300L).map(i => (i, i % 7, i * 3))
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    b1.toDF("id", "k", "v").coalesce(1)
      .write.parquet(s"$dir/src/a.parquet")
    b2.toDF("id", "k", "v").coalesce(1)
      .write.parquet(s"$dir/src/b.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    StreamOps.aggSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*")
        .drop("id"),
      Seq("k"), Seq("v"), s"$dir/table", s"$dir/cp", buckets = 4)
    val streamed = spark.read.parquet(s"$dir/table")
      .select("k", "cnt", "sum_v").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    val recomputed = rows.groupBy(_._2).map { case (k, rs) =>
      (k, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq.sorted
    assert(streamed == recomputed)
    // second run with only a NEW batch must keep merging, not reset
    val b3 = Seq((1000L, 0L, 5L), (1001L, 99L, 7L))
    b3.toDF("id", "k", "v").coalesce(1)
      .write.parquet(s"$dir/src/c.parquet")
    dataFile(s"$dir/src/c.parquet")
      .setLastModified(System.currentTimeMillis())
    StreamOps.aggSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("basePath", s"$dir/src").parquet(s"$dir/src/*")
        .drop("id"),
      Seq("k"), Seq("v"), s"$dir/table", s"$dir/cp", buckets = 4)
    val after = spark.read.parquet(s"$dir/table")
      .select("k", "cnt", "sum_v").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    val expected = (rows ++ b3).groupBy(_._2).map { case (k, rs) =>
      (k, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq.sorted
    assert(after == expected)
  }

  test("skipIngest: incremental sidecar == from-scratch build across " +
    "a checkpoint restart; missing sidecar next to data aborts") {
    val dir = Files.createTempDirectory("st-skip").toString
    val (src, table, cp) = (s"$dir/src", s"$dir/table", s"$dir/cp")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    def runOnce(): Unit = {
      val schema = spark.read.parquet(s"$src/a.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", src).parquet(s"$src/*")
      StreamOps.skipIngest(stream, "k", "sec", table, cp, 10L)
    }
    val now = System.currentTimeMillis()
    // batch A: keys 0..19 evens; batch B (separate RUN → checkpoint
    // restart): odds — every bucket is touched by both batches
    (0L until 20L by 2).map(k => (k, k % 7)).toDF("k", "sec")
      .coalesce(1).write.parquet(s"$src/a.parquet")
    dataFile(s"$src/a.parquet").setLastModified(now - 60000)
    runOnce()
    val afterA = graft.io.Skipping.stats(spark, table)
      .select("bucket", "min_key", "max_key", "n_rows")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(afterA == Seq((0L, 0L, 8L, 5L), (1L, 10L, 18L, 5L)))
    (1L until 20L by 2).map(k => (k, k % 7)).toDF("k", "sec")
      .coalesce(1).write.parquet(s"$src/b.parquet")
    dataFile(s"$src/b.parquet").setLastModified(now)
    runOnce() // restart from the checkpoint: processes only batch B
    val merged = graft.io.Skipping.stats(spark, table)
      .select("bucket", "min_key", "max_key", "n_rows")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(merged == Seq((0L, 0L, 9L, 10L), (1L, 10L, 19L, 10L)))
    // merged bloom == from-scratch bloom over the union
    val scratch = Files.createTempDirectory("st-skip-ref").toString
    graft.io.Skipping.writeIndexed(
      (0L until 20L).map(k => (k, k % 7)).toDF("k", "sec"),
      scratch, "k", "sec", 10L)
    def blooms(t: String) = graft.io.Skipping.stats(spark, t)
      .select("bucket", "bloom").as[(Long, Seq[Long])].collect()
      .map { case (b, bl) => b -> bl }.toMap
    assert(blooms(table) == blooms(scratch),
      "incrementally merged bloom must equal the batch-built bloom")
    // lookups through the streamed layout stay sound
    val (_, _, rows) =
      graft.io.Skipping.lookupPoint(spark, table, "sec", 3L)
    assert(rows.select("k").as[Long].collect().sorted.toSeq ==
      (0L until 20L).filter(_ % 7 == 3))
    // inconsistent state: sidecar deleted, layout present → abort,
    // no data appended
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(s"$table/_skip"))
    def dataFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$table/data"))
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val pre = dataFiles()
    Seq((100L, 1L)).toDF("k", "sec")
      .coalesce(1).write.parquet(s"$src/c.parquet")
    dataFile(s"$src/c.parquet")
      .setLastModified(System.currentTimeMillis() + 1000)
    intercept[Exception](runOnce())
    assert(dataFiles() == pre,
      "missing sidecar next to an existing layout must abort before " +
        "any data lands")
  }
}
