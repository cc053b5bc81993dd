package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkTestBase

/** Observability harness: watermark progression in the metrics table,
  * and the silent late-drop it explains — re-delivered old rows never
  * reach the windowed aggregation, pinned on the SINK contents (the
  * stateOperator drop counters read 0 in Spark 4 for these shapes,
  * which is exactly why the sidecar matters).
  */
class ObservedStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("stream-stream left outer: closed windows emit null-padded, " +
    "still-open windows stay in state unemitted") {
    val dir = Files.createTempDirectory("soj").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: click 10:00 + purchase 10:05 → inner pair.
    // user 2: click 10:00, no purchase, window closes well before the
    //   final watermark → null-padded row.
    // user 3: click 11:58 — its window is OPEN at the final watermark
    //   (min(max click 11:58, max buy 12:00) = 11:58) → NOT emitted.
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "purchase", 1.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0, "{}"),
      (4L, ts("2024-01-01 11:58:00"), 3L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 12:00:00"), 9L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
    val got = graft.queries.StreamQueries.qStreamOuterJoin(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 2L), (3L, -1L)))
  }

  test("watermark telemetry matches max(prior batches) - delay; a " +
    "redelivery TWO batches later is silently dropped (dual-watermark " +
    "late filter uses the previous batch's mark)") {
    val dir = Files.createTempDirectory("obs").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch A: 3 rows in hour 10:00 and 2 in 11:00 of day 1, plus a
    // day-2 row to advance the watermark past day 1
    val a = Seq(
      (1L, ts("2024-01-01 10:00:10")), (2L, ts("2024-01-01 10:20:00")),
      (3L, ts("2024-01-01 10:40:00")), (4L, ts("2024-01-01 11:05:00")),
      (5L, ts("2024-01-01 11:50:00")), (6L, ts("2024-01-02 09:00:00")))
    // batch B: one fresh row (Spark's late filter for batch N uses the
    // watermark as of batch N−1 — SPARK-40925 dual watermark — so the
    // redelivery must arrive one batch AFTER the mark advanced)
    val b = Seq((7L, ts("2024-01-02 09:30:00")))
    // batch C: FULL redelivery of hour 10:00 + one fresh open-hour row
    val c = a.take(3) ++ Seq((8L, ts("2024-01-02 10:00:00")))
    def write(rows: Seq[(Long, java.sql.Timestamp)], f: String) =
      rows.toDF("event_id", "ts").withColumn("event_type", lit("click"))
        .coalesce(1).write.parquet(s"$dir/src/$f")
    write(a, "a.parquet"); write(b, "b.parquet"); write(c, "c.parquet")
    def dataFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val now = System.currentTimeMillis()
    dataFile(s"$dir/src/a.parquet").setLastModified(now - 120000)
    dataFile(s"$dir/src/b.parquet").setLastModified(now - 60000)
    dataFile(s"$dir/src/c.parquet").setLastModified(now)
    val schema = spark.read.parquet(s"$dir/src/a.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("basePath", s"$dir/src").parquet(s"$dir/src/*")
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val writer = agg.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
    val metrics = StreamOps.runWithBatchMetrics(spark, writer)
      .collect().sortBy(_.batch_id).toSeq
    assert(metrics.map(m => (m.batch_id, m.input_rows)) ==
      Seq((0L, 6L), (1L, 1L), (2L, 4L)))
    assert(metrics(0).watermark_ms == 0L)
    assert(metrics(1).watermark_ms ==
      ts("2024-01-02 09:00:00").getTime - 600000L)
    assert(metrics(2).watermark_ms ==
      ts("2024-01-02 09:30:00").getTime - 600000L)
    // the day-1 windows emitted after batch 1 hold the ORIGINAL
    // counts; batch C's redelivery was silently dropped, never
    // re-emitted or double-counted — the loss mode the watermark
    // telemetry exists to explain
    val out = spark.read.parquet(s"$dir/out")
      .select(col("window.start").cast("string").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(out("2024-01-01 10:00:00") == 3L)
    assert(out("2024-01-01 11:00:00") == 2L)
  }
}
