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
}
