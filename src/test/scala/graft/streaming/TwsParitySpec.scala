package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkTestBase

/** Parity: the transformWithState sessionizer must emit the SAME
  * closed-session set as the flatMapGroupsWithState one and as the
  * batch gaps-and-islands computation, batch-for-batch, including the
  * strict ms boundary at end + gap. */
class TwsParitySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Drive `events` through both sessionizers with the same batch
    * schedule; return (fmgsRows, twsRows) as comparable tuples. */
  private def runBoth(batches: Seq[Seq[StreamOps.UserEvent]],
                      gapMs: Long)
      : (Set[(Long, Long, Long, Long)], Set[(Long, Long, Long, Long)]) = {
    def run(useTws: Boolean): Set[(Long, Long, Long, Long)] = {
      val mem = MemoryStream[StreamOps.UserEvent](spark)
      val src = StreamOps.withLateness(mem.toDF(), "ts", "0 seconds")
        .as[StreamOps.UserEvent]
      val sessions =
        if (useTws) StreamOps.sessionizeTws(src, gapMs)
        else StreamOps.sessionizeWithState(src, gapMs)
      val cp = Files.createTempDirectory("tws-par-cp").toString
      val out = Files.createTempDirectory("tws-par-out").toString
      def drain(): Unit = {
        val q = sessions.writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", cp)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      for (b <- batches) {
        mem.addData(b: _*)
        if (useTws) StreamOps.withRocksDb(spark)(drain()) else drain()
      }
      spark.read.parquet(out)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect()
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4)).toSet
    }
    (run(useTws = false), run(useTws = true))
  }

  test("tws == fMGWS == batch islands on a boundary-stressing stream") {
    def e(uid: Long, t: String, ms: Int = 0) = {
      val x = ts(t); x.setNanos(ms * 1000000)
      StreamOps.UserEvent(uid, x, 1.0)
    }
    val gap = 60L * 1000
    val batches = Seq(
      // u1: two events in one session; u2: single event
      Seq(e(1, "2024-01-01 00:00:00"), e(1, "2024-01-01 00:00:30"),
        e(2, "2024-01-01 00:00:10")),
      // u1 extends at EXACTLY the gap (stays one session); u2 breaks
      // one ms past it (second session); watermark advances
      Seq(e(1, "2024-01-01 00:01:30"),
        e(2, "2024-01-01 00:01:10", ms = 1)),
      // idle flush: watermark far past everything closes all opens
      Seq(e(9, "2024-01-01 02:00:00")),
      Seq(e(9, "2024-01-01 03:00:00")))
    val (fmgs, tws) = runBoth(batches, gap)
    assert(tws == fmgs)
    // batch twin over the same events, keeping sessions that closed
    // (followed by a later session or end+gap strictly before the
    // final watermark ms)
    val all = batches.flatten
    val finalWmMs = all.map(_.ts.getTime).max
    val expected = all.groupBy(_.user_id).toSeq.flatMap {
      case (uid, evs) =>
        val sorted = evs.map(_.ts.getTime).sorted
        val islands = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case ((s, en, n) :: rest, t) if t - en <= gap =>
            (s, t, n + 1) :: rest
          case (acc, t) => (t, t, 1L) :: acc
        }.reverse
        islands.zipWithIndex.collect {
          case ((s, en, n), i)
            if i < islands.size - 1 || en + gap < finalWmMs =>
            (uid, s, en, n)
        }
    }.toSet
    assert(tws == expected)
  }

  test("tws timeout boundary: strict ms past end+gap, like fMGWS") {
    val mem = MemoryStream[StreamOps.UserEvent](spark)
    val sessions = StreamOps.sessionizeTws(
      StreamOps.withLateness(mem.toDF(), "ts", "0 seconds")
        .as[StreamOps.UserEvent],
      gapMs = 60L * 1000)
    val cp = Files.createTempDirectory("tws-b-cp").toString
    val out = Files.createTempDirectory("tws-b-out").toString
    def drain(): Unit = StreamOps.withRocksDb(spark) {
      val q = sessions.writeStream.format("parquet").option("path", out)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emittedA() = spark.read.parquet(out)
      .filter($"user_id" === 1L).count()

    mem.addData(
      StreamOps.UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
      StreamOps.UserEvent(8L, ts("2024-01-01 00:01:00"), 1.0))
    drain()
    assert(emittedA() == 0, "watermark == end+gap must not close")

    val t2 = ts("2024-01-01 00:01:00"); t2.setNanos(1000000)
    mem.addData(StreamOps.UserEvent(9L, t2, 1.0))
    drain()
    assert(emittedA() == 1, "watermark one ms past end+gap must close")
  }

  test("MapState leaderboard: per-batch top-k equals prefix-state ranking") {
    val mem = MemoryStream[StreamOps.LbEvent](spark)
    val out = Files.createTempDirectory("tws-lb-out").toString
    val cp = Files.createTempDirectory("tws-lb-cp").toString
    val top = StreamOps.leaderboardTws(mem.toDS(), k = 2)
    def drain(): Unit = StreamOps.withRocksDb(spark) {
      val q = top.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: u1=30, u2=20 on type "a"; type "b" untouched
    mem.addData(
      StreamOps.LbEvent("a", 1L, 10L), StreamOps.LbEvent("a", 1L, 20L),
      StreamOps.LbEvent("a", 2L, 20L))
    drain()
    // batch 2: u3 overtakes u2 on "a" (25 > 20); "b" gets its first
    // batch (batch_seq 1 for "b" — per-KEY counter, not global)
    mem.addData(
      StreamOps.LbEvent("a", 3L, 25L), StreamOps.LbEvent("b", 9L, 5L))
    drain()
    val rows = spark.read.parquet(out)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(rows == Set(
      ("a", 1L, 1L, 1L, 30L), ("a", 1L, 2L, 2L, 20L),
      ("a", 2L, 1L, 1L, 30L), ("a", 2L, 2L, 3L, 25L),
      ("b", 1L, 1L, 9L, 5L)))
  }

  test("session extension is honored across batches (stale timers ignored)") {
    val mem = MemoryStream[StreamOps.UserEvent](spark)
    val sessions = StreamOps.sessionizeTws(
      StreamOps.withLateness(mem.toDF(), "ts", "0 seconds")
        .as[StreamOps.UserEvent],
      gapMs = 60L * 1000)
    val cp = Files.createTempDirectory("tws-x-cp").toString
    val out = Files.createTempDirectory("tws-x-out").toString
    def drain(): Unit = StreamOps.withRocksDb(spark) {
      val q = sessions.writeStream.format("parquet").option("path", out)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1 opens u1 (timer at 00:01:00); batch 2 extends u1 to
    // 00:00:50 BEFORE the old timer could fire, and pushes the
    // watermark past the STALE deadline but not the fresh one — the
    // session must stay open
    mem.addData(StreamOps.UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0))
    drain()
    mem.addData(
      StreamOps.UserEvent(1L, ts("2024-01-01 00:00:50"), 1.0),
      StreamOps.UserEvent(8L, ts("2024-01-01 00:01:30"), 1.0))
    drain()
    val afterExtend = spark.read.parquet(out)
      .filter($"user_id" === 1L)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect()
    assert(afterExtend.isEmpty, "stale timer must not close an extended session")
    // now advance past the fresh deadline: one 2-event session closes
    mem.addData(StreamOps.UserEvent(8L, ts("2024-01-01 00:05:00"), 1.0))
    drain()
    val closed = spark.read.parquet(out).filter($"user_id" === 1L)
      .select($"session_start", $"session_end", $"n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
    assert(closed.toSeq == Seq((ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:00:50"), 2L)))
  }
}
