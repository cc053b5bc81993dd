package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Gaps-and-islands sessionization (qWindowSessionize) on planted
  * series: the exact 30-minute boundary (a gap of EXACTLY 1800 s does
  * NOT split), microsecond precision at the boundary, and per-user
  * independence.
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, user: Long, ts: String, v: Double) =
    (id, Timestamp.valueOf(ts), user, "click", v, "{}")

  test("exact 1800 s gap keeps the session; +1 µs splits it") {
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    Seq(
      ev(1L, 1L, "2024-01-01 10:00:00", 1.0),
      ev(2L, 1L, "2024-01-01 10:30:00", 1.0),        // gap = 1800 s → same
      ev(3L, 1L, "2024-01-01 11:00:00.000001", 1.0), // 1800 s + 1 µs → new
      ev(4L, 2L, "2024-01-01 10:00:00", 2.0)          // other user: own id
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = WindowQueries.qWindowSessionize(spark, dir)
      .select("user_id", "sess_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)), s"$out")
  }

  test("session bounds and sums come from the member events") {
    val dir = java.nio.file.Files.createTempDirectory("sess2").toString
    Seq(
      ev(1L, 1L, "2024-01-01 09:00:00", 1.5),
      ev(2L, 1L, "2024-01-01 09:10:00", 2.25),
      ev(3L, 1L, "2024-01-01 12:00:00", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = WindowQueries.qWindowSessionize(spark, dir)
      .as[(Long, Long, Timestamp, Timestamp, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 09:00:00"),
        Timestamp.valueOf("2024-01-01 09:10:00"), 2L, 3.75),
      (1L, 2L, Timestamp.valueOf("2024-01-01 12:00:00"),
        Timestamp.valueOf("2024-01-01 12:00:00"), 1L, 4.0)), s"$out")
  }
}
