package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Linear multi-touch attribution (qEventAttribution): equal integer
  * split with the remainder on the last touch, 24 h window edges, and
  * credit conservation (attributed cents == purchase cents when every
  * purchase has touches).
  */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("remainder to last touch; window excludes stale clicks") {
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    // user 1: three in-window clicks + one 25 h stale; purchase 10.01
    // → 1001 cents over 3 touches: 333 + 333 + 335 (remainder 2 to the
    // LAST click). user 2: purchase with no clicks → no rows.
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-02 09:00:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-01-02 11:00:00"), 1L, "click", 0.0, "{}"),
      (5L, ts("2024-01-02 12:00:00"), 1L, "purchase", 10.01, "{}"),
      (6L, ts("2024-01-02 12:00:00"), 2L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventAttribution(spark, dir)
      .as[(java.sql.Date, Long, Long, Long)].collect().toSeq
    // all three credited clicks are on Jan 2; the Jan 1 click is stale
    assert(got == Seq(
      (java.sql.Date.valueOf("2024-01-02"), 3L, 1L, 1001L)))
  }

  test("credit conservation across multiple purchases") {
    val dir = java.nio.file.Files.createTempDirectory("attr2").toString
    Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 09:00:00"), 1L, "purchase", 7.07, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 11:00:00"), 1L, "purchase", 3.01, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventAttribution(spark, dir)
      .as[(java.sql.Date, Long, Long, Long)].collect().toSeq
    // click 1 touches both purchases (707 + 150), click 3 only the
    // second (151, carrying its remainder) → day total 1008 = 707+301
    assert(got.map(_._4).sum == 707L + 301L)
  }
}
