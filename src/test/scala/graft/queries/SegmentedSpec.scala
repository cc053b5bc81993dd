package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Segmented regression (qTimeSegmented) against hand-computed
  * piecewise fits on planted daily series.
  */
class SegmentedSpec extends SparkTestBase {

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
    import spark.implicits._
    var id = 0L
    val rows = counts.flatMap { case (et, day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-07-$day%02d ${i % 24}%02d:00:00"),
          id % 7, et, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("step series splits at the step; flat sides fit slope 0 with " +
    "exact level intercepts; sloped sides recover slope and offset " +
    "exactly") {
    val dir = java.nio.file.Files.createTempDirectory("segr").toString
    // 'a': flat 10 → flat 40 at day 5: split k=4, both fits slope 0,
    // intercepts 10 and 40.
    // 'b': y = 3x for days 1–3, then y = 109 + 3x: split k=3; both
    // segments slope exactly 3, intercepts 0 and 109 (hand-checked:
    // left n=3 sx=6 sy=18 sxy=42 sxx=14 → num 18 / den 6 = 3).
    writeEvents(dir,
      Seq(10, 10, 10, 10, 40, 40, 40, 40).zipWithIndex
        .map { case (n, i) => ("a", i + 1, n) } ++
        Seq(3, 6, 9, 121, 124, 127).zipWithIndex
          .map { case (n, i) => ("b", i + 1, n) })
    val got = StreamQueries.qTimeSegmented(spark, dir)
      .select("event_type", "segment", "split_k", "slope_r6", "icept_r6")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq.sortBy(x => (x._1, x._2))
    assert(got == Seq(
      ("a", "left", 4L, 0.0, 10.0), ("a", "right", 4L, 0.0, 40.0),
      ("b", "left", 3L, 3.0, 0.0), ("b", "right", 3L, 3.0, 109.0)))
  }

  test("a one-point segment reports NULL slope (den = 0), not a " +
    "sentinel") {
    val dir = java.nio.file.Files.createTempDirectory("segr2").toString
    // [5, 5, 50]: best split at k=2 → right segment has one point
    writeEvents(dir, Seq(("c", 1, 5), ("c", 2, 5), ("c", 3, 50)))
    val got = StreamQueries.qTimeSegmented(spark, dir)
      .select("segment", "n_days", "slope_r6").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq.sortBy(_._1)
    assert(got == Seq(("left", 2L, Some(0.0)), ("right", 1L, None)))
  }
}
