package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Theil–Sen trend (qTimeTheilsen) on planted series: the median of
  * pairwise slopes must shrug off a single outlier day that would
  * wreck a least-squares fit.
  */
class TheilSenSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
    var id = 0L
    val rows = counts.flatMap { case (et, day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:30:00"),
          id % 7, et, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("outlier day does not move the median slope") {
    val dir = java.nio.file.Files.createTempDirectory("tsen").toString
    // 'a': 10,12,14,16 then an outlier 100 — 6 of 10 pairwise slopes
    // are exactly 2.0, so the lower median (rank 5) is 2.0 and the
    // residual median is 10.0; OLS would report ~17.
    // 'b': flat 7s → slope 0, intercept 7.
    writeEvents(dir, Seq(
      ("a", 1, 10), ("a", 2, 12), ("a", 3, 14), ("a", 4, 16),
      ("a", 5, 100),
      ("b", 1, 7), ("b", 2, 7), ("b", 3, 7)))
    val got = StreamQueries.qTimeTheilsen(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 5L, 10L, 2.0, 10.0),
      ("b", 3L, 3L, 0.0, 7.0)))
  }
}
