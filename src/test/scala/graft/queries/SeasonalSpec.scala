package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Seasonal decomposition (qTimeSeasonal) on an exact planted weekly
  * pattern: any 7-day window sums to the same total, so the trend is
  * exactly flat, the day-of-week means recover the planted offsets
  * exactly, and the remainder is exactly zero — no tolerance needed.
  */
class SeasonalSpec extends SparkTestBase {
  import spark.implicits._

  test("flat trend, exact seasonal recovery, zero remainder") {
    val dir = java.nio.file.Files.createTempDirectory("seas").toString
    val off = Seq(7, -7, 14, -14, 3, -3, 0) // sums to 0 over a week
    // day-of-week via the query's own convention: days since Monday
    // 1970-01-05 (epochDay 4) mod 7
    def dowQ(day: Int): Int =
      ((java.time.LocalDate.of(2024, 1, day).toEpochDay - 4) % 7).toInt
    val counts = (1 to 28).map(d => (d, 70 + off(dowQ(d))))
    var id = 0L
    val rows = counts.flatMap { case (day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:15:00"),
          id % 5, "a", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val got = StreamQueries.qTimeSeasonal(spark, dir)
      .as[(String, java.sql.Date, Long, Option[Double], Option[Double],
        Option[Double])].collect().toSeq.sortBy(_._2.toString)
    assert(got.size == 28)
    for ((row, idx) <- got.zipWithIndex) {
      val day = idx + 1
      assert(row._3 == 70L + off(dowQ(day)))
      if (day >= 4 && day <= 25) {
        assert(row._4.contains(70.0), s"trend on day $day: ${row._4}")
        assert(row._6.contains(0.0), s"remainder day $day: ${row._6}")
      } else {
        assert(row._4.isEmpty && row._6.isEmpty,
          s"edge day $day must have no trend")
      }
      assert(row._5.contains(off(dowQ(day)).toDouble),
        s"seasonal day $day: ${row._5}")
    }
  }
}
