package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Motif discovery (qTimeMotif) against hand-computed SAD window
  * pairs on planted daily series.
  */
class MotifSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
    var id = 0L
    val rows = counts.flatMap { case (et, day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-05-$day%02d ${i % 24}%02d:00:00"),
          id % 7, et, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("a planted repeated shape is found exactly (SAD 0 at the two " +
    "copies); constant series tie-breaks to the smallest (i, j)") {
    val dir = java.nio.file.Files.createTempDirectory("motif").toString
    // 'a': ramp-plateau-ramp — windows at days 1 and 11 are identical
    // copies of [1,2,3,4,5]; every other non-overlapping pair differs.
    val aSeries = Seq(1, 2, 3, 4, 5, 9, 9, 9, 9, 9, 1, 2, 3, 4, 5)
    // 'b': constant — every window pair has SAD 0; (sad, i, j) order
    // must pick i=1, j=6.
    val bSeries = Seq.fill(12)(5)
    writeEvents(dir,
      aSeries.zipWithIndex.map { case (n, i) => ("a", i + 1, n) } ++
        bSeries.zipWithIndex.map { case (n, i) => ("b", i + 1, n) })
    val got = StreamQueries.qTimeMotif(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(2).toString,
        r.getDate(3).toString, r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got == Seq(
      ("a", "2024-05-01", "2024-05-11", 0L),
      ("b", "2024-05-01", "2024-05-06", 0L)))
  }

  test("types spanning fewer than 2m grid days are excluded (no " +
    "non-overlapping pair exists)") {
    val dir = java.nio.file.Files.createTempDirectory("motif2").toString
    writeEvents(dir, (1 to 9).map(d => ("short", d, 3)) ++
      (1 to 10).map(d => ("ok", d, 3)))
    val got = StreamQueries.qTimeMotif(spark, dir)
      .select("event_type").as[String].collect().toSeq
    assert(got == Seq("ok"))
  }
}
