package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Holt double exponential smoothing (qTimeHolt) against an independent
  * scalar replay of the α = β = ½ recurrence on a planted daily series —
  * a second implementation, not the engine's fold.
  */
class HoltSpec extends SparkTestBase {
  import spark.implicits._

  /** Scalar Holt with the query's seeding: l₂ = x₂, b₂ = x₂ − x₁,
    * emitting (level, trend) from the second day on. */
  private def refHolt(xs: Seq[Long]): Seq[(Double, Double)] = {
    var l = xs(1).toDouble
    var b = xs(1).toDouble - xs(0).toDouble
    (l, b) +: xs.drop(2).map { x =>
      val l2 = (x.toDouble + (l + b)) * 0.5
      val b2 = ((l2 - l) + b) * 0.5
      l = l2; b = b2
      (l, b)
    }
  }

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
    // counts: (event_type, dayOfMonth, n) → n events on 2024-01-<day>
    var id = 0L
    val rows = counts.flatMap { case (et, day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$day%02d 0$i%01d:00:00"),
          id % 7, et, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("fold matches the scalar replay on a planted two-type series") {
    val dir = java.nio.file.Files.createTempDirectory("holt").toString
    writeEvents(dir, Seq(
      ("a", 1, 1), ("a", 2, 3), ("a", 3, 2), ("a", 4, 5),
      ("b", 1, 4), ("b", 2, 2), ("b", 3, 2)))
    val got = StreamQueries.qTimeHolt(spark, dir)
      .as[(String, java.sql.Date, Long, Double, Double, Double)]
      .collect().toSeq
    val wantA = refHolt(Seq(1L, 3L, 2L, 5L))
    val wantB = refHolt(Seq(4L, 2L, 2L))
    val want =
      wantA.zipWithIndex.map { case ((l, b), i) =>
        ("a", java.sql.Date.valueOf(f"2024-01-${i + 2}%02d"),
          Seq(3L, 2L, 5L)(i), l, b, l + b)
      } ++ wantB.zipWithIndex.map { case ((l, b), i) =>
        ("b", java.sql.Date.valueOf(f"2024-01-${i + 2}%02d"),
          Seq(2L, 2L)(i), l, b, l + b)
      }
    assert(got == want, s"$got")
    // hand-check one interior step: day 3 of 'a' (x=2 after l=3, b=2):
    // l = (2 + 5)/2 = 3.5, b = ((3.5 − 3) + 2)/2 = 1.25
    assert(got(1) == (("a", java.sql.Date.valueOf("2024-01-03"), 2L,
      3.5, 1.25, 4.75)))
  }

  test("a single-day type emits nothing (needs the two-point seed)") {
    val dir = java.nio.file.Files.createTempDirectory("holt1").toString
    writeEvents(dir, Seq(("solo", 1, 3), ("pair", 1, 1), ("pair", 2, 2)))
    val got = StreamQueries.qTimeHolt(spark, dir)
      .select("event_type").as[String].collect().toSeq
    assert(got == Seq("pair"))
  }
}
