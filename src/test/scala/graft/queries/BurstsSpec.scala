package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Kleinberg burst decoding (qTimeBursts) against HAND-COMPUTED
  * two-state Viterbi traces on planted daily series (VERDICT r10 #6).
  *
  * Expected paths derived by hand from the integer recurrence
  * (r0 = max(1, tot div days), r1 = r0 + max(1, isqrt(r0)),
  * γ = (r1−r0)², e_k = (n−r_k)², D0' = min(D0,D1)+e0,
  * D1' = min(D0+γ,D1)+e1, start (0, γ), ties: entry prefers base,
  * stay prefers burst):
  *  - 'a' = [5,5,5,20,20,20,5,5,5,5]: tot 95, r0 9, r1 12, γ 9.
  *    Burst days save (20−9)²−(20−12)² = 57/day ≫ γ, quiet days cost
  *    (5−12)²−(5−9)² = 33/day more in q1 → exact path 0001110000.
  *  - 'b' = [4,·,6] with day 2 MISSING (zero-fill → [4,0,6]): tot 10
  *    over 3 grid days, r0 3, r1 4, γ 1. Day 3: e0 9 vs e1+γ 4+1 → q1;
  *    days 1–2 stay base → 001. Exercises the calendar zero-fill.
  *  - 'c' = [7] single day: nd = 1, no backtrack loop; (7−7)² = 0 ≤
  *    γ+(7−9)² → [0].
  */
class BurstsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
    var id = 0L
    val rows = counts.flatMap { case (et, day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-03-$day%02d ${i % 24}%02d:00:00"),
          id % 7, et, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("decoded state paths match the hand-computed Viterbi traces; " +
    "zero-filled gaps and single-day series included") {
    val dir = java.nio.file.Files.createTempDirectory("bursts").toString
    val aSeries = Seq(5, 5, 5, 20, 20, 20, 5, 5, 5, 5)
    writeEvents(dir,
      aSeries.zipWithIndex.map { case (n, i) => ("a", i + 1, n) } ++
        Seq(("b", 1, 4), ("b", 3, 6), ("c", 5, 7)))
    val got = StreamQueries.qTimeBursts(spark, dir)
      .select("event_type", "day", "n", "base_rate", "burst_rate",
        "burst", "burst_id")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
      .toSeq.sortBy(x => (x._1, x._2))

    val a = got.filter(_._1 == "a")
    assert(a.map(_._3) == aSeries.map(_.toLong), "daily counts")
    assert(a.head._4 == 9L && a.head._5 == 12L, "a rates (r0, r1)")
    assert(a.map(_._6) == Seq(false, false, false, true, true, true,
      false, false, false, false), "a path 0001110000")
    assert(a.map(_._7) == Seq(-1L, -1L, -1L, 1L, 1L, 1L,
      -1L, -1L, -1L, -1L), "a: one island covering days 4-6")

    val b = got.filter(_._1 == "b")
    assert(b.map(_._2) ==
      Seq("2024-03-01", "2024-03-02", "2024-03-03"),
      "missing day 2 must be zero-filled into the grid")
    assert(b.map(_._3) == Seq(4L, 0L, 6L), "b counts with zero-fill")
    assert(b.head._4 == 3L && b.head._5 == 4L, "b rates")
    assert(b.map(_._6) == Seq(false, false, true), "b path 001")
    assert(b.map(_._7) == Seq(-1L, -1L, 1L))

    val c = got.filter(_._1 == "c")
    assert(c.size == 1 && !c.head._6 && c.head._4 == 7L,
      "single-day series decodes base state without a backtrack loop")
  }

  test("a planted two-island series separates into distinct burst ids") {
    val dir = java.nio.file.Files.createTempDirectory("bursts2").toString
    // [20,20,5,5,5,20,20,5]: tot 100, nd 8 → r0 12, isqrt 3, r1 15,
    // γ 9. Hand trace: high days e0 64 vs e1 25 (save 39 ≫ γ); low
    // days e0 49 vs e1 100 → two islands, days 1-2 and 6-7.
    val s = Seq(20, 20, 5, 5, 5, 20, 20, 5)
    writeEvents(dir, s.zipWithIndex.map { case (n, i) => ("x", i + 1, n) })
    val got = StreamQueries.qTimeBursts(spark, dir)
      .select("burst", "burst_id").collect()
      .map(r => (r.getBoolean(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq
    assert(got.map(_._1) == Seq(true, true, false, false, false,
      true, true, false))
    assert(got.map(_._2) == Seq(1L, 1L, -1L, -1L, -1L, 2L, 2L, -1L),
      "two maximal q1 runs must number as islands 1 and 2")
  }
}
