package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Local-level Kalman filter (qTimeKalman) against an independent
  * scalar replay of the q = 2, r = 8 recursion on a planted daily
  * series — a second implementation, not the engine's fold.
  */
class KalmanSpec extends SparkTestBase {
  import spark.implicits._

  /** Scalar filter with the query's seeding: l₁ = x₁, P₁ = r = 8,
    * gain 0 on the init row. */
  private def refKalman(xs: Seq[Long]): Seq[(Double, Double, Double)] = {
    var l = xs.head.toDouble
    var p = 8.0
    (l, p, 0.0) +: xs.tail.map { x =>
      val pp = p + 2.0
      val k = pp / (pp + 8.0)
      l = l + k * (x.toDouble - l)
      p = (1.0 - k) * pp
      (l, p, k)
    }
  }

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
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

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fold matches the scalar replay; gain adapts downward from " +
    "the uncertain start toward the steady state") {
    val dir = java.nio.file.Files.createTempDirectory("kalman").toString
    writeEvents(dir, Seq(
      ("a", 1, 5), ("a", 2, 1), ("a", 3, 4), ("a", 4, 2), ("a", 5, 6),
      ("b", 1, 3)))
    val got = StreamQueries.qTimeKalman(spark, dir)
      .as[(String, java.sql.Date, Long, Double, Double, Double)]
      .collect().toSeq
    val wantA = refKalman(Seq(5L, 1L, 4L, 2L, 6L))
    val want = wantA.zipWithIndex.map { case ((l, p, k), i) =>
      ("a", java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"),
        Seq(5L, 1L, 4L, 2L, 6L)(i), r6(l), r6(p), r6(k))
    } :+ ("b", java.sql.Date.valueOf("2024-01-01"), 3L, 3.0, 8.0, 0.0)
    assert(got == want, s"$got")
    // gain sequence: k₂ = 10/18 = 0.5̅, then strictly decreasing toward
    // the steady state K* = (√(4 + 64) − 2)/16 ≈ 0.3904
    val gains = wantA.drop(1).map(_._3)
    assert(gains.head == 10.0 / 18.0)
    assert(gains.sliding(2).forall(s => s(1) < s(0)))
    val kStar = (math.sqrt(4.0 + 64.0) - 2.0) / 16.0
    assert(gains.last > kStar && gains.last < 0.45)
  }

  test("streaming two-batch handoff: update 2 continues from update " +
    "1's carried (level, P) — scalar replay of evens-then-odds") {
    val dir = java.nio.file.Files.createTempDirectory("kstream").toString
    // explicit values so the filter actually moves; ids 1..6 ⇒ evens
    // {2, 4, 6} arrive in batch 1, odds {1, 3, 5} in batch 2
    val rows = (1 to 6).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-0$i 00:00:00"), 1L,
        "a", i * 3.0 % 7.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .write.parquet(s"$dir/events.parquet")
    val got = StreamQueries.qStreamKalman(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // scalar replay: evens in ts order, then odds in ts order
    var l = 0.0; var p = 0.0; var n = 0L
    def fold(xs: Seq[Double]): Unit = xs.foreach { x =>
      if (n == 0L) { l = x; p = 8.0 }
      else {
        val pp = p + 2.0
        val k = pp / (pp + 8.0)
        l = l + k * (x - l)
        p = (1.0 - k) * pp
      }
      n += 1
    }
    val vals = (1 to 6).map(i => i * 3.0 % 7.0)
    fold(Seq(vals(1), vals(3), vals(5))) // ids 2, 4, 6
    val u1 = ("a", 1L, 3L, r6(l), r6(p))
    fold(Seq(vals(0), vals(2), vals(4))) // ids 1, 3, 5
    val u2 = ("a", 2L, 6L, r6(l), r6(p))
    assert(got == Seq(u1, u2), s"$got")
  }

  test("single-day series emits exactly the init row") {
    val dir = java.nio.file.Files.createTempDirectory("kalman1").toString
    writeEvents(dir, Seq(("z", 7, 2)))
    val got = StreamQueries.qTimeKalman(spark, dir)
      .as[(String, java.sql.Date, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got ==
      Seq(("z", java.sql.Date.valueOf("2024-01-07"), 2L, 2.0, 8.0, 0.0)))
  }
}
