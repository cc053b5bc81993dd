package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** CUSUM changepoints (qTimeCusum) against an independent scalar replay
  * of the Page recurrence on planted daily series with a known mean
  * shift.
  */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  /** Scalar CUSUM with the query's parameters (κ = 4, h = 12). */
  private def refCusum(xs: Seq[Long]): Seq[(Double, Double, Boolean)] = {
    val mu = xs.sum.toDouble / xs.size
    var sp = 0.0; var sn = 0.0
    xs.map { x =>
      sp = math.max(0.0, sp + (x.toDouble - mu - 4.0))
      sn = math.min(0.0, sn + (x.toDouble - mu + 4.0))
      (sp, sn, sp > 12.0 || sn < -12.0)
    }
  }

  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)])
      : Unit = {
    var id = 0L
    val rows = counts.flatMap { case (et, day, n) =>
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:00:00"),
          id % 7, et, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("fold matches the scalar replay; shift past h alarms") {
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    // 'a': step 10 → 40 at day 5 (μ=25): S⁻ alarms from day 2
    // (−11, −22, …), S⁺ alarms from day 6 (11, 22, …).
    // 'b': flat 7 with one 9: stays inside the slack band, no alarm.
    val aSeries = Seq(10, 10, 10, 10, 40, 40, 40, 40)
    val bSeries = Seq(7, 7, 9, 7)
    writeEvents(dir,
      aSeries.zipWithIndex.map { case (n, i) => ("a", i + 1, n) } ++
        bSeries.zipWithIndex.map { case (n, i) => ("b", i + 1, n) })
    val got = StreamQueries.qTimeCusum(spark, dir)
      .as[(String, java.sql.Date, Long, Double, Double, Boolean)]
      .collect().toSeq
    val wantA = refCusum(aSeries.map(_.toLong))
    val wantB = refCusum(bSeries.map(_.toLong))
    assert(got.size == aSeries.size + bSeries.size)
    val gotA = got.filter(_._1 == "a").sortBy(_._2.toString)
    val gotB = got.filter(_._1 == "b").sortBy(_._2.toString)
    for ((g, w) <- gotA.zip(wantA)) {
      assert(g._4 == math.rint(w._1 * 1e6) / 1e6, s"sp at ${g._2}")
      assert(g._5 == math.rint(w._2 * 1e6) / 1e6, s"sn at ${g._2}")
      assert(g._6 == w._3, s"alarm at ${g._2}")
    }
    for ((g, w) <- gotB.zip(wantB)) {
      assert(g._4 == math.rint(w._1 * 1e6) / 1e6)
      assert(g._5 == math.rint(w._2 * 1e6) / 1e6)
      assert(!g._6 && !w._3)
    }
    assert(gotA.count(_._6) == 7) // days 2..8 alarm
  }
}
