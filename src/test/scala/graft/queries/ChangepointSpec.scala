package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Binary-segmentation changepoint: a planted step splits exactly at
  * the step; symmetric series tie-break to the smallest k.
  */
class ChangepointSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(vols: Seq[Int]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cp").toString
    var id = 0L
    vols.zipWithIndex.flatMap { case (v, i) =>
      (1 to v).map { _ =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
          id % 5, "click", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    dir
  }

  test("a 10→50 step at day 10 splits at k=10 with exact means") {
    val got = StreamQueries.qTimeChangepoint(spark,
      mk(Seq.fill(10)(10) ++ Seq.fill(10)(50)))
      .as[(String, Long, java.sql.Date, Long, Long, Double, Double,
        Double)].collect().head
    assert(got._2 == 10L && got._4 == 10L && got._5 == 10L)
    assert(got._6 == 10.0 && got._7 == 50.0)
    // gain = f(10) − T²/N = (100·10 + 2500·10)/... = 26000 − 18000
    assert(got._8 == 8000.0)
  }

  test("symmetric 1,2,1 ties f(1) = f(2); smallest k wins") {
    val got = StreamQueries.qTimeChangepoint(spark, mk(Seq(1, 2, 1)))
      .as[(String, Long, java.sql.Date, Long, Long, Double, Double,
        Double)].collect().head
    assert(got._2 == 1L)
  }
}
