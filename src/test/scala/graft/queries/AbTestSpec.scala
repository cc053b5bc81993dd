package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Two-proportion A/B verdict on planted conversion splits. */
class AbTestSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(convA: Int, convB: Int, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("ab").toString
    var id = 0L
    // users 2,4,..2n are arm A; 1,3,..2n−1 arm B; the first convX
    // of each arm get a purchase, everyone gets a view
    val rows = (1 to n).flatMap { i =>
      Seq((2L * i, "A", i <= convA), (2L * i - 1, "B", i <= convB))
    }.flatMap { case (u, _, conv) =>
      val base = {
        id += 1
        Seq((id, Timestamp.valueOf("2024-01-01 10:00:00"), u,
          "view", 1.0, "{}"))
      }
      if (conv) {
        id += 1
        base :+ ((id, Timestamp.valueOf("2024-01-01 11:00:00"), u,
          "purchase", 1.0, "{}"))
      } else base
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    dir
  }

  test("stationary: hand-computed three integer power rounds on a " +
    "planted 2-state chain") {
    val dir = java.nio.file.Files.createTempDirectory("mst").toString
    var id = 0L
    // one user, sequence a a a a b b a → n(aa)=3, n(ab)=1, n(bb)=1,
    // n(ba)=1; from uniform 5e8 the three floor-division rounds give
    // exactly (664062500, 335937500)
    val seqTypes = Seq("a", "a", "a", "a", "b", "b", "a")
    seqTypes.zipWithIndex.map { case (et, i) =>
      id += 1
      (id, Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), 1L, et,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventStationary(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 664062500L), ("b", 335937500L)))
  }

  test("stickiness: partial-overlap days score 4/6; everyone-daily " +
    "scores exactly 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    var id = 0L
    def ev(u: Long, day: Int) = {
      id += 1
      (id, Timestamp.valueOf(f"2024-01-$day%02d 09:00:00"), u,
        "view", 1.0, "{}")
    }
    // week of Jan 1: day 1 users {1,2}, day 2 users {2,3} →
    // sum_dau 4, wau 3, 2 days → 4e6 div 6
    Seq(ev(1, 1), ev(2, 1), ev(2, 2), ev(3, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventStickiness(spark, dir)
      .as[(Timestamp, Long, Long, Long, Long)].collect().head
    assert(got._2 == 2L && got._3 == 4L && got._4 == 3L &&
      got._5 == 666666L)
  }

  test("8/10 vs 1/10 rejects; 5/10 vs 5/10 sits at zero difference") {
    val hot = EventQueries.qEventAbtest(spark, mk(8, 1, 10))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(hot == ((10L, 8L, 10L, 1L, 800000L, 100000L, true)))
    val nil = EventQueries.qEventAbtest(spark, mk(5, 5, 10))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(nil._5 == nil._6 && !nil._7)
  }
}
