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

  test("8/10 vs 1/10 rejects; 5/10 vs 5/10 sits at zero difference") {
    val hot = EventQueries.qEventAbtest(spark, mk(8, 1, 10))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(hot == ((10L, 8L, 10L, 1L, 800000L, 100000L, true)))
    val nil = EventQueries.qEventAbtest(spark, mk(5, 5, 10))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(nil._5 == nil._6 && !nil._7)
  }
}
