package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** RFM segmentation (qEventRfm): five planted users landing exactly on
  * the five quintiles of each metric, with hand-assigned segments.
  */
class RfmSpec extends SparkTestBase {
  import spark.implicits._

  test("quintile scores and segments on five planted users") {
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    // user k: k purchases of $k each, last on day k → with 5 users the
    // rank quintiles are exactly 1..5 per metric; user 5 is the most
    // recent AND most frequent
    var id = 0L
    val rows = (1 to 5).flatMap { k =>
      (1 to k).map { j =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$k%02d 0$j:00:00"),
          k.toLong, "purchase", k.toDouble, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventRfm(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 100L, 1L, 1L, 1L, "at_risk"),
      (2L, 3L, 2L, 400L, 2L, 2L, 2L, "at_risk"),
      (3L, 2L, 3L, 900L, 3L, 3L, 3L, "regular"),
      (4L, 1L, 4L, 1600L, 4L, 4L, 4L, "champion"),
      (5L, 0L, 5L, 2500L, 5L, 5L, 5L, "champion")))
  }
}
