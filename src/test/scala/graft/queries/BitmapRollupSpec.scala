package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Exact bitmap distinct rollup (qAggBitmapRollup): users spanning the
  * 63-bit cell boundary, cross-day overlap (monthly < Σ daily), and
  * agreement with a plain COUNT(DISTINCT).
  */
class BitmapRollupSpec extends SparkTestBase {
  import spark.implicits._

  test("cell-boundary ids and day overlap roll up exactly") {
    val dir = java.nio.file.Files.createTempDirectory("bmap").toString
    // users 62, 63, 126 sit at/past cell edges (63-bit cells);
    // user 62 appears on BOTH days → daily 3+2=5, monthly 4
    val rows = Seq(
      (1L, "2024-01-01 01:00:00", 62L), (2L, "2024-01-01 02:00:00", 63L),
      (3L, "2024-01-01 03:00:00", 126L),
      (4L, "2024-01-02 01:00:00", 62L), (5L, "2024-01-02 02:00:00", 0L))
      .map { case (id, t, u) =>
        (id, Timestamp.valueOf(t), u, "click", 1.0, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val got = AggQueries.qAggBitmapRollup(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 2L, 5L, 4L)))
  }

  test("monthly bitmap distinct equals COUNT(DISTINCT) on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = AggQueries.qAggBitmapRollup(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._4)).toMap
    val want = graft.io.Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions
        .countDistinct(org.apache.spark.sql.functions.col("user_id"))
        .as("d"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }
}
