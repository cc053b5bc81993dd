package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Mergeable HLL rollup (qAggHllUnion) on planted events: at small
  * cardinalities the DataSketches HLL is exact (sparse mode), so the
  * union across day-sketches must land exactly on the month's distinct
  * count — overlapping users across days must NOT double-count.
  */
class HllUnionSpec extends SparkTestBase {
  import spark.implicits._

  test("day sketches union to the exact overlapping distinct count") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    // type a: day 1 users {1,2,3}, day 2 users {3,4} → 4 distinct
    // type b: one day, users {7,7,8}                → 2 distinct
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"), (2L, "2024-01-01 11:00:00", 2L, "a"),
      (3L, "2024-01-01 12:00:00", 3L, "a"), (4L, "2024-01-02 10:00:00", 3L, "a"),
      (5L, "2024-01-02 11:00:00", 4L, "a"), (6L, "2024-01-01 10:00:00", 7L, "b"),
      (7L, "2024-01-01 11:00:00", 7L, "b"), (8L, "2024-01-01 12:00:00", 8L, "b"))
      .map { case (id, ts, u, et) =>
        (id, Timestamp.valueOf(ts), u, et, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = AggQueries.qAggHllUnion(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(("a", 2L, 4L, true), ("b", 1L, 2L, true)), s"$out")
  }
}
