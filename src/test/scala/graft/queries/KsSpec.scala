package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Two-sample KS (qStatKs) against hand-computed ECDF distances on
  * planted value distributions — including the all-equal tie case that
  * pins the smallest-v argmax rule.
  */
class KsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(dir: String, vals: Seq[(String, Double)])
      : Unit = {
    val rows = vals.zipWithIndex.map { case ((et, v), i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"),
        i.toLong % 7, et, v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("hand-computed D and argmax on shifted distributions") {
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    // a = {1,2,3,4}, b = {3,4,5,6}: D = max|F_a−F_b| = 0.5, first
    // achieved at v=2.00 (F_a=1/2, F_b=0); also achieved at 3.00 and
    // 4.00 — the smallest-v rule must pick 200 cents.
    writeEvents(dir, Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)))
    val r = StatsQueries.qStatKs(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(r == Seq(("a", "b", 4L, 4L, 8L, 200L, 0.5)))
  }

  test("identical distributions give D = 0 at the smallest value") {
    val dir = java.nio.file.Files.createTempDirectory("ks0").toString
    writeEvents(dir, Seq(
      ("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)))
    val r = StatsQueries.qStatKs(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(r == Seq(("a", "b", 2L, 2L, 0L, 100L, 0.0)))
  }

  test("duplicate values collapse into one evaluation point") {
    val dir = java.nio.file.Files.createTempDirectory("ksdup").toString
    // a = {1,1,1,2}, b = {1,2,2,2}: at v=1: F_a=3/4 vs F_b=1/4 →
    // |3·4−1·4| = 8; at v=2 both 1 → 0. D = 0.5 at 100 cents.
    writeEvents(dir, Seq(
      ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 1.0), ("b", 2.0), ("b", 2.0), ("b", 2.0)))
    val r = StatsQueries.qStatKs(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(r == Seq(("a", "b", 4L, 4L, 8L, 100L, 0.5)))
  }
}
