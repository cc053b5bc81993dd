package graft.ops

import java.sql.Timestamp
import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val quotes = Seq( // key, time, price
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:10:00"), 102.0),
    ("B", ts("2024-01-01 10:02:00"), 200.0)
  ).toDF("sym", "qt", "price")

  lazy val trades = Seq( // key, time, qty
    ("A", ts("2024-01-01 10:03:00"), 5L),  // → 100.0
    ("A", ts("2024-01-01 10:05:00"), 6L),  // tie → inclusive → 101.0
    ("A", ts("2024-01-01 10:30:00"), 7L),  // → 102.0 (latest)
    ("B", ts("2024-01-01 10:01:00"), 8L),  // before any quote → null
    ("C", ts("2024-01-01 10:00:00"), 9L)   // key with no quotes → null
  ).toDF("sym", "tt", "qty")

  test("asOfJoin: nearest-earlier match, inclusive ties, null no-match") {
    val out = AsOf.asOfJoin(trades, quotes,
        leftKey = "sym", rightKey = "sym",
        leftTime = "tt", rightTime = "qt",
        rightCols = Seq("price"))
      .select($"sym", $"qty", $"price")
      .as[(String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("A", 5L)) == Some(100.0))
    assert(out(("A", 6L)) == Some(101.0)) // inclusive at equal timestamps
    assert(out(("A", 7L)) == Some(102.0))
    assert(out(("B", 8L)) == None)
    assert(out(("C", 9L)) == None)
    assert(out.size == 5) // every left row exactly once
  }

  test("asOfJoin preserves all left columns") {
    val out = AsOf.asOfJoin(trades, quotes, "sym", "sym", "tt", "qt",
      Seq("price"))
    assert(out.columns.toSet == Set("sym", "tt", "qty", "price"))
  }
}
