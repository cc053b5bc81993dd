package graft.queries

import java.sql.Date
import graft.SparkTestBase

/** SAX symbolization (saxWords) against a hand-computed 28-day trace:
  * counts 10×7, 20×7, 10×7, 20×7 give μ = 15, σ = 5 exactly, so the
  * four PAA segment z-scores are ∓1 — symbols a/d/a/d. A second type
  * with only 10 observed days must emit no word (incomplete window).
  */
class SaxSpec extends SparkTestBase {
  import spark.implicits._

  test("28-day trace yields word 'adad'; incomplete windows drop") {
    val base = Date.valueOf("2024-01-01").toLocalDate
    val rows =
      (0 until 28).map { i =>
        ("clicks", Date.valueOf(base.plusDays(i)),
          if ((i / 7) % 2 == 0) 10L else 20L)
      } ++ (0 until 10).map { i =>
        ("views", Date.valueOf(base.plusDays(i)), 5L)
      }
    val daily = rows.toDF("event_type", "day", "n")
    val got = StreamQueries.saxWords(daily).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(("clicks", "adad", 1L, 0L)))
  }
}
