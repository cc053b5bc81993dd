package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.ops.Quality._

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, None, Some(200.0)),       // null name; price out of range
    (2L, Some("c"), Some(50.0)),   // duplicate key
    (3L, Some("x"), None),         // null price (range violation)
    (4L, Some("a"), Some(99.0))
  ).toDF("id", "name", "price")

  test("audit counts each check's violations in one pass") {
    val out = Quality.audit(df, Seq(
      Complete("name_complete", "name"),
      Unique("id_unique", Seq("id")),
      InRange("price_0_100", "price", 0.0, 100.0),
      OneOf("name_accepted", "name", Seq("a", "c", "x")),
      Satisfies("id_positive", col("id") > 0)
    )).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("name_complete") === ((1L, 5L, false)))
    assert(out("id_unique") === ((1L, 5L, false)))
    // out-of-range 200.0 + null price
    assert(out("price_0_100") === ((2L, 5L, false)))
    // the null name violates accepted-values too
    assert(out("name_accepted") === ((1L, 5L, false)))
    assert(out("id_positive") === ((0L, 5L, true)))
  }

  test("unique over composite keys counts surplus rows only") {
    val d = Seq((1, 1), (1, 1), (1, 1), (1, 2)).toDF("a", "b")
    val row = Quality.audit(d, Seq(Unique("ab", Seq("a", "b"))))
      .collect().head
    assert(row.getLong(1) === 2L && row.getLong(2) === 4L)
  }

  test("refIntegrity counts orphans via anti-join") {
    val child = Seq(1L, 2L, 3L, 3L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Quality.refIntegrity("ri", child, "fk", parent, "pk")
      .collect().head
    assert(row.getString(0) === "ri")
    assert(row.getLong(1) === 1L)      // the single 9L orphan
    assert(row.getLong(2) === 5L)
    assert(!row.getBoolean(3))
  }

  test("blocklist gate: duplicate hits count, word-exact only, " +
      "clean docs kept") {
    val dir = java.nio.file.Files.createTempDirectory("blocklist")
    Seq(
      (1L, "slow query slow scan", "en", "sA", 20L), // 2 hits (dup token)
      (2L, "dup slow", "en", "sA", 8L),              // 2 hits, 2 terms
      (3L, "slowly legacyx", "en", "sA", 14L),       // substrings ≠ words
      (4L, "fast join", "en", "sB", 9L)              // clean
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.QualityQueries
      .qTextBlocklist(spark, dir.toString)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("sA", 3L, 2L, 1L, 4L), ("sB", 1L, 0L, 1L, 0L)),
      s"$out")
  }
}
