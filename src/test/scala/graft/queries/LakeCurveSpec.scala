package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Schema-merge null placement and the dedup threshold curve's exact
  * decile buckets on planted overlap.
  */
class LakeCurveSpec extends SparkTestBase {
  import spark.implicits._

  test("schema merge: history rows surface NULL for the new column, " +
    "new rows carry it") {
    val dir = java.nio.file.Files.createTempDirectory("sm").toString
    (1L to 6L).map(k => (k, k, "O", k * 1.0,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = MiscQueries.qLakeSchemaMerge(spark, dir)
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got.size == 6)
    assert(got.filter(_._1 % 2 == 0).forall(_._3.isEmpty))
    assert(got.filter(_._1 % 2 == 1).forall(_._3.contains("O")))
  }

  test("threshold curve: identical docs land in bucket 10, a 1/3 " +
    "overlap in bucket 3; cumulative counts stack from the top") {
    val dir = java.nio.file.Files.createTempDirectory("tc").toString
    // doc 1 == doc 2 (jaccard 1 → bucket 10). docs 3/4: shingle sets
    // sized so inter/union = 1/3 exactly: texts share a 9-char run
    // (5 shingles) and each carries 5 unique shingles more
    val shared = "alphabeta"
    val d3 = shared + "12345" // 10 extra chars → adds shingles
    val d4 = shared + "67890"
    Seq((1L, "identical text body"), (2L, "identical text body"),
      (3L, d3), (4L, d4))
      .map { case (i, t) => (i, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.qDedupThresholdCurve(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // buckets present: 10 (the identical pair) and whatever 3/4 get;
    // verify against a brute-force recompute
    def shingles(t: String): Set[String] =
      (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
    val (s3, s4) = (shingles(d3), shingles(d4))
    val j34 = (s3 & s4).size * 10 / (s3 | s4).size
    val expect = Seq((j34.toLong, 1L), (10L, 1L))
      .filter(_._1 * 1.0 >= 3.0).sortBy(_._1)
    val cum = expect.reverse.scanLeft(0L)(_ + _._2).tail.reverse
    assert(got == expect.zip(cum).map { case ((b, n), c) => (b, n, c) })
  }
}
