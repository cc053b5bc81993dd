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

  test("minhash eval: identical pair is a TP in both rules; " +
    "accounting identities hold") {
    val dir = java.nio.file.Files.createTempDirectory("mhe").toString
    Seq((1L, "identical body of shared text"),
      (2L, "identical body of shared text"),
      (3L, "completely different words"),
      (4L, "another unrelated document"))
      .map { case (i, t) => (i, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = DedupQueries.qDedupMinhashEval(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._1 == 1L && r._3 == 1L && r._4 == 0L && r._5 == 0L)
    assert(r._6 == 1000000L && r._7 == 1000000L)
    assert(r._3 + r._4 == r._2 && r._3 + r._5 == r._1)
  }

  test("dedup impact: removed copies charge their tokens to their " +
    "own source; the keeper's source pays nothing") {
    val dir = java.nio.file.Files.createTempDirectory("di").toString
    // doc 1 (src A, 4 tokens) is the keeper; docs 2,3 are copies in
    // sources B and A; doc 4 unique in B (2 tokens)
    Seq((1L, "one two three four", "A"),
      (2L, "one two three four", "B"),
      (3L, "one two three four", "A"),
      (4L, "five six", "B"))
      .map { case (i, t, s) => (i, t, "en", s) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.qDedupImpact(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 2L, 1L, 8L, 4L, 500000L),
      ("B", 2L, 1L, 6L, 4L, 666666L)))
  }

  test("try battery: each lane degrades to NULL exactly where its " +
    "failure occurs") {
    val dir = java.nio.file.Files.createTempDirectory("try").toString
    (0L to 5L).map(k => (k, s"p$k", "m", "b", s"type$k", 1, "c",
      1.0, "x")).toDF("p_partkey", "p_name", "p_mfgr", "p_brand",
      "p_type", "p_size", "p_container", "p_retailprice", "p_comment")
      .write.parquet(s"$dir/part.parquet")
    val got = FuncQueries.qFuncTry(spark, dir)
      .as[(Long, Option[Double], Option[Long], Option[Int],
        Option[String])].collect().toSeq
    val mx = Long.MaxValue
    assert(got == Seq(
      (0L, None, Some(mx), None, Some("a")),
      (1L, Some(100.0), None, Some(12), Some("b")),
      (2L, Some(50.0), Some(mx), Some(12), None),
      (3L, None, None, Some(12), None),
      (4L, Some(100.0), Some(mx), Some(12), Some("a")),
      (5L, Some(50.0), None, None, Some("b"))))
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
