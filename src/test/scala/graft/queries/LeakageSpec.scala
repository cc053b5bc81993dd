package graft.queries

import graft.SparkTestBase

/** Split-leakage audit (qCurateSplitLeakage): a planted near-dup pair
  * straddling the test/train boundary must surface as a cross-split
  * row; a same-split pair must not.
  */
class LeakageSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(id: Long): String = {
    val u = java.lang.Long.parseLong(
      md5hex(id.toString).substring(0, 8), 16) / 4294967296.0
    if (u < 0.1) "test" else if (u < 0.2) "val" else "train"
  }

  test("cross-boundary near-dup pair surfaces; same-split pair " +
    "counts as base rate") {
    val dir = java.nio.file.Files.createTempDirectory("leak").toString
    // pick concrete ids per split with the SAME rule the engine uses
    val ids = (1L to 200L)
    val testId = ids.find(splitOf(_) == "test").get
    val trains = ids.filter(splitOf(_) == "train").take(3).toSeq
    val shared = "the quick brown fox jumps over the lazy dog again " +
      "and again without variation in this planted duplicate text"
    val other = "entirely unrelated content goes here with different " +
      "words throughout so the pair shares no shingles whatsoever now"
    val docs = Seq(
      (testId, shared), (trains(0), shared), // cross-split leak
      (trains(1), other), (trains(2), other)) // same-split pair
    docs.map { case (id2, t) => (id2, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.CacheScope.scoped {
      DedupQueries.qCurateSplitLeakage(spark, dir)
        .as[(String, String, Boolean, Long, Long)].collect().toSeq
    }
    val lo = math.min(testId, trains(0))
    val hi = math.max(testId, trains(0))
    assert(got.toSet == Set(
      ("test", "train", true, 1L, lo * 1000000L + hi),
      ("train", "train", false, 1L,
        trains(1) * 1000000L + trains(2))))
  }
}
