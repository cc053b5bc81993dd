package graft.queries

import graft.SparkTestBase

/** WordPiece greedy longest-match (qTextWordpiece) on planted words:
  * root+continuation split, longest-match-beats-singles, whole-word
  * [UNK] collapse (partial pieces discarded), frequency weighting.
  */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  test("greedy segmentation, UNK collapse and frequency weighting") {
    val dir = java.nio.file.Files.createTempDirectory("wp").toString
    // "the" must match whole (not t ##h ##e); "customer" → cus ##tomer;
    // "x9z" starts matchable ('x') but '9' fails → the WORD is [UNK];
    // "scansort" → scan then letter-by-letter continuations ("sort" is
    // a start-form piece only)
    Seq((1L, "the the customer"), (2L, "x9z scansort"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.qTextWordpiece(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "the" -> 2L, "cus" -> 1L, "##tomer" -> 1L, "[UNK]" -> 1L,
      "scan" -> 1L, "##s" -> 1L, "##o" -> 1L, "##r" -> 1L,
      "##t" -> 1L))
  }
}
