package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** RAKE keyword scores on a hand-computed corpus, and the NFC gate's
  * composition semantics on planted decomposed text.
  */
class RakeNfcSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(d: String, rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, t) => (id, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")

  test("rake: hand-computed deg/freq ppm scores; phrases over the " +
    "4-token cap are dropped entirely") {
    val d = java.nio.file.Files.createTempDirectory("rake").toString
    // doc 1: two [red apple] phrases; doc 2: one [apple];
    // doc 3: a 5-word stopword-free run → capped out, contributes
    // nothing to word stats either
    writeDocs(d, Seq(
      (1L, "red apple of red apple"),
      (2L, "apple"),
      (3L, "one two three four five")))
    val got = TextQueries.qTextRake(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    // red: freq 2, deg 4 → 2_000_000; apple: freq 3, deg 5 →
    // 1_666_666; phrase scores: red apple = 3_666_666 ×2, apple ×1
    assert(got == Seq(
      ("red apple", 2L, 3666666L, 2L),
      ("apple", 1L, 1666666L, 1L)))
  }

  test("rake: stopwords split islands and never appear in phrases") {
    val d = java.nio.file.Files.createTempDirectory("rake2").toString
    writeDocs(d, Seq((1L, "alpha beta the gamma delta")))
    val got = TextQueries.qTextRake(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).toSet == Set("alpha beta", "gamma delta"))
    // each member word: freq 1, deg 2 → 2_000_000; phrase = sum = 4M
    assert(got.forall(r => r._3 == 4000000L && r._4 == 2L))
  }

  test("source overlap: half-shared vocabularies score 1/3; fully " +
    "disjoint pairs emit no row (zero-overlap convention)") {
    val d = java.nio.file.Files.createTempDirectory("ovl").toString
    Seq((1L, "a b c d", "A"), (2L, "c d e f", "B"), (3L, "x y", "C"))
      .map { case (i, t, s) => (i, t, "en", s) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = TextQueries.qTextSourceOverlap(spark, d)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // only the (A, B) pair shares words: |∩| = 2, |∪| = 6
    assert(got == Seq(("A", "B", 4L, 4L, 2L, 333333L)))
  }

  test("nfc: combining acute composes after the first e, exactly one " +
    "codepoint shorter, md5 matches the Java-normalized payload") {
    val d = java.nio.file.Files.createTempDirectory("nfc").toString
    // ids 5, 10 selected (÷5 with an 'e'); id 15 has no 'e' → excluded;
    // id 7 not ÷5 → excluded
    writeDocs(d, Seq(
      (5L, "merge table"), (7L, "merge table"), (10L, "e"),
      (15L, "row sort")))
    val got = QualityQueries.qTextNfc(spark, d)
      .as[(Long, String, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(5L, 10L))
    val exp5 = java.text.Normalizer.normalize(
      "mérge table", java.text.Normalizer.Form.NFC)
    assert(exp5 == "mérge table") // composed é
    val md5b = java.security.MessageDigest.getInstance("MD5")
      .digest(exp5.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(5L) == ((5L, "s", 12L, 11L, true, md5b)))
    assert(got(10L)._3 == 2L && got(10L)._4 == 1L && got(10L)._5)
  }
}
