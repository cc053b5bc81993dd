package graft.queries

import graft.SparkTestBase

/** Interpolated Kneser–Ney (qTextKneserNey) against a fully
  * hand-computed corpus.
  *
  * Corpus "a b a b a c": bigrams ab, ba, ab, ba, ac.
  *   c(a,b)=2 c(b,a)=2 c(a,c)=1; c(a·)=3 c(b·)=2;
  *   N1+(a·)=2 N1+(b·)=1; N1+(·a)=1 N1+(·b)=1 N1+(·c)=1; B=3.
  * With D = 3/4 (×4-cleared integers):
  *   P(b|a) = ((8−3)·3 + 3·2·1)/(4·3·3) = 21/36
  *   P(a|b) = ((8−3)·3 + 3·1·1)/(4·2·3) = 18/24
  *   P(c|a) = ((4−3)·3 + 3·2·1)/(4·3·3) =  9/36
  * Mass check: the unseen continuation P(a|a) = D·N1+(a·)/c(a·) ·
  * N1+(·a)/B = 6/36, and 21/36 + 9/36 + 6/36 = 1 — interpolated KN
  * sums to one over the full vocabulary.
  */
class KneserNeySpec extends SparkTestBase {
  import spark.implicits._

  test("hand corpus probabilities and continuation counts are exact") {
    val dir = java.nio.file.Files.createTempDirectory("kn").toString
    Seq((1L, "a b a b a c", "s")).toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.qTextKneserNey(spark, dir)
      .select("w1", "w2", "c12", "n1f", "n1p", "p_num", "p_den")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(got == Seq(
      ("a", "b", 2L, 2L, 1L, 21L, 36L),
      ("b", "a", 2L, 1L, 1L, 18L, 24L),
      ("a", "c", 1L, 2L, 1L, 9L, 36L)))
  }

  test("bigrams never cross document boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("kn2").toString
    Seq((1L, "x y", "s"), (2L, "z w", "s"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.qTextKneserNey(spark, dir)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(got == Set(("x", "y"), ("z", "w")),
      "no (y, z) bigram may span the document boundary")
  }
}
