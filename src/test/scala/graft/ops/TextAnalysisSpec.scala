package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head().getAs[T]("v")

  test("tokenCount handles runs of whitespace") {
    assert(one[Int](TextAnalysis.tokenCount(lit("a  b\tc   d"))) == 4)
    assert(one[Int](TextAnalysis.tokenCount(lit("single"))) == 1)
  }

  test("stopwordCount: lower-cased exact token match") {
    assert(one[Int](TextAnalysis.stopwordCount(
      lit("The cat of a house"))) == 3) // the, of, a
  }

  test("langGuess: marker argmax with declaration-order ties and und") {
    assert(one[String](TextAnalysis.langGuess(
      lit("the cat and the dog"))) == "en")
    assert(one[String](TextAnalysis.langGuess(
      lit("el gato de que la casa que"))) == "es")
    assert(one[String](TextAnalysis.langGuess(
      lit("zzz qqq www"))) == "und")
  }

  test("fingerprint is whitespace/case insensitive") {
    val a = one[String](TextAnalysis.fingerprintMd5(lit("Hello   World")))
    val b = one[String](TextAnalysis.fingerprintMd5(lit("hello world ")))
    val c = one[String](TextAnalysis.fingerprintMd5(lit("hello worlds")))
    assert(a == b)
    assert(a != c)
  }

  test("wordNgrams produces sliding n-grams") {
    def grams(n: Int): Seq[String] =
      spark.range(1).select(TextAnalysis.wordNgrams(lit("a b c d"), n)
        .as("v")).head().getSeq[String](0)
    assert(grams(2) == Seq("a b", "b c", "c d"))
    assert(grams(3) == Seq("a b c", "b c d"))
  }

  test("qualityFeatures ratios are consistent") {
    val df = Seq((1L, "the quick brown fox")).toDF("id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").head()
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_stopwords") == 1)
    assert(math.abs(r.getAs[Double]("mean_token_len") - 16.0 / 4) < 1e-12)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.25) < 1e-12)
  }
}
