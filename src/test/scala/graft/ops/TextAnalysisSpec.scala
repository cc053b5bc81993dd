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

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    val docs = Seq((1L, "cat dog cat"), (2L, "dog mouse"), (3L, "bird"))
      .toDF("id", "text")
    val got = TextAnalysis.bm25(docs, "id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=2.0, df=1, idf=ln((3-1+0.5)/1.5+1); doc1 tf=2 dl=3
    val idf = math.log((3 - 1 + 0.5) / 1.5 + 1.0)
    val expect = idf * 2.0 * 2.25 /
      (2.0 + 1.25 * (0.25 + 0.75 * 3.0 / 2.0))
    assert(got.keySet == Set(1L))
    assert(math.abs(got(1L) - expect) < 1e-6)
  }

  test("bm25 rewards rarer terms at equal tf and dl") {
    val docs = Seq((1L, "rare x y"), (2L, "common x y"), (3L, "common z w"),
      (4L, "common u v")).toDF("id", "text")
    val got = TextAnalysis.bm25(docs, "id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L)) // df(rare)=1 < df(common)=3, same tf/dl
  }

  test("unigramLogProb: add-one smoothing over the corpus vocabulary") {
    val docs = Seq((1L, "a a a"), (2L, "a c")).toDF("id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // vocab: a->4, c->1; T=5, V=2; p(a)=5/7, p(c)=2/7
    assert(got(1L)._1 == 3)
    assert(math.abs(got(1L)._2 - math.log(5.0 / 7)) < 1e-6)
    assert(math.abs(got(2L)._2 -
      (math.log(5.0 / 7) + math.log(2.0 / 7)) / 2) < 1e-6)
  }

  test("chunk: full coverage with overlap, short doc → one chunk") {
    val df = Seq((1L, "abcdefghij"), (2L, "abc")).toDF("id", "text")
    val out = TextAnalysis.chunk(df, "id", "text", size = 5, overlap = 2)
      .orderBy($"id", $"chunk_idx")
      .select($"id", $"chunk_idx", $"chunk")
      .as[(Long, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "abcde"), (1L, 1, "defgh"), (1L, 2, "ghij"),
      (2L, 0, "abc")))
    // consecutive chunks overlap by exactly `overlap` characters
    assert(out(0)._3.takeRight(2) == out(1)._3.take(2))
    assert(out(1)._3.takeRight(2) == out(2)._3.take(2))
  }

  test("redactPii scrubs emails then phones, leaves clean text alone") {
    def red(s: String): String =
      one[String](TextAnalysis.redactPii(lit(s)))
    assert(red("mail bob.smith+x@corp.io or 555-123-4567 today") ==
      "mail <EMAIL> or <PHONE> today")
    assert(red("call +1-800-555-0199.") == "call <PHONE>.")
    assert(red("no pii here, just words") == "no pii here, just words")
  }
}
