package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Stupid-Backoff bigram scoring (TextAnalysis.stupidBackoffScore):
  * hand-computed scores on a 2-doc corpus pin every branch — seen
  * bigram (c(vw)/c(v)), unseen bigram over a seen word (α·S_uni),
  * fully OOV word (α·add-1 floor), and the doc-initial unigram.
  */
class StupidBackoffSpec extends SparkTestBase {
  import spark.implicits._

  // train (id 0): "a b a c" → uc: a=2 b=1 c=1, N=4, V=3
  //                           bc: (a,b)=1 (b,a)=1 (a,c)=1
  private val docs = Seq(
    (0L, "a b a c"),
    (1L, "a b x")
  ).toDF("doc_id", "text")

  private def scores: Map[Long, (Long, Double, Double)] =
    TextAnalysis.stupidBackoffScore(docs, "doc_id", "text",
        trainPred = col("doc_id") % 2 === 0)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("held-out doc: initial unigram, seen bigram, OOV backoff") {
    val (n, meanLp, ppl) = scores(1L)
    assert(n == 3L)
    // a: S_uni = (2+1)/(4+3); (a,b): 1/uc(a)=1/2; (b,x): 0.4·(0+1)/7
    val expected = (math.log(3.0 / 7) + math.log(0.5) +
      math.log(0.4 / 7)) / 3
    assert(math.abs(meanLp - expected) < 1e-5, s"got $meanLp")
    assert(math.abs(ppl - math.exp(-expected)) < 1e-2, s"got $ppl")
  }

  test("train doc scores its own bigrams at raw relative frequency") {
    val (n, meanLp, _) = scores(0L)
    assert(n == 4L)
    // a: 3/7; (a,b): 1/2; (b,a): 1/1; (a,c): 1/2
    val expected = (math.log(3.0 / 7) + math.log(0.5) + 0.0 +
      math.log(0.5)) / 4
    assert(math.abs(meanLp - expected) < 1e-5, s"got $meanLp")
  }

  test("train corpus with nothing shared still scores the held-out " +
      "doc via the OOV floor only") {
    val d2 = Seq((0L, "p q"), (1L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.stupidBackoffScore(d2, "doc_id", "text",
        col("doc_id") % 2 === 0)
      .where(col("doc_id") === 1).as[(Long, Long, Double, Double)]
      .collect()(0)
    // uc: p=1 q=1, N=2, V=2; x: S_uni=1/4; (x,y): 0.4·1/4
    val expected = (math.log(0.25) + math.log(0.1)) / 2
    assert(r._2 == 2L && math.abs(r._3 - expected) < 1e-5, s"got $r")
  }
}
