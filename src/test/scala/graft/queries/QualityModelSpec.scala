package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the integer-perceptron quality scorer: on planted
  * high/low-quality docs with disjoint vocabularies the model must
  * separate the HELD-OUT docs (not just the training slice), and the
  * whole pipeline must stay integer-exact and deterministic. */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  // passes the gate: 30 tokens, mean len 3.1, stopwords present
  private val good = Seq.fill(3)(
    "the fox and dog ran with the cat for fun").mkString(" ")
  // fails the gate: mean token length 10, zero stopwords
  private val bad = Seq.fill(15)("zzzzzzzzzz qqqqqqqqqq").mkString(" ")

  // class by i % 8 < 4 so the doc_id % 4 == 0 TRAINING slice holds
  // both classes (ids 0, 8, 16, ... good; 4, 12, 20, ... bad)
  private def isGood(i: Long) = i % 8 < 4

  private lazy val scored = {
    val docs = (0L until 40L).map { i =>
      val t = if (isGood(i)) good + s" extra$i" else bad + s" w$i"
      (i, t)
    }.toDF("doc_id", "text")
    val labeled = graft.ops.TextAnalysis.qualityGate(docs, "text")
      .withColumn("y", when(col("pass"), 1L).otherwise(-1L))
    CurationQueries.perceptronScore(labeled)
      .as[(Long, Boolean, Boolean, Long, Boolean, Boolean)]
      .collect()
  }

  test("labels are the planted classes") {
    assert(scored.forall { case (id, _, label, _, _, _) =>
      label == isGood(id)
    })
  }

  test("held-out docs separate: every non-train prediction is correct") {
    val holdout = scored.filterNot(_._2)
    assert(holdout.nonEmpty)
    assert(holdout.forall(_._6), s"misclassified holdout: ${
      holdout.filterNot(_._6).mkString(", ")}")
    // real margin separation, not boundary luck
    val passScores = holdout.filter(_._3).map(_._4)
    val failScores = holdout.filterNot(_._3).map(_._4)
    assert(passScores.min > 0 && failScores.max <= 0)
  }

  test("scores are deterministic under repartitioning") {
    val docs = (0L until 24L).map { i =>
      (i, if (isGood(i)) good + s" extra$i" else bad + s" w$i")
    }.toDF("doc_id", "text")
    def run(parts: Int) = {
      val labeled = graft.ops.TextAnalysis.qualityGate(
          docs.repartition(parts), "text")
        .withColumn("y", when(col("pass"), 1L).otherwise(-1L))
      CurationQueries.perceptronScore(labeled)
        .select("doc_id", "score")
        .as[(Long, Long)].collect().toMap
    }
    assert(run(1) == run(7))
  }
}
