package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Planted-fixture guards for the annotator-agreement / score-mixing
  * curation trio: Cohen's κ identities (perfect agreement = 1,
  * statistical independence = exactly 0), quantile normalization's
  * defining property (shifted-scale sources land on identical
  * normalized values), and Wilson's small-sample demotion.
  */
class CurateAgreementSpec extends SparkTestBase {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def writeDocs(d: String, rows: Seq[(Long, String, String)])
  : Unit =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")

  // a w-word text of fixed word length; n_chars = w·(len+1) − 1
  private def words(w: Int, len: Int): String =
    Seq.fill(w)("a" * len).mkString(" ")

  test("kappa: aligned annotators score exactly 1.0 and substantial") {
    val d = java.nio.file.Files.createTempDirectory("kap").toString
    // (w=10,len=4)→49 chars: short/short; (w=50,len=4)→249: med/med;
    // (w=90,len=4)→449: long/long — unequal class sizes on purpose
    val rows = (1 to 3).map(i => (i.toLong, words(10, 4), "s")) ++
      (4 to 8).map(i => (i.toLong, words(50, 4), "s")) ++
      (9 to 10).map(i => (i.toLong, words(90, 4), "s"))
    writeDocs(d, rows)
    val r = CurationQueries.qCurateKappa(spark, d)
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    assert(r._1 == 10L && r._2 == 10L)
    assert(r._4 == 1.0 && r._5)
  }

  test("kappa: independent annotators score exactly 0.0") {
    val d = java.nio.file.Files.createTempDirectory("kap0").toString
    // 2×2 balanced independence, medium avoided on both axes:
    // four docs in each (a, b) cell → po = pe = 1/2 → κ = 0
    val cells = Seq(
      words(10, 3), // 39 chars (a short), 10 words (b short)
      words(90, 1), // 179 chars (a short), 90 words (b long)
      words(30, 20), // 629 chars (a long), 30 words (b short)
      words(90, 5)) // 539 chars (a long), 90 words (b long)
    val rows = for {
      (t, ci) <- cells.zipWithIndex
      j <- 0 until 4
    } yield ((ci * 4 + j).toLong, t, "s")
    writeDocs(d, rows)
    val r = CurationQueries.qCurateKappa(spark, d)
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    assert(r._1 == 16L && r._2 == 8L && r._3 == 128L)
    assert(r._4 == 0.0 && !r._5)
  }

  test("quantile norm: shifted-scale sources map to identical " +
    "normalized values rank-for-rank") {
    val d = java.nio.file.Files.createTempDirectory("qn").toString
    // source A scores {1,2,3,4}·10 chars, source B the same shape
    // shifted +100 — after normalization the r-th doc of each source
    // must carry the SAME value
    val rows =
      (1 to 4).map(i => (i.toLong, "a" * (i * 10), "A")) ++
        (1 to 4).map(i => (10L + i, "a" * (100 + i * 10), "B"))
    writeDocs(d, rows)
    val got = CurationQueries.qCurateQuantileNorm(spark, d)
      .as[(Long, String, Long, Long)].collect()
    val byRank = got.groupBy(_._2).view.mapValues(
      _.sortBy(_._3).map(_._4).toSeq).toMap
    assert(byRank("A") == byRank("B"))
    // midpoint rule keeps positions in range: norms drawn from globals
    assert(got.map(_._4).toSet.subsetOf(got.map(_._3).toSet))
  }

  test("fertility: punctuation and contractions fragment into more " +
    "BPE-ish segments than whitespace words") {
    val d = java.nio.file.Files.createTempDirectory("fert").toString
    // "don't stop!" = 2 ws tokens but 4 BPE-ish segments
    // (don + 't + " stop" + "!"); plain text stays 1:1
    writeDocs(d, Seq(
      (1L, "don't stop!", "frag"),
      (2L, "plain words here", "clean")))
    val got = CurationQueries.qCurateFertility(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("clean") == (("clean", 1L, 3L, 3L, 1000000L)))
    assert(got("frag")._3 == 2L && got("frag")._4 == 4L &&
      got("frag")._5 == 2000000L)
  }

  test("coverage curve: top-10 of an 11-token Zipf-ish corpus covers " +
    "99%; k beyond the vocabulary clamps to full coverage") {
    val d = java.nio.file.Files.createTempDirectory("cov").toString
    // w0 ×90 in one doc; w1..w10 once each → total 100, vocab 11
    val rows = Seq((1L, Seq.fill(90)("w0").mkString(" "), "s"),
      (2L, (1 to 10).map(i => s"w$i").mkString(" "), "s"))
    writeDocs(d, rows)
    val got = CurationQueries.qCurateCoverage(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 10L, 99L, 100L, 990000L),
      (100L, 11L, 100L, 100L, 1000000L),
      (1000L, 11L, 100L, 100L, 1000000L)))
  }

  test("wilson: 80/100 outranks 3/3 and the bound matches the " +
    "closed form") {
    val d = java.nio.file.Files.createTempDirectory("wil").toString
    // pass gate is 100 ≤ n_chars ≤ 450
    def doc(id: Long, pass: Boolean, src: String) =
      (id, if (pass) "a" * 200 else "a" * 10, src)
    val rows = (1 to 3).map(i => doc(i.toLong, pass = true, "tiny")) ++
      (1 to 100).map(i =>
        doc(100L + i, pass = i <= 80, "big"))
    writeDocs(d, rows)
    val got = CurationQueries.qCurateWilson(spark, d)
      .as[(Int, String, Long, Long, Double)].collect()
      .map(r => r._2 -> r).toMap
    def wilson(s: Long, n: Long): Double = {
      val p = s / n.toDouble
      (p + 1.96 * 1.96 / (2.0 * n)
        - 1.96 * math.sqrt((p * (1.0 - p) + 1.96 * 1.96 / (4.0 * n)) / n)
        ) / (1.0 + 1.96 * 1.96 / n)
    }
    assert(got("big")._1 == 1 && got("tiny")._1 == 2)
    assert(got("big")._5 == r6(wilson(80, 100)))
    assert(got("tiny")._5 == r6(wilson(3, 3)))
    assert(got("big")._5 > got("tiny")._5)
  }
}
