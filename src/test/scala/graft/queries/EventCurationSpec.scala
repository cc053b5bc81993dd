package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

/** Semantic guards for the round-5 event-analytics + curation additions
  * (funnel, Markov matrix, cross-doc duplicated n-grams, DSIR weights).
  * The oracle gate certifies values at sf0.01; these pin the *semantics*
  * that a value-compare could silently lose — funnel step strictness via
  * an independent window-based recomputation, Markov mass conservation,
  * and constructed-fixture behavior for the two document scorers.
  */
class EventCurationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("funnel step 2 equals an independent window-based recomputation") {
    val funnel = EventQueries.qEventFunnel(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // independent path: first view per user via a window, then a click
    // strictly after it — EXISTS semantics instead of chained min-aggs
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val step2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1"))
      .select("user_id").distinct().count()
    assert(funnel(2) == step2)
    assert(funnel(1) >= funnel(2) && funnel(2) >= funnel(3),
      s"funnel not monotone: $funnel")
  }

  test("funnel top-of-funnel conversion is exactly 1000000 ppm") {
    val rows = EventQueries.qEventFunnel(spark, dir).collect()
    assert(rows.find(_.getInt(0) == 1).get.getLong(2) == 1000000L)
  }

  test("markov: per-row probability mass conserves (floor rounding)") {
    val m = EventQueries.qEventMarkov(spark, dir)
    val mass = m.groupBy("from_type")
      .agg(sum("p_ppm").as("mass"), count(lit(1)).as("cells"))
      .collect()
    mass.foreach { r =>
      val (s, cells) = (r.getLong(1), r.getLong(2))
      // each cell floors, so total mass ∈ (1e6 − cells, 1e6]
      assert(s <= 1000000L && s > 1000000L - cells,
        s"${r.getString(0)}: mass $s with $cells cells")
    }
  }

  test("markov: transition count equals events minus users (chain lengths)") {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val expected = e.count() - e.select("user_id").distinct().count()
    val got = EventQueries.qEventMarkov(spark, dir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(got == expected)
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-docs-fixture").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dup spans: shared 5-gram marks both docs, unique text marks none") {
    val shared = "alpha beta gamma delta epsilon" // one 5-gram
    val d = writeDocs(Seq(
      (1L, s"$shared zeta eta theta iota kappa", "en"),   // grams 1..6
      (2L, s"pre1 pre2 $shared post1 post2", "en"),       // shared at pos 3
      (3L, "u1 u2 u3 u4 u5 u6 u7", "en")))                // all unique
    val got = TextQueries.qTextDupSpans(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc1: 6 positions, 1 shared; doc2: 5 positions, 1 shared; doc3: 0
    assert(got == List((1L, 6L, 1L), (2L, 5L, 1L), (3L, 3L, 0L)))
  }

  test("dup spans: within-doc repetition alone is NOT a cross-doc dup") {
    val d = writeDocs(Seq(
      (1L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5", "en"), // self-repeats only
      (2L, "s1 s2 s3 s4 s5 s6", "en")))
    val got = TextQueries.qTextDupSpans(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  test("dup trim: shared span cut from both docs, order preserved") {
    val shared = "alpha beta gamma delta epsilon"
    val d = writeDocs(Seq(
      (1L, s"keep1 $shared keep2", "en"),
      (2L, s"$shared tail1 tail2", "en"),
      (3L, "u1 u2 u3 u4 u5 u6", "en")))
    val got = graft.ops.Dedup.trimSharedNgramSpans(
        graft.io.Tables.documents(spark, d), "doc_id", "text", 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    // doc1: 7 tokens; the 5 span tokens removed, surrounding kept in order
    assert(got(1L) == ((7L, 2L, "keep1 keep2")))
    assert(got(2L) == ((7L, 2L, "tail1 tail2")))
    assert(got(3L) == ((6L, 6L, "u1 u2 u3 u4 u5 u6"))) // untouched
  }

  test("dup trim: overlapping shared grams union their coverage") {
    // doc1/doc2 share a 6-token run ⇒ two overlapping 5-grams; all six
    // positions are covered, not just the first five
    val run = "s1 s2 s3 s4 s5 s6"
    val d = writeDocs(Seq(
      (1L, s"a $run b", "en"),
      (2L, s"$run x y", "en")))
    val got = graft.ops.Dedup.trimSharedNgramSpans(
        graft.io.Tables.documents(spark, d), "doc_id", "text", 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, "a b")))
    assert(got(2L) == ((2L, "x y")))
  }

  test("winnowing guarantee: a (w+k-1)-char match at MISALIGNED " +
    "offsets still shares a fingerprint; disjoint text shares none") {
    // k=8, w=4 ⇒ any ≥11-char common substring must be caught
    // (Schleimer et al. Thm) — embed one at different offsets
    val run = "QWERTYUIOPA" // 11 chars
    val d = writeDocs(Seq(
      (1L, s"abc${run}defghijklmno", "en"),
      (2L, s"zyxwvut${run}srqpabcde", "en"),
      (3L, "0123456789 completely disjoint material here", "en")))
    val got = TextQueries.qTextWinnow(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) >= 1L, s"doc1 must share a fingerprint: $got")
    assert(got(2L) >= 1L, s"doc2 must share a fingerprint: $got")
    assert(got(3L) == 0L, s"disjoint doc shares nothing: $got")
  }

  test("dsir: target-looking docs score above off-target docs") {
    // target (en) speaks tokens a*; the other language speaks b* — a raw
    // doc written in a* must outweigh one written in b*
    val d = writeDocs(Seq(
      (1L, "a1 a2 a3 a1 a2 a3", "en"),
      (2L, "a1 a2 a3 a1 a2 a3", "en"),
      (3L, "b1 b2 b3 b1 b2 b3", "zh"),
      (4L, "b1 b2 b3 b1 b2 b3", "zh"),
      (5L, "a1 a2 a3 a1 a2 a3", "zh"), // target-looking but labeled raw
      (6L, "b1 b2 b3 b1 b2 b3", "de")))
    val w = CurationQueries.qDsirWeights(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(5L) > w(3L), s"target-looking raw doc should win: $w")
    assert(w(1L) > w(6L), s"en doc should beat off-target: $w")
    assert(w(1L) == w(5L), "same text ⇒ same weight regardless of label")
  }

  private def eventsDir(times: Seq[String]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("conc").toString
    times.zipWithIndex.map { case (t, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(t), i.toLong % 3, "view",
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("concurrency sweep: overlapping intervals stack, peak is exact") {
    // 30-min presences at 10:00/10:10/10:29 overlap 3-deep at 10:29;
    // the 11:00 presence stands alone
    val d = eventsDir(Seq("2024-01-01 10:00:00", "2024-01-01 10:10:00",
      "2024-01-01 10:29:00", "2024-01-01 11:00:00"))
    val r = EventQueries.qEventConcurrency(spark, d).collect()
    assert(r.length == 1 && r.head.getLong(1) == 3L)
    assert(r.head.getLong(2) == 8L) // 4 starts + 4 ends
  }

  test("novelty: a gram is novel only for its min-doc first occurrence") {
    val d = writeDocs(Seq(
      (0L, "a1 a2 a3 a4 a5 a6 a7 a8 a9", "en"),      // both grams first
      (23L, "a1 a2 a3 a4 a5 a6 a7 a8 b9", "en"),     // 1 dup + 1 novel
      (46L, "a1 a2 a3 a4 a5 a6 a7", "en")))          // <8 tokens: absent
    val got = TextQueries.qTextNovelty(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List((0L, 2L, 2L, 1000000L), (23L, 2L, 1L, 500000L)))
  }

  test("mix-epochs planner: the 4-epoch cap binds on a tiny source, " +
    "surplus sources cap at their target, tokens conserve") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mix").toString
    // big: 400 tokens, tiny: 8 → total 408, budget 204, target 102/src.
    // big: epochs = 102000/400 div = 255 → planned 102, deficit 0.
    // tiny: uncapped would be 12750 → capped 4000 → planned 32,
    // deficit 70 (data-constrained).
    Seq((1L, Seq.fill(400)("w").mkString(" "), "en", "big"),
      (2L, Seq.fill(8)("w").mkString(" "), "en", "tiny"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = CurationQueries.qMixEpochs(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("big") == (("big", 400L, 102L, 255L, 102L, 0L)))
    assert(got("tiny") == (("tiny", 8L, 102L, 4000L, 32L, 70L)))
  }

  test("concurrency sweep: touching intervals do NOT overlap (end " +
    "sorts before the coincident start)") {
    val d = eventsDir(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
    val r = EventQueries.qEventConcurrency(spark, d).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L,
      "a session ending exactly when another starts must not stack")
  }
}
