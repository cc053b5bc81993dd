package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Maximal-shared-span extraction (TextQueries.maximalSharedSpans):
  * planted spans come back with exact positions and lengths, overlapping
  * gram matches merge into ONE maximal run per diagonal, and sub-L
  * overlap produces nothing. Complements q_text_winnow_spans' DuckDB
  * hash-oracle with position-level assertions on known constructions.
  */
class SharedSpansSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 20

  private def spans(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)]) =
    TextQueries.maximalSharedSpans(
        pairs.toDF("id_a", "id_b"),
        docs.toDF("doc_id", "text"), L)
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("span_len"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  // deterministic non-repeating filler (no internal ≥L self-overlap)
  private def filler(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(('a' + r.nextInt(26)).toChar).mkString
  }

  test("two planted spans at different offsets: exact starts and lengths") {
    val s1 = "THE-FIRST-SHARED-SPAN-IS-THIS-STRING!" // 37 chars
    val s2 = "AND+HERE+IS+A+SECOND+DUPLICATED+REGION" // 38 chars
    val a = filler(1, 50) + s1 + filler(2, 40) + s2 + filler(3, 30)
    val b = filler(4, 10) + s2 + filler(5, 70) + s1 + filler(6, 20)
    val got = spans(Seq((1L, a), (2L, b)), Seq((1L, 2L)))
    // spans are reported 1-based: s1 at a:51, b:119; s2 at a:128, b:11
    assert(got == Seq(
      (1L, 2L, 51L, 119L, 37L),
      (1L, 2L, 128L, 11L, 38L)),
      s"got $got")
  }

  test("shared overlap shorter than L yields no span") {
    val short = "only-nineteen-chars"
    assert(short.length == L - 1)
    val a = filler(7, 40) + short + filler(8, 40)
    val b = filler(9, 40) + short + filler(10, 40)
    assert(spans(Seq((1L, a), (2L, b)), Seq((1L, 2L))).isEmpty)
  }

  test("a long shared region is ONE maximal run, not many gram hits") {
    val shared = filler(11, 200)
    val a = filler(12, 30) + shared + filler(13, 30)
    val b = shared + filler(14, 60)
    val got = spans(Seq((1L, a), (2L, b)), Seq((1L, 2L)))
    assert(got == Seq((1L, 2L, 31L, 1L, 200L)), s"got $got")
  }

  test("scrub: spans cut from the LATER doc only, overlapping cuts " +
      "merge, kept text is exactly the complement") {
    val shared1 = filler(20, 60)
    val shared2 = filler(21, 40)
    val keepA = filler(22, 25)
    val keepB = filler(23, 15)
    val keepC = filler(24, 10)
    val early = shared1 + filler(25, 30) + shared2
    val late = keepA + shared1 + keepB + shared2 + keepC
    val docs = Seq((1L, early), (2L, late)).toDF("doc_id", "text")
    val spansDf = TextQueries.maximalSharedSpans(
      Seq((1L, 2L)).toDF("id_a", "id_b"), docs, L)
    val out = TextQueries.scrubSpans(spansDf, docs)
      .select(col("doc_id"), col("n_cuts"), col("chars_removed"),
        col("clean"))
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 1 && out.head._1 == 2L,
      "only the later (id_b) doc is scrubbed")
    val (_, nCuts, removed, clean) = out.head
    assert(nCuts == 2L && removed == 100L, s"cuts=$nCuts removed=$removed")
    assert(clean == keepA + keepB + keepC,
      "cleaned text must be exactly the non-shared segments in order")
  }

  test("only listed pairs are searched") {
    val shared = filler(15, 80)
    val docs = Seq((1L, filler(16, 20) + shared),
      (2L, shared + filler(17, 20)), (3L, shared))
    // pair list names only (1,2): the (1,3)/(2,3) overlaps are ignored
    val got = spans(docs, Seq((1L, 2L)))
    assert(got.map(t => (t._1, t._2)).distinct == Seq((1L, 2L)))
  }
}
