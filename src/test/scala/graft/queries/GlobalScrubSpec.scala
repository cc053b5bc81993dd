package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pair-free global ExactSubstr scrub (TextQueries.globalScrub):
  * position-level assertions on planted constructions — keep-first by
  * (doc_id, pos), within-doc second occurrences cut, sub-L overlap
  * untouched, exact region boundaries, and the defining property vs
  * the winnow-pair-driven pass: a single duplicated region between
  * otherwise-unrelated docs (far below any fingerprint-sharing
  * threshold) is still caught. Complements q_text_scrub_global's
  * DuckDB hash-oracle.
  */
class GlobalScrubSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 20

  private def scrub(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] =
    TextQueries.globalScrub(docs.toDF("doc_id", "text"), L)
      .select(col("doc_id"), col("n_cuts"), col("chars_removed"),
        col("clean"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  // deterministic non-repeating filler (no internal ≥L self-overlap)
  private def filler(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(('a' + r.nextInt(26)).toChar).mkString
  }

  test("cross-doc duplicated region: later doc cut at exact bounds, " +
      "earlier doc absent (keep-first)") {
    val span = "THIS-EXACT-REGION-APPEARS-IN-BOTH-DOCS" // 38 chars
    val fa = filler(1, 45); val fb1 = filler(2, 25); val fb2 = filler(3, 30)
    val a = fa + span + filler(4, 20)
    val b = fb1 + span + fb2
    val got = scrub(Seq((1L, a), (2L, b)))
    assert(!got.contains(1L), s"earlier doc must be intact, got $got")
    assert(got(2L) == ((1L, 38L, fb1 + fb2)), s"got ${got.get(2L)}")
  }

  test("within-doc repetition: second occurrence cut, first kept") {
    val x = "A-REPEATED-INTERNAL-SEGMENT-HERE!" // 33 chars
    val f1 = filler(5, 30); val f2 = filler(6, 30); val f3 = filler(7, 10)
    val got = scrub(Seq((1L, f1 + x + f2 + x + f3)))
    assert(got(1L) == ((1L, 33L, f1 + x + f2 + f3)), s"got ${got.get(1L)}")
  }

  test("shared overlap shorter than L is untouched") {
    val short = "only-nineteen-chars"
    assert(short.length == L - 1)
    val a = filler(8, 40) + short + filler(9, 40)
    val b = filler(10, 40) + short + filler(11, 40)
    assert(scrub(Seq((1L, a), (2L, b))).isEmpty)
  }

  test("no fingerprint-sharing threshold: a lone duplicated region " +
      "between otherwise-unrelated docs is caught") {
    // exactly L chars shared — the minimum catchable region, far below
    // the winnow pair pass's >=40-shared-fingerprints report threshold
    val span = "exactly-twenty-chars"
    assert(span.length == L)
    val fb1 = filler(14, 60); val fb2 = filler(15, 60)
    val a = filler(12, 200) + span + filler(13, 200)
    val b = fb1 + span + fb2
    val got = scrub(Seq((1L, a), (2L, b)))
    assert(got == Map(2L -> ((1L, 20L, fb1 + fb2))), s"got $got")
  }

  test("three copies across three docs: only the globally first " +
      "survives, both later docs cut") {
    val span = "TRIPLICATED-ACROSS-THREE-DOCUMENTS-!!" // 37 chars
    val docs = Seq(
      (3L, filler(16, 20) + span + filler(17, 20)),
      (7L, filler(18, 20) + span + filler(19, 20)),
      (9L, filler(20, 20) + span + filler(21, 20)))
    val got = scrub(docs)
    assert(!got.contains(3L))
    assert(got(7L)._2 == 37L && got(9L)._2 == 37L, s"got $got")
  }

  test("self-overlapping run collapses to its first gram start " +
      "(every later-start gram is a duplicate of the first)") {
    val f1 = filler(22, 30); val f2 = filler(23, 30)
    val got = scrub(Seq((1L, f1 + ("a" * 60) + f2)))
    // grams at run positions p+1..p+40 duplicate the one at p: the
    // island covers p+1..p+59, keeping a single 'a'
    assert(got(1L) == ((1L, 59L, f1 + "a" + f2)), s"got ${got.get(1L)}")
  }
}
