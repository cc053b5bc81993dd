package graft.ops

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the Aho–Corasick automaton against a brute-force every-window
  * scan: ALL occurrences of ALL patterns, including self-overlapping
  * patterns ("aa", "aba") and patterns nested in each other — the
  * cases the oracle's replace-count trick cannot express (which is why
  * the registered query restricts itself to border-free patterns).
  */
class TextScanSpec extends SparkTestBase {

  private def brute(text: String, patterns: Seq[String]): Seq[Long] =
    patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  private def forAll[A](g: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(11L + i)))
    }

  private val texts: Gen[String] = for {
    n <- Gen.chooseNum(0, 200)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'h', 's', ' '))
  } yield cs.mkString

  test("AC counts equal brute force incl. self-overlapping and nested patterns") {
    val patterns = Seq("a", "aa", "aba", "ha", "ash", "hash", "ab", "b")
    val ac = TextScan.Automaton.build(patterns)
    forAll(texts) { t =>
      assert(ac.countAll(t, patterns.length).toSeq == brute(t, patterns),
        s"text=${t.take(60)}")
    }
  }

  test("self-overlap: 'aa' in 'aaaa' counts 3; 'hash' in 'hashash' counts 2") {
    val ac = TextScan.Automaton.build(Seq("aa", "hash"))
    assert(ac.countAll("aaaa", 2).toSeq == Seq(3L, 0L))
    assert(ac.countAll("hashash", 2).toSeq == Seq(0L, 2L))
  }

  test("one token fires nested patterns ending at the same position") {
    val patterns = Seq("ha", "sh", "has", "ash")
    val ac = TextScan.Automaton.build(patterns)
    // "hash": ha@1, has@1, ash@2, sh@3
    assert(ac.countAll("hash", 4).toSeq == Seq(1L, 1L, 1L, 1L))
  }

  test("distributed counts match a single-machine scan on a tiny frame") {
    import spark.implicits._
    val docs = Seq((1L, "hash the hash"), (2L, "shash"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextScan.multiPatternCounts(docs, "doc_id", "text",
        Seq("ha", "sh", "has", "ash"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "ha", 2L), (1L, "has", 2L), (1L, "ash", 2L),
      (1L, "sh", 2L), (2L, "sh", 2L), (2L, "ha", 1L), (2L, "has", 1L),
      (2L, "ash", 1L))) // "shash": sh@1 AND sh@4
  }
}
