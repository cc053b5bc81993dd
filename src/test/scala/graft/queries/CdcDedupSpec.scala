package graft.queries

import graft.SparkTestBase
import scala.collection.mutable

/** Content-defined chunk dedup (qTextCdcDedup) against an independent
  * scalar replay of the LBFS cut-point rule, plus the property the
  * operator exists for: a head insertion re-synchronizes and the tail
  * still dedups (where fixed-width chunking would shift every chunk).
  */
class CdcDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent direct evaluation of the portable rolling-hash family
    * (graft.functions.RollingHash): plain left-fold per window, no
    * rolling update — so the engine's O(1) rolling recurrence is pinned
    * against a straight re-computation. */
  private def gramHash(s: String): Long = {
    var h1 = 0L; var h2 = 0L
    s.codePoints().forEach { c =>
      h1 = (h1 * 131 + c) % 2147483647L
      h2 = (h2 * 131 + c) % 2147483629L
    }
    h1 * 2147483629L + h2
  }

  /** Scalar replay: cut after position i (1-based) iff the 8-char
    * window ending at i hashes to 0 mod 32. */
  private def cuts(text: String): Seq[Int] = {
    val interior = (8 to text.length).filter { i =>
      gramHash(text.substring(i - 8, i)) % 32 == 0
    }
    (Seq(0) ++ interior ++ Seq(text.length)).distinct.sorted
  }

  private def chunksOf(text: String): Seq[String] = {
    val c = cuts(text)
    c.sliding(2).collect { case Seq(a, b) => text.substring(a, b) }.toSeq
  }

  /** Scalar keep-first dedup over (doc_id, text) in id order. */
  private def refRows(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long)] = {
    val seen = mutable.Set.empty[String]
    docs.sortBy(_._1).map { case (id, t) =>
      val cs = chunksOf(t)
      var kept = 0L; var dupChars = 0L
      cs.foreach { c =>
        if (seen.add(md5hex(c))) kept += 1 else dupChars += c.length
      }
      (id, cs.size.toLong, kept, dupChars)
    }
  }

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    TextQueries.qTextCdcDedup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
  }

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seventy shimmering salmon swim slowly upstream past the " +
    "weathered wooden bridge near the old mill town at dawn every day"

  test("matches the scalar replay; head insertion re-syncs") {
    val docs = Seq((1L, base), (2L, "zz " + base))
    val got = run(docs)
    val want = refRows(docs)
    assert(got == want)
    // the re-sync property itself: everything after the first interior
    // cut inside the shifted copy dedups against doc 1
    val c1 = cuts(base)
    assert(c1.size > 2, "fixture must have interior cut points")
    val firstCut = c1(1)
    assert(want(1)._4 >= (base.length - firstCut).toLong,
      "shifted copy must dedup its whole tail")
  }

  test("exact copy dedups every chunk; short doc is one chunk") {
    val docs = Seq((1L, base), (2L, base), (3L, "tiny"))
    val got = run(docs)
    val want = refRows(docs)
    assert(got == want)
    val d2 = got.find(_._1 == 2L).get
    assert(d2._3 == 0L && d2._4 == base.length.toLong)
    val d3 = got.find(_._1 == 3L).get
    assert(d3._2 == 1L && d3._3 == 1L)
  }
}
