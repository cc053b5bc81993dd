package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection on documents LONGER than the old 2²⁰
  * packing cap (VERDICT r6 item 9). The packed key is
  * h·2²³ + max(0, 2²³−1−pos): before the widening+clamp, positions past
  * 2²⁰ drove the tie-break term negative and floor-division corrupted
  * the recovered hash — a match sitting past the cap in a long document
  * would silently stop sharing fingerprints with its twin. This spec
  * plants the same 64-char marker beyond 2²⁰ in a long doc and early in
  * a short doc and requires a shared fingerprint (the SIGMOD'03
  * guarantee: any match ≥ w+k−1 = 11 chars shares one), plus hash-field
  * integrity for every selected fingerprint.
  */
class WinnowLongDocSpec extends SparkTestBase {
  import spark.implicits._

  test("marker past 2^20 chars still shares a fingerprint; " +
      "hash field stays intact") {
    val marker = "the-very-distinctive-shared-marker-substring-for-winnow-check!!"
    assert(marker.length >= 11) // ≥ w+k−1, the match-guarantee threshold
    // deterministic filler that cannot collide with the marker
    val rnd = new scala.util.Random(42)
    val n = (1 << 20) + 50000
    val sb = new StringBuilder(n + 100)
    while (sb.length < n) sb.append(('a' + rnd.nextInt(26)).toChar)
    val insertAt = (1 << 20) + 10000
    val longDoc = sb.substring(0, insertAt) + marker +
      sb.substring(insertAt, n - marker.length)
    val shortDoc = "prefix " + marker + " suffix padding to clear minimums"
    val docs = Seq((1L, longDoc), (2L, shortDoc)).toDF("doc_id", "text")
    val fps = TextQueries.winnowFingerprints(docs)
      .select(col("doc_id"), col("fp")).as[(Long, Long)].collect()
    // every recovered fingerprint is a genuine 40-bit hash value
    fps.foreach { case (id, fp) =>
      assert(fp >= 0L && fp < (1L << 40),
        s"doc $id fingerprint $fp outside the 40-bit hash range — " +
          "position tie-break leaked into the hash field")
    }
    val longFps = fps.collect { case (1L, fp) => fp }.toSet
    val shortFps = fps.collect { case (2L, fp) => fp }.toSet
    assert(longFps.intersect(shortFps).nonEmpty,
      "a 63-char shared substring past the 2^20 position must still " +
        "share at least one winnowing fingerprint (match guarantee)")
  }

  test("selection is identical whether the doc sits before or after " +
      "other content (position-packing does not alter chosen hashes)") {
    val rnd = new scala.util.Random(7)
    val body = Array.fill(4000)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, body), (2L, "x" * 1500000 + body))
      .toDF("doc_id", "text")
    val fps = TextQueries.winnowFingerprints(docs)
      .select(col("doc_id"), col("fp")).as[(Long, Long)].collect()
    val a = fps.collect { case (1L, fp) => fp }.toSet
    val b = fps.collect { case (2L, fp) => fp }.toSet
    // the long doc's trailing copy of `body` must reproduce (at least)
    // the short doc's interior fingerprints: windows fully inside the
    // shared suffix select the same hashes regardless of absolute pos
    assert(a.intersect(b).size >= a.size / 2,
      s"shared-suffix fingerprints lost: |a|=${a.size}, " +
        s"|a∩b|=${a.intersect(b).size}")
  }
}
