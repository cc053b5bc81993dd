package graft.queries

import graft.SparkTestBase
import scala.collection.mutable

/** Pins qTextUnigramTok's Viterbi DP against a brute-force enumeration
  * of EVERY segmentation: the DP's max score must equal the exhaustive
  * max, and the emitted segmentation must be a valid cover of the word
  * achieving exactly that score. (The tie rule among equal-score
  * segmentations is pinned cross-engine by the oracle, not here — the
  * brute force certifies optimality, which is tie-independent.)
  */
class UnigramTokSpec extends SparkTestBase {
  import spark.implicits._

  test("Viterbi equals brute-force max; segmentation valid and optimal") {
    val texts = Seq(
      "abab ab abab cd abcd abcab",
      "ababab cd ab abcab xyzw",
      "xyzw xy zw abab babab")
    val dir = java.nio.file.Files.createTempDirectory("unitok").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.qTextUnigramTok(spark, dir)
      .as[(String, Long, String, Long, Long)].collect()

    // independent replication of vocab + scores
    val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val cnts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to 4 if i + l <= w.length)
      cnts(w.substring(i, i + l)) += c
    val vocab = cnts.filter(_._1.length == 1).toMap ++
      cnts.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(200).toMap
    val total = vocab.values.sum
    val score = vocab.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / total) * 1e6).toLong }

    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (score.contains(p)) allSegs(w.substring(l)).map(p +: _)
        else Seq.empty
      }

    assert(got.map(_._1).toSet == words.keySet)
    for ((w, c, seg, np, tot) <- got) {
      val best = allSegs(w).map(_.map(score).sum).max
      assert(tot == best, s"$w: DP $tot vs brute $best")
      val pieces = seg.split("\\|").toSeq
      assert(pieces.mkString == w, s"$w: segmentation must cover")
      assert(np == pieces.size.toLong)
      assert(pieces.map(score).sum == best, s"$w: emitted seg suboptimal")
      assert(c == words(w))
    }
  }
}
