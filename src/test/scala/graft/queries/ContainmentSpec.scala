package graft.queries

import graft.SparkTestBase

/** Containment dedup (qDedupContainment): a short document embedded in
  * a much larger one must surface at containment ≈ 1.0 even though its
  * symmetric Jaccard is diluted below any usable threshold — the case
  * the operator exists for.
  */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  test("embedded document found by containment, missed by jaccard") {
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    val small = "alpha bravo charlie delta echo foxtrot"
    val filler = (1 to 40).map(i => s"word$i unique$i token$i")
      .mkString(" ")
    val big = small + " " + filler
    Seq((1L, small), (2L, big), (3L, "completely different content " +
      "nothing shared here at all with anything else"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.qDedupContainment(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    val (_, _, inter, lenA, lenB, c) = got.head
    assert(c >= 0.9, s"containment $c")
    // the same pair's symmetric jaccard is diluted by the filler
    val jac = inter.toDouble / (lenA + lenB - inter)
    assert(jac < 0.2, s"jaccard $jac should be diluted")
  }
}
