package graft.queries

import graft.SparkTestBase

/** Grid-bucketed spatial join (qJoinSpatial) against a brute-force
  * all-pairs scalar replay of the same md5-derived coordinates — the
  * grid must be a pure candidate pruning (identical result set), and
  * the 3×3 neighborhood must produce each qualifying pair exactly
  * once.
  */
class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hex8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def coords(id: Long): (Long, Long) = (
    37000000L + hex8(s"lat:$id") % 100000L,
    (57900000L + hex8(s"lon:$id") % 100000L) * 79L / 100L)

  test("grid join equals brute-force all-pairs; no duplicate pairs") {
    val dir = java.nio.file.Files.createTempDirectory("spatial").toString
    val ids = (1L to 400L).toSeq
    ids.map(i => (i, s"c$i", 1, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val got = JoinQueries.qJoinSpatial(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val want = (for {
      a <- ids; b <- ids if a < b
      (la, qa) = coords(a); (lb, qb) = coords(b)
      d2 = (la - lb) * (la - lb) + (qa - qb) * (qa - qb)
      if d2 <= 4000000L
    } yield (a, b, d2)).sortBy(p => (p._1, p._2))
    assert(got.size == got.distinct.size, "each pair exactly once")
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one pair")
  }
}
