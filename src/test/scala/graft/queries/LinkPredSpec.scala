package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Link prediction (qGraphLinkPred): hand-computed common-neighbor,
  * Jaccard and Adamic–Adar scores on a planted square-plus-chord, and
  * the existing-edge exclusion.
  */
class LinkPredSpec extends SparkTestBase {
  import spark.implicits._

  test("square plus chord: only the open pair is scored") {
    val dir = java.nio.file.Files.createTempDirectory("lp").toString
    // co-supply parts → edges (1,2),(2,3),(3,4),(1,4),(1,3):
    // pair (1,3) is ADJACENT (chord) → excluded; pair (2,4) has
    // common neighbors {1,3} (deg 3 each): cn=2, jaccard=2/(2+2-2)=1,
    // aa = 2/ln(3)
    val parts = Seq(
      (1L, Seq(1L, 2L)), (2L, Seq(2L, 3L)), (3L, Seq(3L, 4L)),
      (4L, Seq(1L, 4L)), (5L, Seq(1L, 3L)))
    val lines = parts.flatMap { case (p, ss) =>
      ss.map(s => (p * 100 + s, p, s))
    }
    lines.zipWithIndex.map { case ((ok, p, s), i) =>
      (ok, p, s, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = GraphQueries.qGraphLinkPred(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val aa = BigDecimal(2.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((2L, 4L, 2L, 1.0, aa)))
  }
}
