package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Modularity (qGraphModularity): hand-computed Q on planted partitions
  * — two nation-aligned triangles score exactly 0.5; a single
  * cross-nation edge scores exactly −0.5.
  */
class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  private def writeFixture(dir: String, parts: Seq[(Long, Seq[Long])],
      nations: Map[Long, Int]): Unit = {
    val lines = parts.flatMap { case (p, ss) => ss.map(s => (p, s)) }
    lines.zipWithIndex.map { case ((p, s), i) =>
      (p * 100 + s, p, s, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    nations.toSeq.map { case (s, n) =>
      (s, s"sup$s", s"addr$s", n, "p", 0.0, "c")
    }.toDF("s_suppkey", "s_name", "s_address", "s_nationkey",
      "s_phone", "s_acctbal", "s_comment")
      .write.parquet(s"$dir/supplier.parquet")
  }

  test("two nation-aligned triangles: Q = 0.5 exactly") {
    val dir = java.nio.file.Files.createTempDirectory("mod").toString
    // part 1 → clique {1,2,3} (nation 0), part 2 → clique {4,5,6}
    // (nation 1): m = 6, Σe_c = 6, D_c = 6 each →
    // q_num = 4·6·6 − 2·36 = 72, 4m² = 144 → Q = 0.5
    writeFixture(dir,
      Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L, 6L))),
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    val got = GraphQueries.qGraphModularity(spark, dir)
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._6).distinct == Seq(0.5))
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((0, 3L, 3L, 6L), (1, 3L, 3L, 6L)))
  }

  test("conductance: two bridged triangles score 1/7 per side, " +
    "exact PPM") {
    val dir = java.nio.file.Files.createTempDirectory("cond").toString
    // cliques {1,2,3} (nation 0) and {4,5,6} (nation 1) + one bridge
    // (3,4): vol = 7 each side, cut = 1 → φ = 1e6 div 7 = 142857
    writeFixture(dir,
      Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L, 6L)),
        (3L, Seq(3L, 4L))),
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    val got = GraphQueries.qGraphConductance(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0, 3L, 7L, 1L, 142857L),
      (1, 3L, 7L, 1L, 142857L)))
  }

  test("assortativity: the 4-path scores exactly -0.5 (Newman's " +
    "classic small-graph value)") {
    val dir = java.nio.file.Files.createTempDirectory("asr").toString
    // P4: edges (1,2),(2,3),(3,4) → degrees 1,2,2,1; symmetrized
    // moments s2m=6, sjk=16, sj=10, sj2=18 → r = (96−100)/(108−100)
    writeFixture(dir,
      Seq((1L, Seq(1L, 2L)), (2L, Seq(2L, 3L)), (3L, Seq(3L, 4L))),
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0))
    val got = GraphQueries.qGraphAssortativity(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((6L, 16L, 10L, 18L, -0.5)))
  }

  test("single cross-nation edge: Q = -0.5 exactly, zero intra rows " +
    "still appear") {
    val dir = java.nio.file.Files.createTempDirectory("mod2").toString
    // one edge (1,2) across nations: m = 1, Σe_c = 0, D_c = 1 each →
    // q_num = 0 − 2 = −2, 4m² = 4 → Q = −0.5
    writeFixture(dir, Seq((1L, Seq(1L, 2L))),
      Map(1L -> 0, 2L -> 1))
    val got = GraphQueries.qGraphModularity(spark, dir)
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._6).distinct == Seq(-0.5))
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((0, 1L, 0L, 1L), (1, 1L, 0L, 1L)))
  }
}
