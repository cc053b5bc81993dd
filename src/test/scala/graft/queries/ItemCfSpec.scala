package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Item-item CF (qRecItemCf): cosine on planted co-purchases, the
  * support threshold, and the power-buyer cap excluding a user whose
  * basket would otherwise link everything.
  */
class ItemCfSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine, support cut and degree cap on planted baskets") {
    val dir = java.nio.file.Files.createTempDirectory("cf").toString
    // users 1..4 buy items {10, 20}; user 5 buys {10, 30};
    // user 99 buys 60 items incl. 10 and 20 → degree-capped out
    val baskets: Seq[(Long, Seq[Long])] =
      (1L to 4L).map(u => (u, Seq(10L, 20L))) ++
        Seq((5L, Seq(10L, 30L)),
          (99L, (10L to 20L).toSeq ++ (100L to 148L).toSeq))
    var ok = 0L
    val orders = baskets.map { case (u, _) => ok += 1; (ok, u) }
    val lines = baskets.zip(orders).flatMap { case ((_, items), (o, _)) =>
      items.zipWithIndex.map { case (i, ln) => (o, i, ln + 1) }
    }
    orders.map { case (o, u) =>
      (o, u, "O", 100.0, Timestamp.valueOf("2024-01-01 00:00:00"), "1-P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    lines.map { case (o, i, ln) =>
      (o, i, 1L, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("2024-01-02 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = MiningQueries.qRecItemCf(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only (10, 20) clears support ≥ 4: c = 4 (user 99 capped out),
    // n_10 = 5 (users 1-5), n_20 = 4 → cosine = 4/√20
    assert(got == Seq((10L, 20L, 4L, 5L, 4L,
      BigDecimal(4.0 / math.sqrt(20.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }
}
