package graft.queries

import graft.SparkTestBase

/** [[StatsQueries.pageFromEvents]] (Page's L trend test) against a
  * brute-force L on hand-built grids — both verdict directions, with
  * a within-block tie exercising the doubled average ranks.
  */
class PageSpec extends SparkTestBase {
  import spark.implicits._

  /** Events for one block: `counts(g)` rows of (d, g). */
  private def block(d: String, counts: Seq[(String, Int)]) =
    counts.flatMap { case (g, c) => Seq.fill(c)((d, g)) }

  private def run(rows: Seq[(String, String)]) =
    StatsQueries.pageFromEvents(rows.toDF("d", "g")).collect().head

  /** Brute L2 = Σ_j w_j Σ_blocks (2 × average rank of block count),
    * w_j = alphabetical position — independent tie-averaged ranking. */
  private def bruteL2(blocks: Seq[Seq[(String, Int)]]): Long = {
    val types = blocks.flatMap(_.map(_._1)).distinct.sorted
    blocks.map { counts =>
      val byG = counts.toMap
      types.zipWithIndex.map { case (g, i) =>
        val v = byG(g)
        val below = types.count(t => byG(t) < v)
        val tied = types.count(t => byG(t) == v)
        (i + 1).toLong * (2L * below + tied + 1L) // w_j · r2
      }.sum
    }.sum
  }

  test("monotone-increasing grid with one tied block: hand L2, " +
    "reject = true, z matches the exact-integer verdict") {
    val blocks = Seq(
      Seq("a" -> 1, "b" -> 2, "c" -> 3),
      Seq("a" -> 1, "b" -> 2, "c" -> 3),
      Seq("a" -> 1, "b" -> 2, "c" -> 3),
      Seq("a" -> 5, "b" -> 5, "c" -> 7)) // a,b tie → r2 = 3, 3, 6
    val r = run(blocks.zipWithIndex.flatMap { case (c, i) =>
      block(s"2024-01-0${i + 1}", c)
    })
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("b") == 4L)
    // s2: a = 2+2+2+3 = 9, b = 4+4+4+3 = 15, c = 6·4 = 24
    // L2 = 1·9 + 2·15 + 3·24 = 111
    assert(r.getAs[Long]("l2") == 111L)
    assert(bruteL2(blocks) == 111L)
    assert(r.getAs[Long]("e_l4") == 192L) // b·k·(k+1)² = 4·3·16
    // z = (2·111 − 192) / (4·√(4·9·16·2 / 144)) = 30 / (4·√8)
    val z = 30.0 / (4.0 * math.sqrt(1152.0 / 144.0))
    assert(r.getAs[Double]("z_r6") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // integer verdict: 9·10⁶·30² = 8.1e9 > 2705543·1152 ≈ 3.12e9
    assert(r.getAs[Boolean]("reject"))
  }

  test("monotone-DECREASING grid: sign guard keeps reject = false " +
    "even though |z| is large") {
    val blocks = Seq.fill(4)(Seq("a" -> 3, "b" -> 2, "c" -> 1))
    val r = run(blocks.zipWithIndex.flatMap { case (c, i) =>
      block(s"2024-01-0${i + 1}", c)
    })
    // s2: a = 24, b = 16, c = 8 → L2 = 24 + 32 + 24 = 80
    assert(r.getAs[Long]("l2") == 80L)
    assert(bruteL2(blocks) == 80L)
    // numerator 2·80 − 192 = −32 < 0: one-sided test never rejects
    assert(!r.getAs[Boolean]("reject"))
    val z = -32.0 / (4.0 * math.sqrt(1152.0 / 144.0))
    assert(r.getAs[Double]("z_r6") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }
}
