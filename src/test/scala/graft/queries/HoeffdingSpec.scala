package graft.queries

import graft.SparkTestBase

/** [[StatsQueries.hoeffdingFromSeries]] vs an independent brute-force
  * implementation of Hoeffding's D with the SAS tie convention
  * (doubled R/S, quadrupled Q) — the integer outputs must match
  * exactly on any input, ties included.
  */
class HoeffdingSpec extends SparkTestBase {
  import spark.implicits._

  /** (n, d1_16, d2_16, d3_16, num16) by direct enumeration. */
  private def brute(pts: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long) = {
    val n = pts.length.toLong
    val rows = pts.map { case (x, y) =>
      val r2 = 2 + 2 * pts.count(_._1 < x) + (pts.count(_._1 == x) - 1)
      val s2 = 2 + 2 * pts.count(_._2 < y) + (pts.count(_._2 == y) - 1)
      val q4 = 4 +
        4 * pts.count(p => p._1 < x && p._2 < y) +
        2 * pts.count(p => p._1 == x && p._2 < y) +
        2 * pts.count(p => p._1 < x && p._2 == y) +
        (pts.count(p => p._1 == x && p._2 == y) - 1)
      (r2.toLong, s2.toLong, q4.toLong)
    }
    val d1 = rows.map { case (_, _, q) => (q - 4) * (q - 8) }.sum
    val d2 = rows.map { case (r, s, _) =>
      (r - 2) * (r - 4) * (s - 2) * (s - 4)
    }.sum
    val d3 = rows.map { case (r, s, q) => (r - 4) * (s - 4) * (q - 4) }.sum
    val num = (n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3
    (n, d1, d2, d3, num)
  }

  private def engine(pts: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long) = {
    val df = pts.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("d", "x", "y")
    val r = StatsQueries.hoeffdingFromSeries(df)
      .select("n", "d1_16", "d2_16", "d3_16", "num16")
      .as[(Long, Long, Long, Long, Long)].head()
    r
  }

  test("monotone dependence: engine == brute, D positive and large") {
    val pts = (1L to 12L).map(i => (i, i * 3 - 1))
    assert(engine(pts) == brute(pts))
    val b = brute(pts)
    assert(30.0 * b._5 / (16.0 * pts.length.toLong * 11 * 10 * 9 * 8)
      > 0.2)
  }

  test("U-shaped dependence (monotone tests blind): engine == brute, " +
    "D clearly above the shuffled baseline") {
    val u = (-6L to 6L).map(x => (x, x * x))
    assert(engine(u) == brute(u))
    val rnd = new scala.util.Random(7)
    val shuffled = u.map(_._1).zip(rnd.shuffle(u.map(_._2)))
    assert(engine(shuffled) == brute(shuffled))
    def dOf(b: (Long, Long, Long, Long, Long)): Double = {
      val n = b._1
      30.0 * b._5 / (16.0 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    }
    assert(dOf(brute(u)) > dOf(brute(shuffled)) + 0.05)
  }

  test("heavy ties (the quadrupled-Q convention): engine == brute on " +
    "random small-domain draws") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val n = 8 + rnd.nextInt(20)
      val pts = Seq.fill(n)(
        (rnd.nextInt(4).toLong, rnd.nextInt(4).toLong))
      assert(engine(pts) == brute(pts), s"trial $trial: $pts")
    }
  }
}
