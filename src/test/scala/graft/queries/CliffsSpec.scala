package graft.queries

import graft.SparkTestBase
import graft.ops.CacheScope

/** [[StatsQueries.cliffsDelta]] vs brute pair enumeration: exact
  * dominance counts, the one-division delta, and the Romano et al.
  * magnitude bands on planted separations.
  */
class CliffsSpec extends SparkTestBase {
  import spark.implicits._

  private def engine(as: Seq[Long], bs: Seq[Long]) = CacheScope.scoped {
    val df = (as.map((true, _)) ++ bs.map((false, _)))
      .toDF("isA", "v")
    StatsQueries.cliffsDelta(df)
      .select("n_a", "n_b", "gt", "lt", "delta_r6", "magnitude")
      .as[(Long, Long, Long, Long, Double, String)].head()
  }

  private def brute(as: Seq[Long], bs: Seq[Long]) = {
    val gt = (for (a <- as; b <- bs if a > b) yield 1L).sum
    val lt = (for (a <- as; b <- bs if a < b) yield 1L).sum
    (gt, lt, (gt - lt).toDouble / (as.size.toLong * bs.size))
  }

  test("brute dominance-count parity on random heavy-tie draws") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 3) {
      val as = Seq.fill(40)(rnd.nextInt(12).toLong)
      val bs = Seq.fill(25)(rnd.nextInt(12).toLong)
      val (gt, lt, d) = brute(as, bs)
      val r = engine(as, bs)
      assert((r._1, r._2, r._3, r._4) == ((40L, 25L, gt, lt)),
        s"trial $trial")
      assert(math.abs(r._5 - d) < 1e-6, (r._5, d))
    }
  }

  test("planted separations land in the documented magnitude bands") {
    // disjoint supports: every a > every b -> delta = 1, large
    val full = engine(Seq(10L, 11L, 12L), Seq(1L, 2L))
    assert(full._5 == 1.0 && full._6 == "large", full)
    // identical samples -> delta = 0, negligible
    val zero = engine(Seq(5L, 6L, 7L), Seq(5L, 6L, 7L))
    assert(zero._5 == 0.0 && zero._6 == "negligible", zero)
    // hand case: A={1,3}, B={2}: gt=1 (3>2), lt=1 (1<2) -> 0
    val hand = engine(Seq(1L, 3L), Seq(2L))
    assert(hand._3 == 1L && hand._4 == 1L && hand._5 == 0.0, hand)
  }
}
