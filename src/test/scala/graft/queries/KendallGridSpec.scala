package graft.queries

import graft.SparkTestBase

/** Grid-decomposed Kendall (kendallGrid) against an in-memory brute
  * force over all pairs — ties on both axes included, and bucket
  * counts chosen so the full-block, same-x-strip and same-y-strip
  * terms are ALL exercised (B smaller than the distinct-value counts).
  */
class KendallGridSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]) = {
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L; var txy = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.size) {
      val (x1, y1) = pts(i); val (x2, y2) = pts(j)
      if (x1 == x2 && y1 == y2) { tx += 1; ty += 1; txy += 1 }
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) conc += 1
      else disc += 1
    }
    (conc, disc, tx, ty, txy)
  }

  private def check(pts: Seq[(Long, Long)], b: Int): Unit = {
    val (conc, disc, tx, ty, txy) = brute(pts)
    val r = graft.ops.CacheScope.scoped {
      StatsQueries.kendallGrid(pts.toDF("x", "y"), b).collect().head
    }
    assert(r.getLong(r.fieldIndex("n")) == pts.size.toLong)
    assert(r.getLong(r.fieldIndex("conc")) == conc, s"conc b=$b")
    assert(r.getLong(r.fieldIndex("disc")) == disc, s"disc b=$b")
    assert(r.getLong(r.fieldIndex("tx")) == tx)
    assert(r.getLong(r.fieldIndex("ty")) == ty)
    assert(r.getLong(r.fieldIndex("txy")) == txy)
  }

  // deterministic pseudo-random points with deliberate ties
  private val pts: Seq[(Long, Long)] = (1 to 120).map { i =>
    val x = (i * 37 + 11) % 23
    val y = (i * 53 + 7) % 17
    (x.toLong, y.toLong)
  }

  test("matches all-pairs brute force at B=4 (strips dominate)") {
    check(pts, 4)
  }

  test("matches brute force at B=8 and at B larger than the " +
    "distinct-value counts (degenerate one-value buckets)") {
    check(pts, 8)
    check(pts, 64)
  }

  test("monotone and anti-monotone extremes give tau = ±1") {
    val mono = (1L to 50L).map(i => (i, i * 2))
    val r1 = graft.ops.CacheScope.scoped {
      StatsQueries.kendallGrid(mono.toDF("x", "y"), 4).collect().head
    }
    assert(r1.getDouble(r1.fieldIndex("tau_b_r6")) == 1.0)
    val anti = (1L to 50L).map(i => (i, -i))
    val r2 = graft.ops.CacheScope.scoped {
      StatsQueries.kendallGrid(anti.toDF("x", "y"), 4).collect().head
    }
    assert(r2.getDouble(r2.fieldIndex("tau_b_r6")) == -1.0)
  }
}
