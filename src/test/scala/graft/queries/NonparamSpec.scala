package graft.queries

import graft.SparkTestBase

/** Hand-traced fixtures for the round-11 nonparametric additions:
  * joint-histogram Kendall (kendallHistogram), Wilcoxon signed-rank
  * (wilcoxonFromDiffs), and the blocked Friedman test
  * (friedmanFromGrid). Every expected value below is derived in the
  * comments — no reference implementation involved.
  */
class NonparamSpec extends SparkTestBase {
  import spark.implicits._

  test("kendallHistogram reproduces the 4-point hand trace " +
    "(C=3, D=0, tx=1, ty=2)") {
    // x: 1,2,2,3  y: 1,1,2,2 — six pairs:
    //  (1,2a) x< y= tie_y; (1,2b) x< y< conc; (1,3) x< y< conc;
    //  (2a,2b) tie_x; (2a,3) x< y< conc; (2b,3) x< y= tie_y
    // C=3 D=0 n0=6 tx=1 ty=1+1=2
    // tau_b = 3/sqrt(5*4); gamma = 1; somers = 3/5
    val xy = Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L))
      .toDF("x", "y")
    val r = graft.ops.CacheScope.scoped {
      StatsQueries.kendallHistogram(xy).collect()
    }
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n")) == 4L)
    assert(row.getLong(row.fieldIndex("n0")) == 6L)
    assert(row.getLong(row.fieldIndex("conc")) == 3L)
    assert(row.getLong(row.fieldIndex("disc")) == 0L)
    assert(row.getLong(row.fieldIndex("tx")) == 1L)
    assert(row.getLong(row.fieldIndex("ty")) == 2L)
    assert(row.getDouble(row.fieldIndex("tau_b_r6")) ==
      math.rint(3.0 / math.sqrt(5.0 * 4.0) * 1e6) / 1e6)
    assert(row.getDouble(row.fieldIndex("gamma_r6")) == 1.0)
    assert(row.getDouble(row.fieldIndex("somers_yx_r6")) == 0.6)
  }

  test("wilcoxonFromDiffs: zeros excluded, tied |d| share doubled " +
    "ranks, verdict from the exact integer inequality") {
    // d = +1, +1, -1, +2, 0, -3 → n = 5 nonzero
    // |d| histogram: 1 (t=3, a=2), 2 (t=1, a=1), 3 (t=1, a=0)
    // r2: v=1 → 2*0+3+1 = 4; v=2 → 2*3+1+1 = 8; v=3 → 2*4+1+1 = 10
    // w2_pos = 2*4 + 1*8 = 16; tie_term = (27-3) = 24
    // D = 2*16 - 5*6 = 2 → 7500*4 = 30000 ≤ 9604*(660-24) → no reject
    val d = Seq(1L, 1L, -1L, 2L, 0L, -3L).toDF("d")
    val r = StatsQueries.wilcoxonFromDiffs(d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n")) == 5L)
    assert(row.getLong(row.fieldIndex("w2_pos")) == 16L)
    assert(row.getLong(row.fieldIndex("tie_term")) == 24L)
    assert(!row.getBoolean(row.fieldIndex("reject")))
  }

  test("friedmanFromGrid matches the 3-block hand trace with a " +
    "within-block tie") {
    // blocks b1, b2: v(g1,g2,g3) = (1,2,3) → r2 = (2,4,6)
    // block b3: v = (2,2,5) → r2 = (3,3,6)
    // R2: g1 = 7, g2 = 11, g3 = 18; n(k+1) = 12
    // num0 = 25+1+36 = 62 → num = 2*62 = 124
    // sr2 = 4+16+36 + 4+16+36 + 9+9+36 = 166; den = 166-144 = 22
    // q = 124/22 = 5.636364; 124000 ≤ 5991*22 = 131802 → no reject
    val grid = Seq(
      ("b1", "g1", 1L), ("b1", "g2", 2L), ("b1", "g3", 3L),
      ("b2", "g1", 1L), ("b2", "g2", 2L), ("b2", "g3", 3L),
      ("b3", "g1", 2L), ("b3", "g2", 2L), ("b3", "g3", 5L))
      .toDF("d", "g", "v")
    val r = StatsQueries.friedmanFromGrid(grid).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("k")) == 3L)
    assert(row.getLong(row.fieldIndex("n")) == 3L)
    assert(row.getLong(row.fieldIndex("num")) == 124L)
    assert(row.getLong(row.fieldIndex("den")) == 22L)
    assert(row.getDouble(row.fieldIndex("q_r6")) ==
      math.rint(124.0 / 22.0 * 1e6) / 1e6)
    assert(!row.getBoolean(row.fieldIndex("reject")))
  }
}
