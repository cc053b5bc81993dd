package graft.queries

import graft.SparkTestBase

/** [[StatsQueries.moodFromValues]] (Brown–Mood median test) against
  * hand-computed 2×5 tables. Pins the two conventions the scaladoc
  * claims: (a) the dichotomy is STRICT `x > med` — values tied ON the
  * grand median count as not-above (the textbook/SAS convention); (b)
  * the χ² fold is the five-literal pivot in slug order, one fixed
  * IEEE order, so the hand value replays exactly.
  */
class MoodSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]) =
    StatsQueries.moodFromValues(rows.toDF("g", "x")).collect().head

  /** χ² replay in the engine's exact operation order: per slug
    * e = (n_g·n_above)/n (one double division), term =
    * (a−e)²·(1/e + 1/(n_g−e)), left-fold in slug order. */
  private def chi2(cells: Seq[(Long, Long)], nAbove: Long,
      n: Long): Double =
    cells.map { case (a, ng) =>
      val e = (ng * nAbove).toDouble / n.toDouble
      (a - e) * (a - e) * (1.0 / e + 1.0 / (ng.toDouble - e))
    }.reduce(_ + _)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ties ON the median count as not-above; hand-computed table " +
    "(n=9, med=20 achieved, three values AT the median)") {
    // sorted: 10,10,10,20,20,20,30,30,30 → median = v5 = 20 exactly
    // (odd-rank percentile: achieved element, no interpolation)
    val rows = Seq(
      "1-URGENT" -> 10L, "1-URGENT" -> 30L,
      "2-HIGH" -> 10L, "2-HIGH" -> 20L,
      "3-MEDIUM" -> 20L, "3-MEDIUM" -> 30L,
      "4-NOT SPECIFIED" -> 10L, "4-NOT SPECIFIED" -> 20L,
      "5-LOW" -> 30L)
    val r = run(rows)
    assert(r.getAs[Double]("med") == 20.0)
    assert(r.getAs[Long]("n") == 9L)
    // above = strictly greater only: the three 30s; the 20s do NOT
    // count (the convention this spec pins)
    assert(r.getAs[Long]("n_above") == 3L)
    val cells = Seq( // (a_g, n_g) hand-counted per slug
      (1L, 2L), // urgent: {10, 30} → one above
      (0L, 2L), // high: {10, 20} → 20 is ON the median, not above
      (1L, 2L), // medium: {20, 30}
      (0L, 2L), // notspec: {10, 20}
      (1L, 1L)) // low: {30}
    for (((a, ng), s) <- cells.zip(
        Seq("urgent", "high", "medium", "notspec", "low"))) {
      assert(r.getAs[Long](s"a_$s") == a, s)
      assert(r.getAs[Long](s"n_$s") == ng, s)
    }
    // exact fractions: terms 1/4, 1, 1/4, 1, 2 → χ² = 9/2
    val want = chi2(cells, 3L, 9L)
    assert(math.abs(want - 4.5) < 1e-9)
    assert(r.getAs[Double]("chi2_r6") == r6(want))
    assert(!r.getAs[Boolean]("reject")) // 4.5 < 9.487729
  }

  test("separated groups reject; interpolated even-n median") {
    val rows =
      Seq.fill(6)("1-URGENT" -> 30L) ++
        Seq.fill(6)("2-HIGH" -> 10L) ++
        (Seq.fill(3)("3-MEDIUM" -> 10L) ++
          Seq.fill(3)("3-MEDIUM" -> 30L)) ++
        Seq.fill(6)("4-NOT SPECIFIED" -> 10L) ++
        Seq.fill(6)("5-LOW" -> 30L)
    val r = run(rows)
    // 15×10 then 15×30 → percentile(0.5) interpolates to 20
    assert(r.getAs[Double]("med") == 20.0)
    assert(r.getAs[Long]("n") == 30L)
    assert(r.getAs[Long]("n_above") == 15L)
    val cells = Seq((6L, 6L), (0L, 6L), (3L, 6L), (0L, 6L), (6L, 6L))
    // every e_g = 6·15/30 = 3 exactly → terms 6, 6, 0, 6, 6 → χ² = 24
    assert(r.getAs[Double]("chi2_r6") == 24.0)
    assert(chi2(cells, 15L, 30L) == 24.0)
    assert(r.getAs[Boolean]("reject")) // 24 > 9.487729
  }
}
