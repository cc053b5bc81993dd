package graft.queries

import graft.SparkTestBase

/** [[StatsQueries.moodScaleFromSamples]] (Mood's squared-rank scale
  * test) against an independent brute implementation with midrank
  * ties — plus a hand-computed no-tie case.
  */
class MoodScaleSpec extends SparkTestBase {
  import spark.implicits._

  /** (t4, sum4, z) by direct enumeration: ×4 score of position p is
    * (2·midrank − (N+1))² with doubled midranks. */
  private def brute(a: Seq[Long], b: Seq[Long])
      : (Long, Long, Double) = {
    val all = a.map((_, 1)) ++ b.map((_, 0))
    val n = all.size.toLong
    val sorted = all.sortBy(_._1)
    val byV = sorted.zipWithIndex.groupBy(_._1._1)
    var t4 = 0L; var sum4 = 0L; var q4 = BigInt(0)
    for (v <- byV.keys.toSeq.sorted) {
      val ms = byV(v)
      val lo = ms.map(_._2).min + 1L
      val hi = ms.map(_._2).max + 1L
      val s4 = (lo + hi - (n + 1)) * (lo + hi - (n + 1))
      val t = ms.size.toLong
      val ca = ms.count(_._1._2 == 1).toLong
      t4 += ca * s4
      sum4 += t * s4
      q4 += BigInt(t * s4) * s4
    }
    val m = a.size.toLong
    val mean = (m * sum4).toDouble / n
    val varr = (m * (n - m)).toDouble / (n * (n - 1)).toDouble *
      (q4.toDouble - sum4.toDouble * sum4 / n)
    (t4, sum4, (t4 - mean) / math.sqrt(varr))
  }

  private def engine(a: Seq[Long], b: Seq[Long]) = {
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    StatsQueries.moodScaleFromSamples(df)
      .select("nn", "m", "n_b", "t4", "sum4", "z_r6", "reject")
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].head()
  }

  test("hand-computed no-tie case: A = {1,10}, B = {4,5}") {
    // N = 4; ×4 scores of positions 1..4: (2p−5)² = 9, 1, 1, 9.
    // A holds the extremes: T4 = 18; Σ = 20; Q4 = 164;
    // mean = 2·20/4 = 10; Var = (4/12)(164 − 100) = 64/3;
    // z = 8/√(64/3) = √3 ≈ 1.7320508 → no reject at 1.96
    val r = engine(Seq(1L, 10L), Seq(4L, 5L))
    assert(r._4 == 18L && r._5 == 20L)
    assert(r._6 == BigDecimal(8.0 / math.sqrt(64.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!r._7)
  }

  test("brute parity with heavy ties on random draws") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 4) {
      val a = Seq.fill(10 + trial)(rnd.nextInt(6).toLong)
      val b = Seq.fill(14)(rnd.nextInt(6).toLong)
      val (t4, sum4, z) = brute(a, b)
      val r = engine(a, b)
      assert(r._4 == t4 && r._5 == sum4, s"trial $trial integers")
      assert(math.abs(r._6 - z) < 1e-6, s"trial $trial z")
    }
  }

  test("dispersed A rejects with POSITIVE z (quadratic tail weights " +
    "— the sign convention opposite to Ansari's end-scores)") {
    val rnd = new scala.util.Random(41)
    val wide = Seq.tabulate(25)(i => (i * 40).toLong)
    val tight = Seq.fill(25)(480L + rnd.nextInt(40))
    val r = engine(wide, tight)
    assert(r._7 && r._6 > 0, s"z=${r._6}")
  }
}
