package graft.queries

import graft.SparkTestBase

/** [[StatsQueries.ansariFromSamples]] (Ansari–Bradley scale test)
  * against an independent brute implementation of tied end-scores and
  * the permutation variance — plus a hand-computed no-tie case.
  */
class AnsariSpec extends SparkTestBase {
  import spark.implicits._

  /** (sum2, T2, z) by direct enumeration with midrank tie handling. */
  private def brute(a: Seq[Long], b: Seq[Long])
      : (Long, Double, Double) = {
    val all = a.map((_, 1)) ++ b.map((_, 0))
    val n = all.size
    val sorted = all.sortBy(t => (t._1, t._2))
    val byV = sorted.zipWithIndex.groupBy(_._1._1)
    var t2 = 0.0; var q2 = 0.0; var s2sum = 0L
    for (v <- byV.keys.toSeq.sorted) {
      val ms = byV(v)
      val s2 = ms.map { case (_, idx) =>
        val p = idx + 1L; 2L * math.min(p, n + 1 - p)
      }.sum
      val t = ms.size
      val ca = ms.count(_._1._2 == 1)
      t2 += ca.toDouble * (s2.toDouble / t)
      q2 += s2.toDouble * (s2.toDouble / t)
      s2sum += s2
    }
    val m = a.size.toLong
    val mean = (m * s2sum).toDouble / n
    val varr = (m * (n - m)).toDouble / (n.toLong * (n - 1)).toDouble *
      (q2 - s2sum.toDouble * s2sum / n)
    (s2sum, t2, (t2 - mean) / math.sqrt(varr))
  }

  private def engine(a: Seq[Long], b: Seq[Long]) = {
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    StatsQueries.ansariFromSamples(df)
      .select("nn", "m", "n_b", "sum2", "t2_r6", "z_r6", "reject")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].head()
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed no-tie case: A = {1,10} (extremes), B = {4,5}") {
    // sorted 1,4,5,10; doubled end scores 2,4,4,2; T2 = 2+2 = 4;
    // mean = 2·12/4 = 6; Q = 40; Var = (4/12)(40 − 36) = 4/3;
    // z = −2/√(4/3) ≈ −1.7320508
    val r = engine(Seq(1L, 10L), Seq(4L, 5L))
    assert(r._1 == 4L && r._2 == 2L && r._3 == 2L)
    assert(r._4 == 12L)
    assert(r._5 == 4.0)
    assert(r._6 == r6(-2.0 / math.sqrt(4.0 / 3.0)))
    assert(!r._7) // |z| < 1.96
  }

  test("brute parity with heavy ties on random draws") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 4) {
      val a = Seq.fill(12 + trial)(rnd.nextInt(8).toLong)
      val b = Seq.fill(15)(rnd.nextInt(8).toLong)
      val (s2sum, t2, z) = brute(a, b)
      val r = engine(a, b)
      assert(r._4 == s2sum, s"trial $trial sum2")
      assert(r._5 == r6(t2), s"trial $trial t2")
      assert(math.abs(r._6 - z) < 1e-6, s"trial $trial z: ${r._6} vs $z")
    }
  }

  test("dispersed A vs concentrated B rejects; equal spreads do not") {
    val rnd = new scala.util.Random(31)
    val wide = Seq.tabulate(25)(i => (i * 40).toLong)
    val tight = Seq.fill(25)(480L + rnd.nextInt(40))
    val r = engine(wide, tight)
    assert(r._7, s"should reject: z=${r._6}")
    assert(r._6 < 0) // dispersed sample gets the LOW end-scores
    val same = engine(tight, tight.map(_ + 1L))
    assert(!same._7, s"equal spreads: z=${same._6}")
  }
}
