package graft.queries

import graft.SparkTestBase

/** [[StreamQueries.grangerFromDaily]] vs an independent local OLS:
  * RSS of the restricted and augmented models computed by explicit
  * residual sums must match the moment-algebra form to float
  * tolerance, and the F verdict must behave on planted lead-lag
  * structure.
  */
class GrangerSpec extends SparkTestBase {
  import spark.implicits._

  /** (rss0, rss1, f) by direct OLS on the lagged rows. */
  private def brute(xs: Seq[Long], ys: Seq[Long])
      : (Double, Double, Double) = {
    val rows = (1 until ys.length).map(t =>
      (ys(t).toDouble, ys(t - 1).toDouble, xs(t - 1).toDouble))
    val n = rows.length
    def ols(feat: ((Double, Double, Double)) => Seq[Double]): Double = {
      // normal equations via tiny Gaussian elimination
      val fs = rows.map(r => 1.0 +: feat(r))
      val k = fs.head.length
      val a = Array.ofDim[Double](k, k + 1)
      for (r <- rows.indices; i <- 0 until k) {
        for (j <- 0 until k) a(i)(j) += fs(r)(i) * fs(r)(j)
        a(i)(k) += fs(r)(i) * rows(r)._1
      }
      for (p <- 0 until k) {
        val pivot = (p until k).maxBy(i => math.abs(a(i)(p)))
        val tmp = a(p); a(p) = a(pivot); a(pivot) = tmp
        for (i <- 0 until k if i != p) {
          val f = a(i)(p) / a(p)(p)
          for (j <- p to k) a(i)(j) -= f * a(p)(j)
        }
      }
      val beta = (0 until k).map(i => a(i)(k) / a(i)(i))
      rows.indices.map { r =>
        val e = rows(r)._1 - fs(r).zip(beta).map(p => p._1 * p._2).sum
        e * e
      }.sum
    }
    val rss0 = ols(r => Seq(r._2))
    val rss1 = ols(r => Seq(r._2, r._3))
    (rss0, rss1, (rss0 - rss1) * (n - 3) / rss1)
  }

  private def engine(xs: Seq[Long], ys: Seq[Long]) = {
    val df = xs.indices.map(i => (i, xs(i), ys(i))).toDF("d", "x", "y")
    StreamQueries.grangerFromDaily(df)
      .select("rss0_r6", "rss1_r6", "f_r6")
      .as[(Double, Double, Double)].head()
  }

  test("moment algebra matches explicit-residual OLS on random series") {
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val ys = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val (r0, r1, f) = brute(xs, ys)
    val (e0, e1, ef) = engine(xs, ys)
    assert(math.abs(e0 - r0) < 1e-4 * (1 + r0.abs), (e0, r0))
    assert(math.abs(e1 - r1) < 1e-4 * (1 + r1.abs), (e1, r1))
    assert(math.abs(ef - f) < 1e-3 * (1 + f.abs), (ef, f))
  }

  test("planted lead: y follows lagged x -> large F; independent " +
    "noise -> F small") {
    val rnd = new scala.util.Random(9)
    val xs = Seq.fill(31)(rnd.nextInt(400).toLong + 100)
    val ysLed = (0 until 31).map(t =>
      if (t == 0) 300L else xs(t - 1) / 2 + rnd.nextInt(8))
    val (_, _, fLed) = brute(xs, ysLed)
    val (_, _, efLed) = engine(xs, ysLed)
    assert(efLed > 10.0 && math.abs(efLed - fLed) < 1e-3 * fLed)
    val ysNoise = Seq.fill(31)(rnd.nextInt(400).toLong + 100)
    val (_, _, efN) = engine(xs, ysNoise)
    assert(efN < efLed / 5, (efN, efLed))
  }

  /** (rss0, rss1, f) for the CONDITIONAL screen by direct OLS:
    * restricted (1, y1, z1), augmented (1, y1, z1, x1), df2 = n−4. */
  private def bruteCond(xs: Seq[Long], ys: Seq[Long], zs: Seq[Long])
      : (Double, Double, Double) = {
    val rows = (1 until ys.length).map(t =>
      (ys(t).toDouble, ys(t - 1).toDouble, zs(t - 1).toDouble,
        xs(t - 1).toDouble))
    val n = rows.length
    def ols(feat: ((Double, Double, Double, Double)) => Seq[Double])
        : Double = {
      val fs = rows.map(r => 1.0 +: feat(r))
      val k = fs.head.length
      val a = Array.ofDim[Double](k, k + 1)
      for (r <- rows.indices; i <- 0 until k) {
        for (j <- 0 until k) a(i)(j) += fs(r)(i) * fs(r)(j)
        a(i)(k) += fs(r)(i) * rows(r)._1
      }
      for (p <- 0 until k) {
        val pivot = (p until k).maxBy(i => math.abs(a(i)(p)))
        val tmp = a(p); a(p) = a(pivot); a(pivot) = tmp
        for (i <- 0 until k if i != p) {
          val f = a(i)(p) / a(p)(p)
          for (j <- p to k) a(i)(j) -= f * a(p)(j)
        }
      }
      val beta = (0 until k).map(i => a(i)(k) / a(i)(i))
      rows.indices.map { r =>
        val e = rows(r)._1 - fs(r).zip(beta).map(p => p._1 * p._2).sum
        e * e
      }.sum
    }
    val rss0 = ols(r => Seq(r._2, r._3))
    val rss1 = ols(r => Seq(r._2, r._3, r._4))
    (rss0, rss1, (rss0 - rss1) * (n - 4) / rss1)
  }

  private def engineCond(xs: Seq[Long], ys: Seq[Long], zs: Seq[Long]) = {
    val df = xs.indices.map(i => (i, xs(i), ys(i), zs(i)))
      .toDF("d", "x", "y", "z")
    StreamQueries.grangerCondFromDaily(df)
      .select("rss0_r6", "rss1_r6", "f_r6")
      .as[(Double, Double, Double)].head()
  }

  test("conditional screen: 3x3 Cramer moment algebra matches " +
    "explicit-residual OLS on random series") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val ys = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val zs = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val (r0, r1, f) = bruteCond(xs, ys, zs)
    val (e0, e1, ef) = engineCond(xs, ys, zs)
    assert(math.abs(e0 - r0) < 1e-4 * (1 + r0.abs), (e0, r0))
    assert(math.abs(e1 - r1) < 1e-4 * (1 + r1.abs), (e1, r1))
    assert(math.abs(ef - f) < 1e-3 * (1 + f.abs), (ef, f))
  }

  test("common driver z lifting x and y: plain screen flags " +
    "x -> y, conditioning on z absorbs it") {
    val rnd = new scala.util.Random(17)
    // z is the hidden driver: x tracks z contemporaneously, y tracks
    // LAGGED z — so x_{t−1} "predicts" y_t only through z_{t−1}
    val zs = Seq.fill(32)(rnd.nextInt(400).toLong + 100)
    val xs = (0 until 32).map(t => zs(t) / 2 + rnd.nextInt(6))
    val ys = (0 until 32).map(t =>
      if (t == 0) 220L else zs(t - 1) / 2 + rnd.nextInt(6))
    val (_, _, fPlain) = brute(xs, ys)
    val (_, _, fCond) = bruteCond(xs, ys, zs)
    val (_, _, efCond) = engineCond(xs, ys, zs)
    assert(math.abs(efCond - fCond) < 1e-3 * (1 + fCond.abs))
    assert(fPlain > 10.0, fPlain) // spurious flag without the control
    assert(fCond < fPlain / 5, (fCond, fPlain)) // control absorbs it
  }

  /** (rss0, rss1, f) for the 2-LAG screen by direct OLS:
    * restricted (1, y1, y2), augmented (1, y1, y2, x1, x2), 2 num df,
    * df2 = n−5. */
  private def brute2(xs: Seq[Long], ys: Seq[Long])
      : (Double, Double, Double) = {
    val rows = (2 until ys.length).map(t =>
      (ys(t).toDouble, ys(t - 1).toDouble, ys(t - 2).toDouble,
        xs(t - 1).toDouble, xs(t - 2).toDouble))
    val n = rows.length
    def ols(feat: ((Double, Double, Double, Double, Double))
        => Seq[Double]): Double = {
      val fs = rows.map(r => 1.0 +: feat(r))
      val k = fs.head.length
      val a = Array.ofDim[Double](k, k + 1)
      for (r <- rows.indices; i <- 0 until k) {
        for (j <- 0 until k) a(i)(j) += fs(r)(i) * fs(r)(j)
        a(i)(k) += fs(r)(i) * rows(r)._1
      }
      for (p <- 0 until k) {
        val pivot = (p until k).maxBy(i => math.abs(a(i)(p)))
        val tmp = a(p); a(p) = a(pivot); a(pivot) = tmp
        for (i <- 0 until k if i != p) {
          val f = a(i)(p) / a(p)(p)
          for (j <- p to k) a(i)(j) -= f * a(p)(j)
        }
      }
      val beta = (0 until k).map(i => a(i)(k) / a(i)(i))
      rows.indices.map { r =>
        val e = rows(r)._1 - fs(r).zip(beta).map(p => p._1 * p._2).sum
        e * e
      }.sum
    }
    val rss0 = ols(r => Seq(r._2, r._3))
    val rss1 = ols(r => Seq(r._2, r._3, r._4, r._5))
    (rss0, rss1, (rss0 - rss1) / 2.0 * (n - 5) / rss1)
  }

  private def engine2(xs: Seq[Long], ys: Seq[Long]) = {
    val df = xs.indices.map(i => (i, xs(i), ys(i))).toDF("d", "x", "y")
    StreamQueries.granger2FromDaily(df)
      .select("rss0_r6", "rss1_r6", "f_r6")
      .as[(Double, Double, Double)].head()
  }

  test("2-lag screen: blockwise Schur moment algebra matches " +
    "explicit-residual OLS on random series") {
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val ys = Seq.fill(30)(rnd.nextInt(200).toLong + 50)
    val (r0, r1, f) = brute2(xs, ys)
    val (e0, e1, ef) = engine2(xs, ys)
    assert(math.abs(e0 - r0) < 1e-4 * (1 + r0.abs), (e0, r0))
    assert(math.abs(e1 - r1) < 1e-4 * (1 + r1.abs), (e1, r1))
    assert(math.abs(ef - f) < 1e-3 * (1 + f.abs), (ef, f))
  }

  test("2-lag screen catches a DELAYED transfer the lag-1 screen " +
    "underrates: y follows x lagged by TWO days") {
    val rnd = new scala.util.Random(29)
    val xs = Seq.fill(33)(rnd.nextInt(400).toLong + 100)
    val ys = (0 until 33).map(t =>
      if (t < 2) 250L else xs(t - 2) / 2 + rnd.nextInt(8))
    val (_, _, f2) = brute2(xs, ys)
    val (_, _, ef2) = engine2(xs, ys)
    assert(math.abs(ef2 - f2) < 1e-3 * (1 + f2.abs), (ef2, f2))
    assert(ef2 > 10.0, ef2) // the 2-lag screen flags the transfer
    // and random noise stays quiet
    val ysN = Seq.fill(33)(rnd.nextInt(400).toLong + 100)
    val (_, _, efN) = engine2(xs, ysN)
    assert(efN < ef2 / 5, (efN, ef2))
  }
}
