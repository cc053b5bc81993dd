package graft.queries

import graft.SparkTestBase
import graft.ops.CacheScope

/** [[StatsQueries.lepageFromSamples]] vs brute rank computation:
  * exact Wilcoxon integers, the combined D statistic, and planted
  * location-only / scale-only shifts that each single component would
  * half-miss but the combined gate flags.
  */
class LepageSpec extends SparkTestBase {
  import spark.implicits._

  private def engine(as: Seq[Long], bs: Seq[Long]) = CacheScope.scoped {
    val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
    StatsQueries.lepageFromSamples(df)
      .select("w2", "tsum", "zw2_r6", "zab2_r6", "d_r6", "reject")
      .as[(Long, Long, Double, Double, Double, Boolean)].head()
  }

  /** Brute doubled Wilcoxon rank-sum of sample A with midranks, its
    * tie-corrected z², and the brute Ansari z² with tied averages. */
  private def brute(as: Seq[Long], bs: Seq[Long])
      : (Long, Double, Double) = {
    val all = (as.map((_, true)) ++ bs.map((_, false))).sortBy(_._1)
    val n = all.size.toLong; val m = as.size.toLong
    // doubled midranks
    val r2 = Array.ofDim[Long](all.size)
    var i = 0
    while (i < all.size) {
      var j = i
      while (j < all.size && all(j)._1 == all(i)._1) j += 1
      val v = (i + 1).toLong + j.toLong // 2 * average of ranks i+1..j
      for (k <- i until j) r2(k) = v
      i = j
    }
    val w2 = all.indices.filter(all(_)._2).map(r2).sum
    val tsum = all.groupBy(_._1).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    val zw2 = 3.0 * n * (n - 1) * math.pow(w2 - m * (n + 1), 2) /
      (m.toDouble * (n - m) * (n * n * n - n - tsum))
    // Ansari with tied averages (brute positions)
    val score = (1 to all.size).map(p => 2L * math.min(p, n + 1 - p))
    val avg = Array.ofDim[Double](all.size)
    i = 0
    while (i < all.size) {
      var j = i
      while (j < all.size && all(j)._1 == all(i)._1) j += 1
      val a = (i until j).map(score(_).toDouble).sum / (j - i)
      for (k <- i until j) avg(k) = a
      i = j
    }
    val t2 = all.indices.filter(all(_)._2).map(avg).sum
    val mean = m * avg.sum / n
    val vr = m * (n - m).toDouble / (n * n * (n - 1)) *
      (n * avg.map(x => x * x).sum - math.pow(avg.sum, 2))
    val zab2 = math.pow(t2 - mean, 2) / vr
    (w2, zw2, zab2)
  }

  test("brute parity on heavy-tie random draws: exact W2, zw2, zab2") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 3) {
      val as = Seq.fill(30)(rnd.nextInt(15).toLong + 50)
      val bs = Seq.fill(24)(rnd.nextInt(15).toLong + 50)
      val (w2, zw2, zab2) = brute(as, bs)
      val e = engine(as, bs)
      assert(e._1 == w2, s"trial $trial w2 ${e._1} vs $w2")
      assert(math.abs(e._3 - zw2) < 1e-4 * (1 + zw2), (e._3, zw2))
      assert(math.abs(e._4 - zab2) < 1e-4 * (1 + zab2), (e._4, zab2))
      assert(math.abs(e._5 - (e._3 + e._4)) < 2e-6)
    }
  }

  test("planted LOCATION shift and planted SCALE shift both trip the " +
    "combined gate; identical samples stay quiet") {
    val rnd = new scala.util.Random(73)
    val base = Seq.fill(40)(rnd.nextInt(20).toLong + 100)
    // location: +15 shift
    val loc = engine(base.map(_ + 15), base)
    assert(loc._6, s"location shift must reject: $loc")
    assert(loc._3 > loc._4, "location shift should load on z_W")
    // scale: symmetric spread x3 around the center
    val spread = base.map(v => 110 + (v - 110) * 3)
    val sc = engine(spread, base)
    assert(sc._6, s"scale shift must reject: $sc")
    assert(sc._4 > sc._3, "scale shift should load on z_AB")
    // same distribution: quiet
    val same = engine(base, base)
    assert(!same._6, s"identical samples must not reject: $same")
  }
}
