package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Graph.hyperBall]]: structural invariants of the neighbourhood
  * function, plus estimate certification against the EXACT ball sizes
  * from [[Graph.multiSourceBfs]] on the same graph — the
  * Boldi–Rosa–Vigna contract is "a few percent at m = 16"; we assert
  * a generous ±40% at every hop (m = 16 has σ ≈ 26%).
  */
class HyperBallSpec extends SparkTestBase {
  import spark.implicits._

  private def ring(n: Int) =
    (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")

  test("neighbourhood function is monotone in the hop, saturates at " +
    "the ring diameter, and matches exact ball sizes within the " +
    "m=16 error envelope") {
    val n = 64
    val rows = CacheScope.scoped {
      Graph.hyperBall(ring(n), maxHops = 8)
        .select("hop", "nf_est_r6", "reach_ratio_r6")
        .as[(Long, Double, Double)].collect().sortBy(_._1)
    }
    assert(rows.map(_._1).toSeq == (0L to 8L))
    // monotone non-decreasing, ratio hits 1 at the horizon
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 - 1e-9, s"nf must grow: $a -> $b") }
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
    // exact N(t) on a ring: every ball is min(2t+1, n) vertices
    for ((hop, nf, _) <- rows) {
      val exact = n.toLong * math.min(2 * hop + 1, n)
      assert(nf > exact * 0.6 && nf < exact * 1.4,
        s"hop $hop: est $nf vs exact $exact")
    }
  }

  test("estimates agree with multiSourceBfs exact balls on a random " +
    "sparse graph, per hop, within the envelope") {
    val rnd = new scala.util.Random(67)
    val edges = Seq.fill(150)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val (est, exact) = CacheScope.scoped {
      val sym = edges.select($"src".as("v"))
        .unionAll(edges.select($"dst".as("v"))).distinct()
      val e = Graph.hyperBall(edges, maxHops = 4)
        .select("hop", "nf_est_r6").as[(Long, Double)]
        .collect().toMap
      val x = Graph.multiSourceBfs(edges, sym, maxHops = 4)
        .groupBy($"dist").agg(count(lit(1)).as("c"))
        .as[(Long, Long)].collect().sortBy(_._1)
      (e, x)
    }
    // exact N(t) = cumulative count of pairs with dist <= t
    var cum = 0L
    for ((d, c) <- exact) {
      cum += c
      val nf = est(d)
      assert(nf > cum * 0.6 && nf < cum * 1.4,
        s"hop $d: est $nf vs exact $cum")
    }
  }

  test("hyperHarmonic estimates track the EXACT harmonic centrality: " +
    "population sum within the m=16 envelope and positive rank " +
    "agreement on a hub-vs-leaf star-chain graph") {
    // star (hub 0) + a chain tail: strong centrality spread
    val star = (1 to 20).map(i => (0L, i.toLong))
    val chain = (20 until 30).map(i => (i.toLong, i.toLong + 1))
    val edges = (star ++ chain).toDF("src", "dst")
    val (est, exact) = CacheScope.scoped {
      val e = Graph.hyperHarmonic(edges, maxHops = 6)
        .select("vertex", "harmonic_est_r6").as[(Long, Double)]
        .collect().toMap
      val x = Graph.harmonicCentrality(edges, maxHops = 6,
          scale = 60L)
        .select("vertex", "harmonic_scaled").as[(Long, Long)]
        .collect().map(kv => kv._1 -> kv._2 / 60.0).toMap
      (e, x)
    }
    assert(est.keySet == exact.keySet)
    val sumE = est.values.sum; val sumX = exact.values.sum
    assert(sumE > sumX * 0.6 && sumE < sumX * 1.4, (sumE, sumX))
    // the hub must rank far above every chain-tail vertex
    assert(est(0L) > est(25L) * 2, (est(0L), est(25L)))
    // Spearman-ish check: top-5 exact vertices average estimate rank
    // must beat the bottom-5's
    val byEst = est.toSeq.sortBy(-_._2).map(_._1).zipWithIndex.toMap
    val byExact = exact.toSeq.sortBy(-_._2).map(_._1)
    val topAvg = byExact.take(5).map(byEst).sum / 5.0
    val botAvg = byExact.takeRight(5).map(byEst).sum / 5.0
    assert(topAvg < botAvg, (topAvg, botAvg))
  }

  test("register derivation is total: every vertex lands in 0..15 " +
    "with rank 1..41 (sparse rows, one per vertex at hop 0)") {
    val rows = CacheScope.scoped {
      // hop-0 output row count equals vertex count via n_verts
      Graph.hyperBall(ring(40), maxHops = 1)
        .filter($"hop" === 0).select($"avg_ball_r6")
        .as[Double].head()
    }
    // a singleton HLL with one register set estimates ~1.03 via the
    // linear-counting branch: 16·ln(16/15)
    val single = 16.0 * math.log(16.0 / 15.0)
    assert(math.abs(rows - single) < 1e-6, (rows, single))
  }
}
