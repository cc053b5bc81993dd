package graft.ops

import graft.SparkTestBase

/** PageRank checked against an independent driver-side scalar replay of
  * the same integer recurrence — a second implementation, not a copy of
  * the operator's join pipeline — plus structural properties.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private val scale = 1000000000L

  test("hits: hand-computed 2-round L1-renormalized scores on a " +
    "3-edge bipartite star") {
    // edges 1→10, 1→11, 2→10; scale 1e9. Round 1: a = (2/3, 1/3),
    // h = (0.6, 0.4) exactly under floor division. Round 2:
    // a = (0.625, 0.375), h = (10/16.25, 6.25/16.25) floored.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("src", "dst")
    val got = Graph.hits(edges, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 615384615L, 0L),
      (2L, 384615384L, 0L),
      (10L, 0L, 625000000L),
      (11L, 0L, 375000000L)))
  }

  /** Reference scalar PageRank: same integer formula, plain Maps. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val e = edges.distinct
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p0 = scale / verts.size
    val base = (p0 * 15L) / 100L
    var pr = verts.map(_ -> p0).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / od(s) }.sum).toMap
      pr = verts.map(v =>
        v -> (base + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    pr
  }

  private val diamond: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))

  test("pagerank matches the scalar integer replay bit-for-bit") {
    val got = Graph.pagerank(diamond.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refPagerank(diamond, 4))
  }

  test("rank ordering follows link structure (hub > spokes > source)") {
    val pr = Graph.pagerank(diamond.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    // vertex 3 has three in-edges (1, 2, 4); vertex 4 has none
    assert(pr(3L) > pr(1L) && pr(3L) > pr(2L) && pr(3L) > pr(4L))
    assert(pr.values.min == pr(4L)) // dangling-in vertex gets base only
    // total mass conserved up to floor-division truncation (≤ 1 unit per
    // edge+vertex per round, and the 15% teleport rounding)
    val total = pr.values.sum
    assert(total > scale / 2 && total <= scale)
  }

  test("duplicate edges collapse before out-degree is computed") {
    val dup = diamond ++ diamond
    val got = Graph.pagerank(dup.toDF("src", "dst"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == refPagerank(diamond, 2))
  }

  test("triangleStats: K4 — 4 triangles, 12 wedges, clustering 1.0") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val out = Graph.triangleStats(k4.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(out == ((6L, 12L, 4L, 1.0)))
  }

  test("triangleStats: path graph has wedges but zero triangles") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.triangleStats(path)
      .as[(Long, Long, Long, Double)].collect().head
    assert(out == ((3L, 2L, 0L, 0.0)))
  }

  test("triangleStats canonicalizes: reversed duplicates and " +
    "self-loops don't inflate the census") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("src", "dst")
    val out = Graph.triangleStats(messy)
      .as[(Long, Long, Long, Double)].collect().head
    assert(out == ((3L, 3L, 1L, 1.0)))
  }

  test("localClustering: K4 vertices all cc=1.0; paper triangle+tail") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val cc4 = Graph.localClustering(k4.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(cc4 == (1L to 4L).map(v => (v, 3L, 3L, 1.0)))
    // triangle 1-2-3 with a tail 3-4: v3 has deg 3 but only 1 closed
    // of its 3 wedges; v4 (deg 1) gets the 0-by-convention
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val out = Graph.localClustering(tri.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 1.0 / 3.0), (4L, 1L, 0L, 0.0)))
  }

  test("property: triangle census matches brute-force triple " +
    "enumeration on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L)
    } yield (a, b))
    (0 until 5).foreach { i =>
      val raw = edgeGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val und = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct.toSet
      val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val bruteTri = (for {
        a <- verts; b <- verts if a < b; c <- verts if b < c
        if und((a, b)) && und((a, c)) && und((b, c))
      } yield 1).size.toLong
      val bruteWedges = verts.map { v =>
        val d = und.count(e => e._1 == v || e._2 == v).toLong
        d * (d - 1) / 2
      }.sum
      val got = Graph.triangleStats(raw.toDF("src", "dst"))
        .as[(Long, Long, Long, Double)].collect().head
      assert(got._1 == und.size.toLong && got._2 == bruteWedges
          && got._3 == bruteTri,
        s"seed ${7 + i}: got $got want (${und.size}, $bruteWedges, $bruteTri)")
    }
  }

  test("property: pagerank matches the scalar replay on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(20, for {
      a <- Gen.chooseNum(1L, 10L); b <- Gen.chooseNum(1L, 10L)
      if a != b
    } yield (a, b))
    (0 until 3).foreach { i =>
      val raw = edgeGen.pureApply(Gen.Parameters.default, Seed(99L + i))
      val got = Graph.pagerank(raw.toDF("src", "dst"), iters = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == refPagerank(raw, 3), s"seed ${99 + i}")
    }
  }

  /** Reference scalar personalized PageRank — same integer recurrence. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
                     iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p0 = scale / seeds.size
    val base = (p0 * 15L) / 100L
    var pr = verts.map(v => v -> (if (seeds(v)) p0 else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / od(s) }.sum).toMap
      pr = verts.map(v =>
        v -> ((if (seeds(v)) base else 0L)
          + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    pr
  }

  test("personalizedPagerank matches the scalar replay; mass stays near seeds") {
    val got = Graph.personalizedPagerank(
        diamond.toDF("src", "dst"), seeds = Seq(1L), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == refPpr(diamond, Set(1L), 3))
    // 4 only reaches 3; nothing reaches 4 ⇒ rank(4) = 0; the seed's
    // direct successors hold mass
    assert(got(4L) == 0L)
    assert(got(2L) > 0L && got(3L) > 0L)
    assert(got(1L) > got(2L)) // teleport keeps the seed on top here
  }

  /** Reference scalar weighted PageRank — same integer recurrence over
    * weight-summed canonical edges. */
  private def refWeightedPr(edges: Seq[(Long, Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val e = edges.groupBy(x => (x._1, x._2)).view
      .mapValues(_.map(_._3).sum).toSeq
      .map { case ((s, d), w) => (s, d, w) }
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val sw = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p0 = scale / verts.size
    val base = (p0 * 15L) / 100L
    var pr = verts.map(_ -> p0).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => (pr(s) * w) / sw(s) }.sum).toMap
      pr = verts.map(v =>
        v -> (base + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    pr
  }

  test("pagerankWeighted matches the scalar replay; weight shifts rank") {
    val we = Seq((1L, 2L, 9L), (1L, 3L, 1L), (4L, 2L, 5L), (4L, 3L, 5L),
      (2L, 1L, 1L), (1L, 2L, 1L)) // parallel edge (1→2) sums to 10
    val got = Graph.pagerankWeighted(we.toDF("src", "dst", "weight"),
        iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == refWeightedPr(we, 3))
    // 2 receives 10/11 of 1's mass and 5/10 of 4's; 3 gets the rest —
    // the weighted rank must order 2 above 3
    assert(got(2L) > got(3L))
  }

  /** Reference scalar synchronous LPA with (count desc, label asc)
    * tie-break. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      labels = nbrs.map { case (v, ns) =>
        val counts = ns.map(labels).groupBy(identity)
          .view.mapValues(_.size).toMap
        val best = counts.toSeq.map { case (l, c) => (-c, l) }.min._2
        v -> best
      }
    }
    labels
  }

  test("labelPropagation: disjoint triangles converge to per-component labels") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val got = Graph.labelPropagation(tri.toDF("src", "dst"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("property: labelPropagation matches the scalar replay on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L)
      if a != b
    } yield (a, b))
    (0 until 3).foreach { i =>
      val raw = edgeGen.pureApply(Gen.Parameters.default, Seed(123L + i))
      val got = Graph.labelPropagation(raw.toDF("src", "dst"), iters = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == refLpa(raw, 3), s"seed ${123 + i}")
    }
  }

  /** Reference scalar k-core peel. */
  private def refKcore(edges: Seq[(Long, Long)], k: Int, peels: Int)
      : Map[Long, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    for (_ <- 1 to peels) {
      val deg = (und.map(_._1) ++ und.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      und = und.filter(e => keep(e._1) && keep(e._2))
    }
    (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
  }

  test("kCore: K4 plus a pendant chain — chain peels away, K4 survives") {
    // K4 on {1,2,3,4}; chain 4-5-6 hangs off it
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = Graph.kCore(g.toDF("src", "dst"), k = 3, peels = 3)
      .as[(Long, Long)].collect().toMap
    // after peeling, only the K4 remains, every vertex at degree 3
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got == refKcore(g, 3, 3))
  }

  test("property: kCore matches the scalar peel on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(30, for {
      a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L)
      if a != b
    } yield (a, b))
    (0 until 3).foreach { i =>
      val raw = edgeGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val got = Graph.kCore(raw.toDF("src", "dst"), k = 2, peels = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == refKcore(raw, 2, 3), s"seed ${7 + i}")
    }
  }

  /** Reference scalar bounded-hop harmonic centrality via BFS. */
  private def refHarmonic(edges: Seq[(Long, Long)], h: Int,
                          scale: Long): Map[Long, (Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val verts = nbrs.keySet
    verts.map { v =>
      var dist = Map(v -> 0)
      var frontier = Set(v)
      for (d <- 1 to h) {
        frontier = frontier.flatMap(nbrs).diff(dist.keySet)
        dist ++= frontier.map(_ -> d)
      }
      val others = dist - v
      v -> ((others.values.map(d => scale / d).sum.toLong,
        others.size.toLong))
    }.toMap
  }

  test("harmonicCentrality matches the scalar BFS replay; hub outranks leaf") {
    // star {1..5 around 0} plus a 2-path tail 5-6-7
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (5L, 6L), (6L, 7L))
    val got = Graph.harmonicCentrality(g.toDF("src", "dst"), maxHops = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == refHarmonic(g, 3, 840L))
    assert(got(0L)._1 > got(7L)._1) // the hub dominates the tail leaf
    // property: random graphs
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(22, for {
      a <- Gen.chooseNum(1L, 11L); b <- Gen.chooseNum(1L, 11L)
      if a != b
    } yield (a, b))
    (0 until 3).foreach { i =>
      val raw = edgeGen.pureApply(Gen.Parameters.default, Seed(31L + i))
      val g2 = Graph.harmonicCentrality(raw.toDF("src", "dst"), 3)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(g2 == refHarmonic(raw, 3, 840L), s"seed ${31 + i}")
    }
  }

  test("degree histogram counts distinct out-edges") {
    val got = Graph.degreeHistogram(
        (diamond ++ diamond).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // out-degrees: v1→2, v2→1, v3→1, v4→1  ⇒  {1→3 vertices, 2→1}
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("betweenness: closed-form values on a path and a diamond, " +
    "partition-independent") {
    // path a—b—c with every vertex a pivot: only (a,c) and (c,a) route
    // through b → betweenness(b) = 2, endpoints 0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.betweennessSampled(path, maxHops = 3, pivots = 3)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((0.0, 0L)), 2L -> ((2.0, 2L)),
      3L -> ((0.0, 0L))))
    // 4-cycle 1–2–4–3–1: each diagonal pair has TWO shortest paths
    // through the other diagonal's vertices (1↔4 via 2 or 3, 2↔3 via
    // 1 or 4), so EVERY vertex carries 2·(1/2)·2-directions/2 = 1.0
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val g2 = Graph.betweennessSampled(dia, maxHops = 3, pivots = 4)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(g2 == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0), s"$g2")
    // partition independence of the exact doubles
    val g3 = Graph.betweennessSampled(dia.repartition(7), 3, 4)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(g3 == g2)
  }

  test("betweenness: empty edge set yields an empty frame, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.betweennessSampled(empty, 3, 4).count() == 0)
  }

  // chain 1→2→3→4 (weight 1 each) plus an expensive shortcut 1→3 (w=5)
  // and a dead-end 5: exercises relaxation preference, the truncated
  // horizon, and unreachability in one graph
  private val wchain: Seq[(Long, Long, Long)] =
    Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 1L),
      (5L, 5L, 9L))

  test("ssspBounded: relaxation beats the direct edge, horizon truncates") {
    val e = wchain.toDF("src", "dst", "w")
    // 2 rounds: 1→2→3 (cost 2) beats 1→3 (cost 5); 4 only reachable
    // within 2 edges via the shortcut (5+1=6) — the 3-edge cost-3 path
    // is beyond the horizon
    val d2 = Graph.ssspBounded(e, source = 1L, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(d2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 6L), s"$d2")
    // 3 rounds: the full chain fits the horizon — 4 improves to 3
    val d3 = Graph.ssspBounded(e, source = 1L, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(d3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"$d3")
    // vertex 5 is unreachable: absent from the table, not infinity-rowed
    assert(!d3.contains(5L))
  }

  test("ssspBounded: source with no outgoing edges is just itself at 0") {
    val e = wchain.toDF("src", "dst", "w")
    val d = Graph.ssspBounded(e, source = 4L, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(4L -> 0L))
  }

  test("ssspBounded: partition-count independent") {
    val e = wchain.toDF("src", "dst", "w")
    val a = Graph.ssspBounded(e, 1L, 4).as[(Long, Long)].collect().toMap
    val b = Graph.ssspBounded(e.repartition(7), 1L, 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  // K4 on {1,2,3,4} + pendant triangle {4,5,6} + tail edge (6,7)
  private val trussFixture: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))

  test("kTruss: K4 survives at k=4, pendant triangle and tail peel off") {
    val got = Graph.kTruss(trussFixture.toDF("src", "dst"), k = 4,
        peels = 2)
      .as[(Long, Long, Long)].collect().toSet
    // every K4 edge sits in exactly 2 triangles of the K4
    assert(got == Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("kTruss: removal cascades across rounds (bowtie empties)") {
    // two triangles sharing edge (2,3): that edge has support 2 in
    // round 1 and survives alone, then dies in round 2 with no
    // triangles left — a one-peel run would keep it incorrectly
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val one = Graph.kTruss(bowtie.toDF("src", "dst"), k = 4, peels = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(one == Set((2L, 3L, 0L)))
    val two = Graph.kTruss(bowtie.toDF("src", "dst"), k = 4, peels = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(two.isEmpty)
  }

  test("kTruss: converged peel is idempotent; k=3 keeps all triangles") {
    val df = trussFixture.toDF("src", "dst")
    val p2 = Graph.kTruss(df, 4, 2).as[(Long, Long, Long)]
      .collect().toSet
    val p3 = Graph.kTruss(df, 4, 3).as[(Long, Long, Long)]
      .collect().toSet
    assert(p2 == p3)
    // k=3 keeps every edge in ≥1 triangle: all but the (6,7) tail
    val k3 = Graph.kTruss(df, 3, 2).as[(Long, Long, Long)]
      .collect().toSet
    assert(k3.map(e => (e._1, e._2)) ==
      trussFixture.toSet - ((6L, 7L)))
  }

  test("incremental CC == from-scratch: remap through old labels, " +
    "old-doc-first-edge-in-delta, untouched clusters, new-new pairs") {
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("ccinc").toString
    val (ta, tb, tu, tn) = ("aaaaabbbbbccccc", "dddddeeeeefffff",
      "ggggghhhhhiiiii", "jjjjjkkkkklllll")
    // old: {1,2}=ta cluster, {3,4}=tb cluster (untouched), 5=tu alone;
    // delta: 250=ta (remaps through label 1), 251=tu (old doc 5's
    // FIRST edge ever), 252/253=tn (purely new cluster)
    Seq((1L, ta), (2L, ta), (3L, tb), (4L, tb), (5L, tu),
      (250L, ta), (251L, tu), (252L, tn), (253L, tn))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = graft.queries.GraphQueries.qGraphCcIncremental(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L,
      250L -> 1L, 251L -> 5L, 252L -> 252L, 253L -> 252L))
  }
  // ---- boruvkaForest -------------------------------------------------

  /** Kruskal over the (w, a, b) total order — an independent scalar
    * replay of the canonical MSF, not a copy of the operator. */
  private def refMsf(edges: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.sortBy { case (a, b, w) => (w, a, b) }.flatMap {
      case (a, b, w) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) None
        else { parent(math.max(ra, rb)) = math.min(ra, rb); Some((a, b, w)) }
    }.toSet
  }

  private val mstFixture: Seq[(Long, Long, Long)] = Seq(
    (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (1L, 3L, 4L),
    (4L, 5L, 10L), (6L, 7L, 5L))

  test("boruvkaForest: hand-traced two-tree forest, min-id tree labels") {
    val got = Graph.boruvkaForest(mstFixture.toDF("a", "b", "w"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // cycle edge (1,3,4) is the max of cycle 1-2-3; everything else in
    val want = Set((1L, 2L, 1L, 1L), (2L, 3L, 2L, 1L), (3L, 4L, 3L, 1L),
      (4L, 5L, 10L, 1L), (6L, 7L, 5L, 6L))
    assert(got == want)
    assert(got.map(e => (e._1, e._2, e._3)) == refMsf(mstFixture))
  }

  test("boruvkaForest: equal weights resolve by the (w, a, b) total " +
    "order — the canonical tie case") {
    // triangle with all weights 5: the perturbed order is
    // (5,1,2) < (5,1,3) < (5,2,3), so the unique MSF is {(1,2),(1,3)}
    val tri = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))
    val got = Graph.boruvkaForest(tri.toDF("a", "b", "w"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5L, 1L), (1L, 3L, 5L, 1L)))
    assert(got.map(e => (e._1, e._2, e._3)) == refMsf(tri))
  }

  test("boruvkaForest: distributed-label path (smallLabelLimit=0) " +
    "equals the driver path on a contraction-chain graph") {
    // path 1-2-…-8 with increasing weights: round 1 selects every edge
    // and the contraction must collapse a pointer CHAIN, exercising
    // the 2-cycle rooting + pointer-doubling budget
    val chain = (1L to 7L).map(i => (i, i + 1, i))
    val viaDriver = Graph.boruvkaForest(chain.toDF("a", "b", "w"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaCluster = Graph
      .boruvkaForest(chain.toDF("a", "b", "w"), smallLabelLimit = 0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaDriver == chain.map(e => (e._1, e._2, e._3, 1L)).toSet)
    assert(viaCluster == viaDriver)
  }

  test("boruvkaForest: random graphs match the Kruskal replay on " +
    "both label paths") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 7
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.2
      } yield (a, b, rnd.nextInt(9).toLong + 1)).toSeq
      val want = refMsf(edges).map(e => e._1 -> e)
      val got = Graph.boruvkaForest(edges.toDF("a", "b", "w"))
        .as[(Long, Long, Long, Long)].collect()
      assert(got.map(e => (e._1, e._2, e._3)).toSet == refMsf(edges),
        s"trial $trial: edge set diverged from Kruskal")
      val got0 = Graph
        .boruvkaForest(edges.toDF("a", "b", "w"), smallLabelLimit = 0)
        .as[(Long, Long, Long, Long)].collect()
      assert(got0.toSet == got.toSet, s"trial $trial: paths diverged")
      // third tier: broadcast-label Borůvka (driver Kruskal disabled)
      val got1 = Graph
        .boruvkaForest(edges.toDF("a", "b", "w"), smallEdgeLimit = 0)
        .as[(Long, Long, Long, Long)].collect()
      assert(got1.toSet == got.toSet,
        s"trial $trial: broadcast-label path diverged")
      assert(want.nonEmpty || got.isEmpty)
    }
  }

  test("boruvkaForest: double weights (the HDBSCAN mutual-reachability " +
    "input) keep the weight column uncast") {
    val e = Seq((1L, 2L, 0.25), (2L, 3L, 0.5), (1L, 3L, 0.125))
      .toDF("a", "b", "w")
    val got = Graph.boruvkaForest(e)
      .as[(Long, Long, Double, Long)].collect().toSet
    // cycle max (2,3,0.5) drops
    assert(got == Set((1L, 3L, 0.125, 1L), (1L, 2L, 0.25, 1L)))
  }

  test("boruvkaForest: an insufficient round budget fails loudly " +
    "instead of returning a truncated forest (ADVICE r12)") {
    // needs 2 selection rounds + 1 empty confirmation round
    val twoRounds = Seq((1L, 2L, 1L), (2L, 3L, 3L), (3L, 4L, 2L))
    val df = twoRounds.toDF("a", "b", "w")
    // the budget governs the two round-loop paths (the driver Kruskal
    // tier is single-pass and has no rounds to exhaust)
    intercept[IllegalArgumentException] {
      Graph.boruvkaForest(df, maxRounds = 2, smallEdgeLimit = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.boruvkaForest(df, maxRounds = 2, smallLabelLimit = 0)
    }
    val ok = Graph
      .boruvkaForest(df, maxRounds = 3, smallEdgeLimit = 0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ok == twoRounds.map(e => (e._1, e._2, e._3, 1L)).toSet)
  }

  test("incremental MSF: a delta edge DISPLACES an old forest edge " +
    "(sparsification identity, not append)") {
    // old MSF keeps (2,3,6); the arriving (1,3,1) closes a cycle on
    // which (2,3,6) is now maximal — the second pass must evict it
    val old = Seq((1L, 2L, 5L), (2L, 3L, 6L)).toDF("a", "b", "w")
    val delta = Seq((1L, 3L, 1L)).toDF("a", "b", "w")
    val oldMsf = Graph.boruvkaForest(old)
      .select(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"),
        org.apache.spark.sql.functions.col("w"))
    val inc = Graph.boruvkaForest(oldMsf.unionByName(delta))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == Set((1L, 3L, 1L, 1L), (1L, 2L, 5L, 1L)))
  }

  test("incremental MSF equals from-scratch MSF on random graphs " +
    "for random edge-batch splits") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 15 + trial * 5
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.25
      } yield (a, b, rnd.nextInt(9).toLong + 1)).toSeq
      val (oldE, deltaE) = edges.partition(_ => rnd.nextDouble() < 0.7)
      val full = Graph.boruvkaForest(edges.toDF("a", "b", "w"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val oldMsf = Graph.boruvkaForest(oldE.toDF("a", "b", "w"))
        .select(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"),
          org.apache.spark.sql.functions.col("w"))
      val inc = Graph
        .boruvkaForest(oldMsf.unionByName(deltaE.toDF("a", "b", "w")))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(inc == full, s"trial $trial: incremental != from-scratch")
    }
  }

  test("multiSourceBfs: hand-traced path-graph distances, per-seed " +
    "isolation across components, self at dist 0") {
    // path 1-2-3-4-5 plus the island edge 8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 3L, 8L).toDF("v")
    val got = CacheScope.scoped {
      Graph.multiSourceBfs(edges, seeds, maxHops = 6)
        .as[(Long, Long, Long)].collect().toSet
    }
    val want = Set(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L),
      (1L, 5L, 4L),
      (3L, 3L, 0L), (3L, 2L, 1L), (3L, 4L, 1L), (3L, 1L, 2L),
      (3L, 5L, 2L),
      (8L, 8L, 0L), (8L, 9L, 1L))
    assert(got == want)
  }

  test("multiSourceBfs: the hop horizon truncates the ball; distances " +
    "inside it stay exact (not horizon-clamped)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = CacheScope.scoped {
      Graph.multiSourceBfs(edges, Seq(1L).toDF("v"), maxHops = 2)
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(got == Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("randomWalks: engine walks equal an independent local replay " +
    "(md5 index, sorted neighbor ranks); deterministic across runs; " +
    "graph-absent seeds drop") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 6L)).toDF("src", "dst")
    def run() = CacheScope.scoped {
      Graph.randomWalks(edges,
          Seq(1L, 5L, 99L).toDF("v"), walksPerSeed = 2, walkLen = 3)
        .select("seed", "walk", "path")
        .as[(Long, Long, String)].collect().toSet
    }
    val got = run()
    assert(got == run()) // bit-deterministic
    assert(!got.exists(_._1 == 99L)) // absent seed drops at deg join
    // independent local replay
    val adj = Map(
      1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L, 4L),
      4L -> Seq(1L, 3L), 5L -> Seq(6L), 6L -> Seq(5L))
    def md5idx(seed: Long, w: Int, s: Int, deg: Int): Int = {
      val hex = graft.ops.Dedup.md5Hex(s"$seed:$w:$s").take(15)
      (BigInt(hex, 16) % deg).toInt
    }
    val want = (for (seed <- Seq(1L, 5L); w <- 0 until 2) yield {
      var cur = seed
      val sb = new StringBuilder(seed.toString)
      for (st <- 1 to 3) {
        val ns = adj(cur)
        cur = ns(md5idx(seed, w, st, ns.length))
        sb.append(">").append(cur)
      }
      (seed, w.toLong, sb.toString)
    }).toSet
    assert(got == want)
  }
  test("densestSubgraph: hand-traced peel finds the planted dense " +
    "core; trace rows, densities and is_best exact; deterministic") {
    // K6 core {1..6} (15 edges, in-core degree 5) + one pendant per
    // core vertex (6 edges): round 0 state (12, 21), threshold
    // d <= 3*21/12 = 5.25 removes exactly the pendants (d = 1, core
    // d = 6); round 1 state (6, 15), threshold 7.5 clears the core.
    val core = for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)
    val pendants = (1L to 6L).map(i => (i, i + 10L))
    val edges = (core ++ pendants).toDF("src", "dst")
    def run() = CacheScope.scoped {
      Graph.densestSubgraph(edges, rounds = 10)
        .as[(Int, Long, Long, Long, Boolean)].collect().toSeq
    }
    val got = run()
    assert(got == Seq(
      (0, 12L, 21L, 1750000L, false),
      (1, 6L, 15L, 2500000L, true)), s"$got")
    assert(got == run()) // deterministic
    // the guarantee: best visited density >= rho* / 3 (rho* >= K6's 2.5)
    assert(got.filter(_._5).head._4 >= 2500000L / 3)
  }
}
