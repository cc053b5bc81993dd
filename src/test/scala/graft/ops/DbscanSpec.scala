package graft.ops

import graft.SparkTestBase

/** Grid-blocked DBSCAN ([[Dbscan.dbscan2D]]) against a hand-computed
  * layout in exact dyadic coordinates (ε = 0.25, every coordinate a
  * multiple of 0.125, so all distances and the ε² boundary are
  * float-exact — boundary-equality pairs are included deliberately).
  *
  * Layout (minPts = 4, |N_ε| counts self):
  *  - cluster A = ids 1–5 (a 0.125-square + right-edge point at
  *    (0.25, 0)) — all core, component label 1;
  *  - cluster B = ids 11–15 (mirror block starting at x = 0.75) —
  *    all core, component label 11;
  *  - id 50 at (0.5, 0): exactly ε from A's edge core (5) AND B's
  *    edge core (15), |N_ε| = 3 < 4 → BORDER, multi-reachable →
  *    min-label rule must assign cluster 1, not 11;
  *  - id 99 far away: |N_ε| = 1 → noise, NULL cluster.
  */
class DbscanSpec extends SparkTestBase {
  import spark.implicits._

  private val pts = Seq(
    (1L, 0.0, 0.0), (2L, 0.125, 0.0), (3L, 0.0, 0.125),
    (4L, 0.125, 0.125), (5L, 0.25, 0.0),
    (11L, 0.875, 0.0), (12L, 1.0, 0.0), (13L, 0.875, 0.125),
    (14L, 1.0, 0.125), (15L, 0.75, 0.0),
    (50L, 0.5, 0.0), (99L, 5.0, 5.0))

  private val expect = Seq(
    (1L, 5L, true, Some(1L)), (2L, 5L, true, Some(1L)),
    (3L, 4L, true, Some(1L)), (4L, 5L, true, Some(1L)),
    (5L, 5L, true, Some(1L)),
    (11L, 5L, true, Some(11L)), (12L, 5L, true, Some(11L)),
    (13L, 5L, true, Some(11L)), (14L, 4L, true, Some(11L)),
    (15L, 5L, true, Some(11L)),
    (50L, 3L, false, Some(1L)), (99L, 1L, false, None))

  private def run(df: org.apache.spark.sql.DataFrame) =
    CacheScope.scoped {
      Dbscan.dbscan2D(df, "id", "x", "y", eps = 0.25, minPts = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSeq.sortBy(_._1)
    }

  test("core/border/noise and the min-label multi-reach border rule " +
    "match the hand-computed layout") {
    assert(run(pts.toDF("id", "x", "y")) == expect)
  }

  test("partitioning-invariant: a 7-way repartition decodes the same " +
    "clusters (grid blocking loses no ε-pair)") {
    assert(run(pts.toDF("id", "x", "y").repartition(7)) == expect)
  }

  test("coreDistance2D: hand-computed (minPts−1)-th neighbor " +
    "distances; NULL exactly off the dbscan core set") {
    val got = CacheScope.scoped {
      Dbscan.coreDistance2D(pts.toDF("id", "x", "y"), "id", "x", "y",
        eps = 0.25, minPts = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSeq.sortBy(_._1)
    }
    // id 1 at (0,0): other neighbors within ε sorted by d² =
    // 0.125² (→2), 0.125² (→3), 0.125²·2 (→4), 0.25² (→5); 3rd = 2·0.125²
    val d1 = 0.125 * 0.125
    assert(got.find(_._1 == 1L).get == (1L, 5L, Some(2 * d1)))
    // id 3 at (0, 0.125): neighbors 1 (0.125²), 4 (0.125²), 2 (2·0.125²)
    // — exactly minPts−1 = 3 of them → core distance = 2·0.125²
    assert(got.find(_._1 == 3L).get == (3L, 4L, Some(2 * d1)))
    // border (50) and noise (99) points have no 3rd neighbor within ε
    assert(got.find(_._1 == 50L).get == (50L, 3L, None))
    assert(got.find(_._1 == 99L).get == (99L, 1L, None))
    // the contract with dbscan2D: core ⟺ non-NULL core distance
    val core = run(pts.toDF("id", "x", "y"))
      .map(t => t._1 -> t._3).toMap
    assert(got.forall { case (id, _, cd) => cd.isDefined == core(id) })
  }

  test("isolated core (minPts met purely by borders) keeps its own " +
    "singleton cluster") {
    // hub at origin with 3 spokes at ε: hub |N| = 4 → core; spokes
    // |N| = 2 (hub + nothing: spokes are 2ε·sin60 ≈ 0.43 apart...
    // use axis-aligned spokes: (±0.25, 0), (0, 0.25) pairwise > ε) →
    // border, attached to the hub's singleton component
    val df = Seq((7L, 0.0, 0.0), (20L, 0.25, 0.0), (21L, -0.25, 0.0),
      (22L, 0.0, 0.25)).toDF("id", "x", "y")
    val got = run(df)
    assert(got == Seq((7L, 4L, true, Some(7L)),
      (20L, 2L, false, Some(7L)), (21L, 2L, false, Some(7L)),
      (22L, 2L, false, Some(7L))))
  }
  /** [[Dbscan.hdbscanMst2D]] against a fully hand-traced line layout
    * in exact dyadic coordinates (ε = 1.0, minPts = 3): two triples
    * A = {1,2,3} at x ∈ {0, 0.125, 0.25} and B = {4,5,6} at
    * x ∈ {0.75, 0.875, 1.0}, plus far non-core 7. Every distance²,
    * core distance² and mutual-reachability weight is a dyadic
    * rational, so the trace is bit-exact. Within each triple all
    * three mreach² weights tie at 0.0625 — the MST must pick the
    * (w, a, b)-canonical pair — and the unique A–B bottleneck is
    * (3,4) at 0.25.
    */
  test("hdbscanMst2D: hand-traced cores, canonical tie MST, " +
    "nested dendrogram cuts") {
    val line = Seq((1L, 0.0), (2L, 0.125), (3L, 0.25), (4L, 0.75),
      (5L, 0.875), (6L, 1.0), (7L, 5.0))
      .toDF("id", "x")
      .withColumn("y", org.apache.spark.sql.functions.lit(0.0))
    val (cores, mst) =
      Dbscan.hdbscanMst2D(line, "id", "x", "y", eps = 1.0, minPts = 3)
    val c = cores.as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // n_eps counts self; 1–6 are mutually within ε (1→6 exactly ε,
    // inclusive boundary), 7 is alone
    assert((1L to 6L).forall(c(_)._1 == 6L) && c(7L)._1 == 1L)
    // core_d2 = squared distance to the 2nd-nearest other point
    assert(c(1L)._2.contains(0.0625) && c(2L)._2.contains(0.015625)
      && c(3L)._2.contains(0.0625) && c(4L)._2.contains(0.0625)
      && c(5L)._2.contains(0.015625) && c(6L)._2.contains(0.0625))
    assert(c(7L)._2.isEmpty, "non-core has no core distance")
    val edges = mst.as[(Long, Long, Double, Long)].collect().toSet
    // intra-triple mreach² all tie at 0.0625 → canonical (w,a,b)
    // order keeps (1,2),(1,3) and (4,5),(4,6); bottleneck (3,4)=0.25
    assert(edges == Set((1L, 2L, 0.0625, 1L), (1L, 3L, 0.0625, 1L),
      (4L, 5L, 0.0625, 1L), (4L, 6L, 0.0625, 1L), (3L, 4L, 0.25, 1L)))
    // dendrogram cuts: t² = 0.1 splits A|B, t² = 0.3 merges them —
    // the same cut the registry query takes
    def cut(t2: Double): Map[Long, Long] = {
      val kept = mst
        .filter(org.apache.spark.sql.functions.col("w") <= t2)
        .selectExpr("a as id_a", "b as id_b")
        .unionByName((1L to 6L).map(i => (i, i)).toDF("id_a", "id_b"))
      Dedup.dedupComponentsConverged(kept)._1
        .as[(Long, Long)].collect().toMap
    }
    assert(cut(0.1) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    assert(cut(0.3) == (1L to 6L).map(_ -> 1L).toMap)
  }

}
