package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact grid-blocked DBSCAN (Ester et al., KDD 1996) in a 2-D feature
  * space — density clustering without the O(N²) ε-neighbor self-join.
  *
  * Blocking: each point lands in the ⌊coord/ε⌋ grid cell; any two
  * points within ε of each other differ by at most ε per coordinate,
  * so every ε-pair co-occurs in a 3×3 cell neighborhood — the probe
  * side emits 9 cell keys per point and the build side one, making
  * candidate generation an EQUI-join on (cx, cy) with zero false
  * negatives. Candidates verify the exact ε² predicate; the full
  * distance never leaves map-side arithmetic.
  *
  * Definitions are the paper's: |N_ε(p)| counts p itself; core points
  * have |N_ε| ≥ minPts; clusters are connected components of the
  * core–core ε-graph (via [[Dedup.dedupComponentsConverged]] —
  * min-label pointer doubling that runs to a CHECKSUM-VERIFIED label
  * fixpoint, so a density-connected chain whose core-graph diameter
  * exceeds any fixed round budget can never silently split;
  * `componentIters` is the hard cap on rounds, not the round count,
  * and O(log diameter) rounds suffice under pointer doubling so 16
  * covers diameters beyond 2¹⁵); border points (non-core
  * within ε of a core) attach to the SMALLEST core component label —
  * the classic scan-order ambiguity for multi-reachable borders pinned
  * to a deterministic rule; everything else is noise (NULL cluster).
  *
  * Scale: cells shrink with ε, so per-cell occupancy is the data's
  * local density, not its size; the 9× probe fan-out is constant; the
  * only corpus-sized shuffles are the cell equi-join and the neighbor-
  * count aggregate. For d > 2 feature spaces, project first (any
  * single coordinate is 1-Lipschitz in L2, so 2-D grid blocking over
  * projections stays exact for the PROJECTED-space clustering; see
  * q_sim_dbscan) or block on more coordinates (3^d fan-out).
  *
  * @param points  input frame
  * @param id      integral id column (survives as output key)
  * @param x       first coordinate (cast to double)
  * @param y       second coordinate
  * @return (id, n_eps, is_core, cluster) — cluster is the min member
  *         id of the component, NULL for noise
  */
object Dbscan {

  /** Exact ε-neighbor pairs (ia, ib, d2) via the 3×3 grid equi-join —
    * the shared candidate generator for [[dbscan2D]] and
    * [[coreDistance2D]]. Each ordered (ia, ib) pair matches in exactly
    * one build cell, so downstream counts need no dedup. */
  private def epsNeighbors(points: DataFrame, id: String, x: String,
      y: String, eps: Double): DataFrame = {
    val e2 = eps * eps
    val pts = CacheScope.cached(points
      .select(col(id).cast("long").as("__id"),
        col(x).cast("double").as("__x"),
        col(y).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__cx", floor(col("__x") / eps).cast("long"))
      .withColumn("__cy", floor(col("__y") / eps).cast("long")))
    val probes = pts
      .select(col("__id").as("ia"), col("__x").as("xa"),
        col("__y").as("ya"), col("__cx"), col("__cy"))
      .withColumn("d", explode(expr(
        "flatten(transform(sequence(-1, 1), dx -> " +
          "transform(sequence(-1, 1), dy -> " +
          "named_struct('dx', dx, 'dy', dy))))")))
      .select(col("ia"), col("xa"), col("ya"),
        (col("__cx") + col("d.dx")).as("jcx"),
        (col("__cy") + col("d.dy")).as("jcy"))
    val build = pts.select(col("__id").as("ib"), col("__x").as("xb"),
      col("__y").as("yb"), col("__cx").as("jcx"), col("__cy").as("jcy"))
    probes.join(build, Seq("jcx", "jcy"))
      .filter(col("ia") =!= col("ib"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= e2)
      .select(col("ia"), col("ib"), col("d2"))
  }

  /** All input ids (post null-filter) — for left joins back. */
  private def allIds(points: DataFrame, id: String, x: String,
      y: String): DataFrame = points
    .select(col(id).cast("long").as("ia"), col(x).cast("double").as("__x"),
      col(y).cast("double").as("__y"))
    .filter(col("__x").isNotNull && col("__y").isNotNull)
    .select(col("ia"))

  def dbscan2D(points: DataFrame, id: String, x: String, y: String,
      eps: Double, minPts: Int, componentIters: Int = 16): DataFrame = {
    require(eps > 0 && minPts >= 1, "eps > 0 and minPts >= 1 required")
    val nbr = CacheScope.cached(
      epsNeighbors(points, id, x, y, eps).select(col("ia"), col("ib")))
    val pts = allIds(points, id, x, y)
    val counts = CacheScope.cached(pts
      .join(nbr.groupBy(col("ia")).agg(count(lit(1)).as("nn")),
        Seq("ia"), "left")
      .select(col("ia"),
        (coalesce(col("nn"), lit(0L)) + 1L).as("n_eps")))
    val core = CacheScope.cached(
      counts.filter(col("n_eps") >= minPts).select(col("ia")))
    // self-pairs register isolated cores (minPts met purely by border
    // neighbors) as their own singleton component
    val coreEdges = nbr
      .join(core, Seq("ia"))
      .join(core.select(col("ia").as("ib")), Seq("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"))
      .unionByName(core.select(col("ia").as("id_a"),
        col("ia").as("id_b")))
    // auto CC: bounded-probe driver union-find when the core graph is
    // small; otherwise the checksum-verified convergence loop (ADVICE
    // r11 — a blind fixed-round budget would silently split a long
    // density-connected chain at scale)
    val comp = Dedup.dedupComponentsAuto(coreEdges, maxIters = componentIters)
    val borderAssign = nbr
      .join(core, Seq("ia"), "left_anti")
      .join(comp.select(col("doc_id").as("ib"), col("component")),
        Seq("ib"))
      .groupBy(col("ia")).agg(min(col("component")).as("cluster"))
    val clusters = comp
      .select(col("doc_id").as("ia"), col("component").as("cluster"))
      .unionByName(borderAssign)
    counts.join(clusters, Seq("ia"), "left")
      .select(col("ia").as(id), col("n_eps"),
        (col("n_eps") >= minPts).as("is_core"), col("cluster"))
  }

  /** ε-CAPPED CORE DISTANCE — the HDBSCAN d_core(p) (Campello,
    * Moulavi & Sander 2013, §3) under a DBSCAN ε bound: the squared
    * distance from p to its (minPts−1)-th nearest OTHER point, using
    * only neighbors within ε (|N_ε(p)| counts p itself, matching
    * [[dbscan2D]], so the core distance is defined exactly for
    * dbscan2D's core points: n_eps ≥ minPts ⟺ core_d2 non-NULL).
    * This is both the k-distance diagnostic used to choose ε (sort
    * the values, read the elbow) and the mutual-reachability input
    * for an ε-bounded HDBSCAN
    * (d_mreach(a,b) = max(d_core(a), d_core(b), d(a,b))).
    *
    * Exactness + scale: candidates come from the same 3×3 grid
    * equi-join (zero false negatives within ε, so the k-th-NN rank is
    * exact for the capped definition — the cap is what keeps the
    * operator out of the O(N²) uncapped-kNN regime); the per-point
    * selection is one rank window over each point's ≤|cell
    * neighborhood| candidate rows, keyed (d2, ib) so distance ties
    * break deterministically.
    *
    * @return (id, n_eps, core_d2) — core_d2 NULL for non-core points
    */
  /** ε-BOUNDED HDBSCAN BUILD (Campello, Moulavi & Sander 2013 §3–4,
    * under the same ε cap as [[coreDistance2D]]): returns the
    * per-point core table AND the minimum spanning tree of the
    * MUTUAL-REACHABILITY graph — d_mreach(a,b) = max(d_core(a),
    * d_core(b), d(a,b)), here all as SQUARED distances (max is
    * monotone under squaring, so the squared-space MST is the
    * distance-space MST). The MST is HDBSCAN's whole dendrogram: a
    * horizontal cut at λ = 1/t is "drop MST edges with w > t²", and
    * by the single-linkage minimax property the resulting components
    * equal the connected components of the t-thresholded
    * mutual-reachability graph — which is what lets a SQL oracle
    * check any cut without replaying the MST.
    *
    * Scale shape: one 3×3 grid equi-join for the ε-pairs (zero false
    * negatives within ε), one rank window for d_core, two equi-joins
    * to attach core distances to edges, then
    * [[Graph.boruvkaForest]] (log-round, one action per round) over
    * the |core-pairs|-bounded edge set. The ε bound is what keeps the
    * mutual-reachability graph out of the O(N²) complete-graph regime
    * the unbounded HDBSCAN needs; the trade is the standard DBSCAN*
    * one — points farther than ε apart can never share a cluster.
    *
    * @return (cores, mst): cores = (id, n_eps, core_d2) for ALL
    *         points (core_d2 NULL ⟺ non-core, as [[coreDistance2D]]);
    *         mst = (a, b, w, tree) over core points with w =
    *         squared mutual-reachability distance
    */
  def hdbscanMst2D(points: DataFrame, id: String, x: String,
      y: String, eps: Double, minPts: Int): (DataFrame, DataFrame) = {
    require(eps > 0 && minPts >= 2, "eps > 0 and minPts >= 2 required")
    import org.apache.spark.sql.expressions.Window
    val nbr = CacheScope.cached(epsNeighbors(points, id, x, y, eps))
    val kth = CacheScope.cached(nbr
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("ia")).orderBy(col("d2"), col("ib"))))
      .filter(col("rn") === minPts - 1)
      .select(col("ia"), col("d2").as("core_d2")))
    val cores = allIds(points, id, x, y)
      .join(nbr.groupBy(col("ia")).agg(count(lit(1)).as("nn")),
        Seq("ia"), "left")
      .join(kth, Seq("ia"), "left")
      .select(col("ia").as(id),
        (coalesce(col("nn"), lit(0L)) + 1L).as("n_eps"), col("core_d2"))
    // core–core ε-edges, one row per unordered pair, weighted by the
    // squared mutual-reachability distance (inner joins to kth = the
    // core filter: d_core is defined exactly for core points)
    val mrEdges = nbr.filter(col("ia") < col("ib"))
      .join(kth.select(col("ia"), col("core_d2").as("ca")), Seq("ia"))
      .join(kth.select(col("ia").as("ib"), col("core_d2").as("cb")),
        Seq("ib"))
      .select(col("ia").as("a"), col("ib").as("b"),
        greatest(col("d2"), col("ca"), col("cb")).as("w"))
    (cores, Graph.boruvkaForest(mrEdges))
  }

  def coreDistance2D(points: DataFrame, id: String, x: String,
      y: String, eps: Double, minPts: Int): DataFrame = {
    require(eps > 0 && minPts >= 2, "eps > 0 and minPts >= 2 required")
    import org.apache.spark.sql.expressions.Window
    val nbr = CacheScope.cached(epsNeighbors(points, id, x, y, eps))
    val kth = nbr
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("ia")).orderBy(col("d2"), col("ib"))))
      .filter(col("rn") === minPts - 1)
      .select(col("ia"), col("d2").as("core_d2"))
    allIds(points, id, x, y)
      .join(nbr.groupBy(col("ia")).agg(count(lit(1)).as("nn")),
        Seq("ia"), "left")
      .join(kth, Seq("ia"), "left")
      .select(col("ia").as(id),
        (coalesce(col("nn"), lit(0L)) + 1L).as("n_eps"), col("core_d2"))
  }
}
