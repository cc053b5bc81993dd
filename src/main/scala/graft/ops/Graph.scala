package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the second graph-operator
  * class next to [[Dedup.dedupComponents]]' connected components: PageRank
  * by power iteration (Page et al., 1999, "The PageRank Citation Ranking").
  *
  * Determinism doctrine: ranks are BIGINT mass in units of `scale⁻¹`, every
  * per-edge contribution is an integer floor-division `pr div outdeg`, and
  * the damping step is `base + (85·Σ) div 100` — all order-independent
  * integer arithmetic, so any engine (and the DuckDB oracle twin) replaying
  * the same formula reproduces the ranks bit-for-bit. The truncation the
  * floor divisions introduce is ≤ 1 unit per edge per round — irrelevant at
  * scale = 10⁹ — and buys exact cross-engine replay, the same trade
  * [[Similarity.kmeansFit]] makes with its rounded centroid updates.
  *
  * Scale shape: one eager `count()` for |V| (an 8-byte driver action, the
  * documented kmeans precedent); out-degrees join the edge list once up
  * front; each round is edges ⨝ ranks (shuffle on src) → groupBy(dst)
  * partial-aggregated sum → left join back to vertices. The shuffle
  * payload is one (vertex, long) pair per edge — never adjacency lists.
  * Rounds are O(iters), each persisted and released by the consumer's
  * [[CacheScope]]; iters is fixed (power iteration converges geometrically
  * at rate d≈0.85, so 10–20 rounds saturate a 10⁻⁹ unit grid).
  */
object Graph {

  /** Per-round lineage cut for iterative loops: EAGER localCheckpoint.
    *
    * A lazy persist() chain keeps the whole round history in the plan
    * tree — every downstream materialization re-analyzes and
    * re-AQE-plans the nested InMemoryRelation stack, which goes
    * superlinear in the round count (measured on q_graph_ecc, see
    * [[bfsReach]]: 21.6 s wall / 97 s CPU lazy vs 4.2 s / 17 s eager
    * on a 4k-row reach set — ALL overhead, no data). Rounds of a
    * synchronous iteration are inherently serial, so eager
    * materialization costs no pipelining. Cluster note: localCheckpoint
    * blocks die with their executor — swap in `checkpoint()` against a
    * reliable store for long-running cluster jobs.
    */
  private def roundCut(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** @param edges DataFrame[src: Long, dst: Long]; deduplicated here.
    * @return DataFrame[vertex, rank_scaled] — rank mass in scale⁻¹ units.
    */
  def pagerank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000L): DataFrame = {
    val e = CacheScope.cached(
      edges.select(col("src"), col("dst")).distinct())
    val verts = CacheScope.cached(
      e.select(col("src").as("v"))
        .union(e.select(col("dst").as("v"))).distinct())
    val n = verts.count() // eager |V|: an 8-byte action, documented above
    if (n == 0)
      return verts.select(col("v").as("vertex"),
        lit(0L).as("rank_scaled"))
    val p0 = scale / n
    val base = (p0 * 15L) / 100L
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val edgesW = CacheScope.cached(e.join(deg, "src"))
    var ranks = verts.select(col("v"), lit(p0).as("pr"))
    for (_ <- 1 to iters) {
      val in = edgesW.join(ranks, edgesW("src") === ranks("v"))
        .select(col("dst"), expr("pr div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = verts.join(in, verts("v") === in("dst"), "left")
        .select(col("v"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
      ranks = roundCut(next)
    }
    ranks.select(col("v").as("vertex"), col("pr").as("rank_scaled"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) under the
    * [[pagerank]] integer-determinism doctrine: each half-round is
    * one equi-join + sum aggregate, then L1 renormalization back to
    * `scale` total mass via floor division — x·scale div Σx — done in
    * DECIMAL(38,0) so the product can't overflow before the divide
    * (results fit BIGINT again by construction: each score ≤ scale).
    * L1 instead of Kleinberg's L2 keeps every step integral; the
    * normalization choice only rescales, the hub/authority ORDER
    * converges to the same principal eigenvectors. The DuckDB twin
    * replays rounds bit-for-bit.
    *
    * Shape per round: two (edges ⨝ scores → sum) shuffles plus two
    * 1-row total frames broadcast back — the pagerank cost class.
    */
  def hits(edges: DataFrame, iters: Int,
           scale: Long = 1000000000L): DataFrame = {
    // iters = 0 would leave the auth frame unbuilt (null) and NPE in the
    // final join — same parameter doctrine as pagerank
    require(iters >= 1, s"hits needs at least one iteration, got $iters")
    val e = CacheScope.cached(
      edges.select(col("src"), col("dst")).distinct())
    val hubs = CacheScope.cached(e.select(col("src").as("v")).distinct())
    val auths = CacheScope.cached(e.select(col("dst").as("v")).distinct())
    def renorm(scores: DataFrame, c: String): DataFrame = {
      val tot = scores.agg(sum(col(c)).as("tot"))
      scores.crossJoin(broadcast(tot))
        .select(col("v"), expr(
          s"cast(cast($c as decimal(38,0)) * $scale div tot as bigint)")
          .as(c))
    }
    var h = hubs.select(col("v"), lit(scale).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val a0 = e.join(h, e("src") === h("v"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
        .select(col("dst").as("v"), col("a"))
      a = roundCut(renorm(a0, "a"))
      val h0 = e.join(a, e("dst") === a("v"))
        .groupBy(col("src")).agg(sum(col("a")).as("h"))
        .select(col("src").as("v"), col("h"))
      h = roundCut(renorm(h0, "h"))
    }
    hubs.select(col("v")).unionByName(auths.select(col("v"))).distinct()
      .join(h.select(col("v"), col("h").as("hub_scaled")), Seq("v"),
        "left")
      .join(a.select(col("v"), col("a").as("auth_scaled")), Seq("v"),
        "left")
      .select(col("v").as("vertex"),
        coalesce(col("hub_scaled"), lit(0L)).as("hub_scaled"),
        coalesce(col("auth_scaled"), lit(0L)).as("auth_scaled"))
  }

  /** Personalized PageRank (Jeh & Widom, WWW'03 "Scaling Personalized
    * Web Search"): power iteration whose teleport mass lands ONLY on the
    * `seeds` set — rank becomes proximity-to-seeds, the standard
    * recommendation / related-entity primitive. Same integer-arithmetic
    * determinism doctrine as [[pagerank]]: seed base mass is
    * `(scale div |seeds|)·15 div 100`, contributions are floor
    * divisions, so the DuckDB twin replays rounds bit-for-bit. Dangling
    * mass is dropped, exactly as in [[pagerank]] — at 100 TB the
    * alternative (a per-round global dangling sum broadcast back) adds
    * one scalar aggregate per round and is noted here for the cluster
    * deployment; ranks remain a valid proximity ORDER either way.
    *
    * Shape per round: edges ⨝ ranks shuffle on src, partial-aggregated
    * sum on dst, map-side seed base via a broadcast `isin` — the seed
    * set is a query parameter (tens of ids), never a table.
    */
  def personalizedPagerank(edges: DataFrame, seeds: Seq[Long], iters: Int,
                           scale: Long = 1000000000L): DataFrame = {
    require(seeds.nonEmpty, "personalizedPagerank needs seed vertices")
    val e = CacheScope.cached(
      edges.select(col("src"), col("dst")).distinct())
    val verts = CacheScope.cached(
      e.select(col("src").as("v"))
        .union(e.select(col("dst").as("v"))).distinct())
    if (verts.isEmpty)
      return verts.select(col("v").as("vertex"),
        lit(0L).as("rank_scaled"))
    val p0 = scale / seeds.length
    val base = (p0 * 15L) / 100L
    val isSeed = col("v").isin(seeds: _*)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val edgesW = CacheScope.cached(e.join(deg, "src"))
    var ranks = verts.select(col("v"),
      when(isSeed, lit(p0)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      val in = edgesW.join(ranks, edgesW("src") === ranks("v"))
        .select(col("dst"), expr("pr div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = verts.join(in, verts("v") === in("dst"), "left")
        .select(col("v"),
          (when(isSeed, lit(base)).otherwise(lit(0L))
            + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
      ranks = roundCut(next)
    }
    ranks.select(col("v").as("vertex"), col("pr").as("rank_scaled"))
  }

  /** Weighted PageRank: rank mass distributed proportionally to edge
    * weights instead of uniformly — the form used on interaction graphs
    * where edge strength matters (co-purchase counts, message volume).
    * Same determinism doctrine: each contribution is
    * `(pr · w) div Σw(src)` — integer floor arithmetic over BIGINT
    * weights, order-independent, replayable bit-for-bit in SQL.
    * Parallel edges are weight-summed first, so the edge list is
    * canonical. Shape identical to [[pagerank]]: per-round one shuffle
    * on src, one partial-aggregated sum on dst.
    */
  def pagerankWeighted(edges: DataFrame, iters: Int,
                       scale: Long = 1000000000L): DataFrame = {
    val e = CacheScope.cached(
      edges.groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("w")))
    val verts = CacheScope.cached(
      e.select(col("src").as("v"))
        .union(e.select(col("dst").as("v"))).distinct())
    val n = verts.count()
    if (n == 0)
      return verts.select(col("v").as("vertex"),
        lit(0L).as("rank_scaled"))
    val p0 = scale / n
    val base = (p0 * 15L) / 100L
    val sw = e.groupBy(col("src")).agg(sum(col("w")).as("sw"))
    val edgesW = CacheScope.cached(e.join(sw, "src"))
    var ranks = verts.select(col("v"), lit(p0).as("pr"))
    for (_ <- 1 to iters) {
      val in = edgesW.join(ranks, edgesW("src") === ranks("v"))
        // pr is scale-bounded but w/sw are caller data: widen the
        // product to DECIMAL(38,0) so very large summed weights cannot
        // wrap BIGINT; `div` still yields BIGINT.
        .select(col("dst"),
          expr("(cast(pr as decimal(38,0)) * w) div sw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = verts.join(in, verts("v") === in("dst"), "left")
        .select(col("v"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr"))
      ranks = roundCut(next)
    }
    ranks.select(col("v").as("vertex"), col("pr").as("rank_scaled"))
  }

  /** Community detection by synchronous label propagation (Raghavan et
    * al., 2007, Phys. Rev. E 76): every vertex starts labeled with its
    * own id; each round it adopts the most frequent label among its
    * neighbors, ties broken toward the SMALLEST label. The synchronous
    * schedule plus the deterministic tie-break is what makes the result
    * engine-independent (async LPA's result depends on visit order) —
    * the DuckDB twin replays the rounds exactly.
    *
    * Shape per round: one equi-join of the symmetrized edge list against
    * the label table (shuffle carries (vertex, label) pairs — never
    * adjacency lists), then two hash aggregates: (v, label) counts, and
    * the per-v argmax via `max(struct(cnt, -label))` — both map-side
    * partial, no window. O(iters) rounds, each persisted and released by
    * the caller's [[CacheScope]].
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val und = CacheScope.cached(
      edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
    val sym = CacheScope.cached(
      und.select(col("a").as("v"), col("b").as("n"))
        .unionAll(und.select(col("b").as("v"), col("a").as("n"))))
    var labels = sym.select(col("v")).distinct()
      .select(col("v"), col("v").as("label"))
    for (_ <- 1 to iters) {
      val nbr = sym.join(labels.withColumnRenamed("v", "n"), "n")
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("c"))
      val next = nbr
        .groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("label"))
      labels = roundCut(next)
    }
    labels.select(col("v").as("vertex"), col("label"))
  }

  /** k-core peeling (Seidman 1983; distributed form follows Montresor
    * et al.'s iterative peel): repeatedly delete vertices of degree
    * < k; what survives `peels` rounds is the k-core once the peel
    * reaches fixpoint. The round count is an EXPLICIT parameter — the
    * operator's determinism contract is "the state after exactly
    * `peels` synchronous peels", which an oracle can replay; peel
    * depth needed for convergence is bounded by the graph's
    * degeneracy ordering length (small for real corpora; callers can
    * over-provision rounds — a converged peel is idempotent, so extra
    * rounds are cheap no-ops on the shrunken subgraph).
    *
    * Shape per round: one degree aggregate over the (already-pruned)
    * edge list + two semi-joins to keep edges whose BOTH endpoints
    * survive. Work shrinks monotonically; shuffles carry (vertex,
    * long) and edge pairs only.
    *
    * @return surviving vertices with their degree in the peeled
    *         subgraph.
    */
  def kCore(edges: DataFrame, k: Int, peels: Int): DataFrame = {
    var e = CacheScope.cached(
      edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
    for (_ <- 1 to peels) {
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k)
      e = roundCut(
        e.join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("v").as("b")), Seq("b"), "left_semi"))
    }
    e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .select(col("v").as("vertex"), col("degree"))
  }

  /** Per-edge triangle SUPPORT of a canonicalized (a < b) edge list:
    * support(a,b) = number of common neighbors. Triangles are
    * enumerated once via the id-ordered form (u < v < w joined on the
    * three canonical edges) and each triangle credits its three edges.
    * The id-ordered join is the oracle-replayable baseline; the
    * degree-oriented enumeration (triangleStats) bounds the wedge count
    * tighter on skewed graphs — swap in `orientByDegree` for corpora
    * with power-law hubs.
    */
  private def edgeSupport(e: DataFrame): DataFrame = {
    val x = e.select(col("a").as("u"), col("b").as("v"))
    val y = e.select(col("a").as("u"), col("b").as("w"))
    val tri = x.join(y, Seq("u")).filter(col("v") < col("w"))
      .join(e, col("v") === col("a") && col("w") === col("b"))
      .select(col("u"), col("v"), col("w"))
    tri.select(col("u").as("a"), col("v").as("b"))
      .unionAll(tri.select(col("u").as("a"), col("w").as("b")))
      .unionAll(tri.select(col("v").as("a"), col("w").as("b")))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
  }

  /** Bounded-round k-TRUSS (Cohen 2008, "Trusses: cohesive subgraphs
    * for social network analysis"): iteratively delete every edge in
    * fewer than k−2 triangles; the fixpoint is the maximal subgraph
    * where each edge has ≥ k−2 triangle supports — a strictly tighter
    * cohesion notion than the k-core (every k-truss edge's endpoints
    * lie in the (k−1)-core, not vice versa). Like [[kCore]], the round
    * count is an explicit bounded contract; a converged peel is a
    * no-op, so over-provisioning is safe and convergence is observable
    * (round N == round N+1, spec-pinned).
    *
    * Shape per round: one triangle enumeration (two self-equi-joins of
    * the shrinking edge list) + a support aggregate + one semi-join.
    * Edges-only shuffles; the wedge join is the standard distributed
    * triangle-count cost, monotonically shrinking each round.
    *
    * @return surviving canonical edges with their support in the FINAL
    *         subgraph (≥ k−2 everywhere once converged).
    */
  def kTruss(edges: DataFrame, k: Int, peels: Int): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    // lazy localCheckpoint per round: each round references the edge
    // list FOUR times (two wedge legs, the closing join, the semi-join
    // base), so without truncation the logical plan grows 4^peels —
    // the same OOM-by-analysis trap dedupComponentsConverged documents.
    // Trade on a durable cluster: `checkpoint()` — local checkpoints
    // don't survive executor loss.
    var e = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(false)
    for (_ <- 1 to peels) {
      val keep = edgeSupport(e).filter(col("support") >= k - 2)
      e = e.join(keep.select(col("a"), col("b")), Seq("a", "b"),
          "left_semi")
        .localCheckpoint(false)
    }
    e.join(edgeSupport(e), Seq("a", "b"), "left")
      .select(col("a").as("src"), col("b").as("dst"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** All-pairs LONGEST path lengths on a DAG by max-plus path
    * doubling: R₁ = edges (length 1); each round composes
    * R ∪ {(u,v, len(u,w)+len(w,v))} and keeps the per-pair max, so
    * after r rounds every path of length ≤ 2^r is covered — ceil(log₂
    * diameter) rounds suffice, NOT diameter rounds (the reason this
    * beats per-round relaxation on long chains: 7 rounds cover depth
    * 128). Caller guarantees acyclicity (a cycle would diverge — as in
    * any longest-path formulation; the query-layer DAGs here are
    * ordered-calendar graphs, acyclic by construction).
    *
    * Shape per round: one self-equi-join on the midpoint + a max
    * aggregate; lazy localCheckpoint truncates the doubling lineage
    * (the [[kTruss]] doctrine). State is the reachability pair set —
    * for calendar/taxonomy DAGs a bounded table regardless of corpus
    * size.
    */
  def longestPaths(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"longestPaths needs rounds >= 1, got $rounds")
    var r = edges.filter(col("src") =!= col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).distinct()
      .withColumn("len", lit(1L))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val comp = r.select(col("u"), col("v").as("w"), col("len").as("la"))
        .join(r.select(col("u").as("w"), col("v"), col("len").as("lb")),
          "w")
        .select(col("u"), col("v"), (col("la") + col("lb")).as("len"))
      r = r.unionByName(comp)
        .groupBy(col("u"), col("v")).agg(max(col("len")).as("len"))
        .localCheckpoint(false)
    }
    r
  }

  /** Bounded-hop HARMONIC centrality (Boldi & Vigna 2014, "Axioms for
    * Centrality": the well-behaved closeness variant) over an
    * undirected graph: score(v) = Σ_{u≠v, d(u,v) ≤ H} scale div
    * d(u,v). The horizon H is an explicit contract (truncated
    * centrality — the standard trade on big graphs, cf. HyperBall);
    * `scale` divisible by 1..H makes every term an EXACT integer, so
    * the sum is order-independent and the SQL twin replays it.
    *
    * Shape: H rounds of multi-source frontier expansion over an
    * APPEND-ONLY reach set (see [[bfsReach]]); the reach set is
    * (src, v, d) pairs, bounded by |V|² worst-case and by the H-hop
    * ball in practice, and settled vertices are never re-expanded or
    * re-shuffled.
    * That quadratic ceiling is inherent to ALL-pairs centrality; at
    * 100 TB one runs it on the (much smaller) entity graph, or pivots
    * to the HyperBall sketch this operator's contract mirrors.
    */
  def harmonicCentrality(edges: DataFrame, maxHops: Int,
                         scale: Long = 840L): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "bounded horizon 1..8")
    val sym = symmetrized(edges)
    val reach = bfsReach(sym,
      sym.select(col("v").as("s"), col("v")).distinct(), maxHops)
    reach.filter(col("d") > 0)
      .groupBy(col("v").as("vertex"))
      .agg(sum(expr(s"$scale div d")).as("harmonic_scaled"),
        count(lit(1)).as("n_reached"))
  }

  /** Bounded-hop MULTI-SOURCE BFS: exact hop distances from each seed
    * vertex, all seeds in ONE frontier frame (landmark technique —
    * Magnien, Latapy & Habib 2009: BFS from a few landmarks brackets
    * eccentricities and the diameter without the all-pairs cost that
    * [[harmonicCentrality]] pays). Undirected: edges are symmetrized
    * and deduplicated here.
    *
    * Scale shape: the frontier (s, v, d) is |seeds| × ball-size — the
    * landmark count is the fan-out cap the all-sources variant lacks.
    * Per hop ([[bfsReach]]): one adjacency equi-join (frontier-only
    * input) + one frontier-sized dedup + one anti-join against the
    * append-only reach; zero driver actions (a per-round
    * empty-frontier early-exit probe was MEASURED SLOWER on the
    * fixture — it serializes rounds for a ball that never saturates
    * inside maxHops; revisit only for maxHops ≫ diameter workloads).
    * Seeds arrive as a DataFrame so landmark choice stays declarative
    * (pushed into the plan).
    *
    * @param seeds one column `v` — the landmark vertices
    * @return (source, vertex, dist) for every vertex within `maxHops`
    *         of a seed (dist 0 = the seed itself)
    */
  def multiSourceBfs(edges: DataFrame, seeds: DataFrame,
                     maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "bounded horizon 1..8")
    val sym = symmetrized(edges)
    bfsReach(sym, seeds.select(col("v").as("s"), col("v")), maxHops)
      .select(col("s").as("source"), col("v").as("vertex"),
        col("d").cast("long").as("dist"))
  }

  /** Symmetrize + dedup an undirected edge list into adjacency
    * (v, n) rows, cached (two branches consume it per BFS hop). */
  private def symmetrized(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    CacheScope.cached(
      und.select(col("a").as("v"), col("b").as("n"))
        .unionAll(und.select(col("b").as("v"), col("a").as("n"))))
  }

  /** Level-synchronous BFS core with an APPEND-ONLY reach set — the
    * shared engine of [[multiSourceBfs]] and [[harmonicCentrality]].
    *
    * Invariant (induction on h): `frontier` holds EXACTLY the (s, v)
    * pairs at distance h-1 — every distance-h vertex is adjacent to
    * one of them, and anything expanded that is already in `reach`
    * has distance < h. So per hop the work is: equi-join the
    * frontier (not the reach) against the adjacency, dedup the
    * frontier-sized expansion, LEFT ANTI against the reach on (s, v),
    * materialize the result as the next frontier, and append it.
    * Settled rows are never re-aggregated or re-written: the reach is
    * a lazy union of per-hop checkpointed frontiers, so the per-hop
    * WRITE is frontier-sized (the anti-join re-reads the reach scan —
    * the unavoidable membership probe).
    *
    * Why an EAGER localCheckpoint per hop instead of lazy persist():
    * measured on q_graph_ecc (sf0.1, warm JVM, local[4]) the three
    * forms cost — lazy-cache re-group (the r14 shape) 21.6 s wall /
    * 97 s CPU; lazy-cache anti-join 39.0 s / 123 s; CHECKPOINTED
    * anti-join 4.2 s / 17 s. The data is tiny (≤4k reach rows) — the
    * lazy forms burn all their CPU re-planning the nested
    * AQE-over-InMemoryRelation chain at every materialization, the
    * same superlinear-analysis pathology the densest-subgraph peel
    * hit at 26 rounds. Eager per-hop actions serialize rounds, but a
    * level-synchronous BFS is inherently round-serial anyway. On a
    * real cluster localCheckpoint trades fault-tolerance for speed
    * (blocks die with an executor); swap in `checkpoint()` against a
    * reliable store for long jobs — the shape is otherwise
    * cluster-ready: per-hop shuffle is frontier-sized, the min-fold
    * re-group form survives only in [[betweennessSampled]] where an
    * on-operator measurement showed it wins (σ must be re-summed).
    *
    * @param sym   cached symmetric adjacency (v, n)
    * @param seeds (s, v) distance-0 rows (duplicates tolerated)
    * @return (s, v, d) — exact hop distance ≤ maxHops per source
    */
  private def bfsReach(sym: DataFrame, seeds: DataFrame,
                       maxHops: Int): DataFrame = {
    var frontier = seeds.select(col("s"), col("v")).distinct()
      .select(col("s"), col("v"), lit(0).as("d"))
      .localCheckpoint(true)
    var reach = frontier
    for (h <- 1 to maxHops) {
      val expanded = frontier
        .join(sym.withColumnRenamed("n", "nx"), "v")
        .select(col("s"), col("nx").as("v"))
      frontier = expanded.distinct()
        .join(reach, Seq("s", "v"), "left_anti")
        .select(col("s"), col("v"), lit(h).as("d"))
        .localCheckpoint(true)
      reach = reach.unionByName(frontier)
    }
    reach
  }

  /** Pivot-sampled bounded-hop BETWEENNESS centrality (Brandes' pair-
    * dependency form with source sampling, Brandes & Pich, 2007 — the
    * standard scalable estimator): centrality of m = Σ over sampled
    * sources s and all targets t of σ_st(m)/σ_st, where σ_st(m) =
    * σ_s(m)·σ_m(t) when d(s,m)+d(m,t) = d(s,t).
    *
    * Exactness discipline: shortest-path COUNTS are integers from the
    * BFS-DAG recurrence (σ at distance h = Σ of neighbor σ at h−1 —
    * one grouped sum per hop, no walk enumeration engine-side); each
    * pair dependency is ONE double division; the per-vertex total
    * folds contributions in (s, t) order so the double sum is
    * bit-identical cross-engine. Pivots are md5-sampled (the kmeans
    * init discipline) — the scalability knob: work is
    * O(|pivots| · reach²), not O(V · reach²).
    *
    * Shuffle ledger: maxHops grouped-sum rounds over (s, v) keys, one
    * equi-join on the mid vertex + one on (s, t), two-level ordered
    * dependency folds. No cartesian anywhere. Cost is dominated by
    * the sampled dependency materialization (|pivots|·reach² pair
    * rows — ~3.4M at sf0.1 with 32 pivots; the most expensive
    * registered graph query at ~9 s, scaling linearly in the pivot
    * knob).
    */
  def betweennessSampled(edges: DataFrame, maxHops: Int,
                         pivots: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "bounded horizon 1..8")
    require(pivots >= 1, "need at least one pivot source")
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sym = CacheScope.cached(
      und.select(col("a").as("v"), col("b").as("n"))
        .unionAll(und.select(col("b").as("v"), col("a").as("n"))))
    val verts = CacheScope.cached(sym.select(col("v")).distinct())
    val pivotSet = CacheScope.cached(
      verts.withColumn("_h", md5(col("v").cast("string")))
        .orderBy(col("_h"), col("v")).limit(pivots)
        .select(col("v").as("s")))
    // multi-source BFS carrying σ: at hop h, a vertex first reached
    // now gets σ = Σ σ of its distance-(h−1) neighbors — walks of
    // minimal length are exactly the shortest paths
    // min-struct re-aggregation per round: measured FASTER than the
    // frontier + anti-join form here (10.5 vs 18.4 s at sf0.1 — the
    // anti-join chain defeats shuffle reuse), and the whole-set
    // re-group is still one shuffle per hop
    var reach = CacheScope.cached(
      verts.select(col("v").as("s"), col("v"), lit(0).as("d"),
        lit(1L).as("sigma")))
    for (h <- 1 to maxHops) {
      val expanded = reach.filter(col("d") === h - 1)
        .join(sym.withColumnRenamed("n", "nx"), "v")
        .groupBy(col("s"), col("nx"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("s"), col("nx").as("v"), lit(h).as("d"),
          col("sigma"))
      reach = roundCut(
        reach.unionByName(expanded)
          .groupBy(col("s"), col("v"))
          .agg(min(struct(col("d"), col("sigma"))).as("ds"))
          .select(col("s"), col("v"), col("ds.d").as("d"),
            col("ds.sigma").as("sigma")))
    }
    val fromPivot = reach.join(pivotSet, "s")
      .filter(col("s") =!= col("v"))
    val pairs = fromPivot.select(col("s"), col("v").as("t"),
      col("d").as("dst"), col("sigma").as("sigst"))
    val mid1 = fromPivot.select(col("s"), col("v").as("m"),
      col("d").as("d1"), col("sigma").as("sig1"))
    val mid2 = reach.filter(col("s") =!= col("v"))
      .select(col("s").as("m"), col("v").as("t"), col("d").as("d2"),
        col("sigma").as("sig2"))
    val contribs = mid1.join(mid2, "m")
      .filter(col("m") =!= col("t"))
      .join(pairs, Seq("s", "t"))
      .filter(col("d1") + col("d2") === col("dst"))
      .select(col("m"), col("s"), col("t"),
        ((col("sig1") * col("sig2")).cast("double") / col("sigst"))
          .as("c"))
    // two-level deterministic fold — (m, s) partials in t order, then
    // per-m in s order: same bit-exact result on both engines, and the
    // sorted arrays stay small (≤ reach size, then ≤ |pivots|) instead
    // of one giant per-vertex list
    val partials = contribs.groupBy(col("m"), col("s"))
      .agg(expr("aggregate(array_sort(collect_list(struct(t, c)))," +
        " 0D, (acc, e) -> acc + e.c)").as("ps"),
        count(lit(1)).as("np"))
    val bet = partials.groupBy(col("m"))
      .agg(expr("aggregate(array_sort(collect_list(struct(s, ps)))," +
        " 0D, (acc, e) -> acc + e.ps)").as("bet"),
        sum(col("np")).as("n_pair_paths"))
    verts.join(bet, verts("v") === bet("m"), "left")
      .select(col("v").as("vertex"),
        round(coalesce(col("bet"), lit(0.0)), 6).as("betweenness_r6"),
        coalesce(col("n_pair_paths"), lit(0L)).as("n_pair_paths"))
  }

  /** Degree-distribution profile: how many vertices have out-degree k —
    * the standard first look at any graph's shape (and the skew check
    * before partitioning a graph workload). Two hash aggregates, both
    * map-side partial.
    */
  def degreeHistogram(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst")).distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("out_degree"))
      .groupBy(col("out_degree")).agg(count(lit(1)).as("n_vertices"))

  /** Triangle count + global clustering coefficient via DEGREE
    * ORIENTATION (Schank & Wagner 2005; the MapReduce form is Suri &
    * Vassilvitskii WWW'11): orient each undirected edge from its
    * lower-degree endpoint (ties by id), enumerate wedges only from
    * each vertex's OUT-edges, and close them against the canonical edge
    * set. Orientation is what makes this scale: out-degree is bounded
    * by O(√m) regardless of hub size, so a celebrity vertex with 10⁸
    * neighbors generates no 10¹⁶-wedge explosion — the wedge count is
    * Σ C(out-deg, 2) ≤ O(m^1.5) total, and each triangle is counted
    * exactly once (from its minimum vertex in the degree order).
    *
    * All joins are equi-joins (wedge source; canonical (a,b) pair);
    * counts are exact BIGINTs; the coefficient divides two exact counts
    * once — bit-identical cross-engine.
    *
    * @param edges undirected edge list (either orientation, duplicates
    *              and self-loops tolerated — canonicalized here).
    * @return one row: n_edges, n_wedges (= Σ C(deg,2), the standard
    *         closed+open wedge count), n_triangles,
    *         global_clustering = 3·triangles / wedges.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = CacheScope.cached(
      edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
    val deg = CacheScope.cached(
      und.select(col("a").as("v"))
        .unionAll(und.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d")))
    val ori = CacheScope.cached(
      und.join(deg.withColumnRenamed("v", "a")
          .withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b")
          .withColumnRenamed("d", "db"), "b")
        .select(
          when(col("da") < col("db")
              || (col("da") === col("db") && col("a") < col("b")),
            col("a")).otherwise(col("b")).as("s"),
          when(col("da") < col("db")
              || (col("da") === col("db") && col("a") < col("b")),
            col("b")).otherwise(col("a")).as("t")))
    val e1 = ori.select(col("s"), col("t").as("x"))
    val e2 = ori.select(col("s"), col("t").as("y"))
    // oriented wedges (Σ C(out-deg, 2), the bounded candidate set) are
    // only the triangle candidates; the clustering denominator is the
    // STANDARD wedge count Σ C(deg, 2) over unoriented degrees
    val wedges = e1.join(e2, "s").filter(col("x") < col("y"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val nTri = wedges
      .join(und, col("x") === col("a") && col("y") === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
    nEdges.crossJoin(broadcast(nWedges)).crossJoin(broadcast(nTri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        (lit(3.0) * col("n_triangles")
          / col("n_wedges").cast("double")).as("global_clustering"))
  }

  /** Per-vertex triangle counts + LOCAL clustering coefficient
    * (Watts–Strogatz 1998): cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)).
    * Same oriented-wedge enumeration as [[triangleStats]]; each closed
    * wedge credits all three corners via a map-side explode, then one
    * hash aggregate per vertex. Exact integer counts; the one division
    * runs identically cross-engine. Degree-1 vertices (no wedge) get
    * cc = 0 by convention.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val und = CacheScope.cached(
      edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct())
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val ori = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"),
        "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"),
        "b")
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("s"),
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("t"))
    val closed = ori.select(col("s"), col("t").as("x"))
      .join(ori.select(col("s"), col("t").as("y")), "s")
      .filter(col("x") < col("y"))
      .join(und, col("x") === col("a") && col("y") === col("b"))
    val triPerV = closed
      .select(explode(array(col("s"), col("x"), col("y"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
    deg.join(triPerV, Seq("v"), "left")
      .select(col("v").as("vertex"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("d") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
            / (col("d") * (col("d") - 1)).cast("double"))
          .as("local_clustering"))
  }

  /** Bounded-round single-source shortest paths by distributed
    * Bellman–Ford relaxation (Bellman 1958; the message-passing form
    * every vertex-centric framework ships): each round relaxes EVERY
    * edge against the tentative distance table via one equi-join on the
    * source endpoint + one min aggregate on the destination. After R
    * rounds the distances are exact over all paths of ≤ R edges — a
    * truncated-horizon contract like [[harmonicCentrality]]'s, and the
    * standard trade on shallow-diameter entity graphs (R ≥ diameter ⇒
    * fully exact). Integer weights make min/+ order-independent, so a
    * SQL twin enumerating ≤R-edge walks replays the result bit-for-bit.
    *
    * Scale shape: R rounds × (dist ⨝ edges shuffled on the vertex key →
    * partial-aggregated min per dst). The shuffle payload is one
    * (vertex, long) pair per relaxed edge; the state is the |V|-bounded
    * distance table — never materialized walks (the oracle's walk
    * enumeration is the CHECK, not the algorithm). Unreached vertices
    * simply never enter the table.
    *
    * @param edges DataFrame[src: Long, dst: Long, w: integral ≥ 0];
    *              directed — symmetrize upstream for undirected graphs.
    */
  def ssspBounded(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "bounded rounds 1..8")
    val e = CacheScope.cached(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w")))
    // seed via range(1)'s id column (0) so `v` is NOT a foldable
    // literal — a literal seed constant-folds the first relaxation
    // join into a nested-loop filter instead of an equi-join
    var dist = e.sparkSession.range(1)
      .select((col("id") + source).as("v"), lit(0L).as("d"))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, dist("v") === e("src"))
        .select(col("dst").as("v"), (col("d") + col("w")).as("d"))
      dist = roundCut(
        dist.unionByName(relaxed)
          .groupBy(col("v")).agg(min(col("d")).as("d")))
    }
    dist.select(col("v").as("vertex"), col("d").as("dist"))
  }

  /** MINIMUM SPANNING FOREST by distributed BORŮVKA (Borůvka 1926;
    * the textbook distributed MST — each round every component selects
    * its minimum outgoing edge, selected edges join the forest,
    * components contract, so the ACTIVE component count at least
    * HALVES per round and ⌈log₂V⌉ rounds suffice). Under the
    * deterministic total edge order (w, a, b) the minimum outgoing
    * edge is unique per component, which makes the selected set
    * acyclic every round and the resulting forest the UNIQUE
    * canonical MSF — both engines (and any fixed-round replay) must
    * produce the identical edge set, so the operator is
    * hash-oracle-checkable even though MST is otherwise
    * tie-ambiguous. Weights pass through UNCAST, so any totally
    * ordered numeric weight works (integer part costs, HDBSCAN's
    * double mutual-reachability d²) — determinism then rests on the
    * weight column itself being cross-engine reproducible.
    *
    * Scale shape, and the r12 constant-factor fix (45 s → seconds on
    * a 3,491-edge graph): the EDGE-side work — (edge ⨝ label) × 2 on
    * the endpoint keys + one min-struct aggregate per component — is
    * always distributed; that is the 100 TB part. The LABEL table is
    * |V|-sized and contracts along one of two paths:
    *
    *  - |E| ≤ `smallEdgeLimit` (default 2²¹): the whole edge set
    *    probe-fits the driver, so the MSF is one Spark-side sort by
    *    the (w, a, b) total order collected into a driver Kruskal —
    *    ONE action, the "collapse tiny contracted graphs in one job"
    *    degenerate case (a 3,491-edge entity graph has no business
    *    paying log-round orchestration).
    *
    *  - |V| ≤ `smallLabelLimit` (default 2²⁰ ≈ 16 MB of pairs): the
    *    label table is a driver map broadcast into the candidate
    *    joins (the standard broadcast-dimension shape — entity graphs
    *    whose edge set is huge but whose vertex set is catalog-sized
    *    are exactly this), the per-component min selection is
    *    COLLECTED (≤ one row per active component, so ≤ |V| rows,
    *    halving every round), and the contraction is a driver
    *    union-find — one action and zero label shuffles per round.
    *
    *  - |V| above the limit: labels stay distributed. The round costs
    *    ONE driver action (the empty-selection stop test, which
    *    doubles as the cache materialization point); the contraction
    *    needs NO action and NO convergence probe, because under a
    *    total edge order the selected (cs → ct) pointer graph is a
    *    FUNCTIONAL graph whose only cycles are 2-cycles (follow a
    *    pointer cycle c₁→c₂→…→cₖ→c₁: eᵢ is outgoing of both cᵢ and
    *    cᵢ₊₁, so e₁ ≥ e₂ ≥ … ≥ e₁ in the total order forces one
    *    shared edge, i.e. k = 2). Rooting each 2-cycle at its smaller
    *    component id turns the selection into a forest of parent
    *    pointers, and pointer doubling reaches every root in
    *    ⌈log₂ c⌉ STATICALLY BUDGETED self-joins (tree depth < c, the
    *    active-component count, bounded a priori by the halving
    *    guarantee n/2^(r−1) — unlike the general-graph
    *    [[Dedup.dedupComponentsConverged]], no per-step checksum is
    *    needed). Each step is localCheckpoint(false)-cut: the
    *    self-join references its input twice, so an uncut logical
    *    plan would double per step.
    *
    * Internal labels are contraction representatives (consistent, not
    * min); the output `tree` ids are restored to min-node-id at the
    * end. The loop budget is ⌈log₂ n⌉ + 2 rounds, sufficient by the
    * halving guarantee; exhausting it without an empty selection is
    * impossible for consistent labels, so the guard `require`s
    * convergence rather than returning a silently incomplete forest
    * (ADVICE r12: a blind fixed budget must fail loudly, never
    * truncate).
    *
    * @param edges DataFrame[a: Long, b: Long, w: numeric] —
    *              undirected, one row per unordered pair (a < b)
    * @param maxRounds optional override of the ⌈log₂ n⌉ + 2 round
    *                  budget (tests only; 0 = derive from n)
    * @param smallLabelLimit max |V| for the driver/broadcast label
    *                        path (tests pass 0 to force the
    *                        distributed path on toy graphs)
    * @param smallEdgeLimit max |E| for the driver Kruskal tier
    *                       (tests pass 0 to force the broadcast-label
    *                       Borůvka path)
    * @return (a, b, w, tree) — forest edges, tree = the min node id of
    *         the containing tree
    */
  def boruvkaForest(edges: DataFrame, maxRounds: Int = 0,
      smallLabelLimit: Long = 1L << 20,
      smallEdgeLimit: Long = 1L << 21): DataFrame = {
    // 2^k ≥ m−1 (the max tree depth on m nodes) ⇔ k = ⌈log₂(m−1)⌉
    def log2ceil(m: Long): Int =
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, m - 1))).toInt
    val e = CacheScope.cached(edges.select(
      col("a").cast("long").as("a"), col("b").cast("long").as("b"),
      col("w")))
    val dir2 = CacheScope.cached(
      e.select(col("a").as("s"), col("b").as("t"), col("w"))
        .unionByName(
          e.select(col("b").as("s"), col("a").as("t"), col("w"))))
    val nodes = dir2.select(col("s").as("node")).distinct()
    val spark = e.sparkSession
    val emptyForest = e.limit(0).withColumn("tree", lit(0L))
      .select(col("a"), col("b"), col("w"), col("tree"))

    // per-round candidate minimum outgoing edges: each directed copy
    // carries its CANONICAL identity (w, a, b) so the per-component
    // min is the same edge from either side; the partner component
    // rides along after the unique (w, a, b) key
    def selectMin(labels: DataFrame): DataFrame = dir2
      .join(labels.select(col("node").as("s"), col("comp").as("cs")), "s")
      .join(labels.select(col("node").as("t"), col("comp").as("ct")), "t")
      .filter(col("cs") =!= col("ct"))
      .select(col("cs"),
        struct(col("w"), least(col("s"), col("t")).as("a"),
          greatest(col("s"), col("t")).as("b"), col("ct")).as("k"))
      .groupBy(col("cs")).agg(min(col("k")).as("k"))
      .select(col("cs"), col("k.a").as("a"), col("k.b").as("b"),
        col("k.w").as("w"), col("k.ct").as("ct"))

    // ---- small-|V| path: driver labels, broadcast joins ------------
    def smallPath(nodeIds: Array[Long]): DataFrame = {
      val n = nodeIds.length.toLong
      val budget = if (maxRounds > 0) maxRounds else log2ceil(n) + 2
      val labelOf = scala.collection.mutable.LongMap.empty[Long]
      nodeIds.foreach(v => labelOf(v) = v)
      val forestRows = scala.collection.mutable.LinkedHashMap
        .empty[(Long, Long), org.apache.spark.sql.Row]
      var done = false
      var rounds = 0
      val labelSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("comp",
          org.apache.spark.sql.types.LongType, nullable = false)))
      while (!done && rounds < budget) {
        val labelRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
        labelOf.foreach { case (v, c) => labelRows.add(
          org.apache.spark.sql.Row(v, c)) }
        val labels = broadcast(spark.createDataFrame(labelRows, labelSchema))
        val sel = selectMin(labels).collect() // the round's ONE action
        if (sel.isEmpty) done = true
        else {
          // driver union-find contraction, min-id representative
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != c) {
              val nx = parent(c); parent(c) = r; c = nx
            }
            r
          }
          sel.foreach { row =>
            forestRows.getOrElseUpdate(
              (row.getLong(1), row.getLong(2)),
              org.apache.spark.sql.Row(row.get(1), row.get(2), row.get(3)))
            val (ra, rb) = (find(row.getLong(0)), find(row.getLong(4)))
            if (ra != rb) {
              if (ra < rb) parent(rb) = ra else parent(ra) = rb
            }
          }
          labelOf.keys.foreach(v => labelOf(v) = find(labelOf(v)))
          rounds += 1
        }
      }
      require(done,
        s"boruvkaForest: selection not empty after $rounds rounds " +
          s"(budget $budget, n=$n) — inconsistent labels, refusing to " +
          "return a truncated forest")
      if (forestRows.isEmpty) return emptyForest
      // tree = min node id of the final component
      val minOfComp = scala.collection.mutable.LongMap.empty[Long]
      labelOf.foreach { case (v, c) =>
        minOfComp(c) = math.min(minOfComp.getOrElse(c, v), v) }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      forestRows.valuesIterator.foreach { r =>
        rows.add(org.apache.spark.sql.Row(
          r.get(0), r.get(1), r.get(2), minOfComp(labelOf(r.getLong(0)))))
      }
      val schema = org.apache.spark.sql.types.StructType(
        e.schema.fields :+ org.apache.spark.sql.types.StructField(
          "tree", org.apache.spark.sql.types.LongType, nullable = false))
      spark.createDataFrame(rows, schema)
    }

    // ---- large-|V| path: distributed labels + pointer doubling -----
    def largePath(n: Long): DataFrame = {
      val budget = if (maxRounds > 0) maxRounds else log2ceil(n) + 2
      var labels = CacheScope.cached(
        nodes.select(col("node"), col("node").as("comp")))
      var forest = spark.emptyDataFrame
      var haveForest = false
      var done = n == 0
      var rounds = 0
      var compUB = math.max(n, 1L) // active comps in round r ≤ n/2^(r−1)
      while (!done && rounds < budget) {
        val sel = CacheScope.cached(selectMin(labels))
        if (sel.isEmpty) done = true // the round's ONE action
        else {
          val selEdges =
            sel.select(col("a"), col("b"), col("w")).distinct()
          forest =
            if (haveForest) CacheScope.cached(forest.unionByName(selEdges))
            else { haveForest = true; CacheScope.cached(selEdges) }
          // contract: parent = chosen partner, except the smaller side
          // of a mutual pair roots itself (the only cycles are
          // 2-cycles — see the scaladoc lemma — so this is a forest)
          var pt = sel.as("s1")
            .join(sel.select(col("cs").as("pc"), col("ct").as("back"))
              .as("s2"), col("s1.ct") === col("pc"), "left")
            .select(col("s1.cs").as("node"),
              when(col("back") === col("s1.cs") &&
                col("s1.cs") < col("s1.ct"), col("s1.cs"))
                .otherwise(col("s1.ct")).as("p"))
          // pointer doubling to the root: depth < active comps ≤
          // compUB, so ⌈log₂ compUB⌉ self-joins PROVABLY saturate —
          // zero actions; localCheckpoint(false) per step because the
          // self-join references pt twice (uncut, the plan would
          // double per step)
          for (_ <- 1 to log2ceil(compUB))
            pt = pt.join(
              pt.select(col("node").as("__j"), col("p").as("__pp")),
              col("p") === col("__j"))
              .select(col("node"), col("__pp").as("p"))
              .localCheckpoint(false)
          labels = CacheScope.cached(labels
            .join(pt.select(col("node").as("comp"), col("p").as("nc")),
              Seq("comp"), "left")
            .select(col("node"),
              coalesce(col("nc"), col("comp")).as("comp")))
          compUB = (compUB + 1) / 2
          rounds += 1
        }
      }
      require(done,
        s"boruvkaForest: selection not empty after $rounds rounds " +
          s"(budget $budget, n=$n) — inconsistent labels, refusing to " +
          "return a truncated forest")
      if (!haveForest) return emptyForest
      // restore min-node-id tree labels (internal labels are roots)
      val treeIds = labels.groupBy(col("comp"))
        .agg(min(col("node")).as("tree"))
      forest
        .join(labels.select(col("node").as("a"), col("comp")), "a")
        .join(treeIds, "comp")
        .select(col("a"), col("b"), col("w"), col("tree"))
    }

    // ---- tiny-|E| path: the whole edge set fits the driver --------
    // the sort (Kruskal's only superlinear step) stays in Spark; the
    // driver walks the sorted edges once with a union-find. Under the
    // same (w, a, b) total order this is the identical canonical MSF
    // (GraphSpec asserts Kruskal-replay equality for all paths).
    def kruskalPath(nodeIds: Array[Long]): DataFrame = {
      val sorted = e.orderBy(col("w"), col("a"), col("b")).collect()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nx = parent(c); parent(c) = r; c = nx
        }
        r
      }
      val kept = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      sorted.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
          kept += r
        }
      }
      if (kept.isEmpty) return emptyForest
      val minOfComp = scala.collection.mutable.LongMap.empty[Long]
      nodeIds.foreach { v =>
        val c = find(v)
        minOfComp(c) = math.min(minOfComp.getOrElse(c, v), v)
      }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      kept.foreach { r =>
        rows.add(org.apache.spark.sql.Row(
          r.get(0), r.get(1), r.get(2), minOfComp(find(r.getLong(0)))))
      }
      val schema = org.apache.spark.sql.types.StructType(
        e.schema.fields :+ org.apache.spark.sql.types.StructField(
          "tree", org.apache.spark.sql.types.LongType, nullable = false))
      spark.createDataFrame(rows, schema)
    }

    if (smallLabelLimit <= 0) largePath(nodes.count())
    else {
      // bounded probes decide the tier: limit+1 collects fit the
      // driver iff the vertex (then edge) set is under its limit, so
      // a misestimated input can never trip an unbounded collect
      val probe = nodes.limit((smallLabelLimit + 1).toInt)
        .collect().map(_.getLong(0))
      if (probe.length > smallLabelLimit) largePath(nodes.count())
      else if (smallEdgeLimit > 0 &&
          e.limit((smallEdgeLimit + 1).toInt).count() <= smallEdgeLimit)
        kruskalPath(probe)
      else smallPath(probe)
    }
  }
  /** DETERMINISTIC RANDOM-WALK CORPUS (DeepWalk — Perozzi, Al-Rfou &
    * Skiena, KDD 2014; the sequence-generation front end of
    * DeepWalk/node2vec graph embeddings): `walksPerSeed` walks of
    * `walkLen` steps from every seed vertex over the symmetrized
    * graph. Step s of walk (seed, w) moves from the current vertex to
    * its neighbor at index conv(md5("seed:w:s")[0..14], 16) mod
    * degree — the md5 determinism family (the kmeans-init /
    * hyperplane discipline), so the "random" walks are
    * bit-reproducible, partition-invariant, and ORACLE-replayable.
    *
    * Scale shape: the neighbor table is ranked ONCE (per-vertex
    * row-number window — one shuffle, partition key = vertex); each
    * step is one equi-join of the walk frame against (vertex, rank) +
    * one against the degree table — `walkLen` bounded joins total,
    * and the walk frame stays |seeds|·walksPerSeed rows, so corpus
    * cost is workload-sized, never O(V·E). No neighborhood is ever
    * collected: the md5 index SELECTS a neighbor relationally. Dead
    * ends cannot occur (symmetrized graph ⇒ every reached vertex has
    * degree ≥ 1); seeds absent from the graph drop at the first
    * degree join (documented inner-join semantics).
    *
    * @param seeds one column `v` — walk start vertices (declarative)
    * @return (seed, walk, last_vertex, path) — path is ">"-joined
    */
  def randomWalks(edges: DataFrame, seeds: DataFrame,
                  walksPerSeed: Int, walkLen: Int): DataFrame = {
    require(walkLen >= 1 && walkLen <= 8, "bounded walk length 1..8")
    require(walksPerSeed >= 1 && walksPerSeed <= 16,
      "bounded walks per seed 1..16")
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sym = CacheScope.cached(
      und.select(col("a").as("v"), col("b").as("n"))
        .unionAll(und.select(col("b").as("v"), col("a").as("n"))))
    val deg = CacheScope.cached(
      sym.groupBy($"v").agg(count(lit(1)).as("deg")))
    val nbr = CacheScope.cached(sym.withColumn("rk",
      (row_number().over(Window.partitionBy($"v").orderBy($"n")) - 1)
        .cast("long")))
    var cur = seeds.select($"v".as("seed"))
      .crossJoin(broadcast((0 until walksPerSeed).toDF("w")))
      .select($"seed", $"w", $"seed".as("cur"),
        $"seed".cast("string").as("path"))
    for (s <- 1 to walkLen) {
      cur = cur
        .join(deg.select($"v".as("cur"), $"deg"), Seq("cur"))
        .withColumn("idx", expr(
          s"cast(conv(substring(md5(concat(seed, ':', w, ':', $s))," +
            s" 1, 15), 16, 10) as bigint) % deg"))
        .join(nbr.select($"v".as("cur"), $"rk".as("idx"), $"n"),
          Seq("cur", "idx"))
        .select($"seed", $"w", $"n".as("cur"),
          concat($"path", lit(">"), $"n".cast("string")).as("path"))
    }
    cur.select($"seed", $"w".cast("long").as("walk"),
      $"cur".as("last_vertex"), $"path")
  }
  /** DENSEST SUBGRAPH by (1+ε)-batched greedy peeling (Bahmani, Kumar
    * & Vassilvitskii, VLDB 2012 — THE MapReduce-era graph algorithm:
    * Charikar's 2-approx greedy peel needs |V| sequential rounds;
    * batching every vertex below 2(1+ε)·density into one removal
    * keeps the 2(1+ε) guarantee in ⌈log_{1+ε} |V|⌉ rounds). ε = ½
    * here: remove every v with deg(v)·|V| ≤ 3·|E| (the exact integer
    * cross-multiplication of deg ≤ 3·ρ), so each round removes ≥ ⅓ of
    * the remaining vertices and the density of the best VISITED state
    * is ≥ ρ* / 3.
    *
    * Round discipline: ONE degree aggregate per round (|V| = its row
    * count, |E| = Σd/2 — no separate distinct/count passes), its
    * one-row stats collected to drive the loop and the keep rule as
    * MAP-SIDE literals (O(log n) bounded driver actions total — the
    * selection-probe exception class); each round's survivor edge
    * list is localCheckpoint-ed (the dedupComponents lineage-cut
    * precedent — a 26-deep lazy unroll sends Catalyst analysis
    * superlinear). localCheckpoint is the LOCAL-MODE choice: its
    * blocks die with an executor, so a long-running cluster job
    * should swap in `checkpoint()` against a reliable store (lineage
    * is already cut, so recovery cost is the checkpoint re-read, not
    * a replay). `rounds` is the unroll CEILING the oracle mirrors;
    * the loop exits at the first empty graph. Output: one row per
    * non-empty round (vertex/edge counts, exact floor-ppm density)
    * with `is_best` marking the densest visited state (floor-ppm,
    * earliest round on ties — deterministic, twin-replayable).
    *
    * Scale shape per round: one degree aggregate over the edge list +
    * two semi-join filters keyed by vertex; edges only ever shrink.
    * At 100 TB: O(log n) rounds of linear work — exactly the paper's
    * point.
    */
  def densestSubgraph(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 40, "bounded peel rounds 1..40")
    import org.apache.spark.sql.expressions.Window
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    var cur = und.localCheckpoint()
    val trace = Seq.newBuilder[(Int, Long, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val deg = CacheScope.cached(cur.select(col("a").as("v"))
        .unionAll(cur.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d")))
      val row = deg
        .agg(count(lit(1)).as("nv"), sum(col("d")).as("sd"))
        .collect()(0)
      val nv = row.getLong(0)
      if (nv == 0) done = true
      else {
        val ne = row.getLong(1) / 2
        trace += ((r, nv, ne))
        val keep = deg
          .filter(col("d") * lit(nv) > lit(3L) * lit(ne))
          .select(col("v"))
        cur = cur
          .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint()
        r += 1
      }
    }
    val spark = edges.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col("density_ppm").desc, col("round").asc)
    trace.result().toDF("round", "nv", "ne")
      .select(col("round"), col("nv"), col("ne"),
        expr("ne * 1000000 div nv").as("density_ppm"))
      .withColumn("is_best", row_number().over(w) === 1)
      .orderBy(col("round"))
  }

  /** HYPERBALL (Boldi, Rosa & Vigna, 2011 — "HyperANF: approximating
    * the neighbourhood function of very large graphs"): the
    * NEIGHBOURHOOD FUNCTION N(t) = Σ_v |ball(v, t)| estimated with one
    * m = 16-register HyperLogLog counter per vertex — THE published
    * way to get distance distributions / effective diameter on graphs
    * where the all-pairs BFS behind [[harmonicCentrality]] is
    * unaffordable (and exactly the sketch that method's scaladoc
    * points to as its 100 TB fallback). Per hop, counter(v) absorbs
    * its neighbours' counters; HLL union is ELEMENT-WISE MAX, so the
    * whole update is relational: registers live as SPARSE (v, j, r)
    * rows (absent register = 0) and one hop is
    * union ∪ (adjacency ⨝ registers) → groupBy(v, j).max(r) —
    * the pagerank cost class ×m, eager roundCut per hop.
    *
    * Determinism (no RNG anywhere): register index and rank derive
    * from md5(vertex) STRING ops shared verbatim with the DuckDB twin
    * (the q_graph_walks convention) — j = hex digit 31, and
    * ρ = 4·(leading '0' hex chars of digits 1..10) + nibble-internal
    * zeros of the first non-zero digit + 1, capped at 41 by width.
    * The HLL sum Σ 2^{−r_j} is carried as the exact BIGINT
    * S = Σ 2^{41−r_j} (empty registers contribute 2^41; max 16·2^41 —
    * no overflow), so the raw estimate α₁₆·m²·2^41 / S is ONE double
    * division; the standard small-range branch (raw ≤ 2.5m with empty
    * registers → linear counting m·ln(m/zeros)) uses the same ln in
    * both engines. Per-hop totals N̂(t) fold the per-vertex estimates
    * in vertex order (sort_array + aggregate — the q_time_holt
    * discipline), so the final doubles are bit-replayable; that fold
    * collects |V| estimates into one row per hop — fine for the
    * profiled graphs this query class targets, and at 100 TB the
    * total becomes a two-level ordered fold (the betweenness
    * pattern) without touching the sketch itself.
    *
    * @return one row per hop 0..maxHops: (hop, nf_est_r6 — the
    *         estimated #pairs within the hop, avg_ball_r6, and
    *         reach_ratio_r6 = N̂(t)/N̂(maxHops) whose first crossing
    *         of 0.9 is the effective-diameter read-off)
    */
  def hyperBall(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "bounded horizon 1..8")
    val sym = symmetrized(edges)
    val verts = sym.select(col("v")).distinct()
      .withColumn("hex", md5(col("v").cast("string")))
    // ρ from hex digits 1..10 (40 bits), j from digit 31 — string ops
    // only, so the twin replays them without any numeric hex parse
    val z = length(regexp_extract(substring(col("hex"), 1, 10),
      "^0*", 0))
    // the first non-zero digit sits at position z+1 within the window;
    // its value d (1..15) contributes 3/2/1/0 extra zero bits for
    // d = 1 / {2,3} / {4..7} / {8..15}
    val firstNz = expr(
      "instr('0123456789abcdef', substring(substring(hex, 1, 10), " +
        "cast(length(regexp_extract(substring(hex, 1, 10), '^0*', 0)) " +
        "as int) + 1, 1)) - 1")
    val rho = when(z === 10, lit(41))
      .otherwise(z * 4 + when(firstNz >= 8, 0).when(firstNz >= 4, 1)
        .when(firstNz >= 2, 2).otherwise(3) + 1)
    var regs = verts.select(col("v"),
        expr("instr('0123456789abcdef', substring(hex, 31, 1)) - 1")
          .cast("int").as("j"),
        rho.cast("int").as("r"))
      .localCheckpoint(true)
    def estimates(r: DataFrame): DataFrame =
      r.groupBy(col("v"))
        .agg(count(lit(1)).as("cnt"),
          sum(expr("cast(1 as bigint) << (41 - r)")).as("sp"))
        .select(col("v"), (col("sp")
            + (lit(16L) - col("cnt")) * expr("cast(1 as bigint) << 41"))
          .as("s"), (lit(16L) - col("cnt")).as("zeros"))
        .select(col("v"),
          // α₁₆·m²·2^41 / S; small-range: m·ln(m/zeros)
          when(lit(0.673 * 256.0 * 2199023255552.0).cast("double")
              / col("s").cast("double") <= lit(40.0)
              && col("zeros") > 0,
            lit(16.0) * log(lit(16.0)
              / col("zeros").cast("double")))
            .otherwise(lit(0.673 * 256.0 * 2199023255552.0)
              .cast("double") / col("s").cast("double")).as("est"))
    def nfRow(hop: Int, r: DataFrame): DataFrame =
      estimates(r).agg(
        expr("sort_array(collect_list(struct(v, est)))").as("arr"))
        .select(lit(hop).as("hop"),
          expr("aggregate(arr, 0D, (a, x) -> a + x.est)").as("nf"),
          expr("cast(size(arr) as bigint)").as("n_verts"))
    val rows = Seq.newBuilder[DataFrame]
    rows += nfRow(0, regs)
    for (h <- 1 to maxHops) {
      val absorbed = sym.withColumnRenamed("n", "nv")
        .join(regs.withColumnRenamed("v", "nv"), "nv")
        .select(col("v"), col("j"), col("r"))
      regs = regs.unionByName(absorbed)
        .groupBy(col("v"), col("j")).agg(max(col("r")).as("r"))
        .localCheckpoint(true)
      rows += nfRow(h, regs)
    }
    val all = rows.result().reduce(_.unionByName(_))
    val tot = all.filter(col("hop") === maxHops)
      .select(col("nf").as("nf_max"))
    all.crossJoin(broadcast(tot))
      .select(col("hop").cast("long").as("hop"),
        round(col("nf"), 6).as("nf_est_r6"),
        round(col("nf") / col("n_verts").cast("double"), 6)
          .as("avg_ball_r6"),
        round(col("nf") / col("nf_max"), 6).as("reach_ratio_r6"))
      .orderBy(col("hop"))
  }

  /** HYPERANF HARMONIC-CENTRALITY ESTIMATES (Boldi, Rosa & Vigna
    * 2011, §5): from the same per-vertex HyperBall counters as
    * [[hyperBall]], the harmonic score of v is estimated as
    * ĥ(v) = Σ_{t=1..H} (|b̂all(v,t)| − |b̂all(v,t−1)|)/t — the ball
    * DELTAS are the estimated count of vertices first reached at
    * distance t. This is the sketch twin of [[harmonicCentrality]]:
    * the exact operator pays an all-pairs BFS (|V|·ball reach rows);
    * this one pays m = 16 registers per vertex per hop and reads the
    * centrality off six subtractions — the form that survives 100 TB.
    *
    * Registers grow monotonically, so ball estimates are monotone in
    * t within an estimator branch; the raw↔linear-counting branch
    * switch can dip slightly, so each delta floors at 0 — the SAME
    * greatest(0, ·) in both engines keeps the twin bit-exact. The
    * per-vertex sum is a FIXED six-term left-associated double
    * expression (no data-dependent fold), deterministic by shape.
    *
    * @return (vertex, ball0..ballH implicit) as
    *         (vertex, reached_est_r6 = b̂all(H) − 1 self-excluded,
    *         harmonic_est_r6)
    */
  def hyperHarmonic(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "bounded horizon 1..8")
    val sym = symmetrized(edges)
    val verts = sym.select(col("v")).distinct()
      .withColumn("hex", md5(col("v").cast("string")))
    val z = length(regexp_extract(substring(col("hex"), 1, 10),
      "^0*", 0))
    val firstNz = expr(
      "instr('0123456789abcdef', substring(substring(hex, 1, 10), " +
        "cast(length(regexp_extract(substring(hex, 1, 10), '^0*', 0)) " +
        "as int) + 1, 1)) - 1")
    val rho = when(z === 10, lit(41))
      .otherwise(z * 4 + when(firstNz >= 8, 0).when(firstNz >= 4, 1)
        .when(firstNz >= 2, 2).otherwise(3) + 1)
    var regs = verts.select(col("v"),
        expr("instr('0123456789abcdef', substring(hex, 31, 1)) - 1")
          .cast("int").as("j"),
        rho.cast("int").as("r"))
      .localCheckpoint(true)
    def estimates(hop: Int, r: DataFrame): DataFrame =
      r.groupBy(col("v"))
        .agg(count(lit(1)).as("cnt"),
          sum(expr("cast(1 as bigint) << (41 - r)")).as("sp"))
        .select(col("v"), (col("sp")
            + (lit(16L) - col("cnt")) * expr("cast(1 as bigint) << 41"))
          .as("s"), (lit(16L) - col("cnt")).as("zeros"))
        .select(lit(hop).as("hop"), col("v"),
          when(lit(0.673 * 256.0 * 2199023255552.0).cast("double")
              / col("s").cast("double") <= lit(40.0)
              && col("zeros") > 0,
            lit(16.0) * log(lit(16.0)
              / col("zeros").cast("double")))
            .otherwise(lit(0.673 * 256.0 * 2199023255552.0)
              .cast("double") / col("s").cast("double")).as("est"))
    val perHop = Seq.newBuilder[DataFrame]
    perHop += estimates(0, regs)
    for (h <- 1 to maxHops) {
      val absorbed = sym.withColumnRenamed("n", "nv")
        .join(regs.withColumnRenamed("v", "nv"), "nv")
        .select(col("v"), col("j"), col("r"))
      regs = regs.unionByName(absorbed)
        .groupBy(col("v"), col("j")).agg(max(col("r")).as("r"))
        .localCheckpoint(true)
      perHop += estimates(h, regs)
    }
    val pivotCols = (0 to maxHops).map(t =>
      max(when(col("hop") === t, col("est"))).as(s"b$t"))
    val wide = perHop.result().reduce(_.unionByName(_))
      .groupBy(col("v"))
      .agg(pivotCols.head, pivotCols.tail: _*)
    val harmonic = (1 to maxHops).map(t =>
        greatest(lit(0.0), col(s"b$t") - col(s"b${t - 1}"))
          / lit(t.toDouble))
      .reduce(_ + _)
    wide.select(col("v").as("vertex"),
        round(col(s"b$maxHops") - lit(1.0), 6).as("reached_est_r6"),
        round(harmonic, 6).as("harmonic_est_r6"))
      .orderBy(col("vertex"))
  }
}
