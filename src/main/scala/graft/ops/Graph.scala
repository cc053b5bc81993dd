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
      val persisted = CacheScope.cached(next)
      ranks = persisted
    }
    ranks.select(col("v").as("vertex"), col("pr").as("rank_scaled"))
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
}
