package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Graph

/** Graph analytics over the supplier→customer shipment graph: an edge
  * (s → c) exists when supplier s shipped a line of one of customer c's
  * orders. Customer ids are offset by 10⁶ to keep the two id spaces
  * disjoint in one vertex universe.
  *
  * The oracle twins replay [[graft.ops.Graph.pagerank]]'s integer
  * arithmetic round by round in SQL — possible precisely because the
  * operator is defined over order-independent BIGINT floor divisions
  * (see the Graph scaladoc).
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Run-wide memo of the supplier→customer shipment edge list WITH
    * the per-line quantity (r16, guide §2.4 "do fewer passes"): six
    * graph queries built this same lineitem ⋈ orders projection
    * independently, each paying the 600k-row join again. Under the
    * harness's scratch root the build writes ONCE to a parquet sidecar
    * and every consumer reads a flat 3-column scan — the identical
    * accounting as the dedup-signature memo (the first graph query in
    * run order pays the build; Bench emits the graph family sum).
    * Deterministic pure function of the fixture dir.
    */
  private def shipmentBase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.CacheScope.memoizedDisk(s"graph:shipbase:$dir") {
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .select($"l_suppkey".as("src"),
          ($"o_custkey" + 1000000L).as("dst"),
          $"l_quantity".cast("long").as("weight"))
    }
  }

  private def shipmentEdges(spark: SparkSession, dir: String): DataFrame =
    shipmentBase(spark, dir).select(col("src"), col("dst"))

  /** Run-wide memo of the sparse co-supply WEDGE table (supplier pairs
    * sharing a single-unit part, shared part retained): FIFTEEN graph
    * queries inlined this same scan→filter→distinct→self-join chain.
    * Same memo discipline as [[shipmentBase]]. Consumers project
    * (src, dst); the link-prediction and weighted variants derive
    * their shapes from the same wedge rows.
    */
  private def coSupplyWedge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.CacheScope.memoizedDisk(s"graph:cosupply:$dir") {
      val ps = Tables.lineitem(spark, dir)
        .filter($"l_quantity" === 1.0)
        .select($"l_partkey".as("p"), $"l_suppkey".as("s")).distinct()
      ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.s") < col("y.s"))
        .select(col("x.s").as("src"), col("y.s").as("dst"),
          col("x.p").as("p"))
    }
  }

  private def coSupplyEdges(spark: SparkSession, dir: String): DataFrame =
    coSupplyWedge(spark, dir).select(col("src"), col("dst"))

  /** 3-round integer PageRank over the shipment graph, full ranking. */
  def qGraphPagerank(spark: SparkSession, dir: String): DataFrame =
    Graph.pagerank(shipmentEdges(spark, dir), iters = 3)
      .orderBy(desc("rank_scaled"), asc("vertex"))

  /** Out-degree distribution of the shipment graph. */
  def qGraphDegree(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeHistogram(shipmentEdges(spark, dir))
      .orderBy(col("out_degree"))

  /** Triangle census of the CO-SUPPLY graph (suppliers linked when they
    * supply the same part — the shipment graph itself is bipartite and
    * trivially triangle-free). Restricted to single-unit lines: the
    * unrestricted graph is COMPLETE at sf0.1 (every supplier pair
    * shares some part — C(1000,2) edges, 1.66e8 triangles), which
    * demonstrates nothing but brute force; the restriction yields a
    * sparse graph whose census actually exercises orientation.
    */
  def qGraphTriangles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.triangleStats(edges)
  }

  /** Local clustering coefficients on the sparse co-supply graph. */
  def qGraphLocalCc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.localClustering(edges).orderBy(col("vertex"))
  }

  /** Personalized PageRank from suppliers {1, 2}: proximity of every
    * vertex to those two suppliers' shipping neighborhoods. */
  def qGraphPpr(spark: SparkSession, dir: String): DataFrame =
    Graph.personalizedPagerank(shipmentEdges(spark, dir),
        seeds = Seq(1L, 2L), iters = 3)
      .filter(col("rank_scaled") > 0)
      .orderBy(desc("rank_scaled"), asc("vertex"))

  /** 2-round synchronous label-propagation communities on the sparse
    * co-supply graph (same fixture as the triangle census). */
  def qGraphLabelProp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.labelPropagation(edges, iters = 2).orderBy(col("vertex"))
  }

  /** 2-round weighted PageRank: shipment edges carry total shipped
    * quantity, so rank follows volume, not mere connectivity. */
  def qGraphPagerankWeighted(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val edges = shipmentBase(spark, dir)
    Graph.pagerankWeighted(edges, iters = 2)
      .orderBy(desc("rank_scaled"), asc("vertex"))
  }

  /** 3-peel 3-core of the sparse co-supply graph. */
  def qGraphKcore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.kCore(edges, k = 3, peels = 3).orderBy(col("vertex"))
  }

  /** 3-peel 4-truss of the sparse co-supply graph: every surviving
    * edge sits in ≥ 2 triangles of the surviving subgraph — the
    * cohesive-core cut one notch tighter than q_graph_kcore. At sf0.01
    * the peel converges in 3 rounds (344 → 77 → 55 → 55 edges;
    * idempotence spec-pinned in GraphSpec). */
  def qGraphKtruss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.kTruss(edges, k = 4, peels = 3)
      .orderBy(col("src"), col("dst"))
  }

  /** LINK PREDICTION scores (Liben-Nowell & Kleinberg 2003) on the
    * sparse co-supply graph: for every NON-adjacent pair with ≥ 2
    * common neighbors — common-neighbor count, neighborhood Jaccard,
    * and Adamic–Adar Σ 1/ln(deg z) (rare shared neighbors weigh more;
    * every common neighbor has deg ≥ 2 by construction, so ln never
    * hits zero). ln is the one libm call — rounded to 6 dp, the
    * engine-parity convention BM25/DSIR established.
    *
    * Shape: candidate pairs come from the wedge join (z's adjacency
    * list squared — the triangle-count cost class, bounded by the
    * df-style degree distribution), then one anti-join removes
    * existing edges; never a vertex×vertex product.
    */
  def qGraphLinkPred(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = coSupplyWedge(spark, dir)
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    val sym = raw.select($"a".as("v"), $"b".as("n"))
      .unionAll(raw.select($"b".as("v"), $"a".as("n")))
    val deg = sym.groupBy($"v").agg(count(lit(1)).as("d"))
    val wedges = sym.select($"v".as("z"), $"n".as("pa")).as("l")
      .join(sym.select($"v".as("z"), $"n".as("pb")).as("r"), "z")
      .filter($"pa" < $"pb")
    val scored = wedges
      .join(deg.select($"v".as("z"), $"d".as("dz")), "z")
      .groupBy($"pa", $"pb")
      .agg(count(lit(1)).as("cn"),
        sum(lit(1.0) / log($"dz".cast("double"))).as("aa"))
      .filter($"cn" >= 2)
    scored
      .join(raw, $"pa" === $"a" && $"pb" === $"b", "left_anti")
      .join(deg.select($"v".as("pa"), $"d".as("da")), "pa")
      .join(deg.select($"v".as("pb"), $"d".as("db")), "pb")
      .select($"pa".as("a"), $"pb".as("b"), $"cn",
        round($"cn".cast("double") / ($"da" + $"db" - $"cn"), 6)
          .as("jaccard_r6"),
        round($"aa", 6).as("aa_r6"))
      .orderBy($"a", $"b")
  }

  /** 3-hop harmonic centrality on the sparse co-supply graph. */
  def qGraphHarmonic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.harmonicCentrality(edges, maxHops = 3)
      .orderBy(desc("harmonic_scaled"), asc("vertex"))
  }

  /** Pivot-sampled bounded-hop betweenness on the co-supply graph
    * (same sparse graph as harmonic centrality): Brandes
    * pair-dependencies from 32 md5-sampled sources, hop bound 3,
    * integer shortest-path counts, (s, t)-ordered dependency folds.
    */
  def qGraphBetweenness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.betweennessSampled(edges, maxHops = 3, pivots = 32)
      .orderBy(desc("betweenness_r6"), asc("vertex"))
  }

  /** 4-round weighted single-source shortest paths from supplier 1 over
    * the sparse co-supply graph (symmetrized; edge weight = min over
    * shared parts of p mod 97 + 1 — a deterministic positive integer
    * cost). Bellman–Ford relaxation rounds, exact over ≤4-edge paths;
    * the DuckDB twin enumerates every ≤4-edge walk and takes the min —
    * feasible only because the oracle graph is small, which is exactly
    * the point: the engine's relaxation form is the one that scales.
    */
  def qGraphSssp(spark: SparkSession, dir: String): DataFrame = {
    val und = supplierGraph(spark, dir)
    val edges = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst"),
        col("w")))
    Graph.ssspBounded(edges, source = 1L, rounds = 4)
      .orderBy(col("dist"), col("vertex"))
  }

  /** The weighted undirected supplier co-part graph shared by
    * [[qGraphSssp]] and [[qGraphMst]]: suppliers of the same
    * quantity-1 part are adjacent, w = min(partkey % 97 + 1). */
  private def supplierGraph(spark: SparkSession, dir: String)
      : DataFrame =
    coSupplyWedge(spark, dir)
      .groupBy(col("src").as("a"), col("dst").as("b"))
      .agg(min(col("p") % 97 + 1).as("w"))

  /** MINIMUM SPANNING FOREST of the supplier co-part graph by
    * distributed Borůvka ([[graft.ops.Graph.boruvkaForest]]) — the
    * maintenance query behind cheapest-backbone problems (replication
    * topology, dedup-cluster spanning structure, HDBSCAN's
    * mutual-reachability MST). Under the (w, a, b) total edge order
    * the forest is UNIQUE, so the twin — the same Borůvka recursion
    * unrolled as fixed-round SQL with a recursive-CTE closure per
    * round — must reproduce the edge set row-for-row. The engine stops
    * at the first round selecting no outgoing edge; the unrolled twin
    * over-runs to a fixed 12 rounds, which is identical by idempotence
    * (an empty selection leaves forest and labels unchanged) and
    * covers V ≤ 4096 components by the halving guarantee. */
  def qGraphMst(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.boruvkaForest(supplierGraph(spark, dir))
      .orderBy(col("a"), col("b"))

  /** INCREMENTAL MSF MAINTENANCE — fold an ARRIVAL BATCH of edges
    * into an already-built forest without touching the full edge set:
    * MSF(MSF(old) ∪ delta) = MSF(old ∪ delta), the standard
    * sparsification identity (Eppstein et al., J. ACM 1997 §3 —
    * under the distinct-weight total order (w, a, b), any edge of
    * MSF(old ∪ delta) lying in `old` is non-maximal on every cycle of
    * the smaller graph too, so it survives into MSF(old); the second
    * pass therefore sees a superset of the answer). Incremental cost:
    * O(|V| + |batch|) edges through one Borůvka run, vs |E| from
    * scratch — the q_graph_cc_incremental / q_dedup_incremental
    * arrival-batch discipline applied to spanning structure.
    *
    * The batch here is the deterministic (a + b) % 7 = 0 slice of the
    * supplier co-part graph; the oracle is the SAME full-graph MST
    * twin as q_graph_mst — equality with the from-scratch answer IS
    * the correctness claim.
    */
  def qGraphMstIncremental(spark: SparkSession, dir: String)
      : DataFrame = {
    val und = graft.ops.CacheScope.cached(supplierGraph(spark, dir))
    val isDelta = (col("a") + col("b")) % 7 === 0
    val oldMsf = graft.ops.Graph.boruvkaForest(und.filter(!isDelta))
      .select(col("a"), col("b"), col("w"))
    graft.ops.Graph.boruvkaForest(
      oldMsf.unionByName(und.filter(isDelta)))
      .orderBy(col("a"), col("b"))
  }

  /** INCREMENTAL CONNECTED-COMPONENTS MAINTENANCE — the arrival-batch
    * update of the near-dup cluster table, done WITHOUT re-running CC
    * over the corpus graph: (1) the accepted corpus's label table is
    * the run-wide <250-doc components memo (built once, shared with
    * q_dedup_components/keep_best/takedown); (2) the arrival batch
    * (docs 250–349) contributes only DELTA pairs — at least one new
    * endpoint, old×old never recomputed
    * ([[graft.ops.Dedup.ngramJaccardPairsDelta]]); (3) delta edges
    * CONTRACT through the old labels (edge (u,v) → (L(u), L(v))), so
    * CC re-runs only on the reduced graph whose nodes are touched old
    * components + new docs; (4) old nodes re-map through the reduced
    * labels, new nodes take them directly. Min-of-min labels compose,
    * so the result is EXACTLY the from-scratch CC over the union graph
    * — which is what the oracle computes (the q_dedup_components
    * recursive CTE at the 350 cutoff). Incremental cost: O(batch
    * shingles × df + touched labels), vs O(corpus pairs) from scratch.
    */
  def qGraphCcIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldLabels = graft.ops.CacheScope.cached(
      DedupQueries.memoComponents250(spark, dir)
        .select(col("doc_id").as("node"), col("component").as("lab")))
    val deltaPairs = graft.ops.Dedup.ngramJaccardPairsDelta(
      docs.filter(col("doc_id") < 350),
      docs.filter(col("doc_id") >= 250 && col("doc_id") < 350),
      "doc_id", "text", k = 5, minJaccard = 0.8)
    def mapped(c: String) = coalesce(col(s"${c}_lab"), col(c)).as(c)
    val contracted = deltaPairs
      .join(oldLabels.select(col("node").as("id_a"),
        col("lab").as("id_a_lab")), Seq("id_a"), "left")
      .join(oldLabels.select(col("node").as("id_b"),
        col("lab").as("id_b_lab")), Seq("id_b"), "left")
      .select(mapped("id_a"), mapped("id_b"))
    val reduced = graft.ops.CacheScope.cached(
      graft.ops.Dedup.dedupComponents(contracted, iters = 2)
        .select(col("doc_id").as("rnode"), col("component").as("rlab")))
    val oldFinal = oldLabels
      .join(reduced, col("lab") === col("rnode"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("rlab"), col("lab")).as("component"))
    // reduced nodes NOT in the old label table: new docs, plus old
    // docs whose FIRST edge ever is a delta pair (they were never in
    // the old graph, so they carry no old label to remap)
    val newFinal = reduced
      .join(oldLabels.select(col("node").as("rnode")), Seq("rnode"),
        "left_anti")
      .select(col("rnode").as("doc_id"), col("rlab").as("component"))
    oldFinal.unionByName(newFinal).orderBy(col("doc_id"))
  }

  /** MODULARITY of a given partition (Newman & Girvan 2004): does
    * nationality explain the co-supply graph's structure? The partition
    * under test assigns each supplier to its nation; modularity
    * Q = Σ_c [e_c/m − (D_c/2m)²] is computed as the exact integer pair
    * (q_num, 4m²) with q_num = 4m·Σe_c − ΣD_c², so the score is a
    * ratio of BIGINTs and the r6 double is one IEEE division. Per-nation
    * rows carry the community evidence (vertices, intra-edges, degree
    * mass); the global q_num/q_r6 columns are constant by construction
    * (the same cross-joined 1-row frame).
    *
    * Scale shape: edge dedup is one distinct shuffle; degrees one
    * aggregate over the 2|E| endpoint table; intra-edge counts a
    * broadcast of the vertex→community map (suppliers are the SMALL
    * dimension — at 100 TB the map is still MBs). No per-community
    * subgraph materialization.
    */
  def qGraphModularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    val nat = broadcast(Tables.supplier(spark, dir)
      .select($"s_suppkey".as("v"), $"s_nationkey".as("c")))
    val deg = edges.select($"src".as("v"))
      .unionAll(edges.select($"dst".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d"))
    val comm = deg.join(nat, "v")
      .groupBy($"c")
      .agg(count(lit(1)).as("n_nodes"), sum($"d").as("deg_sum"))
    val intra = edges
      .join(nat.select($"v".as("src"), $"c".as("c_src")), "src")
      .join(nat.select($"v".as("dst"), $"c".as("c_dst")), "dst")
      .filter($"c_src" === $"c_dst")
      .groupBy($"c_src".as("c")).agg(count(lit(1)).as("intra_edges"))
    val m = edges.agg(count(lit(1)).as("m"))
    val per = comm.join(intra, Seq("c"), "left")
      .select($"c", $"n_nodes", $"deg_sum",
        coalesce($"intra_edges", lit(0L)).as("intra_edges"))
    val tot = per.agg(sum($"intra_edges").as("sum_intra"),
      sum($"deg_sum" * $"deg_sum").as("sum_d2"))
    per.crossJoin(broadcast(m)).crossJoin(broadcast(tot))
      .select($"c".as("nation"), $"n_nodes", $"intra_edges", $"deg_sum",
        (lit(4L) * $"m" * $"sum_intra" - $"sum_d2").as("q_num"),
        round((lit(4L) * $"m" * $"sum_intra" - $"sum_d2").cast("double")
          / (lit(4L) * $"m" * $"m").cast("double"), 6).as("q_r6"))
      .orderBy($"nation")
  }

  /** DEGREE ASSORTATIVITY (Newman 2002, "Assortative mixing in
    * networks"): the Pearson correlation of endpoint degrees over the
    * co-supply graph's edges — do high-degree suppliers co-supply
    * with each other (r > 0) or with the periphery (r < 0)? Each
    * undirected edge contributes BOTH orientations (the standard
    * symmetrization), so the moment sums are exact BIGINTs over a
    * 2m-row frame and r is one IEEE formula on them:
    * r = (S·Sjk − Sj²) / (S·Sj2 − Sj²), S = 2m. Collaboration graphs
    * measure positive, technological graphs negative (Newman's table
    * — this one is a fixture question the number answers).
    *
    * Scale shape: degrees are one aggregate; attaching them to edges
    * is two joins against the (small) degree table — broadcastable
    * whenever vertices ≪ edges, which is the co-supply regime.
    */
  def qGraphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    val deg = broadcast(edges.select($"src".as("v"))
      .unionAll(edges.select($"dst".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d")))
    val both = edges
      .join(deg.select($"v".as("src"), $"d".as("dj")), "src")
      .join(deg.select($"v".as("dst"), $"d".as("dk")), "dst")
      .select($"dj", $"dk")
      .unionAll(edges
        .join(deg.select($"v".as("src"), $"d".as("dk")), "src")
        .join(deg.select($"v".as("dst"), $"d".as("dj")), "dst")
        .select($"dj", $"dk"))
    both.groupBy()
      .agg(count(lit(1)).as("s2m"),
        sum($"dj" * $"dk").as("sjk"),
        sum($"dj").as("sj"),
        sum($"dj" * $"dj").as("sj2"))
      .select($"s2m", $"sjk", $"sj", $"sj2",
        round(($"s2m" * $"sjk" - $"sj" * $"sj").cast("double")
          / ($"s2m" * $"sj2" - $"sj" * $"sj").cast("double"), 6)
          .as("r_r6"))
  }

  /** 2-round integer HITS over the shipment graph: suppliers are pure
    * hubs, customers pure authorities (bipartite), under
    * [[graft.ops.Graph.hits]]'s L1-renormalized floor-division
    * doctrine — the twin replays both rounds bit-for-bit. */
  def qGraphHits(spark: SparkSession, dir: String): DataFrame =
    Graph.hits(shipmentEdges(spark, dir), iters = 2)
      .orderBy(desc("auth_scaled"), desc("hub_scaled"), asc("vertex"))

  /** POWER-LAW FIT of the co-supply degree distribution (Clauset,
    * Shalizi & Newman 2009, SIAM Rev — the MLE, not the discredited
    * log-log regression): α̂ = 1 + n/Σln(dᵢ/dmin) over degrees ≥ dmin
    * (dmin = 2 — degree-1 vertices are boundary noise). The ln fold
    * is (degree, vertex)-ORDERED so the double sum is bit-identical
    * cross-engine (the q_stat_anova discipline); n, dmin and the
    * degree histogram inputs are exact integers. One aggregate to
    * degrees, one bounded fold.
    */
  def qGraphPowerlaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    val deg = edges.select($"src".as("v"))
      .unionAll(edges.select($"dst".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d"))
      .filter($"d" >= 2)
    deg.groupBy()
      .agg(count(lit(1)).as("n"),
        min($"d").as("d_min_observed"),
        expr("aggregate(sort_array(collect_list(struct(d, v)))," +
          " cast(0.0 as double), (a, x) -> a + ln(x.d / 2.0))")
          .as("lnsum"))
      .select($"n", $"d_min_observed",
        round(lit(1.0) + $"n".cast("double") / $"lnsum", 6)
          .as("alpha_r6"),
        round($"lnsum", 6).as("lnsum_r6"))
  }

  /** COMMUNITY CONDUCTANCE (Kannan, Vempala & Vetta 2004; the
    * Leskovec NCP-plot metric) for the nation partition of the
    * co-supply graph — the per-community companion to
    * q_graph_modularity's global score: φ(C) = cut(C) / min(vol(C),
    * vol(V∖C)), reported as exact PPM (cut and volumes are BIGINTs).
    * Low conductance = a real community (few escaping edges); the
    * metric survives 100 TB because it needs only degree sums and a
    * cut count per community — same broadcast-map shapes as
    * modularity, no subgraphs.
    */
  def qGraphConductance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    val nat = broadcast(Tables.supplier(spark, dir)
      .select($"s_suppkey".as("v"), $"s_nationkey".as("c")))
    val deg = edges.select($"src".as("v"))
      .unionAll(edges.select($"dst".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d"))
    val vol = deg.join(nat, "v").groupBy($"c")
      .agg(count(lit(1)).as("n_nodes"), sum($"d").as("vol"))
    val labeled = edges
      .join(nat.select($"v".as("src"), $"c".as("c_src")), "src")
      .join(nat.select($"v".as("dst"), $"c".as("c_dst")), "dst")
    val cut = labeled.filter($"c_src" =!= $"c_dst")
      .select($"c_src".as("c")).unionAll(
        labeled.filter($"c_src" =!= $"c_dst").select($"c_dst".as("c")))
      .groupBy($"c").agg(count(lit(1)).as("cut"))
    val m2 = edges.agg((count(lit(1)) * 2L).as("vol_all"))
    vol.join(cut, Seq("c"), "left")
      .withColumn("cut", coalesce($"cut", lit(0L)))
      .crossJoin(broadcast(m2))
      .select($"c".as("nation"), $"n_nodes", $"vol", $"cut",
        expr("cut * 1000000L div " +
          "nullif(least(vol, vol_all - vol), 0L)").as("conductance_ppm"))
      .orderBy($"nation")
  }

  /** CRITICAL-PATH profile of the customer order-cadence DAG: nodes
    * are order MONTHS (index (year−1995)·12 + month−1), an edge m→m′
    * when some customer's consecutive distinct order months are
    * (m, m′) — strictly increasing, so the graph is acyclic BY
    * CONSTRUCTION. For every month the length of the longest chain
    * ENDING there ([[Graph.longestPaths]] max-plus doubling, 7 rounds
    * ≥ depth 128 ≥ the 80-month calendar), i.e. the deepest
    * "customer kept coming back" cadence chain the month terminates.
    *
    * Scale shape: the corpus-sized work is the per-customer distinct
    * month extraction + lead() window (one shuffle on custkey); the
    * DAG itself is CALENDAR-bounded (≤ 80 nodes, ≤ 6.4k pairs) no
    * matter the table size, so the doubling rounds are metadata-cheap.
    * The twin replays reachability with a recursive CTE (UNION dedups
    * the (u,v,len) working set — bounded by nodes²·depth).
    */
  def qGraphCritpath(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mi = (year(col("o_orderdate")) - 1995) * 12 +
      (month(col("o_orderdate")) - 1)
    val months = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"), mi.cast("long").as("mi"))
      .distinct()
    val nxt = lead(col("mi"), 1).over(
      Window.partitionBy(col("cust")).orderBy(col("mi")))
    val edges = months.withColumn("nmi", nxt)
      .filter(col("nmi").isNotNull)
      .select(col("mi").as("src"), col("nmi").as("dst"))
    val longest = Graph.longestPaths(edges, rounds = 7)
      .groupBy(col("v")).agg(max(col("len")).as("longest_in"))
    months.select(col("mi")).distinct()
      .join(longest, col("mi") === col("v"), "left")
      .select(col("mi"),
        coalesce(col("longest_in"), lit(0L)).as("longest_in"))
      .orderBy(col("mi"))
  }

  /** LANDMARK ECCENTRICITY / diameter bracketing (Magnien, Latapy &
    * Habib 2009): hop-exact BFS from the four smallest-id vertices of
    * the sparse co-supply graph, all landmarks in ONE frontier frame
    * ([[graft.ops.Graph.multiSourceBfs]]). Per landmark: bounded
    * eccentricity (max distance within the 6-hop horizon) and ball
    * size. max(ecc) lower-bounds the graph diameter — the standard
    * scalable bracket when the all-pairs BFS behind q_graph_harmonic
    * is unaffordable. Landmark choice is declarative (sorted LIMIT 4
    * inside the plan, no collect); the DuckDB twin replays the BFS as
    * a UNION-deduped recursive CTE.
    */
  def qGraphEcc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    val seeds = edges.select($"src".as("v"))
      .unionAll(edges.select($"dst".as("v")))
      .distinct().orderBy($"v").limit(4)
    Graph.multiSourceBfs(edges, seeds, maxHops = 6)
      .groupBy($"source")
      .agg(max($"dist").as("ecc"), count(lit(1)).as("reached"))
      .orderBy($"source")
  }

  /** HYPERBALL NEIGHBOURHOOD FUNCTION of the co-supply graph
    * ([[graft.ops.Graph.hyperBall]]): N̂(t) for t = 0..6 from one
    * 16-register HLL counter per supplier — the Boldi–Rosa–Vigna
    * sketch that answers "how connected is this graph" (distance
    * distribution, average ball growth, effective diameter via the
    * 0.9 reach-ratio crossing) without q_graph_harmonic's all-pairs
    * BFS. The estimates are deterministic (md5 registers, exact
    * BIGINT register sums, ordered folds), so the DuckDB twin replays
    * every double bit-for-bit; HyperBallSpec certifies the estimates
    * against the EXACT ball sizes from multiSourceBfs on the same
    * fixture graph.
    */
  def qGraphHyperball(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    Graph.hyperBall(edges, maxHops = 6)
  }

  /** HyperANF per-vertex HARMONIC ESTIMATES on the same co-supply
    * graph ([[graft.ops.Graph.hyperHarmonic]]): ĥ(v) from the ball
    * deltas of v's own HyperBall counter — the sketch twin of
    * q_graph_harmonic whose cost is m = 16 registers per vertex per
    * hop instead of an all-pairs BFS. HyperBallSpec certifies the
    * estimates against the exact operator (rank agreement + sum
    * envelope); the DuckDB twin replays every double bit-for-bit.
    */
  def qGraphHyperHarmonic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir).distinct()
    Graph.hyperHarmonic(edges, maxHops = 6)
  }

  val defs: Map[String, Q] = Map(
    "q_graph_hyperball" -> (qGraphHyperball(_, _)),
    "q_graph_hyperharmonic" -> (qGraphHyperHarmonic(_, _)),
    "q_graph_ecc" -> (qGraphEcc(_, _)),
    "q_graph_critpath" -> (qGraphCritpath(_, _)),
    "q_graph_conductance" -> (qGraphConductance(_, _)),
    "q_graph_powerlaw" -> (qGraphPowerlaw(_, _)),
    "q_graph_hits" -> (qGraphHits(_, _)),
    "q_graph_assortativity" -> (qGraphAssortativity(_, _)),
    "q_graph_modularity" -> (qGraphModularity(_, _)),
    "q_graph_cc_incremental" -> (qGraphCcIncremental(_, _)),
    "q_graph_sssp" -> (qGraphSssp(_, _)),
    "q_graph_mst" -> (qGraphMst(_, _)),
    "q_graph_mst_incremental" -> (qGraphMstIncremental(_, _)),
    "q_graph_betweenness" -> (qGraphBetweenness(_, _)),
    "q_graph_harmonic" -> (qGraphHarmonic(_, _)),
    "q_graph_kcore" -> (qGraphKcore(_, _)),
    "q_graph_ktruss" -> (qGraphKtruss(_, _)),
    "q_graph_link_pred" -> (qGraphLinkPred(_, _)),
    "q_graph_pagerank_weighted" -> (qGraphPagerankWeighted(_, _)),
    "q_graph_pagerank" -> (qGraphPagerank(_, _)),
    "q_graph_degree" -> (qGraphDegree(_, _)),
    "q_graph_triangles" -> (qGraphTriangles(_, _)),
    "q_graph_local_cc" -> (qGraphLocalCc(_, _)),
    "q_graph_ppr" -> (qGraphPpr(_, _)),
    "q_graph_label_prop" -> (qGraphLabelProp(_, _)),
    "q_graph_walks" -> (qGraphWalks(_, _)),
    "q_graph_densest" -> (qGraphDensest(_, _))
  )

  /** Densest-subgraph peel over the sparse CO-SUPPLY graph (the
    * triangle-census fixture — the bipartite shipment graph
    * degenerates: one peel removes every customer and the trace is a
    * single round) — see [[graft.ops.Graph.densestSubgraph]]
    * (Bahmani et al. VLDB 2012, ε = ½). `rounds` = 26 is the
    * log_1.5 |V| ceiling; the loop exits at the first empty graph.
    */
  def qGraphDensest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = coSupplyEdges(spark, dir)
    Graph.densestSubgraph(edges, rounds = 26)
  }

  /** DeepWalk-style DETERMINISTIC random-walk corpus over the shipment
    * graph: 2 walks of 4 steps from suppliers 1..6 (declarative seed
    * range). See [[graft.ops.Graph.randomWalks]] for the md5 neighbor
    * selection and the workload-sized scale shape — this is the
    * sequence-generation front end a graph-embedding trainer consumes.
    */
  def qGraphWalks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Graph.randomWalks(shipmentEdges(spark, dir),
        spark.range(1L, 7L).select($"id".as("v")),
        walksPerSeed = 2, walkLen = 4)
      .orderBy($"seed", $"walk")
  }

  private val edgeCte =
    """e AS (SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** Twin of qGraphBetweenness: same σ recurrence (grouped sums per
    * hop, min-d row kept), same pivot sample, same (s, t)-ordered
    * dependency folds.
    */
  private def betweennessOracleSql(maxHops: Int, pivots: Int): String = {
    val hops = (1 to maxHops).map { h =>
      s"""x$h AS (
         |  SELECT r.s, sym.n AS v, $h AS d,
         |    CAST(SUM(r.sigma) AS BIGINT) AS sigma
         |  FROM r${h - 1} r JOIN sym ON r.v = sym.v
         |  WHERE r.d = ${h - 1} GROUP BY r.s, sym.n),
         |r$h AS (
         |  SELECT s, v, d, sigma FROM (
         |    SELECT s, v, d, sigma, row_number() OVER (
         |      PARTITION BY s, v ORDER BY d) AS rn
         |    FROM (SELECT * FROM r${h - 1} UNION ALL SELECT * FROM x$h))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
       |            FROM lineitem WHERE l_quantity = 1.0),
       |und AS (SELECT DISTINCT least(x.s, y.s) AS a,
       |          greatest(x.s, y.s) AS b
       |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
       |sym AS (SELECT a AS v, b AS n FROM und
       |        UNION ALL SELECT b, a FROM und),
       |verts AS (SELECT DISTINCT v FROM sym),
       |piv AS (SELECT v AS s FROM (
       |    SELECT v, row_number() OVER (
       |      ORDER BY md5(CAST(v AS VARCHAR)), v) AS rk FROM verts)
       |  WHERE rk <= $pivots),
       |r0 AS (SELECT v AS s, v, 0 AS d, CAST(1 AS BIGINT) AS sigma
       |       FROM verts),
       |$hops,
       |sv AS (SELECT r$maxHops.s, r$maxHops.v, r$maxHops.d,
       |         r$maxHops.sigma
       |       FROM r$maxHops JOIN piv USING (s)
       |       WHERE r$maxHops.s <> r$maxHops.v),
       |pairs AS (SELECT s, v AS t, d AS dst, sigma AS sigst FROM sv),
       |mid1 AS (SELECT s, v AS m, d AS d1, sigma AS sig1 FROM sv),
       |mid2 AS (SELECT s AS m, v AS t, d AS d2, sigma AS sig2
       |         FROM r$maxHops WHERE s <> v),
       |contrib AS (
       |  SELECT m1.m, m1.s, m2.t,
       |    CAST(m1.sig1 * m2.sig2 AS DOUBLE) / p.sigst AS c
       |  FROM mid1 m1 JOIN mid2 m2 USING (m)
       |  JOIN pairs p ON p.s = m1.s AND p.t = m2.t
       |    AND m1.d1 + m2.d2 = p.dst
       |  WHERE m2.t <> m1.m),
       |bp AS (SELECT m, s,
       |    list_reduce(list(c ORDER BY t), (x, y) -> x + y) AS ps,
       |    count(*) AS np
       |  FROM contrib GROUP BY m, s),
       |bet AS (SELECT m,
       |    list_reduce(list(ps ORDER BY s), (x, y) -> x + y) AS b,
       |    CAST(SUM(np) AS BIGINT) AS n
       |  FROM bp GROUP BY m)
       |SELECT verts.v AS vertex,
       |  round(COALESCE(bet.b, 0.0), 6) AS betweenness_r6,
       |  CAST(COALESCE(bet.n, 0) AS BIGINT) AS n_pair_paths
       |FROM verts LEFT JOIN bet ON verts.v = bet.m
       |ORDER BY betweenness_r6 DESC, vertex""".stripMargin
  }

  /** Unrolled k-truss twin: per round, id-ordered triangle enumeration
    * (u < v < w) credits each triangle's three edges, then edges below
    * k−2 supports are dropped; the final round's support table scores
    * the survivors. */
  private val ktrussSql: String = {
    // MATERIALIZED: each round references the prior edge set four
    // times; inlined CTEs would re-expand (and re-open the parquet)
    // 4^rounds times — the twin of the engine-side localCheckpoint
    val rounds = (1 to 3).map { r =>
      s"""t$r AS MATERIALIZED (SELECT x.a AS u, x.b AS v, y.b AS w
         |  FROM e${r - 1} x JOIN e${r - 1} y
         |    ON y.a = x.a AND y.b > x.b
         |  JOIN e${r - 1} z ON z.a = x.b AND z.b = y.b),
         |s$r AS MATERIALIZED (SELECT a, b, count(*) AS c FROM (
         |    SELECT u AS a, v AS b FROM t$r
         |    UNION ALL SELECT u, w FROM t$r
         |    UNION ALL SELECT v, w FROM t$r) GROUP BY a, b),
         |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN s$r s ON s.a = e.a AND s.b = e.b WHERE s.c >= 2)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
       |            FROM lineitem WHERE l_quantity = 1.0),
       |raw AS (SELECT x.s AS src, y.s AS dst
       |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
       |         greatest(src, dst) AS b
       |       FROM raw WHERE src <> dst),
       |$rounds,
       |t4 AS (SELECT x.a AS u, x.b AS v, y.b AS w
       |  FROM e3 x JOIN e3 y ON y.a = x.a AND y.b > x.b
       |  JOIN e3 z ON z.a = x.b AND z.b = y.b),
       |s4 AS (SELECT a, b, count(*) AS c FROM (
       |    SELECT u AS a, v AS b FROM t4
       |    UNION ALL SELECT u, w FROM t4
       |    UNION ALL SELECT v, w FROM t4) GROUP BY a, b)
       |SELECT e.a AS src, e.b AS dst,
       |  coalesce(s.c, 0) AS support
       |FROM e3 e LEFT JOIN s4 s ON s.a = e.a AND s.b = e.b
       |ORDER BY src, dst""".stripMargin
  }

  /** One unrolled Borůvka round as twin SQL (lab{k−1}/f{k−1} →
    * sel{k}/f{k}/lab{k}): the per-component minimum outgoing edge under
    * the (w, a, b) total order via row_number, the grown forest, a
    * recursive-CTE closure over it, and the relabel. Idempotent once
    * converged (empty selection leaves f and lab unchanged), so a
    * fixed over-unroll equals the engine's convergence stop. */
  private def mstRoundSql(k: Int): String = {
    val pl = s"lab${k - 1}"
    val pf = s"f${k - 1}"
    s"""sel$k AS MATERIALIZED (
       |  SELECT DISTINCT a, b, w FROM (
       |    SELECT l1.comp AS cs, d.w,
       |      LEAST(d.s, d.t) AS a, GREATEST(d.s, d.t) AS b,
       |      row_number() OVER (PARTITION BY l1.comp
       |        ORDER BY d.w, LEAST(d.s, d.t), GREATEST(d.s, d.t))
       |        AS rn
       |    FROM dir2 d
       |    JOIN $pl l1 ON l1.node = d.s
       |    JOIN $pl l2 ON l2.node = d.t
       |    WHERE l1.comp <> l2.comp) z
       |  WHERE rn = 1),
       |f$k AS MATERIALIZED (
       |  SELECT * FROM $pf UNION SELECT * FROM sel$k),
       |fe$k AS MATERIALIZED (SELECT a AS s, b AS t FROM f$k
       |         UNION ALL SELECT b, a FROM f$k
       |         UNION ALL SELECT a, a FROM f$k),
       |reach$k(node, lab) AS (
       |  SELECT DISTINCT s, s FROM fe$k
       |  UNION
       |  SELECT e.s, r.lab FROM fe$k e JOIN reach$k r ON r.node = e.t),
       |comp$k AS MATERIALIZED (SELECT node, MIN(lab) AS component
       |           FROM reach$k GROUP BY node),
       |lab$k AS MATERIALIZED (
       |  SELECT n.node, COALESCE(c.component, n.node) AS comp
       |  FROM nodes n LEFT JOIN comp$k c ON c.node = n.node)"""
      .stripMargin
  }

  /** HyperBall twin: same md5 register derivation via string ops
    * (strpos/instr are both 1-based), sparse (v, j, r) max-union per
    * hop unrolled as MATERIALIZED CTEs (the mstSql inlining lesson),
    * exact BIGINT register sums, and the per-hop estimate total as
    * list_sum over an ORDER BY v list — the q_time_holt fold twin. */
  private lazy val hyperballSql: String = {
    def hop(k: Int) =
      s"""r$k AS MATERIALIZED (
         |  SELECT v, j, CAST(max(r) AS INT) AS r FROM (
         |    SELECT v, j, r FROM r${k - 1}
         |    UNION ALL
         |    SELECT s.v, r.j, r.r FROM sym s
         |      JOIN r${k - 1} r ON r.v = s.n)
         |  GROUP BY v, j)""".stripMargin
    def est(k: Int) =
      s"""e$k AS MATERIALIZED (SELECT $k AS hop, nf, n_verts FROM (
         |  SELECT list_sum(list(est ORDER BY v)) AS nf,
         |      CAST(count(*) AS BIGINT) AS n_verts FROM (
         |    SELECT v,
         |      CASE WHEN (CAST(0.673 AS DOUBLE) * CAST(256.0 AS DOUBLE) * CAST(2199023255552.0 AS DOUBLE))
         |            / CAST(s AS DOUBLE) <= 40.0 AND zeros > 0
         |        THEN 16.0 * ln(16.0 / CAST(zeros AS DOUBLE))
         |        ELSE (CAST(0.673 AS DOUBLE) * CAST(256.0 AS DOUBLE) * CAST(2199023255552.0 AS DOUBLE))
         |          / CAST(s AS DOUBLE) END AS est
         |    FROM (
         |      SELECT v,
         |        CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT)
         |          + (16 - CAST(count(*) AS BIGINT))
         |            * (CAST(1 AS BIGINT) << 41) AS s,
         |        16 - CAST(count(*) AS BIGINT) AS zeros
         |      FROM r$k GROUP BY v))))""".stripMargin
    s"""WITH ps AS MATERIALIZED (SELECT DISTINCT l_partkey AS p,
       |    l_suppkey AS s
       |  FROM lineitem WHERE l_quantity = 1),
       |e0_ AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
       |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
       |sym AS MATERIALIZED (SELECT a AS v, b AS n FROM e0_
       |  UNION ALL SELECT b, a FROM e0_),
       |verts AS MATERIALIZED (SELECT DISTINCT v,
       |    md5(CAST(v AS VARCHAR)) AS hex FROM sym),
       |r0 AS MATERIALIZED (SELECT v,
       |    CAST(strpos('0123456789abcdef', substring(hex, 31, 1)) - 1
       |      AS INT) AS j,
       |    CAST(CASE WHEN length(regexp_extract(
       |        substring(hex, 1, 10), '^0*')) = 10 THEN 41
       |      ELSE length(regexp_extract(substring(hex, 1, 10), '^0*'))
       |          * 4
       |        + CASE WHEN strpos('0123456789abcdef',
       |            substring(substring(hex, 1, 10),
       |              CAST(length(regexp_extract(substring(hex, 1, 10),
       |                '^0*')) AS INT) + 1, 1)) - 1 >= 8 THEN 0
       |          WHEN strpos('0123456789abcdef',
       |            substring(substring(hex, 1, 10),
       |              CAST(length(regexp_extract(substring(hex, 1, 10),
       |                '^0*')) AS INT) + 1, 1)) - 1 >= 4 THEN 1
       |          WHEN strpos('0123456789abcdef',
       |            substring(substring(hex, 1, 10),
       |              CAST(length(regexp_extract(substring(hex, 1, 10),
       |                '^0*')) AS INT) + 1, 1)) - 1 >= 2 THEN 2
       |          ELSE 3 END + 1 END AS INT) AS r
       |  FROM verts),
       |${(1 to 6).map(hop).mkString(",\n")},
       |${(0 to 6).map(est).mkString(",\n")},
       |all_ AS (${(0 to 6).map(k => s"SELECT * FROM e$k")
          .mkString(" UNION ALL ")}),
       |mx AS (SELECT nf AS nf_max FROM all_ WHERE hop = 6)
       |SELECT CAST(hop AS BIGINT) AS hop,
       |  round(nf, 6) AS nf_est_r6,
       |  round(nf / CAST(n_verts AS DOUBLE), 6) AS avg_ball_r6,
       |  round(nf / nf_max, 6) AS reach_ratio_r6
       |FROM all_ CROSS JOIN mx ORDER BY hop""".stripMargin
  }

  /** HyperANF harmonic twin: same register/hop CTEs as
    * [[hyperballSql]], then a per-vertex pivot of the per-hop
    * estimates and the FIXED six-term delta sum (greatest(0, ·)
    * floors the raw↔linear branch-switch dip, same as the engine). */
  private lazy val hyperharmonicSql: String = {
    def hop(k: Int) =
      s"""r$k AS MATERIALIZED (
         |  SELECT v, j, CAST(max(r) AS INT) AS r FROM (
         |    SELECT v, j, r FROM r${k - 1}
         |    UNION ALL
         |    SELECT s.v, r.j, r.r FROM sym s
         |      JOIN r${k - 1} r ON r.v = s.n)
         |  GROUP BY v, j)""".stripMargin
    def est(k: Int) =
      s"""e$k AS MATERIALIZED (
         |  SELECT v,
         |    CASE WHEN (CAST(0.673 AS DOUBLE) * CAST(256.0 AS DOUBLE)
         |          * CAST(2199023255552.0 AS DOUBLE))
         |          / CAST(s AS DOUBLE) <= 40.0 AND zeros > 0
         |      THEN 16.0 * ln(16.0 / CAST(zeros AS DOUBLE))
         |      ELSE (CAST(0.673 AS DOUBLE) * CAST(256.0 AS DOUBLE)
         |          * CAST(2199023255552.0 AS DOUBLE))
         |        / CAST(s AS DOUBLE) END AS est
         |  FROM (
         |    SELECT v,
         |      CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT)
         |        + (16 - CAST(count(*) AS BIGINT))
         |          * (CAST(1 AS BIGINT) << 41) AS s,
         |      16 - CAST(count(*) AS BIGINT) AS zeros
         |    FROM r$k GROUP BY v))""".stripMargin
    val deltas = (1 to 6).map(t =>
      s"greatest(CAST(0.0 AS DOUBLE), e$t.est - e${t - 1}.est) " +
        s"/ CAST($t.0 AS DOUBLE)").mkString("\n       |  + ")
    s"""WITH ps AS MATERIALIZED (SELECT DISTINCT l_partkey AS p,
       |    l_suppkey AS s
       |  FROM lineitem WHERE l_quantity = 1),
       |e0_ AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
       |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
       |sym AS MATERIALIZED (SELECT a AS v, b AS n FROM e0_
       |  UNION ALL SELECT b, a FROM e0_),
       |verts AS MATERIALIZED (SELECT DISTINCT v,
       |    md5(CAST(v AS VARCHAR)) AS hex FROM sym),
       |r0 AS MATERIALIZED (SELECT v,
       |    CAST(strpos('0123456789abcdef', substring(hex, 31, 1)) - 1
       |      AS INT) AS j,
       |    CAST(CASE WHEN length(regexp_extract(
       |        substring(hex, 1, 10), '^0*')) = 10 THEN 41
       |      ELSE length(regexp_extract(substring(hex, 1, 10), '^0*'))
       |          * 4
       |        + CASE WHEN strpos('0123456789abcdef',
       |            substring(substring(hex, 1, 10),
       |              CAST(length(regexp_extract(substring(hex, 1, 10),
       |                '^0*')) AS INT) + 1, 1)) - 1 >= 8 THEN 0
       |          WHEN strpos('0123456789abcdef',
       |            substring(substring(hex, 1, 10),
       |              CAST(length(regexp_extract(substring(hex, 1, 10),
       |                '^0*')) AS INT) + 1, 1)) - 1 >= 4 THEN 1
       |          WHEN strpos('0123456789abcdef',
       |            substring(substring(hex, 1, 10),
       |              CAST(length(regexp_extract(substring(hex, 1, 10),
       |                '^0*')) AS INT) + 1, 1)) - 1 >= 2 THEN 2
       |          ELSE 3 END + 1 END AS INT) AS r
       |  FROM verts),
       |${(1 to 6).map(hop).mkString(",\n")},
       |${(0 to 6).map(est).mkString(",\n")}
       |SELECT e0.v AS vertex,
       |  round(e6.est - 1.0, 6) AS reached_est_r6,
       |  round($deltas, 6) AS harmonic_est_r6
       |FROM e0
       |  JOIN e1 ON e1.v = e0.v JOIN e2 ON e2.v = e0.v
       |  JOIN e3 ON e3.v = e0.v JOIN e4 ON e4.v = e0.v
       |  JOIN e5 ON e5.v = e0.v JOIN e6 ON e6.v = e0.v
       |ORDER BY vertex""".stripMargin
  }

  private val mstRounds = 12

  // every non-recursive CTE is MATERIALIZED: the round chain
  // references f_{k-1}/lab_{k-1} several times each, and DuckDB's
  // default inlining re-expands the whole chain per reference —
  // exponential plan growth (and one parquet open per leaf) by
  // round 12. Materialization makes the unroll linear.
  private lazy val mstSql: String =
      s"""WITH RECURSIVE ps AS MATERIALIZED (
         |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s
         |  FROM lineitem WHERE l_quantity = 1.0),
         |und AS MATERIALIZED (
         |  SELECT x.s AS a, y.s AS b, min(x.p % 97 + 1) AS w
         |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s
         |  GROUP BY x.s, y.s),
         |dir2 AS MATERIALIZED (SELECT a AS s, b AS t, w FROM und
         |         UNION ALL SELECT b, a, w FROM und),
         |nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM dir2),
         |lab0 AS MATERIALIZED (SELECT node, node AS comp FROM nodes),
         |f0 AS MATERIALIZED (SELECT a, b, w FROM und WHERE FALSE),
         |${(1 to mstRounds).map(mstRoundSql).mkString(",\n")},
         |final_lab AS (SELECT * FROM lab$mstRounds)
         |SELECT f.a, f.b, f.w, l.comp AS tree
         |FROM f$mstRounds f JOIN final_lab l ON l.node = f.a
         |ORDER BY f.a, f.b""".stripMargin

  // same md5 neighbor-index arithmetic as the engine (15 hex digits ->
  // BIGINT via the strpos parse, the cmGrid convention), same sorted
  // neighbor ranks, 4 unrolled step joins
  private val walksOracleSql: String =
    s"""WITH $edgeCte,
      |und AS (SELECT DISTINCT least(src, dst) AS a,
      |    greatest(src, dst) AS b FROM e WHERE src <> dst),
      |sym AS (SELECT a AS v, b AS n FROM und
      |  UNION ALL SELECT b, a FROM und),
      |dg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM sym
      |  GROUP BY v),
      |nb AS (SELECT v, n, CAST(row_number() OVER (PARTITION BY v
      |    ORDER BY n) - 1 AS BIGINT) AS rk FROM sym),
      |w0 AS (SELECT s.seed, w.w, s.seed AS cur,
      |    CAST(s.seed AS VARCHAR) AS path
      |  FROM (SELECT unnest(generate_series(1, 6)) AS seed) s
      |  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS w) w),
      |w1 AS (SELECT c.seed, c.w, nb.n AS cur,
      |    c.path || '>' || CAST(nb.n AS VARCHAR) AS path
      |  FROM w0 c JOIN dg ON dg.v = c.cur
      |  JOIN nb ON nb.v = c.cur
      |    AND nb.rk = CAST(list_sum(list_transform(generate_series(1, 15), dd -> CAST(strpos('0123456789abcdef', substring(md5(CAST(c.seed AS VARCHAR) || ':' || CAST(c.w AS VARCHAR) || ':1'), dd, 1)) - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT) % dg.deg),
      |w2 AS (SELECT c.seed, c.w, nb.n AS cur,
      |    c.path || '>' || CAST(nb.n AS VARCHAR) AS path
      |  FROM w1 c JOIN dg ON dg.v = c.cur
      |  JOIN nb ON nb.v = c.cur
      |    AND nb.rk = CAST(list_sum(list_transform(generate_series(1, 15), dd -> CAST(strpos('0123456789abcdef', substring(md5(CAST(c.seed AS VARCHAR) || ':' || CAST(c.w AS VARCHAR) || ':2'), dd, 1)) - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT) % dg.deg),
      |w3 AS (SELECT c.seed, c.w, nb.n AS cur,
      |    c.path || '>' || CAST(nb.n AS VARCHAR) AS path
      |  FROM w2 c JOIN dg ON dg.v = c.cur
      |  JOIN nb ON nb.v = c.cur
      |    AND nb.rk = CAST(list_sum(list_transform(generate_series(1, 15), dd -> CAST(strpos('0123456789abcdef', substring(md5(CAST(c.seed AS VARCHAR) || ':' || CAST(c.w AS VARCHAR) || ':3'), dd, 1)) - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT) % dg.deg),
      |w4 AS (SELECT c.seed, c.w, nb.n AS cur,
      |    c.path || '>' || CAST(nb.n AS VARCHAR) AS path
      |  FROM w3 c JOIN dg ON dg.v = c.cur
      |  JOIN nb ON nb.v = c.cur
      |    AND nb.rk = CAST(list_sum(list_transform(generate_series(1, 15), dd -> CAST(strpos('0123456789abcdef', substring(md5(CAST(c.seed AS VARCHAR) || ':' || CAST(c.w AS VARCHAR) || ':4'), dd, 1)) - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT) % dg.deg)
      |SELECT seed, CAST(w AS BIGINT) AS walk, cur AS last_vertex, path
      |FROM w4 ORDER BY seed, walk""".stripMargin

  // 26 unrolled peel rounds, verbatim engine replay (the Boruvka
  // unroll precedent): per round degree table, integer
  // cross-multiplied keep rule, two semi-join edge filters
  // 26 unrolled peel rounds, verbatim engine replay (the Boruvka
  // unroll precedent); every chain CTE is MATERIALIZED — DuckDB
  // inlines plain CTEs, and a 26-deep chain referenced 4x per level
  // inlines exponentially
  private val densestOracleSql: String =
    """WITH ps AS MATERIALIZED (SELECT DISTINCT l_partkey AS p,
      |    l_suppkey AS s FROM lineitem WHERE l_quantity = 1),
      |g0 AS MATERIALIZED (SELECT DISTINCT least(x.s, y.s) AS a,
      |    greatest(x.s, y.s) AS b
      |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s
      |  WHERE x.s <> y.s),
      |v0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g0 UNION SELECT b FROM g0)),
      |n0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g0),
      |st0 AS (SELECT 0 AS round, nv, ne FROM v0, n0),
      |k0 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g0 UNION ALL SELECT b FROM g0)
      |   GROUP BY v) d, v0, n0
      |  WHERE d.d * nv > 3 * ne),
      |g1 AS MATERIALIZED (SELECT g.a, g.b FROM g0 g
      |  JOIN k0 ka ON g.a = ka.v JOIN k0 kb ON g.b = kb.v),
      |v1 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g1 UNION SELECT b FROM g1)),
      |n1 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g1),
      |st1 AS (SELECT 1 AS round, nv, ne FROM v1, n1),
      |k1 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g1 UNION ALL SELECT b FROM g1)
      |   GROUP BY v) d, v1, n1
      |  WHERE d.d * nv > 3 * ne),
      |g2 AS MATERIALIZED (SELECT g.a, g.b FROM g1 g
      |  JOIN k1 ka ON g.a = ka.v JOIN k1 kb ON g.b = kb.v),
      |v2 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g2 UNION SELECT b FROM g2)),
      |n2 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g2),
      |st2 AS (SELECT 2 AS round, nv, ne FROM v2, n2),
      |k2 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g2 UNION ALL SELECT b FROM g2)
      |   GROUP BY v) d, v2, n2
      |  WHERE d.d * nv > 3 * ne),
      |g3 AS MATERIALIZED (SELECT g.a, g.b FROM g2 g
      |  JOIN k2 ka ON g.a = ka.v JOIN k2 kb ON g.b = kb.v),
      |v3 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g3 UNION SELECT b FROM g3)),
      |n3 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g3),
      |st3 AS (SELECT 3 AS round, nv, ne FROM v3, n3),
      |k3 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g3 UNION ALL SELECT b FROM g3)
      |   GROUP BY v) d, v3, n3
      |  WHERE d.d * nv > 3 * ne),
      |g4 AS MATERIALIZED (SELECT g.a, g.b FROM g3 g
      |  JOIN k3 ka ON g.a = ka.v JOIN k3 kb ON g.b = kb.v),
      |v4 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g4 UNION SELECT b FROM g4)),
      |n4 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g4),
      |st4 AS (SELECT 4 AS round, nv, ne FROM v4, n4),
      |k4 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g4 UNION ALL SELECT b FROM g4)
      |   GROUP BY v) d, v4, n4
      |  WHERE d.d * nv > 3 * ne),
      |g5 AS MATERIALIZED (SELECT g.a, g.b FROM g4 g
      |  JOIN k4 ka ON g.a = ka.v JOIN k4 kb ON g.b = kb.v),
      |v5 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g5 UNION SELECT b FROM g5)),
      |n5 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g5),
      |st5 AS (SELECT 5 AS round, nv, ne FROM v5, n5),
      |k5 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g5 UNION ALL SELECT b FROM g5)
      |   GROUP BY v) d, v5, n5
      |  WHERE d.d * nv > 3 * ne),
      |g6 AS MATERIALIZED (SELECT g.a, g.b FROM g5 g
      |  JOIN k5 ka ON g.a = ka.v JOIN k5 kb ON g.b = kb.v),
      |v6 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g6 UNION SELECT b FROM g6)),
      |n6 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g6),
      |st6 AS (SELECT 6 AS round, nv, ne FROM v6, n6),
      |k6 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g6 UNION ALL SELECT b FROM g6)
      |   GROUP BY v) d, v6, n6
      |  WHERE d.d * nv > 3 * ne),
      |g7 AS MATERIALIZED (SELECT g.a, g.b FROM g6 g
      |  JOIN k6 ka ON g.a = ka.v JOIN k6 kb ON g.b = kb.v),
      |v7 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g7 UNION SELECT b FROM g7)),
      |n7 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g7),
      |st7 AS (SELECT 7 AS round, nv, ne FROM v7, n7),
      |k7 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g7 UNION ALL SELECT b FROM g7)
      |   GROUP BY v) d, v7, n7
      |  WHERE d.d * nv > 3 * ne),
      |g8 AS MATERIALIZED (SELECT g.a, g.b FROM g7 g
      |  JOIN k7 ka ON g.a = ka.v JOIN k7 kb ON g.b = kb.v),
      |v8 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g8 UNION SELECT b FROM g8)),
      |n8 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g8),
      |st8 AS (SELECT 8 AS round, nv, ne FROM v8, n8),
      |k8 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g8 UNION ALL SELECT b FROM g8)
      |   GROUP BY v) d, v8, n8
      |  WHERE d.d * nv > 3 * ne),
      |g9 AS MATERIALIZED (SELECT g.a, g.b FROM g8 g
      |  JOIN k8 ka ON g.a = ka.v JOIN k8 kb ON g.b = kb.v),
      |v9 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g9 UNION SELECT b FROM g9)),
      |n9 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g9),
      |st9 AS (SELECT 9 AS round, nv, ne FROM v9, n9),
      |k9 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g9 UNION ALL SELECT b FROM g9)
      |   GROUP BY v) d, v9, n9
      |  WHERE d.d * nv > 3 * ne),
      |g10 AS MATERIALIZED (SELECT g.a, g.b FROM g9 g
      |  JOIN k9 ka ON g.a = ka.v JOIN k9 kb ON g.b = kb.v),
      |v10 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g10 UNION SELECT b FROM g10)),
      |n10 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g10),
      |st10 AS (SELECT 10 AS round, nv, ne FROM v10, n10),
      |k10 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g10 UNION ALL SELECT b FROM g10)
      |   GROUP BY v) d, v10, n10
      |  WHERE d.d * nv > 3 * ne),
      |g11 AS MATERIALIZED (SELECT g.a, g.b FROM g10 g
      |  JOIN k10 ka ON g.a = ka.v JOIN k10 kb ON g.b = kb.v),
      |v11 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g11 UNION SELECT b FROM g11)),
      |n11 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g11),
      |st11 AS (SELECT 11 AS round, nv, ne FROM v11, n11),
      |k11 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g11 UNION ALL SELECT b FROM g11)
      |   GROUP BY v) d, v11, n11
      |  WHERE d.d * nv > 3 * ne),
      |g12 AS MATERIALIZED (SELECT g.a, g.b FROM g11 g
      |  JOIN k11 ka ON g.a = ka.v JOIN k11 kb ON g.b = kb.v),
      |v12 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g12 UNION SELECT b FROM g12)),
      |n12 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g12),
      |st12 AS (SELECT 12 AS round, nv, ne FROM v12, n12),
      |k12 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g12 UNION ALL SELECT b FROM g12)
      |   GROUP BY v) d, v12, n12
      |  WHERE d.d * nv > 3 * ne),
      |g13 AS MATERIALIZED (SELECT g.a, g.b FROM g12 g
      |  JOIN k12 ka ON g.a = ka.v JOIN k12 kb ON g.b = kb.v),
      |v13 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g13 UNION SELECT b FROM g13)),
      |n13 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g13),
      |st13 AS (SELECT 13 AS round, nv, ne FROM v13, n13),
      |k13 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g13 UNION ALL SELECT b FROM g13)
      |   GROUP BY v) d, v13, n13
      |  WHERE d.d * nv > 3 * ne),
      |g14 AS MATERIALIZED (SELECT g.a, g.b FROM g13 g
      |  JOIN k13 ka ON g.a = ka.v JOIN k13 kb ON g.b = kb.v),
      |v14 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g14 UNION SELECT b FROM g14)),
      |n14 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g14),
      |st14 AS (SELECT 14 AS round, nv, ne FROM v14, n14),
      |k14 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g14 UNION ALL SELECT b FROM g14)
      |   GROUP BY v) d, v14, n14
      |  WHERE d.d * nv > 3 * ne),
      |g15 AS MATERIALIZED (SELECT g.a, g.b FROM g14 g
      |  JOIN k14 ka ON g.a = ka.v JOIN k14 kb ON g.b = kb.v),
      |v15 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g15 UNION SELECT b FROM g15)),
      |n15 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g15),
      |st15 AS (SELECT 15 AS round, nv, ne FROM v15, n15),
      |k15 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g15 UNION ALL SELECT b FROM g15)
      |   GROUP BY v) d, v15, n15
      |  WHERE d.d * nv > 3 * ne),
      |g16 AS MATERIALIZED (SELECT g.a, g.b FROM g15 g
      |  JOIN k15 ka ON g.a = ka.v JOIN k15 kb ON g.b = kb.v),
      |v16 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g16 UNION SELECT b FROM g16)),
      |n16 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g16),
      |st16 AS (SELECT 16 AS round, nv, ne FROM v16, n16),
      |k16 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g16 UNION ALL SELECT b FROM g16)
      |   GROUP BY v) d, v16, n16
      |  WHERE d.d * nv > 3 * ne),
      |g17 AS MATERIALIZED (SELECT g.a, g.b FROM g16 g
      |  JOIN k16 ka ON g.a = ka.v JOIN k16 kb ON g.b = kb.v),
      |v17 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g17 UNION SELECT b FROM g17)),
      |n17 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g17),
      |st17 AS (SELECT 17 AS round, nv, ne FROM v17, n17),
      |k17 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g17 UNION ALL SELECT b FROM g17)
      |   GROUP BY v) d, v17, n17
      |  WHERE d.d * nv > 3 * ne),
      |g18 AS MATERIALIZED (SELECT g.a, g.b FROM g17 g
      |  JOIN k17 ka ON g.a = ka.v JOIN k17 kb ON g.b = kb.v),
      |v18 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g18 UNION SELECT b FROM g18)),
      |n18 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g18),
      |st18 AS (SELECT 18 AS round, nv, ne FROM v18, n18),
      |k18 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g18 UNION ALL SELECT b FROM g18)
      |   GROUP BY v) d, v18, n18
      |  WHERE d.d * nv > 3 * ne),
      |g19 AS MATERIALIZED (SELECT g.a, g.b FROM g18 g
      |  JOIN k18 ka ON g.a = ka.v JOIN k18 kb ON g.b = kb.v),
      |v19 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g19 UNION SELECT b FROM g19)),
      |n19 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g19),
      |st19 AS (SELECT 19 AS round, nv, ne FROM v19, n19),
      |k19 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g19 UNION ALL SELECT b FROM g19)
      |   GROUP BY v) d, v19, n19
      |  WHERE d.d * nv > 3 * ne),
      |g20 AS MATERIALIZED (SELECT g.a, g.b FROM g19 g
      |  JOIN k19 ka ON g.a = ka.v JOIN k19 kb ON g.b = kb.v),
      |v20 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g20 UNION SELECT b FROM g20)),
      |n20 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g20),
      |st20 AS (SELECT 20 AS round, nv, ne FROM v20, n20),
      |k20 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g20 UNION ALL SELECT b FROM g20)
      |   GROUP BY v) d, v20, n20
      |  WHERE d.d * nv > 3 * ne),
      |g21 AS MATERIALIZED (SELECT g.a, g.b FROM g20 g
      |  JOIN k20 ka ON g.a = ka.v JOIN k20 kb ON g.b = kb.v),
      |v21 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g21 UNION SELECT b FROM g21)),
      |n21 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g21),
      |st21 AS (SELECT 21 AS round, nv, ne FROM v21, n21),
      |k21 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g21 UNION ALL SELECT b FROM g21)
      |   GROUP BY v) d, v21, n21
      |  WHERE d.d * nv > 3 * ne),
      |g22 AS MATERIALIZED (SELECT g.a, g.b FROM g21 g
      |  JOIN k21 ka ON g.a = ka.v JOIN k21 kb ON g.b = kb.v),
      |v22 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g22 UNION SELECT b FROM g22)),
      |n22 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g22),
      |st22 AS (SELECT 22 AS round, nv, ne FROM v22, n22),
      |k22 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g22 UNION ALL SELECT b FROM g22)
      |   GROUP BY v) d, v22, n22
      |  WHERE d.d * nv > 3 * ne),
      |g23 AS MATERIALIZED (SELECT g.a, g.b FROM g22 g
      |  JOIN k22 ka ON g.a = ka.v JOIN k22 kb ON g.b = kb.v),
      |v23 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g23 UNION SELECT b FROM g23)),
      |n23 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g23),
      |st23 AS (SELECT 23 AS round, nv, ne FROM v23, n23),
      |k23 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g23 UNION ALL SELECT b FROM g23)
      |   GROUP BY v) d, v23, n23
      |  WHERE d.d * nv > 3 * ne),
      |g24 AS MATERIALIZED (SELECT g.a, g.b FROM g23 g
      |  JOIN k23 ka ON g.a = ka.v JOIN k23 kb ON g.b = kb.v),
      |v24 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g24 UNION SELECT b FROM g24)),
      |n24 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g24),
      |st24 AS (SELECT 24 AS round, nv, ne FROM v24, n24),
      |k24 AS MATERIALIZED (SELECT d.v FROM
      |  (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
      |    (SELECT a AS v FROM g24 UNION ALL SELECT b FROM g24)
      |   GROUP BY v) d, v24, n24
      |  WHERE d.d * nv > 3 * ne),
      |g25 AS MATERIALIZED (SELECT g.a, g.b FROM g24 g
      |  JOIN k24 ka ON g.a = ka.v JOIN k24 kb ON g.b = kb.v),
      |v25 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nv
      |  FROM (SELECT a AS x FROM g25 UNION SELECT b FROM g25)),
      |n25 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS ne
      |  FROM g25),
      |st25 AS (SELECT 25 AS round, nv, ne FROM v25, n25),
      |allst AS (SELECT * FROM st0
      |  UNION ALL SELECT * FROM st1
      |  UNION ALL SELECT * FROM st2
      |  UNION ALL SELECT * FROM st3
      |  UNION ALL SELECT * FROM st4
      |  UNION ALL SELECT * FROM st5
      |  UNION ALL SELECT * FROM st6
      |  UNION ALL SELECT * FROM st7
      |  UNION ALL SELECT * FROM st8
      |  UNION ALL SELECT * FROM st9
      |  UNION ALL SELECT * FROM st10
      |  UNION ALL SELECT * FROM st11
      |  UNION ALL SELECT * FROM st12
      |  UNION ALL SELECT * FROM st13
      |  UNION ALL SELECT * FROM st14
      |  UNION ALL SELECT * FROM st15
      |  UNION ALL SELECT * FROM st16
      |  UNION ALL SELECT * FROM st17
      |  UNION ALL SELECT * FROM st18
      |  UNION ALL SELECT * FROM st19
      |  UNION ALL SELECT * FROM st20
      |  UNION ALL SELECT * FROM st21
      |  UNION ALL SELECT * FROM st22
      |  UNION ALL SELECT * FROM st23
      |  UNION ALL SELECT * FROM st24
      |  UNION ALL SELECT * FROM st25),
      |allr AS (SELECT round, nv, ne, ne * 1000000 // nv
      |    AS density_ppm FROM allst WHERE nv > 0)
      |SELECT round, nv, ne, density_ppm,
      |  (row_number() OVER (ORDER BY density_ppm DESC, round) = 1)
      |    AS is_best
      |FROM allr ORDER BY round""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_graph_densest" -> densestOracleSql,
    "q_graph_walks" -> walksOracleSql,
    "q_graph_hyperball" -> hyperballSql,
    "q_graph_hyperharmonic" -> hyperharmonicSql,
    // UNION-deduped recursive BFS from the same sorted-LIMIT landmarks
    "q_graph_ecc" ->
      """WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey AS p,
        |    l_suppkey AS s
        |  FROM lineitem WHERE l_quantity = 1),
        |e0 AS (SELECT DISTINCT x.s AS a, y.s AS b
        |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |seeds AS (SELECT DISTINCT src AS v FROM e ORDER BY v LIMIT 4),
        |bfs(s, v, d) AS (
        |  SELECT v, v, 0 FROM seeds
        |  UNION
        |  SELECT b.s, e.dst, b.d + 1 FROM bfs b
        |  JOIN e ON b.v = e.src WHERE b.d < 6),
        |md AS (SELECT s, v, MIN(d) AS d FROM bfs GROUP BY 1, 2)
        |SELECT s AS source, CAST(MAX(d) AS BIGINT) AS ecc,
        |  CAST(count(*) AS BIGINT) AS reached
        |FROM md GROUP BY s ORDER BY source""".stripMargin,
    // same graph as q_graph_sssp; Borůvka unrolled to 12 rounds
    // (halving guarantee covers V ≤ 4096 components; sf0.01 has ~100)
    "q_graph_mst" -> mstSql,
    // the incremental path must equal the from-scratch MSF by the
    // sparsification identity — same twin, verbatim
    "q_graph_mst_incremental" -> mstSql,
    // reachable-chain enumeration with UNION-deduped (u,v,len) working
    // set; longest_in(v) = max len over chains ending at v
    "q_graph_critpath" ->
      """WITH RECURSIVE months AS (
        |  SELECT DISTINCT o_custkey AS cust,
        |    CAST((year(o_orderdate) - 1995) * 12
        |      + (month(o_orderdate) - 1) AS BIGINT) AS mi
        |  FROM orders),
        |e AS (
        |  SELECT DISTINCT mi AS src, nmi AS dst FROM (
        |    SELECT mi, lead(mi) OVER (
        |      PARTITION BY cust ORDER BY mi) AS nmi
        |    FROM months)
        |  WHERE nmi IS NOT NULL),
        |r(u, v, len) AS (
        |  SELECT src, dst, CAST(1 AS BIGINT) FROM e
        |  UNION
        |  SELECT r.u, e.dst, r.len + 1
        |  FROM r JOIN e ON e.src = r.v)
        |SELECT m.mi, COALESCE(l.longest_in, 0) AS longest_in
        |FROM (SELECT DISTINCT mi FROM months) m
        |LEFT JOIN (SELECT v, MAX(len) AS longest_in FROM r GROUP BY v) l
        |  ON l.v = m.mi
        |ORDER BY m.mi""".stripMargin,
    // identical cut double-counting per incident community, PPM exact
    "q_graph_conductance" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |  FROM lineitem WHERE l_quantity = 1.0),
        |ed AS (SELECT DISTINCT x.s AS src, y.s AS dst
        |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |nat AS (SELECT s_suppkey AS v, s_nationkey AS c FROM supplier),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT src AS v FROM ed
        |        UNION ALL SELECT dst AS v FROM ed) GROUP BY v),
        |vol AS (SELECT c, CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(d) AS BIGINT) AS vol
        |  FROM deg JOIN nat ON deg.v = nat.v GROUP BY c),
        |lab AS (SELECT ns.c AS c_src, nd.c AS c_dst FROM ed
        |  JOIN nat ns ON ed.src = ns.v JOIN nat nd ON ed.dst = nd.v),
        |cut AS (SELECT c, CAST(count(*) AS BIGINT) AS cut FROM
        |  (SELECT c_src AS c FROM lab WHERE c_src <> c_dst
        |   UNION ALL SELECT c_dst AS c FROM lab WHERE c_src <> c_dst)
        |  GROUP BY c),
        |m2 AS (SELECT CAST(count(*) * 2 AS BIGINT) AS vol_all FROM ed)
        |SELECT vol.c AS nation, n_nodes, vol.vol,
        |  COALESCE(cut.cut, 0) AS cut,
        |  COALESCE(cut.cut, 0) * 1000000
        |    // nullif(least(vol.vol, m2.vol_all - vol.vol), 0)
        |    AS conductance_ppm
        |FROM vol LEFT JOIN cut ON vol.c = cut.c, m2
        |ORDER BY nation""".stripMargin,
    // same (degree, vertex)-ordered ln fold, exact integer inputs
    "q_graph_powerlaw" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |  FROM lineitem WHERE l_quantity = 1.0),
        |ed AS (SELECT DISTINCT x.s AS src, y.s AS dst
        |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT src AS v FROM ed
        |        UNION ALL SELECT dst AS v FROM ed) GROUP BY v
        |  HAVING count(*) >= 2),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    MIN(d) AS d_min_observed,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(ln(d / 2.0) ORDER BY d, v)), (a, b) -> a + b)
        |      AS lnsum
        |  FROM deg)
        |SELECT n, d_min_observed,
        |  round(1.0 + CAST(n AS DOUBLE) / lnsum, 6) AS alpha_r6,
        |  round(lnsum, 6) AS lnsum_r6
        |FROM f""".stripMargin,
    // both HITS rounds unrolled with the same L1 floor-div renorm
    "q_graph_hits" ->
      s"""WITH $edgeCte,
         |hubs AS (SELECT DISTINCT src AS v FROM e),
         |auths AS (SELECT DISTINCT dst AS v FROM e),
         |h0 AS (SELECT v, CAST(1000000000 AS BIGINT) AS h FROM hubs),
         |a1r AS (SELECT dst AS v, CAST(SUM(h) AS BIGINT) AS a
         |  FROM e JOIN h0 ON e.src = h0.v GROUP BY dst),
         |a1 AS (SELECT v, CAST(CAST(a AS HUGEINT) * 1000000000
         |    // (SELECT SUM(a) FROM a1r) AS BIGINT) AS a FROM a1r),
         |h1r AS (SELECT src AS v, CAST(SUM(a) AS BIGINT) AS h
         |  FROM e JOIN a1 ON e.dst = a1.v GROUP BY src),
         |h1 AS (SELECT v, CAST(CAST(h AS HUGEINT) * 1000000000
         |    // (SELECT SUM(h) FROM h1r) AS BIGINT) AS h FROM h1r),
         |a2r AS (SELECT dst AS v, CAST(SUM(h) AS BIGINT) AS a
         |  FROM e JOIN h1 ON e.src = h1.v GROUP BY dst),
         |a2 AS (SELECT v, CAST(CAST(a AS HUGEINT) * 1000000000
         |    // (SELECT SUM(a) FROM a2r) AS BIGINT) AS a FROM a2r),
         |h2r AS (SELECT src AS v, CAST(SUM(a) AS BIGINT) AS h
         |  FROM e JOIN a2 ON e.dst = a2.v GROUP BY src),
         |h2 AS (SELECT v, CAST(CAST(h AS HUGEINT) * 1000000000
         |    // (SELECT SUM(h) FROM h2r) AS BIGINT) AS h FROM h2r),
         |verts AS (SELECT v FROM hubs UNION SELECT v FROM auths)
         |SELECT verts.v AS vertex,
         |  COALESCE(h2.h, 0) AS hub_scaled,
         |  COALESCE(a2.a, 0) AS auth_scaled
         |FROM verts LEFT JOIN h2 ON verts.v = h2.v
         |  LEFT JOIN a2 ON verts.v = a2.v
         |ORDER BY auth_scaled DESC, hub_scaled DESC, vertex""".stripMargin,
    // identical symmetrized edge-degree moments, one IEEE formula
    "q_graph_assortativity" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |  FROM lineitem WHERE l_quantity = 1.0),
        |ed AS (SELECT DISTINCT x.s AS src, y.s AS dst
        |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT src AS v FROM ed
        |        UNION ALL SELECT dst AS v FROM ed) GROUP BY v),
        |bo AS (
        |  SELECT ds.d AS dj, dd.d AS dk FROM ed
        |    JOIN deg ds ON ed.src = ds.v JOIN deg dd ON ed.dst = dd.v
        |  UNION ALL
        |  SELECT dd.d AS dj, ds.d AS dk FROM ed
        |    JOIN deg ds ON ed.src = ds.v JOIN deg dd ON ed.dst = dd.v)
        |SELECT CAST(count(*) AS BIGINT) AS s2m,
        |  CAST(SUM(dj * dk) AS BIGINT) AS sjk,
        |  CAST(SUM(dj) AS BIGINT) AS sj,
        |  CAST(SUM(dj * dj) AS BIGINT) AS sj2,
        |  round(CAST(CAST(count(*) AS BIGINT) * CAST(SUM(dj * dk)
        |        AS BIGINT) - CAST(SUM(dj) AS BIGINT) * CAST(SUM(dj)
        |        AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(count(*) AS BIGINT) * CAST(SUM(dj * dj)
        |        AS BIGINT) - CAST(SUM(dj) AS BIGINT) * CAST(SUM(dj)
        |        AS BIGINT) AS DOUBLE), 6) AS r_r6
        |FROM bo""".stripMargin,
    // identical exact-integer modularity decomposition per nation
    "q_graph_modularity" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |  FROM lineitem WHERE l_quantity = 1.0),
        |ed AS (SELECT DISTINCT x.s AS src, y.s AS dst
        |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |nat AS (SELECT s_suppkey AS v, s_nationkey AS c FROM supplier),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT src AS v FROM ed
        |        UNION ALL SELECT dst AS v FROM ed) GROUP BY v),
        |comm AS (SELECT c, CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(d) AS BIGINT) AS deg_sum
        |  FROM deg JOIN nat ON deg.v = nat.v GROUP BY c),
        |intra AS (SELECT ns.c AS c, CAST(count(*) AS BIGINT)
        |      AS intra_edges
        |  FROM ed JOIN nat ns ON ed.src = ns.v
        |    JOIN nat nd ON ed.dst = nd.v
        |  WHERE ns.c = nd.c GROUP BY ns.c),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ed),
        |per AS (SELECT comm.c, n_nodes, deg_sum,
        |    COALESCE(intra_edges, 0) AS intra_edges
        |  FROM comm LEFT JOIN intra ON comm.c = intra.c),
        |tot AS (SELECT CAST(SUM(intra_edges) AS BIGINT) AS sum_intra,
        |    CAST(SUM(deg_sum * deg_sum) AS BIGINT) AS sum_d2 FROM per)
        |SELECT per.c AS nation, n_nodes, intra_edges, deg_sum,
        |  4 * m.m * tot.sum_intra - tot.sum_d2 AS q_num,
        |  round(CAST(4 * m.m * tot.sum_intra - tot.sum_d2 AS DOUBLE)
        |    / CAST(4 * m.m * m.m AS DOUBLE), 6) AS q_r6
        |FROM per, m, tot
        |ORDER BY nation""".stripMargin,
    // from-scratch CC over the UNION graph (old + delta pairs) — the
    // maintenance-correctness theorem as a hash compare
    "q_graph_cc_incremental" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents WHERE doc_id < 350),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b)
        |SELECT node AS doc_id, MIN(lab) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "q_graph_ktruss" -> ktrussSql,
    "q_graph_link_pred" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem WHERE l_quantity = 1.0),
        |raw AS (SELECT DISTINCT x.s AS a, y.s AS b
        |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |sym AS (SELECT a AS v, b AS n FROM raw
        |        UNION ALL SELECT b, a FROM raw),
        |deg AS (SELECT v, COUNT(*) AS d FROM sym GROUP BY v),
        |w AS (SELECT l.v AS z, l.n AS pa, r.n AS pb
        |      FROM sym l JOIN sym r ON l.v = r.v AND l.n < r.n),
        |sc AS (SELECT w.pa, w.pb, COUNT(*) AS cn,
        |    SUM(1.0 / ln(CAST(deg.d AS DOUBLE))) AS aa
        |  FROM w JOIN deg ON deg.v = w.z
        |  GROUP BY w.pa, w.pb HAVING COUNT(*) >= 2),
        |nonedge AS (SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (SELECT 1 FROM raw
        |    WHERE raw.a = sc.pa AND raw.b = sc.pb))
        |SELECT n.pa AS a, n.pb AS b, n.cn,
        |  round(CAST(n.cn AS DOUBLE) / (da.d + db.d - n.cn), 6)
        |    AS jaccard_r6,
        |  round(n.aa, 6) AS aa_r6
        |FROM nonedge n JOIN deg da ON da.v = n.pa
        |  JOIN deg db ON db.v = n.pb
        |ORDER BY a, b""".stripMargin,
    // ≤4-edge walk enumeration + min — replays 4 Bellman–Ford rounds
    // exactly (integer weights ⇒ order-independent min/+).
    "q_graph_sssp" ->
      """WITH RECURSIVE ps AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |  FROM lineitem WHERE l_quantity = 1.0),
        |und AS (
        |  SELECT x.s AS a, y.s AS b, min(x.p % 97 + 1) AS w
        |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s
        |  GROUP BY x.s, y.s),
        |edges AS (SELECT a AS src, b AS dst, w FROM und
        |          UNION ALL SELECT b, a, w FROM und),
        |walk(v, d, hops) AS (
        |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT e.dst, walk.d + e.w, walk.hops + 1
        |  FROM walk JOIN edges e ON e.src = walk.v
        |  WHERE walk.hops < 4)
        |SELECT v AS vertex, min(d) AS dist FROM walk
        |GROUP BY v ORDER BY dist, vertex""".stripMargin,
    "q_graph_betweenness" -> betweennessOracleSql(3, 32),
    "q_graph_pagerank" ->
      s"""WITH $edgeCte,
        |verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |p AS (SELECT 1000000000 // COUNT(*) AS p0,
        |        ((1000000000 // COUNT(*)) * 15) // 100 AS base
        |      FROM verts),
        |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT v, (SELECT p0 FROM p) AS pr FROM verts),
        |c1 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r0 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c1 ON verts.v = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r1 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c2 ON verts.v = c2.dst),
        |c3 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r2 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c3 ON verts.v = c3.dst)
        |SELECT v AS vertex, pr AS rank_scaled FROM r3
        |ORDER BY rank_scaled DESC, vertex""".stripMargin,
    "q_graph_harmonic" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem WHERE l_quantity = 1.0),
        |raw AS (SELECT x.s AS src, y.s AS dst
        |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |          greatest(src, dst) AS b
        |        FROM raw WHERE src <> dst),
        |sym AS (SELECT a AS v, b AS n FROM und
        |        UNION ALL SELECT b AS v, a AS n FROM und),
        |r0 AS (SELECT DISTINCT v AS s, v, 0 AS d FROM sym),
        |e1 AS (SELECT r.s, sym.n AS v, 1 AS d
        |       FROM r0 r JOIN sym ON r.v = sym.v),
        |r1 AS (SELECT s, v, MIN(d) AS d FROM
        |         (SELECT * FROM r0 UNION ALL SELECT * FROM e1)
        |       GROUP BY s, v),
        |e2 AS (SELECT r.s, sym.n AS v, 2 AS d
        |       FROM r1 r JOIN sym ON r.v = sym.v),
        |r2 AS (SELECT s, v, MIN(d) AS d FROM
        |         (SELECT * FROM r1 UNION ALL SELECT * FROM e2)
        |       GROUP BY s, v),
        |e3 AS (SELECT r.s, sym.n AS v, 3 AS d
        |       FROM r2 r JOIN sym ON r.v = sym.v),
        |r3 AS (SELECT s, v, MIN(d) AS d FROM
        |         (SELECT * FROM r2 UNION ALL SELECT * FROM e3)
        |       GROUP BY s, v)
        |SELECT v AS vertex, CAST(SUM(840 // d) AS BIGINT)
        |    AS harmonic_scaled,
        |  count(*) AS n_reached
        |FROM r3 WHERE d > 0 GROUP BY v
        |ORDER BY harmonic_scaled DESC, vertex""".stripMargin,
    "q_graph_kcore" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem WHERE l_quantity = 1.0),
        |raw AS (SELECT x.s AS src, y.s AS dst
        |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |e0 AS (SELECT DISTINCT least(src, dst) AS a,
        |         greatest(src, dst) AS b
        |       FROM raw WHERE src <> dst),
        |d1 AS (SELECT v, count(*) AS d FROM
        |         (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
        |       GROUP BY v),
        |k1 AS (SELECT v FROM d1 WHERE d >= 3),
        |e1 AS (SELECT a, b FROM e0
        |       WHERE a IN (SELECT v FROM k1)
        |         AND b IN (SELECT v FROM k1)),
        |d2 AS (SELECT v, count(*) AS d FROM
        |         (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)
        |       GROUP BY v),
        |k2 AS (SELECT v FROM d2 WHERE d >= 3),
        |e2 AS (SELECT a, b FROM e1
        |       WHERE a IN (SELECT v FROM k2)
        |         AND b IN (SELECT v FROM k2)),
        |d3 AS (SELECT v, count(*) AS d FROM
        |         (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)
        |       GROUP BY v),
        |k3 AS (SELECT v FROM d3 WHERE d >= 3),
        |e3 AS (SELECT a, b FROM e2
        |       WHERE a IN (SELECT v FROM k3)
        |         AND b IN (SELECT v FROM k3))
        |SELECT v AS vertex, count(*) AS degree FROM
        |  (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
        |GROUP BY v ORDER BY vertex""".stripMargin,
    "q_graph_pagerank_weighted" ->
      """WITH e AS (SELECT l_suppkey AS src, o_custkey + 1000000 AS dst,
        |         SUM(CAST(l_quantity AS BIGINT)) AS w
        |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       GROUP BY src, dst),
        |verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |p AS (SELECT 1000000000 // COUNT(*) AS p0,
        |        ((1000000000 // COUNT(*)) * 15) // 100 AS base
        |      FROM verts),
        |sw AS (SELECT src, SUM(w) AS sw FROM e GROUP BY src),
        |r0 AS (SELECT v, (SELECT p0 FROM p) AS pr FROM verts),
        |c1 AS (SELECT e.dst, SUM((r.pr * e.w) // s.sw) AS s
        |       FROM e JOIN r0 r ON e.src = r.v
        |         JOIN sw s ON e.src = s.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c1 ON verts.v = c1.dst),
        |c2 AS (SELECT e.dst, SUM((r.pr * e.w) // s.sw) AS s
        |       FROM e JOIN r1 r ON e.src = r.v
        |         JOIN sw s ON e.src = s.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c2 ON verts.v = c2.dst)
        |SELECT v AS vertex, pr AS rank_scaled FROM r2
        |ORDER BY rank_scaled DESC, vertex""".stripMargin,
    "q_graph_ppr" ->
      s"""WITH $edgeCte,
        |verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT v, CASE WHEN v IN (1, 2) THEN 500000000
        |         ELSE 0 END AS pr FROM verts),
        |c1 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r0 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT verts.v, CAST(
        |         CASE WHEN verts.v IN (1, 2) THEN 75000000 ELSE 0 END
        |         + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c1 ON verts.v = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r1 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT verts.v, CAST(
        |         CASE WHEN verts.v IN (1, 2) THEN 75000000 ELSE 0 END
        |         + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c2 ON verts.v = c2.dst),
        |c3 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r2 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT verts.v, CAST(
        |         CASE WHEN verts.v IN (1, 2) THEN 75000000 ELSE 0 END
        |         + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c3 ON verts.v = c3.dst)
        |SELECT v AS vertex, pr AS rank_scaled FROM r3 WHERE pr > 0
        |ORDER BY rank_scaled DESC, vertex""".stripMargin,
    "q_graph_label_prop" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem WHERE l_quantity = 1.0),
        |raw AS (SELECT x.s AS src, y.s AS dst
        |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |          greatest(src, dst) AS b
        |        FROM raw WHERE src <> dst),
        |sym AS (SELECT a AS v, b AS n FROM und
        |        UNION ALL SELECT b AS v, a AS n FROM und),
        |r0 AS (SELECT DISTINCT v, v AS label FROM sym),
        |c1 AS (SELECT s.v, l.label, COUNT(*) AS c
        |       FROM sym s JOIN r0 l ON s.n = l.v GROUP BY s.v, l.label),
        |r1 AS (SELECT v, MIN(label) AS label FROM
        |         (SELECT v, label, c, MAX(c) OVER (PARTITION BY v) AS mx
        |          FROM c1) t
        |       WHERE c = mx GROUP BY v),
        |c2 AS (SELECT s.v, l.label, COUNT(*) AS c
        |       FROM sym s JOIN r1 l ON s.n = l.v GROUP BY s.v, l.label),
        |r2 AS (SELECT v, MIN(label) AS label FROM
        |         (SELECT v, label, c, MAX(c) OVER (PARTITION BY v) AS mx
        |          FROM c2) t
        |       WHERE c = mx GROUP BY v)
        |SELECT v AS vertex, label FROM r2 ORDER BY vertex""".stripMargin,
    "q_graph_degree" ->
      s"""WITH $edgeCte,
        |d AS (SELECT src, COUNT(*) AS out_degree FROM e GROUP BY src)
        |SELECT out_degree, COUNT(*) AS n_vertices
        |FROM d GROUP BY out_degree ORDER BY out_degree""".stripMargin,
    "q_graph_triangles" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem WHERE l_quantity = 1.0),
        |raw AS (SELECT x.s AS src, y.s AS dst
        |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |          greatest(src, dst) AS b
        |        FROM raw WHERE src <> dst),
        |deg AS (SELECT v, COUNT(*) AS d
        |        FROM (SELECT a AS v FROM und
        |              UNION ALL SELECT b AS v FROM und)
        |        GROUP BY v),
        |ori AS (SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |         THEN u.a ELSE u.b END AS s,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |         THEN u.b ELSE u.a END AS t
        |  FROM und u JOIN deg da ON u.a = da.v
        |    JOIN deg db ON u.b = db.v),
        |w AS (SELECT e1.s, e1.t AS x, e2.t AS y
        |      FROM ori e1 JOIN ori e2 ON e1.s = e2.s WHERE e1.t < e2.t),
        |ne AS (SELECT COUNT(*) AS n_edges FROM und),
        |nw AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT)
        |         AS n_wedges FROM deg),
        |nt AS (SELECT COUNT(*) AS n_triangles
        |       FROM w JOIN und ON w.x = und.a AND w.y = und.b)
        |SELECT n_edges, n_wedges, n_triangles,
        |  3.0 * n_triangles / CAST(n_wedges AS DOUBLE)
        |    AS global_clustering
        |FROM ne, nw, nt""".stripMargin,
    "q_graph_local_cc" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        |            FROM lineitem WHERE l_quantity = 1.0),
        |raw AS (SELECT x.s AS src, y.s AS dst
        |        FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |und AS (SELECT DISTINCT least(src, dst) AS a,
        |          greatest(src, dst) AS b
        |        FROM raw WHERE src <> dst),
        |deg AS (SELECT v, COUNT(*) AS d
        |        FROM (SELECT a AS v FROM und
        |              UNION ALL SELECT b AS v FROM und)
        |        GROUP BY v),
        |ori AS (SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |         THEN u.a ELSE u.b END AS s,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |         THEN u.b ELSE u.a END AS t
        |  FROM und u JOIN deg da ON u.a = da.v
        |    JOIN deg db ON u.b = db.v),
        |closed AS (SELECT e1.s, e1.t AS x, e2.t AS y
        |           FROM ori e1 JOIN ori e2 ON e1.s = e2.s
        |           JOIN und ON e1.t = und.a AND e2.t = und.b
        |           WHERE e1.t < e2.t),
        |corners AS (SELECT unnest([s, x, y]) AS v FROM closed),
        |tv AS (SELECT v, COUNT(*) AS n_triangles FROM corners GROUP BY v)
        |SELECT deg.v AS vertex, deg.d AS degree,
        |  COALESCE(tv.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.d < 2 THEN 0.0
        |       ELSE 2.0 * COALESCE(tv.n_triangles, 0)
        |         / CAST(deg.d * (deg.d - 1) AS DOUBLE) END
        |    AS local_clustering
        |FROM deg LEFT JOIN tv ON deg.v = tv.v
        |ORDER BY vertex""".stripMargin
  )
}
