package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths with the same output shape (query_id, neighbor_id, cosine,
  * rank):
  *  - `bruteForceTopK`: exact O(|Q|·|N|) — the correctness baseline. The
  *    cross join broadcasts the (small) query side; per-pair cosine is a
  *    codegen'd expression; top-k is a per-query window. Use when |Q| is
  *    small (ad-hoc search), any |N| (scales out linearly).
  *  - `lshTopK`: hyperplane-LSH bucketed — candidates only from matching
  *    signature buckets, so the join is an equi-join on bucket keys and
  *    cost is |Q|·(bucket size). The 100 TB path. Approximate: recall
  *    depends on nBits/nTables; verified vs brute force in tests.
  */
object Similarity {

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** MIPS top-k — maximum INNER PRODUCT retrieval, the unnormalized
    * cousin of [[bruteForceTopK]] (recommendation scores, reward
    * models, any embedding whose norm carries signal). Exact ranking
    * here orders by the raw dot product (index-ordered fold — the
    * cosSql determinism contract without the norm division). The
    * 100 TB path is the norm-augmentation reduction (Bachrach et al.,
    * RecSys 2014): append √(M²−|x|²) to corpus vectors and 0 to
    * queries and ANY cosine ANN index (lshTopK / ivfTopK) serves
    * MIPS — noted rather than defaulted because the float
    * augmentation can flip near-tied ranks vs the exact product.
    */
  def mipsTopK(queries: DataFrame, corpus: DataFrame,
               idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(qv, cv," +
          " (a, b) -> cast(a as double) * b), cast(0.0 as double)," +
          " (acc, x) -> acc + x)").as("ip"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ip").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the top-k most-similar corpus vectors whose LABEL DIFFERS — the
    * negatives that sit closest to the decision boundary, which is what
    * embedding-model training loops sample (e.g. Xiong et al., ANCE,
    * 2021). Same shape and determinism contract as [[bruteForceTopK]]
    * (broadcast anchor side, map-side cosine, per-anchor window);
    * for corpus-scale anchor sets, feed [[lshCandidates]] output
    * through the same label filter instead of the cross join.
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col(labelCol).as("neg_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("neg_label"))
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-table hyperplane LSH: a candidate is any corpus vector sharing
    * a full signature with the query in at least one of `nTables` tables
    * (different seeds). Equi-join on (table, signature).
    *
    * `multiprobe = true` additionally probes, per table, every bucket at
    * Hamming distance 1 from the query's signature — ASYMMETRIC
    * multiprobe: only the small broadcast query side fans out (×(nBits+1)
    * rows), the corpus side still emits exactly one row per (vector,
    * table), so the extra recall costs no corpus-side work or shuffle.
    */
  /** The candidate (query_id, neighbor_id) pairs lshTopK scores —
    * exposed so tuning tools (RecallSweep) can measure candidate volume
    * for a parameter point without duplicating the banding logic.
    *
    * Carries ONLY the id pair: a vector sharing buckets in several
    * tables would otherwise push its full embedding through the dedup
    * shuffle once per collision — distinct on 16 bytes instead; vectors
    * re-attach afterwards (queries broadcast by contract; corpus by
    * equi-join on id, one vector per surviving candidate).
    */
  def lshCandidates(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String,
                    nBits: Int, nTables: Int,
                    multiprobe: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val qSig = queries.select(col(idCol).as("query_id"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"), hyperplaneTableSig(col(vecCol), nBits, t)
          .as("sig"))): _*)).as("b"))
      .select(col("query_id"), col("b.tbl").as("tbl"), col("b.sig").as("sig"))
    val q =
      if (!multiprobe) qSig
      else qSig.select(col("query_id"), col("tbl"),
        explode(array(col("sig") +: (0 until nBits).map(j =>
          col("sig").bitwiseXOR(lit(1L << j))): _*)).as("sig"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"), hyperplaneTableSig(col(vecCol), nBits, t)
          .as("sig"))): _*)).as("b"))
      .select(col("neighbor_id"), col("b.tbl").as("tbl"), col("b.sig").as("sig"))
    c.join(broadcast(q), Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nBits: Int = 12, nTables: Int = 4,
              multiprobe: Boolean = false): DataFrame = {
    val cand = lshCandidates(queries, corpus, idCol, vecCol,
      nBits, nTables, multiprobe)
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Raw random projection for tree level `j`: Σᵢ sign(0,j,i)·v[i] as
    * an index-ordered left fold (the cross-engine determinism contract
    * every cosine here rides). Signs are the same md5-parity family as
    * [[hyperplaneSign]] table 0 — the DuckDB twin embeds them as array
    * literals. */
  private[graft] def rpProj(vec: org.apache.spark.sql.Column, j: Int,
      dims: Int, tree: Int = 0): org.apache.spark.sql.Column = {
    val signs = array((0 until dims).map(i =>
      lit(hyperplaneSign(tree, j, i))): _*)
    aggregate(zip_with(vec, signs, (x, s) => x.cast("double") * s),
      lit(0.0), (a, b) => a + b)
  }

  /** RANDOM-PROJECTION TREE routing (Dasgupta & Freund, STOC 2008):
    * a depth-d tree that splits each node at the LOWER-MEDIAN element
    * of its members' projection onto the level's hyperplane (one
    * shared direction per level; per-node data-adaptive threshold —
    * the property that lets RP trees adapt to low intrinsic dimension,
    * which origin-split hyperplane LSH cannot). Leaves are
    * balanced-by-construction buckets of ~|N|/2^d vectors.
    *
    * Determinism/exactness: projections are index-ordered folds
    * (identical doubles cross-engine); each threshold is a rank-picked
    * ELEMENT — ((n+1) div 2)-th in (proj, id) order — never an
    * interpolated midpoint, because (a+b)/2 vs a+(b−a)/2 differ in the
    * last ulp between engines. Routing compares identical doubles.
    *
    * Scale shape: per-node ranks run through [[Prefix.denseRank]]
    * (range-partitioned two-pass — the root's rank is NOT a
    * single-partition window over the corpus), looped over the ≤ 2^d−1
    * internal nodes — tree fan-out bounds the pass count, each pass
    * distributed. Thresholds are ≤ 2^d one-row frames broadcast back;
    * the candidate join is a leaf-key equi-join.
    *
    * Spill bands (`spillPct` > 0): alongside the median threshold,
    * each node also exposes the rank-picked elements at ranks
    * rm ± ⌊n·spillPct/100⌋ (clamped to [1, n]) as `lo`/`hi` — the
    * overlap buffer of a hybrid spill tree (Liu, Moore, Gray & Yang,
    * NIPS 2004), except the CORPUS is never duplicated: only QUERIES
    * spill to both children when their projection falls inside
    * (lo, hi] (defeatist-search mitigation). All three thresholds are
    * achieved elements, never interpolated.
    *
    * @param tree sign-family index — tree t projects with
    *             hyperplaneSign(t, j, i), so a forest's trees split on
    *             independent direction families
    * @return (routed corpus with `node` = leaf id, per-level
    *         (node, thr, lo, hi) threshold frames for routing queries)
    */
  private[graft] def rpTreeRoute(corpus: DataFrame, idCol: String,
      vecCol: String, depth: Int, dims: Int,
      rankPartitions: Int = 0,
      smallProjLimit: Long = 1L << 20,
      tree: Int = 0, spillPct: Int = 0): (DataFrame, Seq[DataFrame]) = {
    val (routed, bySpill) = rpTreeRouteMulti(corpus, idCol, vecCol,
      depth, dims, rankPartitions, smallProjLimit, tree,
      Seq(spillPct))
    (routed, bySpill(spillPct))
  }

  /** [[rpTreeRoute]] for a SWEEP of spill settings: the corpus is
    * projected, ranked and routed ONCE (projections, per-node rank
    * passes and the routing joins depend only on the median), and
    * each requested spill gets its own per-level (node, thr, lo, hi)
    * threshold frames read off the same ranks. This is what makes a
    * knob grid affordable: at 100 TB the index build (corpus routing)
    * dominates and is paid once; sweeping the spill band re-prices
    * only the query-side probe fanout.
    */
  private[graft] def rpTreeRouteMulti(corpus: DataFrame, idCol: String,
      vecCol: String, depth: Int, dims: Int,
      rankPartitions: Int = 0,
      smallProjLimit: Long = 1L << 20,
      tree: Int = 0, spillPcts: Seq[Int] = Seq(0))
      : (DataFrame, Map[Int, Seq[DataFrame]]) = {
    require(depth >= 1 && depth <= 4, "bounded tree depth 1..4")
    require(dims >= 1 && dims <= HyperplaneMaxDim)
    require(spillPcts.nonEmpty, "need at least one spill setting")
    // a duplicated spill value would append TWO threshold frames per
    // level for that key, desynchronizing spillProbe's per-level
    // frame indexing (ADVICE r15) — distinctness is part of the
    // contract, not a caller courtesy
    require(spillPcts.distinct.size == spillPcts.size,
      s"spillPcts must be distinct, got $spillPcts")
    spillPcts.foreach(s =>
      require(s >= 0 && s <= 25, "spill band 0..25%"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val projCols = (0 until depth).map(j =>
      rpProj(col(vecCol), j, dims, tree).as(s"p$j"))
    var cur = CacheScope.cached(corpus.select(
        (col(idCol).as("id") +: col(vecCol).as("v") +: projCols): _*)
      .withColumn("node", lit(0)))
    // Probe-bounded driver tier (the boruvkaForest discipline): when
    // the (id, depth × projection) table fits the driver, thresholds
    // come from one local sort per node — same (p, id) rank rule,
    // parity pinned in SimilaritySpec — and ship back as ≤ 2^j-row
    // literal frames; ROUTING stays distributed (broadcast joins over
    // the cached corpus). The per-node Prefix path below remains for
    // corpora that blow the probe.
    val probe = cur.select(
        (col("id") +: (0 until depth).map(j => col(s"p$j"))): _*)
      .limit((smallProjLimit + 1).toInt).collect()
    if (probe.length <= smallProjLimit) {
      var local = probe.map(r => (r.getLong(0),
        Array.tabulate(depth)(i => r.getDouble(1 + i)), 0))
      val framesBySpill = scala.collection.mutable.Map.empty[Int,
        Vector[DataFrame]].withDefaultValue(Vector.empty)
      (0 until depth).foreach { j =>
        val sortedByNode = local.groupBy(_._3).toSeq.map {
          case (nd, rs) => nd -> rs.sortBy(t => (t._2(j), t._1))
        }
        for (s <- spillPcts) {
          val thr = sortedByNode.map { case (nd, sorted) =>
            val n = sorted.length.toLong
            val rm = (n + 1) / 2
            val d = n * s / 100
            (nd, sorted(rm.toInt - 1)._2(j),
              sorted(math.max(1L, rm - d).toInt - 1)._2(j),
              sorted(math.min(n, rm + d).toInt - 1)._2(j))
          }
          framesBySpill(s) = framesBySpill(s) :+
            thr.sortBy(_._1).toDF("node", "thr", "lo", "hi")
        }
        val thrMap = sortedByNode.map { case (nd, sorted) =>
          nd -> sorted(((sorted.length + 1) / 2) - 1)._2(j)
        }.toMap
        local = local.map { case (id, ps, nd) =>
          (id, ps, nd * 2 + (if (ps(j) <= thrMap(nd)) 0 else 1))
        }
      }
      var routed = cur
      val medianFrames = framesBySpill(spillPcts.head)
      for (j <- 0 until depth) {
        routed = routed
          .join(broadcast(medianFrames(j).select("node", "thr")),
            Seq("node"))
          .withColumn("node", col("node") * 2
            + when(col(s"p$j") <= col("thr"), 0).otherwise(1))
          .drop("thr")
      }
      return (routed, spillPcts.map(s =>
        s -> framesBySpill(s).toSeq).toMap)
    }
    val thrsBySpill = scala.collection.mutable.Map.empty[Int,
      Vector[DataFrame]].withDefaultValue(Vector.empty)
    for (j <- 0 until depth) {
      // threshold frames are ≤ 2^j rows but close over per-node rank
      // DAGs — cached so corpus routing and query routing don't each
      // re-execute them (they are consumed by 2 broadcasts per level);
      // ONE rank pass per node serves every requested spill (the lo/hi
      // aggregate just reads more rank marks off the same ranked rows)
      val rmE = expr("(n + 1) div 2")
      def rloE(s: Int) = expr(
        s"greatest(1, (n + 1) div 2 - n * $s div 100)")
      def rhiE(s: Int) = expr(
        s"least(n, (n + 1) div 2 + n * $s div 100)")
      val markCond = spillPcts
        .map(s => col("rk") === rloE(s) || col("rk") === rhiE(s))
        .reduce(_ || _) || col("rk") === rmE
      val wide = CacheScope.cached((0 until (1 << j)).map { nd =>
        val part = cur.filter(col("node") === nd)
        val cnt = part.agg(count(lit(1)).as("n"))
        Prefix.denseRank(part, Seq(col(s"p$j"), col("id")), "rk",
            partitions = rankPartitions)
          .crossJoin(broadcast(cnt))
          .filter(markCond)
          .agg(max(when(col("rk") === rmE, col(s"p$j"))).as("thr"),
            spillPcts.flatMap(s => Seq(
              max(when(col("rk") === rloE(s), col(s"p$j")))
                .as(s"lo_$s"),
              max(when(col("rk") === rhiE(s), col(s"p$j")))
                .as(s"hi_$s"))): _*)
          .select((lit(nd).as("node") +: col("thr") +:
            spillPcts.flatMap(s =>
              Seq(col(s"lo_$s"), col(s"hi_$s")))): _*)
          .filter(col("thr").isNotNull) // empty node: no threshold row
      }.reduce(_.unionByName(_)))
      for (s <- spillPcts)
        thrsBySpill(s) = thrsBySpill(s) :+ wide.select(col("node"),
          col("thr"), col(s"lo_$s").as("lo"), col(s"hi_$s").as("hi"))
      val thr = wide
      cur = CacheScope.cached(cur
        .join(broadcast(thr.select("node", "thr")), Seq("node"))
        .withColumn("node", col("node") * 2
          + when(col(s"p$j") <= col("thr"), 0).otherwise(1))
        .drop("thr"))
    }
    (cur, spillPcts.map(s => s -> thrsBySpill(s).toSeq).toMap)
  }

  /** RP-tree ANN, same output shape as the brute/LSH/IVF variants:
    * queries route through the corpus-derived thresholds to one leaf
    * and score only its members. Fully deterministic → oracle-checked
    * (the DuckDB twin replays projections, rank-picked medians and
    * routing). Recall floor vs brute force pinned in SimilaritySpec.
    */
  def rpTreeTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 depth: Int = 3, dims: Int = 64,
                 rankPartitions: Int = 0,
                 smallProjLimit: Long = 1L << 20): DataFrame = {
    val (routed, thrs) = rpTreeRoute(corpus, idCol, vecCol, depth,
      dims, rankPartitions, smallProjLimit)
    val projCols = (0 until depth).map(j =>
      rpProj(col(vecCol), j, dims).as(s"p$j"))
    var q = queries.select(
        (col(idCol).as("query_id") +: col(vecCol).as("qv")
          +: projCols): _*)
      .withColumn("node", lit(0))
    for (j <- 0 until depth) {
      // LEFT join: a query landing in a corpus-empty subtree keeps
      // routing (null thr ⇒ otherwise ⇒ right child) instead of being
      // silently dropped — it still yields zero candidates, but the
      // routing function is total for external query sets
      q = q.join(broadcast(thrs(j).select("node", "thr")),
          Seq("node"), "left")
        .withColumn("node", col("node") * 2
          + when(col(s"p$j") <= col("thr"), 0).otherwise(1))
        .drop("thr")
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    routed.join(broadcast(
        q.select(col("query_id"), col("qv"), col("node"))), Seq("node"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** RP-FOREST ANN with spill multiprobe: `nTrees` independent RP
    * trees (tree t splits on the hyperplaneSign(t, ·, ·) direction
    * family) and, within each tree, queries SPILL to both children
    * whenever their projection falls inside the node's rank-picked
    * (lo, hi] band (see [[rpTreeRoute]]) — the two standard recall
    * levers for defeatist tree search (Liu et al. 2004 spill trees;
    * Dasgupta & Sinha 2013 on why independent random trees compound).
    * Candidates = DISTINCT union of every probed leaf's members across
    * all trees; exact cosine re-rank picks the top k.
    *
    * Determinism: every threshold is an achieved element; spill
    * membership compares identical doubles; candidate dedup is exact —
    * so the whole forest is oracle-replayable. Scale shape: corpus is
    * routed once per tree (never duplicated — only query probe rows
    * fan out, ≤ 2^depth per tree worst-case), candidates flow through
    * one leaf-key equi-join per tree, and the re-rank touches only
    * candidate pairs.
    */
  def rpForestTopK(queries: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String, k: Int,
                   nTrees: Int = 2, depth: Int = 3, dims: Int = 64,
                   spillPct: Int = 10,
                   rankPartitions: Int = 0,
                   smallProjLimit: Long = 1L << 20): DataFrame = {
    require(nTrees >= 1 && nTrees <= 8, "bounded forest 1..8 trees")
    val cand = (0 until nTrees).map { t =>
      val (routed, thrs) = rpTreeRoute(corpus, idCol, vecCol, depth,
        dims, rankPartitions, smallProjLimit, tree = t,
        spillPct = spillPct)
      routed.join(
          broadcast(spillProbe(queries, idCol, vecCol, depth, dims, t,
            thrs).distinct()),
          Seq("node"))
        .filter(col("query_id") =!= col("id"))
        .select(col("query_id"), col("id").as("neighbor_id"))
    }.reduce(_.unionByName(_)).distinct()
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Query-side spill probe of tree `tree`: every (query_id, node)
    * leaf a query reaches when it descends left while p ≤ hi and
    * right while p > lo — BOTH children when p lands inside the
    * (lo, hi] band. LEFT join so corpus-empty subtrees prune the
    * probe (null band ⇒ both whens null ⇒ zero children) instead of
    * erroring. */
  private def spillProbe(queries: DataFrame, idCol: String,
      vecCol: String, depth: Int, dims: Int, tree: Int,
      thrs: Seq[DataFrame]): DataFrame = {
    val projCols = (0 until depth).map(j =>
      rpProj(col(vecCol), j, dims, tree).as(s"p$j"))
    var q = queries.select(
        (col(idCol).as("query_id") +: projCols): _*)
      .withColumn("node", lit(0))
    for (j <- 0 until depth) {
      q = q.join(broadcast(thrs(j).select("node", "lo", "hi")),
          Seq("node"), "left")
        .select(col("query_id") +: (0 until depth).map(i =>
          col(s"p$i")) :+ explode(filter(array(
            when(col(s"p$j") <= col("hi"), col("node") * 2),
            when(col(s"p$j") > col("lo"), col("node") * 2 + 1)),
          c => c.isNotNull)).as("node"): _*)
    }
    q.select(col("query_id"), col("node"))
  }

  /** KNOB-GRID RP-forest sweep: every (nTrees, spillPct) point of
    * `grid` evaluated against ONE shared index — each tree's corpus
    * routing and rank passes are built once ([[rpTreeRouteMulti]])
    * and reused by every spill setting and every forest size; only
    * the query probes (tiny vs the corpus) differ per point.
    * Point-for-point identical to calling [[rpForestTopK]] with the
    * same knobs (same routing, same candidate union-distinct, same
    * re-rank) — pinned in SimilaritySpec — at roughly the cost of the
    * single largest forest. The 100 TB story of a knob sweep: index
    * once, sweep the query-side knob for free.
    *
    * @param grid (nTrees, spillPct) points; trees ≤ 8, spill 0..25
    * @return (trees, spill, query_id, rank, neighbor_id, cosine)
    */
  def rpForestTopKGrid(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      grid: Seq[(Int, Int)], depth: Int = 3, dims: Int = 64,
      rankPartitions: Int = 0,
      smallProjLimit: Long = 1L << 20): DataFrame = {
    require(grid.nonEmpty, "empty knob grid")
    grid.foreach { case (t, _) =>
      require(t >= 1 && t <= 8, "bounded forest 1..8 trees") }
    val maxTrees = grid.map(_._1).max
    val spills = grid.map(_._2).distinct
    val candTS: Map[(Int, Int), DataFrame] =
      (0 until maxTrees).flatMap { t =>
        val (routed0, bySpill) = rpTreeRouteMulti(corpus, idCol,
          vecCol, depth, dims, rankPartitions, smallProjLimit, t,
          spills)
        val routed = CacheScope.cached(routed0)
        spills.map { s =>
          (t, s) -> CacheScope.cached(routed.join(
              broadcast(spillProbe(queries, idCol, vecCol, depth,
                dims, t, bySpill(s)).distinct()),
              Seq("node"))
            .filter(col("query_id") =!= col("id"))
            .select(col("query_id"), col("id").as("neighbor_id")))
        }
      }.toMap
    val arms = grid.map { case (tt, s) =>
      (0 until tt).map(t => candTS((t, s)))
        .reduce(_.unionByName(_)).distinct()
        .select(lit(tt).as("trees"), lit(s).as("spill"),
          col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val w = Window.partitionBy(col("trees"), col("spill"),
        col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    arms.join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(col("trees"), col("spill"), col("query_id"),
        col("neighbor_id"), cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: a coarse quantizer with no trained model. Centroids =
    * the `nLists` corpus vectors sorting first by md5(id) — a
    * deterministic, engine-portable pseudo-random sample; every corpus
    * vector joins the inverted list of its highest-cosine centroid; a
    * query scores only the vectors in its `nProbe` closest lists.
    *
    * Unlike most ANN indexes, the whole pipeline is deterministic
    * arithmetic (sample order, assignment, probing, ranking — all with id
    * tiebreaks and bit-reproducible cosines), so it is ORACLE-checkable:
    * the DuckDB twin reproduces the index and the search exactly.
    *
    * Scale shape: centroids broadcast (nLists rows); assignment is one
    * map-side pass over the corpus (nLists cosines per vector); the
    * search shuffles only the probed lists' candidates — corpus work per
    * query drops from O(N) to O(N·nProbe/nLists). At 100 TB the
    * assignment persists as a table bucketed by cent_id and the sample
    * gives way to trained centroids; the plan shape stays identical.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nLists: Int, nProbe: Int,
              centroids: Option[DataFrame] = None): DataFrame = {
    val v = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    // `centroids` (cent_id, centv — e.g. kmeansFit output) overrides the
    // md5 pseudo-random sample: the trained-IVF form. nLists is ignored
    // when centroids are supplied (their count defines the list count).
    val cents = centroids.map(_.select(col("cent_id"), col("centv")))
      .getOrElse(v.withColumn("_h", md5(col("cid").cast("string")))
        .orderBy(col("_h"), col("cid")).limit(nLists)
        .select(col("cv").as("centv"),
          row_number().over(Window.orderBy(col("_h"), col("cid")))
            .as("cent_id")))
    // List assignment is MAP-SIDE (assignToCentroids): the centroid
    // table collapses to a single broadcast row carrying a cent_id-sorted
    // array, and each corpus vector picks its list with an in-row
    // argmax — array_max over (sim, -cent_id) structs == "highest
    // cosine, ties to the smallest cent_id", the same ordering the
    // former row_number(sim desc, cent_id) window used. No Exchange
    // touches the corpus between scan and assignment (the earlier
    // crossJoin+window form replicated every vector nLists× through a
    // shuffle just to argmax — a 16×-corpus exchange at 100 TB). The
    // lambda body is the native cosine_sim expression: HOFs don't
    // whole-stage-codegen, so per-element cost is interpreted eval —
    // cosine_sim's fused primitive loop beats the zip_with+aggregate
    // chain (which allocates and boxes per element) by ~2×.
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centv")))).as("cents"))
    val assign = assignToCentroids(v, cents)
      .select(col("cent_id"), col("cid").as("neighbor_id"), col("cv"))
    // probes derive from the SAME broadcast single-row centroid array as
    // the assignment (ReusedExchange — one centroid job, not two);
    // explode is fine here: the probe side is |Q| rows
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("qv"), explode(col("cents")).as("c"))
      .select(col("query_id"), col("qv"), col("c.cent_id").as("cent_id"),
        expr("cosine_sim(qv, c.centv)").as("sim"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("cent_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // probe side is |Q|·nProbe rows — broadcast it so the corpus-sized
    // assignment never hash-shuffles on cent_id either; the only
    // exchange in the whole pipeline is the final per-query top-k
    // window, which carries (query_id, neighbor_id, cosine) only.
    assign.join(broadcast(probes), "cent_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** MATRYOSHKA-routed IVF (Kusupati et al., NeurIPS'22 × IVF): the
    * coarse quantizer — centroid table, corpus list assignment, query
    * probing — runs entirely in the first `routeDims` PREFIX dimensions
    * of the embedding, while the final candidate scoring uses the FULL
    * vectors. This is the production serving form for matryoshka-
    * trained embeddings: routing flops/bytes shrink by d/routeDims
    * (the centroid table stores prefix vectors only — at 1M lists ×
    * 1024 dims that's the difference between a broadcastable and an
    * unbroadcastable index), and full-fidelity similarity is paid only
    * on the probed lists' candidates.
    *
    * Same determinism contract as [[ivfTopK]] (md5-sampled centroids,
    * id tiebreaks, sequential-fold cosines) → oracle-checkable; same
    * plan shape (broadcast centroid array, map-side assignment carrying
    * the full vector alongside, broadcast probes, one final top-k
    * window exchange — the corpus never shuffles before scoring).
    */
  def ivfTopKMatryoshka(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        nLists: Int, nProbe: Int,
                        routeDims: Int): DataFrame = {
    require(routeDims >= 1, "routeDims must be >= 1")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      slice(col(vecCol), 1, routeDims).as("rv"))
    // centroids live in PREFIX space: md5-ordered deterministic sample,
    // stored already-sliced (the routing index is routeDims/d the size
    // of a full-dimension one)
    val cents = v.withColumn("_h", md5(col("cid").cast("string")))
      .orderBy(col("_h"), col("cid")).limit(nLists)
      .select(col("rv").as("centv"),
        row_number().over(Window.orderBy(col("_h"), col("cid")))
          .as("cent_id"))
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centv")))).as("cents"))
    // map-side assignment by PREFIX cosine; the full vector rides along
    // so scoring needs no corpus re-join
    val assign = v.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        "array_max(transform(cents, c -> " +
          "named_struct('sim', cosine_sim(rv, c.centv), " +
          "'neg_id', -c.cent_id)))"))
      .select((-col("best.neg_id")).as("cent_id"),
        col("cid").as("neighbor_id"), col("cv"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        slice(col(vecCol), 1, routeDims).as("qrv"))
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("qv"), col("qrv"),
        explode(col("cents")).as("c"))
      .select(col("query_id"), col("qv"), col("c.cent_id").as("cent_id"),
        expr("cosine_sim(qrv, c.centv)").as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("cent_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assign.join(broadcast(probes), "cent_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic Lloyd's k-means over an embedding column — the
    * "trained centroids" step that upgrades `ivfTopK`'s md5-sampled
    * coarse quantizer into a real IVF index, as a pure DataFrame loop:
    *
    *  - init: the k corpus vectors sorting first by md5(id) (same
    *    engine-portable pseudo-random sample as ivfTopK);
    *  - assignment: map-side argmax over the broadcast centroid array
    *    (identical plan shape to ivfTopK's assignment — the corpus
    *    never shuffles for it);
    *  - update: per-dimension mean via posexplode + avg, ROUNDED to 6
    *    decimals — the rounding absorbs float-sum-order drift across
    *    partitionings/engines (~1e-13), which is what makes the whole
    *    fit bit-reproducible and oracle-checkable;
    *  - clusters that lose all members drop out (classic Lloyd edge;
    *    callers needing fixed k re-seed — documented, not hidden).
    *
    * Each iteration shuffles only (cent_id, dim, partial-mean) rows —
    * k·dim per partition after map-side combine — never vectors. The
    * centroid table is cached per iteration (CacheScope) so the lazy
    * plan doesn't re-derive iteration i−1 per branch.
    *
    * @return DataFrame[cent_id: int, centv: array<float>]
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    var cents = v.withColumn("_h", md5(col("cid").cast("string")))
      .orderBy(col("_h"), col("cid")).limit(k)
      .select(col("cv").as("centv"),
        row_number().over(Window.orderBy(col("_h"), col("cid")))
          .as("cent_id"))
    for (_ <- 0 until iters) {
      val assigned = assignToCentroids(v, cents)
      cents = CacheScope.cached(assigned
        .select(col("cent_id"), posexplode(col("cv")).as(Seq("i", "x")))
        .groupBy(col("cent_id"), col("i"))
        .agg(round(avg(col("x").cast("double")), 6).as("xm"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("xm")))),
          s => s.getField("xm").cast("float")).as("centv"))
        .select(col("centv"), col("cent_id")))
    }
    cents.select(col("cent_id"), col("centv"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with deterministic k-means,
    * then compute EXACT pairwise cosine only WITHIN each cluster and
    * emit pairs above the threshold.
    *
    * The within-cluster restriction is what makes semantic dedup
    * feasible at 100 TB: quadratic work drops from N² to k·(N/k)², and
    * the pair join is an equi-join on cent_id (no cartesian product).
    * Cross-cluster near-dups are missed by construction — that is the
    * documented SemDeDup approximation; lower k trades cost for recall.
    *
    * Fully deterministic (kmeansFit's md5 init + id tiebreaks; native
    * codegen'd cosine is a sequential fold) → oracle-checkable.
    *
    * @return DataFrame[cent_id, id_a, id_b, cos] with id_a < id_b
    */
  def semanticDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int,
                       threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val cents = kmeansFit(emb, idCol, vecCol, k, iters)
    // cached: the pair join reads the assignment twice (both sides)
    val assigned = CacheScope.cached(assignToCentroids(
      emb.select(col(idCol).as("cid"), col(vecCol).as("cv")), cents))
    val a = assigned.select(col("cent_id"), col("cid").as("id_a"),
      col("cv").as("va"))
    val b = assigned.select(col("cent_id"), col("cid").as("id_b"),
      col("cv").as("vb"))
    a.join(b, Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", expr("cosine_sim(va, vb)"))
      .filter(col("cos") >= threshold)
      .select(col("cent_id").cast("long").as("cent_id"),
        col("id_a"), col("id_b"), col("cos"))
  }

  /** Symmetric per-vector int8 scalar quantization — the 4× embedding-
    * storage compressor (float32 → int8 + one float scale per vector)
    * that makes 100 TB vector corpora hold in a fraction of the space
    * for coarse ANN stages.
    *
    * scale = max|v|/127; q[i] = round(v[i]/scale) ∈ [−127, 127]. The
    * all-zero vector quantizes to zeros (nullif/coalesce — no NaNs).
    * Entirely map-side: no shuffle, no UDF — runs at scan speed.
    *
    * Cross-engine determinism: double division + round-half-away-from-
    * zero agree between Spark (BigDecimal HALF_UP) and DuckDB for all
    * non-exact-half inputs (exact binary .5 quotients are measure-zero
    * for float embeddings); the reconstruction RMSE is a sequential
    * array fold — bit-identical across engines (see Exact.scala rules).
    *
    * @return DataFrame[id, scale, q (array<byte>), rmse]
    */
  def quantizeInt8(emb: DataFrame, idCol: String,
                   vecCol: String): DataFrame = {
    val v = col(vecCol)
    val scale = array_max(transform(v, x => abs(x.cast("double")))) /
      lit(127.0)
    // project q + scale FIRST: rmse references q — inlining it would
    // re-run the whole quantization per element (no CSE inside lambdas)
    val quantized = emb.select(col(idCol).as("id"), v.as("vec"),
      scale.as("scale"),
      transform(v, x => coalesce(
        round(x.cast("double") / nullif(scale, lit(0.0))),
        lit(0.0)).cast("byte")).as("q"))
    quantized.select(col("id"), col("scale"), col("q"),
      sqrt(aggregate(
        zip_with(col("vec"), col("q"), (x, qi) =>
          x.cast("double") - qi.cast("double") *
            coalesce(nullif(col("scale"), lit(0.0)), lit(1.0))),
        lit(0.0), (acc, e) => acc + e * e) /
        size(col("vec")).cast("double")).as("rmse"))
  }

  /** Map-side nearest-centroid assignment (shared by ivfTopK and
    * kmeansFit): broadcast the cent_id-sorted centroid array as one row,
    * argmax in-row — no exchange touches the corpus.
    *
    * @return DataFrame[cent_id, cid, cv]
    */
  def assignToCentroids(v: DataFrame, cents: DataFrame): DataFrame = {
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centv")))).as("cents"))
    v.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        "array_max(transform(cents, c -> " +
          "named_struct('sim', cosine_sim(cv, c.centv), " +
          "'neg_id', -c.cent_id)))"))
      .select((-col("best.neg_id")).as("cent_id"), col("cid"), col("cv"))
  }

  /** Max embedding dimensionality the precomputed hyperplane sign
    * tables cover (vectors longer than this would zip against nulls and
    * silently zero their tail — callers with wider embeddings must
    * raise it).
    */
  val HyperplaneMaxDim: Int = 1024

  /** Driver-derived portable hyperplane sign for (table, bit, dim):
    * ±1 from the parity of the first hex digit of
    * md5("graft-hyp:t:j:i") — the same formula the DuckDB oracle twin
    * re-derives in SQL, so outputs are engine-portable even though the
    * engine never hashes at eval time (the signs precompute into the
    * native expression's reference matrix). Public: HyperplaneSigExpr
    * derives its sign matrix from this.
    */
  def hyperplaneSign(t: Int, j: Int, i: Int): Double =
    if (Integer.parseInt(graft.ops.Dedup
      .md5Hex(s"graft-hyp:$t:$j:$i").substring(0, 1), 16) % 2 == 0) 1.0
    else -1.0

  /** Hyperplane signature for table `t` (plan-time Int): bit j is the
    * sign of Σᵢ sign(t,j,i)·v[i], packed with weight 2^(nBits−1−j) —
    * the native codegen'd HyperplaneSigExpr (one fused multiply-add
    * loop per row, signs precomputed per executor; the interpreted HOF
    * chain measured 5.7 s and the per-element-md5 form 7.9 s vs ~1 s
    * for q_sim_topk_lsh at sf0.1, parity pinned bit-for-bit in
    * CustomFunctionsSpec).
    */
  private def hyperplaneTableSig(vec: org.apache.spark.sql.Column, nBits: Int,
                                 t: Int): org.apache.spark.sql.Column =
    call_function("hyperplane_sig", vec, lit(t), lit(nBits))

  /** Product quantization ANN (Jégou, Douze & Schmid, TPAMI'11) — the
    * memory-compression path that makes billion-vector corpora
    * searchable: split each d-dim vector into `m` subspaces, quantize
    * each slice against a k-entry per-subspace codebook (here the
    * deterministic md5-sampled codebook, the same init discipline as
    * kmeansFit), and search with Asymmetric Distance Computation — the
    * query builds an m×k lookup table of exact slice distances and a
    * corpus vector's approximate L2² is the sum of m table entries
    * picked by its codes.
    *
    * Scale shape: the codebook (m·k slices) and the per-query LUT
    * (|Q|·m·k rows) broadcast; encoding is a map-side argmin
    * (min-of-struct partial aggregate, no window shuffle); ADC is an
    * equi-join on (subspace, code) + a per-(query, vector) ordered
    * fold of m doubles. The corpus crosses the shuffle as CODES
    * (m bytes-worth per vector), never as float vectors — that is the
    * whole point of PQ. A final exact re-rank touches only the
    * |Q|·topK candidates.
    *
    * All arithmetic is order-pinned (zip_with + ordered fold; ADC sums
    * fold in subspace order) → bit-identical cross-engine, oracle-
    * checkable end to end.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             m: Int, k: Int, dim: Int, nQueries: Int,
             topK: Int, trainIters: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val v = CacheScope.cached(
      emb.select(col(idCol).as("pid"), col(vecCol).as("pv")))
    val sliceExpr = (src: String) => expr(
      s"transform(sequence(0, ${m - 1}), mi -> " +
        s"struct(mi as mi, slice($src, mi * $sub + 1, $sub) as sv))")
    val slices = CacheScope.cached(
      v.select(col("pid"), explode(sliceExpr("pv")).as("s"))
        .select(col("pid"), col("s.mi").as("mi"), col("s.sv").as("sv")))
    val l2 = expr(
      "aggregate(zip_with(sv, cent, (x, y) -> " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, " +
        "(acc, d) -> acc + d)")
    // deterministic codebook init: md5-ordered k sample vectors, sliced
    var codebook = CacheScope.cached(
      v.withColumn("_h", md5(col("pid").cast("string")))
        .orderBy(col("_h"), col("pid")).limit(k)
        .select(row_number().over(Window.orderBy(col("_h"), col("pid")))
          .as("cent_id"), col("pv"))
        .select(col("cent_id"), explode(sliceExpr("pv")).as("s"))
        .select(col("s.mi").as("mi"), col("cent_id"),
          col("s.sv").as("cent")))
    // optional Lloyd refinement per subspace: argmin-assign slices,
    // recompute centroids as 6-decimal-rounded per-dim means (the
    // kmeansFit update discipline, so the DuckDB twin replays it
    // bit-for-bit); empty centroids drop, as in kmeansFit
    for (_ <- 0 until trainIters) {
      val assigned = slices.join(broadcast(codebook), "mi")
        .select(col("pid"), col("mi"), col("sv"),
          struct(l2.as("d"), col("cent_id").as("c")).as("dc"))
        .groupBy(col("pid"), col("mi"))
        .agg(min(col("dc")).as("best"), first(col("sv")).as("sv"))
      codebook = CacheScope.cached(assigned
        .select(col("mi"), col("best.c").as("cent_id"),
          posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("mi"), col("cent_id"), col("i"))
        .agg(round(avg(col("x").cast("double")), 6).as("xm"))
        .groupBy(col("mi"), col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("i"), col("xm")))),
          s => s.getField("xm").cast("float")).as("cent")))
    }
    // encode: per (vector, subspace) argmin over the broadcast codebook
    // — min-of-struct is a partial-aggregable map-side reduction
    val codes = CacheScope.cached(
      slices
        .join(broadcast(codebook), "mi")
        .select(col("pid"), col("mi"),
          struct(l2.as("d"), col("cent_id").as("c")).as("dc"))
        .groupBy(col("pid"), col("mi"))
        .agg(min(col("dc")).as("best"))
        .select(col("pid"), col("mi"), col("best.c").as("code")))
    // per-query ADC lookup table: exact slice distance to every
    // codebook entry
    val lut = slices.filter(col("pid") < nQueries)
      .select(col("pid").as("qid"), col("mi"), col("sv"))
      .join(broadcast(codebook), "mi")
      .select(col("qid"), col("mi"), col("cent_id"), l2.as("d"))
    // ADC: codes pick their LUT entries; fold in subspace order so the
    // 4-double sum is bit-deterministic
    val adc = codes.join(broadcast(lut),
        codes("mi") === lut("mi") && codes("code") === lut("cent_id"))
      .drop(lut("mi"))
      .filter(col("qid") =!= col("pid"))
      .groupBy(col("qid"), col("pid"))
      .agg(expr("aggregate(array_sort(collect_list(struct(mi, d))), " +
        "0D, (acc, s) -> acc + s.d)").as("adc"))
    val top = adc.withColumn("rnk",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("adc"), col("pid"))))
      .filter(col("rnk") <= topK)
    // exact re-rank of the topK candidates only
    val exact = expr(
      "aggregate(zip_with(qv, cv, (x, y) -> " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, " +
        "(acc, d) -> acc + d)")
    top
      .join(v.select(col("pid").as("qid"), col("pv").as("qv")), "qid")
      .join(v.select(col("pid"), col("pv").as("cv")), "pid")
      .select(col("qid").as("query_id"), col("pid").as("neighbor_id"),
        round(col("adc"), 6).as("adc_r6"),
        round(exact, 6).as("l2_r6"), col("rnk").cast("long").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVFADC — the combined coarse+fine quantizer of Jégou, Douze &
    * Schmid (TPAMI'11 §IV.A), the configuration billion-scale
    * deployments actually run: the IVF coarse quantizer routes every
    * vector to an inverted list, and product quantization encodes each
    * vector's RESIDUAL (x − list centroid), so the m·k codebook budget
    * covers only the within-list displacement instead of the global
    * spread. Search: a query probes its nProbe closest lists and builds
    * one residual ADC lookup table PER PROBED LIST (the query residual
    * depends on the list centroid), then scores only those lists'
    * codes; the topK by ADC re-rank exactly.
    *
    * Determinism discipline (everything the house ANN family already
    * pins): md5-sampled coarse centroids and PQ codebook, cosine
    * routing via the native `cosine_sim` fold, (d, id) struct-min
    * encode tiebreaks, residuals as exact double subtractions, ADC
    * folded in subspace order — bit-replayable in the DuckDB twin.
    *
    * Scale shape: coarse centroids (nLists) and codebook (m·k slices)
    * broadcast; routing + residual are MAP-SIDE (in-row argmax over
    * the broadcast centroid array, then a broadcast join back for the
    * centroid vector); the corpus crosses the encode shuffle as
    * residual slices and thereafter lives as (list_id, m codes) —
    * bytes per vector; per-query cost is nProbe LUTs (m·k exact slice
    * distances each, broadcast) + the probed lists' codes; the exact
    * re-rank touches |Q|·topK float vectors only.
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                nLists: Int, nProbe: Int, m: Int, k: Int, dim: Int,
                nQueries: Int, topK: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val v = CacheScope.cached(
      emb.select(col(idCol).as("pid"), col(vecCol).as("pv")))
    val cents = v.withColumn("_h", md5(col("pid").cast("string")))
      .orderBy(col("_h"), col("pid")).limit(nLists)
      .select(col("pv").as("centv"),
        row_number().over(Window.orderBy(col("_h"), col("pid")))
          .as("cent_id"))
    // map-side routing, then the residual joins the list centroid back
    // in (broadcast again — still no corpus exchange before encode)
    val resid = CacheScope.cached(assignToCentroids(
        v.select(col("pid").as("cid"), col("pv").as("cv")), cents)
      .join(broadcast(cents), "cent_id")
      .select(col("cent_id").as("list_id"), col("cid").as("pid"),
        expr("zip_with(cv, centv, (x, y) -> " +
          "CAST(x AS DOUBLE) - CAST(y AS DOUBLE))").as("rv")))
    val sliceExpr = (src: String) => expr(
      s"transform(sequence(0, ${m - 1}), mi -> " +
        s"struct(mi as mi, slice($src, mi * $sub + 1, $sub) as sv))")
    val slices = CacheScope.cached(
      resid.select(col("pid"), col("list_id"),
          explode(sliceExpr("rv")).as("s"))
        .select(col("pid"), col("list_id"), col("s.mi").as("mi"),
          col("s.sv").as("sv")))
    val l2 = expr(
      "aggregate(zip_with(sv, cent, (x, y) -> (x - y) * (x - y)), 0D, " +
        "(acc, d) -> acc + d)")
    // PQ codebook: the residuals of the md5-ordered k sample, sliced
    val codebook = CacheScope.cached(
      resid.withColumn("_h", md5(col("pid").cast("string")))
        .orderBy(col("_h"), col("pid")).limit(k)
        .select(row_number().over(Window.orderBy(col("_h"), col("pid")))
          .as("cent_id"), col("rv"))
        .select(col("cent_id"), explode(sliceExpr("rv")).as("s"))
        .select(col("s.mi").as("mi"), col("cent_id"),
          col("s.sv").as("cent")))
    // encode: per (vector, subspace) argmin — map-side partial min
    val codes = CacheScope.cached(
      slices.join(broadcast(codebook), "mi")
        .select(col("pid"), col("list_id"), col("mi"),
          struct(l2.as("d"), col("cent_id").as("c")).as("dc"))
        .groupBy(col("pid"), col("list_id"), col("mi"))
        .agg(min(col("dc")).as("best"))
        .select(col("pid"), col("list_id"), col("mi"),
          col("best.c").as("code")))
    // probes: top-nProbe lists by cosine (house IVF tiebreaks), each
    // probe carrying the query's residual AGAINST THAT LIST's centroid
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centv")))).as("cents"))
    val probes = v.filter(col("pid") < nQueries)
      .select(col("pid").as("qid"), col("pv").as("qv"))
      .crossJoin(broadcast(centArr))
      .select(col("qid"), col("qv"), explode(col("cents")).as("c"))
      .select(col("qid"), col("qv"), col("c.cent_id").as("list_id"),
        col("c.centv").as("centv"),
        expr("cosine_sim(qv, c.centv)").as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("list_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("list_id"),
        expr("zip_with(qv, centv, (x, y) -> " +
          "CAST(x AS DOUBLE) - CAST(y AS DOUBLE))").as("qrv"))
    val lut = probes
      .select(col("qid"), col("list_id"),
        explode(sliceExpr("qrv")).as("s"))
      .select(col("qid"), col("list_id"), col("s.mi").as("mi"),
        col("s.sv").as("sv"))
      .join(broadcast(codebook), "mi")
      .select(col("qid"), col("list_id"), col("mi"), col("cent_id"),
        l2.as("d"))
    // ADC: the probed lists' codes pick their per-list LUT entries;
    // fold in subspace order for a bit-deterministic m-double sum
    val adc = codes.join(broadcast(lut), Seq("list_id", "mi")
        .map(c => codes(c) === lut(c)).reduce(_ && _)
        && codes("code") === lut("cent_id"))
      .drop(lut("list_id")).drop(lut("mi"))
      .filter(col("qid") =!= col("pid"))
      .groupBy(col("qid"), col("pid"))
      .agg(expr("aggregate(array_sort(collect_list(struct(mi, d))), " +
        "0D, (acc, s) -> acc + s.d)").as("adc"))
    val top = adc.withColumn("rnk",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("adc"), col("pid"))))
      .filter(col("rnk") <= topK)
    val exact = expr(
      "aggregate(zip_with(qv, cv, (x, y) -> " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, " +
        "(acc, d) -> acc + d)")
    top
      .join(v.select(col("pid").as("qid"), col("pv").as("qv")), "qid")
      .join(v.select(col("pid"), col("pv").as("cv")), "pid")
      .select(col("qid").as("query_id"), col("pid").as("neighbor_id"),
        round(col("adc"), 6).as("adc_r6"),
        round(exact, 6).as("l2_r6"), col("rnk").cast("long").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
