package graft

/** Plan-shape guards: the scale properties the engine promises —
  * pushdown, pruning, broadcast dims, pre-shuffle top-k, no cartesian
  * products — asserted on the optimized physical plans so a regression
  * shows up as a test failure, not a 100× slowdown at 100 TB.
  */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q1: ship-date filter reaches the parquet scan, columns pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "unused columns must be pruned")
  }

  test("dim joins broadcast; fact side never shuffles before the agg") {
    val p = plan("q_join_region_revenue")
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("window top-k uses pre-shuffle WindowGroupLimit") {
    assert(plan("q_window_topk").contains("WindowGroupLimit"))
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("attribution touch join equi-joins on (user, 24h bucket) — " +
    "no per-user C·P expansion ahead of the window predicate") {
    val p = plan("q_event_attribution")
    assert("keys \\[2\\]: \\[user_id#\\d+L?, bkt#\\d+L?\\]".r
      .findFirstIn(p).isDefined,
      "touch join must carry the time bucket as an equi-key")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("kappa: one confusion aggregate, broadcast pe frame, no " +
    "sort-merge anywhere") {
    val p = plan("q_curate_kappa")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("modularity: vertex→community map broadcasts to both edge " +
    "endpoint joins; totals frames broadcast too") {
    val p = plan("q_graph_modularity")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2,
      "endpoint community attachment must be broadcast joins")
    assert(!p.contains("CartesianProduct"))
  }

  test("assortativity: degree table broadcasts to the edge joins") {
    val p = plan("q_graph_assortativity")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 4)
    assert(!p.contains("CartesianProduct"))
  }

  test("compaction plan reads only manifest columns (event payload " +
    "pruned to props/ts/type)") {
    val p = plan("q_lake_compaction")
    assert(!p.contains("user_id") && !p.contains("event_id"),
      "planner must not read event identity columns")
  }

  test("rake: no cartesian product; the only wide ops are the " +
    "per-doc window and the word/phrase aggregates") {
    val p = plan("q_text_rake")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 must not be a global sort")
  }

  test("nfc gate: doc_id filter reaches the scan; wholly map-side " +
    "before the final order") {
    val p = plan("q_text_nfc")
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
      "no shuffle belongs in a per-doc scalar gate")
  }

  test("dpp: the fact scan carries a dynamicpruning subquery on the " +
    "partition column — dim selectivity prunes partitions at runtime") {
    val p = plan("q_join_dpp")
    assert(p.contains("dynamicpruning"),
      "dynamic partition pruning must reach the fact scan")
    assert(p.contains("PartitionFilters"))
  }

  test("silhouette: centroid array broadcasts — corpus never " +
    "shuffles before the rollup") {
    val p = plan("q_sim_silhouette")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "centroids must reach the corpus as a broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("time-range window: one per-user window, no join anywhere") {
    val p = plan("q_window_time_range")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
    assert(!p.contains("Join"), "rolling 1h must not self-join")
  }

  test("stickiness: distinct aggregates only — no cartesian, the " +
    "week join is a broadcast") {
    val p = plan("q_event_stickiness")
    assert(!p.contains("CartesianProduct"))
  }

  test("set-similarity join has no cartesian product or nested loop") {
    val p = plan("q_dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_ngram_jaccard plan CONSTRUCTION runs no eager job " +
    "(vocab regime from footer stats, not a count) — only the same " +
    "scan setup as a trivially-lazy query") {
    val sc = spark.sparkContext
    // jobs submitted during plan construction carry no job group →
    // getJobIdsForGroup(null). The sentinel runs in its OWN group, and
    // the listener bus is FIFO: once it is visible, every construction
    // job is too.
    def ids(): Set[Int] = sc.statusTracker.getJobIdsForGroup(null).toSet
    def constructionJobs(name: String, tag: String): Int = {
      val before = ids()
      SparkEntry.queries(name)(spark, dir) // build only, no action
      sc.setJobGroup(tag, "sentinel")
      try spark.range(1).collect() finally sc.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (sc.statusTracker.getJobIdsForGroup(tag).isEmpty &&
          System.nanoTime() < deadline) Thread.sleep(50)
      (ids() -- before).size
    }
    // control: same single documents scan, nothing eager by design
    val control = constructionJobs("q_dedup_exact", "planspec-s1")
    val target = constructionJobs("q_dedup_ngram_jaccard", "planspec-s2")
    assert(target <= control,
      s"ngram-jaccard construction ran $target job(s) vs the lazy " +
        s"control's $control — the eager vocabulary count is back")
  }

  test("q_join_bucketed re-construction is JOB-FREE: the bucketed " +
    "layout memoizes per (session, dir) — no write jobs, DROPs, or " +
    "temp dirs after the first build") {
    val sc = spark.sparkContext
    SparkEntry.queries("q_join_bucketed")(spark, dir) // first: fixture
    def ids(): Set[Int] = sc.statusTracker.getJobIdsForGroup(null).toSet
    val before = ids()
    SparkEntry.queries("q_join_bucketed")(spark, dir) // re-entry
    sc.setJobGroup("planspec-bkt", "sentinel")
    try spark.range(1).collect() finally sc.clearJobGroup()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (sc.statusTracker.getJobIdsForGroup("planspec-bkt").isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert((ids() -- before).isEmpty,
      "second construction must submit zero Spark jobs")
  }

  test("round-9 candidate/verify ops: no cartesian products or " +
    "unbounded nested loops anywhere") {
    // ER: deletion-neighborhood equi-join candidates + id-equi verify;
    // snapshot diff: one full-outer equi-join; CEP: one aggregate +
    // map-side regex; PMI: only 1-row broadcasts may nest-loop
    Seq("q_er_dedupe", "q_lake_snapshot_diff", "q_event_cep")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), q)
        assert(!p.contains("BroadcastNestedLoopJoin"), q)
      }
    assert(!plan("q_text_pmi").contains("CartesianProduct"))
  }

  test("FS candidate generation equi-joins on the deletion-neighborhood " +
    "key (nat, i, bkey) — bounded blocks, O(N) candidates (r11 #2)") {
    // the former nation-only key was 25 fixed blocks (quadratic pair
    // growth); the 3-part key bounds block size by a name's
    // single-substitution neighborhood, independent of corpus size
    // the keys detail section is only rendered for an uncached plan
    // (q_er_score wraps erPairs in an InMemoryRelation, whose nested
    // tree omits per-node details) — q_er_em consumes the same
    // builder uncached, so its plan carries the proof for the family
    val pe = plan("q_er_em")
    assert("keys \\[3\\]: \\[nat#\\d+L?, i#\\d+L?, bkey#\\d+\\]".r
      .findFirstIn(pe).isDefined,
      "candidate join must be equi on (nat, i, bkey)")
    assert(!pe.contains("CartesianProduct"))
    // q_er_weights never materializes pairs at all (frequency-moment
    // stats): no cartesian; its 1-row broadcast stat frames are the
    // intentional bounded nest-loop class
    assert(!plan("q_er_weights").contains("CartesianProduct"))
    // q_er_score additionally crossJoins the 8-row pattern grid with
    // the broadcast ONE-ROW stats frame (the intentional bounded
    // nest-loop class) — guard only that no data-sized cartesian
    // appears: the pair bulk must reach the decision table via the
    // equi join on the three agreement bits
    val ps = plan("q_er_score")
    assert(!ps.contains("CartesianProduct"))
    assert("keys \\[3\\]: \\[ag_name#\\d+, ag_seg#\\d+, ag_bal#\\d+\\]".r
      .findFirstIn(ps).isDefined,
      "pair classification must equi-join the broadcast decision table")
  }

  test("multi-pattern AC scan is join-free: one typed pass over " +
    "documents, the automaton arrives by broadcast") {
    val p = plan("q_text_multiscan")
    assert(!p.contains("Join"), "no join of any kind")
    assert(p.contains("SerializeFromObject"), "typed map path")
  }

  test("semi/anti joins plan as real semi/anti, not inner+distinct") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("correlated LATERAL + LIMIT decorrelates to pre-shuffle " +
    "WindowGroupLimit, no per-row subquery or cartesian") {
    val p = plan("q_sql_lateral_join")
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("banded jaccard is equi-join candidates + broadcast-verify — " +
    "no cartesian/BNL") {
    val p = plan("q_dedup_jaccard_banded")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("maximal shared spans: gram matches come from an equi-join, " +
    "never an all-pairs text comparison") {
    val p = plan("q_text_winnow_spans")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("span scrub: interval merge + rebuild joins stay equi/hash — " +
    "no cartesian/BNL") {
    val p = plan("q_text_span_scrub")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus-wide ExactSubstr scrub: NO pair limit anywhere in the " +
    "plan; gram matches stay equi-join") {
    val p = plan("q_text_scrub_corpus")
    assert(!p.contains("GlobalLimit") && !p.contains("LocalLimit") &&
      !p.contains("TakeOrdered"),
      "the corpus pass must not slice the candidate pair list")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("global pair-free scrub: no limit, no cartesian — one gram " +
    "window feeds the islands pass") {
    val p = plan("q_text_scrub_global")
    assert(!p.contains("GlobalLimit") && !p.contains("TakeOrdered"),
      "the global pass has no candidate slice to limit")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Window"), "per-gram first-occurrence window")
  }

  test("bloom decontam funnel: construction lazy (filter built as a " +
    "relational aggregate, no driver-side build job) — same scan " +
    "setup as a trivially-lazy control") {
    val sc = spark.sparkContext
    def ids(): Set[Int] = sc.statusTracker.getJobIdsForGroup(null).toSet
    def constructionJobs(name: String, tag: String): Int = {
      val before = ids()
      SparkEntry.queries(name)(spark, dir) // build only, no action
      sc.setJobGroup(tag, "sentinel")
      try spark.range(1).collect() finally sc.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (sc.statusTracker.getJobIdsForGroup(tag).isEmpty &&
          System.nanoTime() < deadline) Thread.sleep(50)
      (ids() -- before).size
    }
    val control = constructionJobs("q_dedup_exact", "planspec-bl1")
    val target = constructionJobs("q_curate_decontam_bloom",
      "planspec-bl2")
    assert(target <= control,
      s"bloom construction ran $target job(s) vs the lazy control's " +
        s"$control — a driver-side filter build (stat.bloomFilter) " +
        "crept in")
  }

  test("KMV sketch aggregates partially: ≤ k longs per partition " +
    "cross the shuffle, never the token stream") {
    val p = plan("q_agg_kmv_intersect")
    assert(p.toLowerCase.contains("partial_kmvagg") ||
      (p.contains("ObjectHashAggregate") && p.contains("partial")),
      s"expected partial KMV aggregation in:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("count-min probe joins the grid by broadcast — the counter " +
    "grid never shuffles the probe side") {
    val p = plan("q_agg_countmin")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("bigram LM: pairs build map-side (no lag-window before the " +
    "count tables), scoring joins stay equi") {
    val p = plan("q_text_bigram_lm")
    assert(!p.contains("CartesianProduct"))
  }

  test("trained IVF search plans without cartesian/BNL; assignment " +
    "stays map-side") {
    val p = plan("q_sim_topk_ivf_trained")
    assert(!p.contains("CartesianProduct"))
    // the only hash exchanges may carry k-means (cent_id, dim) partial
    // means or the final top-k window — never corpus vectors keyed by
    // corpus id
    val hashExchanges = p.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(hashExchanges.forall(l => !l.matches(".*\\bcid#.*")),
      s"corpus must not shuffle on cid:\n${hashExchanges.mkString("\n")}")
  }

  test("exact embedding dedup is a blocked equi-join — no nested loop") {
    val p = plan("q_dedup_embedding")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("ivfTopK: list assignment is map-side — corpus never hash-shuffles") {
    val p = plan("q_sim_topk_ivf")
    // the former crossJoin+window argmax hash-partitioned the corpus on
    // cid (replicated nLists×); the map-side argmax + broadcast probes
    // leave no hash exchange touching the corpus id or vector columns
    val hashExchanges = p.linesIterator.filter(_.contains("hashpartitioning"))
      .toSeq
    assert(hashExchanges.forall(l => !l.matches(".*\\bcid#.*")),
      s"assignment must not shuffle on cid:\n${hashExchanges.mkString("\n")}")
    assert(hashExchanges.forall(l => !l.contains("cv#")),
      s"corpus vectors must never hash-shuffle:\n${hashExchanges.mkString("\n")}")
  }

  test("lshTopK dedupes candidates on id pairs, not embedding vectors") {
    // the distinct's exchange must not carry the vector columns
    val p = plan("q_sim_topk_lsh")
    val distinctExchanges = p.linesIterator
      .filter(l => l.contains("hashpartitioning") &&
        l.contains("query_id") && l.contains("neighbor_id"))
    assert(distinctExchanges.forall(l => !l.contains("qv") && !l.contains("cv")))
  }

  test("semantic dedup pair join is equi on cent_id — no nested loop") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"))
    // the ONLY BroadcastNestedLoopJoins allowed are the single-row
    // centroid-array crossJoins (IVF-style broadcast of one row), never
    // a vector-vector pair join
    assert(p.contains("cent_id"), "pair join must key on the cluster id")
  }

  test("q18: IN subquery plans as a semi join before the big join") {
    val p = plan("q18_large_orders")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q21: EXISTS + NOT EXISTS chain plans as semi AND anti self-joins, " +
    "no cartesian") {
    val p = plan("q21_suppliers_waiting")
    assert(p.contains("LeftSemi"), "EXISTS must plan as a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("int8 quantization is map-side: no hash exchange at all") {
    val p = plan("q_sim_quantize")
    assert(!p.contains("hashpartitioning"),
      "quantization must not shuffle — it is a per-row projection")
  }

  test("bm25: documents never shuffle; stats re-attach by broadcast; " +
    "per-doc table cached for its two consumers") {
    val p = plan("q_text_bm25")
    // the only shuffled rows are (doc_id, dl, tf…) tuples — no exchange
    // may carry the raw text column
    val hashEx = p.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(hashEx.forall(l => !l.contains("text")),
      s"text must not shuffle:\n${hashEx.mkString("\n")}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    // stats branch + scoring branch share ONE tokenize/aggregate pass
    assert(p.contains("InMemoryTableScan"))
  }

  test("merge upsert is one full-outer join, whole-row replace map-side") {
    val p = plan("q_merge_upsert")
    assert(p.contains("FullOuter"))
    // the ONLY join is the full-outer — no second join, no nested loop
    assert(!p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("scd2 and cdc diff stay on full-outer equi-joins — " +
    "version emission is map-side explode/case, never a second shuffle op") {
    for (q <- Seq("q_merge_scd2", "q_cdc_diff")) {
      val p = plan(q)
      assert(p.contains("FullOuter"), s"$q must full-outer join")
      assert(!p.contains("CartesianProduct")
          && !p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("stats aggregates keep map-side partial aggregation") {
    // the moment sums must combine before the shuffle: a partial
    // HashAggregate under the exchange, final above it
    for (q <- Seq("q_agg_corr", "q_agg_mode", "q_agg_histogram",
        "q_agg_bool_bits")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q lost map-side partial agg:\n$p")
    }
  }

  test("pagerank rounds are equi-joins; no cartesian across iterations") {
    val p = plan("q_graph_pagerank")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("triangle census: wedge join and closure are equi-joins " +
    "(the only cross-join is the three 1-row count scalars)") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct"))
    // scalar-count assembly broadcasts two 1-row sides; FormattedMode
    // prints every node twice (tree + details) ⇒ exactly 2 BNL joins
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 4)
  }

  test("label propagation + personalized pagerank rounds stay on " +
    "equi-joins") {
    Seq("q_graph_label_prop", "q_graph_ppr").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("quality battery: row checks collapse into ONE aggregate over " +
    "each table scan; RI checks are anti-joins") {
    val p = plan("q_quality_constraints")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("skyline is agg + bounded window — never a quadratic self-join") {
    val p = plan("q_skyline")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"))
  }

  test("k-core peels run eagerly per round (roundCut); the final plan " +
    "reads the checkpointed survivor set — no cartesian anywhere") {
    // r15: each peel round (two LeftSemi joins) executes at
    // construction under Graph.roundCut's eager localCheckpoint, so
    // the FINAL plan is the degree aggregate over a checkpointed scan
    // — the per-round semi-join shape is pinned by the kCore scaladoc
    // and SCALING.md, its correctness by GraphSpec's peel traces
    val p = plan("q_graph_kcore")
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("grouped heavy hitters: candidates re-attach by equi-join — " +
    "no driver collect, no cartesian") {
    val p = plan("q_text_heavy_hitters_grouped")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("3-D skyline: local frontier + single merge, survivors " +
    "re-attach via semi-join") {
    val p = plan("q_skyline_3d")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("assoc pairs: basket self-join is an equi-join; the only " +
    "cross-join is the 1-row n_baskets scalar") {
    val p = plan("q_assoc_rules")
    assert(!p.contains("CartesianProduct"))
    // FormattedMode double-prints nodes ⇒ the single scalar BNL shows ≤2×
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 2)
  }

  test("quantile sketch: in-band exact selection joins on a BROADCAST " +
    "of the 9 band rows — the data side never shuffles before the " +
    "per-band window") {
    val p = plan("q_agg_quantile_sketch")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      "bounds frame must broadcast, not shuffle")
    assert(!p.contains("SortMergeJoin"))
  }

  test("perceptual image near-dup: dHash LSH candidates come from an " +
    "equi-join on (slice, bits) — no cartesian/BNL") {
    val p = plan("q_multimodal_phash")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("typed cogroup co-partitions both sides on the key — one " +
    "exchange each, no join materialization") {
    val p = plan("q_typed_cogroup")
    assert(p.contains("CoGroup"))
    assert(!p.contains("CartesianProduct"))
  }

  test("betweenness: BFS rounds, mid and (s,t) joins are all " +
    "equi-joins — no cartesian/BNL on any path") {
    val p = plan("q_graph_betweenness")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("binary ANN: corpus scored against a BROADCAST query-code set " +
    "(bounded 10-row non-equi) — never a cartesian") {
    val p = plan("q_sim_binary")
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop is the broadcast of the 10 query codes
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("PQ search: codebook and LUT joins broadcast; encode is a " +
    "partial-aggregable argmin, not a window shuffle; no cartesian") {
    val p = plan("q_sim_pq")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
    // the encode argmin must be a hash aggregate (min-of-struct with
    // map-side partials), not a per-(vector,subspace) window sort
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("dup spans + trim: gram df re-attach is an equi-join on the " +
    "60-bit hash — no cartesian/BNL, no gram strings in the shuffle") {
    Seq("q_text_dup_spans", "q_text_dup_trim").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("dsir: both unigram models reduce from ONE corpus-sized " +
    "aggregate; the log-ratio vector re-attaches by broadcast") {
    val p = plan("q_curate_dsir")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // exactly one exchange keyed by (doc, bucket) feeds docBkt; the
    // model tables must not re-shuffle the token stream
    assert(p.sliding("InMemoryTableScan".length)
      .count(_ == "InMemoryTableScan") >= 2,
      "docBkt must be cached and reused by both model branches")
  }

  test("funnel: each step is a key-partitioned aggregate; the final " +
    "3-row ratio join broadcasts") {
    val p = plan("q_event_funnel")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin")) // the 1-row n1 attach
  }

  test("hard negatives: anchors broadcast; corpus is scored map-side " +
    "with a per-anchor window — no sort-merge join") {
    val p = plan("q_sim_hard_negatives")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastNestedLoopJoin")) // broadcast anchor side
  }

  test("frame dedup: GIF frame hashes and stills join on (slice, bits) " +
    "— no cartesian") {
    val p = plan("q_multimodal_frame_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("phrase search: the word filter reaches the parquet scan — " +
    "postings for non-phrase tokens never materialize") {
    val p = plan("q_text_phrase")
    assert(p.contains("PushedFilters: [IsNotNull(text)]") ||
      p.contains("ReadSchema"), "scan section present")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // positional joins are hash equi-joins on (doc, position)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"))
  }

  test("winsorized stats: clamp bounds re-attach by broadcast — events " +
    "shuffle once per pass, never nested-loop") {
    val p = plan("q_stat_winsorized")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("matryoshka IVF: same corpus-never-shuffles contract as plain " +
    "ivfTopK — prefix routing adds no exchange") {
    val p = plan("q_sim_topk_ivf_mrl")
    assert(!p.contains("CartesianProduct"))
    val hashExchanges = p.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(hashExchanges.forall(l => !l.matches(".*\\bcid#.*")),
      s"assignment must not shuffle on cid:\n${hashExchanges.mkString("\n")}")
    assert(hashExchanges.forall(l => !l.contains("cv#")),
      s"corpus vectors must never hash-shuffle:\n${hashExchanges.mkString("\n")}")
  }

  test("winnow LCS: the O(|a|·|b|) verify runs on the bounded pair " +
    "list — texts re-attach by equi-join, no cartesian/BNL") {
    val p = plan("q_text_winnow_lcs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("lcs_pack"), "native expression must be in the plan")
  }

  test("blocklist gate: membership is map-side (no join at all) and " +
    "only the needed columns are scanned") {
    val p = plan("q_text_blocklist")
    assert(!p.contains("Join"), "literal-array membership must not join")
    assert(p.contains("ReadSchema") && !p.contains("doc_id"),
      "unused columns must be pruned")
  }

  test("HLL rollup: the day-sketch union re-aggregates sketch columns; " +
    "the exact-side join is broadcast") {
    val p = plan("q_agg_hll_union")
    assert(p.contains("hll_union_agg") || p.contains("HllUnionAgg"),
      "union must re-aggregate sketches, not raw rows")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("sessionize: ONE exchange on user_id feeds both window passes " +
    "and the session aggregate") {
    val p = plan("q_window_sessionize")
    // count operator DETAIL headers ("(n) Exchange") — FormattedMode
    // prints each node once in the tree and once in the details, so a
    // raw substring count double-counts
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    // one hashpartitioning(user_id) + the final orderBy's range exchange
    assert(exchanges <= 2, s"expected <=2 exchanges, plan had $exchanges")
  }

  test("SSSP: relaxation rounds are equi-joins — no cartesian/BNL " +
    "anywhere in the 4-round plan") {
    val p = plan("q_graph_sssp")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("IVFADC: codebook/LUT joins broadcast; the only corpus " +
    "exchanges are the encode aggregate and the ADC fold") {
    val p = plan("q_sim_topk_ivfpq")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("ORC round-trip: the ORC scan prunes to the projected columns " +
    "(text is read only for the md5)") {
    val p = plan("q_source_orc")
    assert(p.contains("Format: orc") || p.contains("orc"),
      "must actually scan ORC")
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      "map-only until the final sort")
  }

  test("KS drift: corpus reduces through two hash exchanges (cells, " +
    "per-type arrays); the 5x5 pair join broadcasts the tiny side") {
    val p = plan("q_stat_ks")
    assert(p.contains("BroadcastExchange"),
      "per-type array side must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "nothing here should sort-merge — both join sides are tiny " +
        "aggregates")
  }

  test("CDC dedup: the documents scan reads only (doc_id, text); " +
    "cutting and hashing stay map-side before the chunk-hash group") {
    val p = plan("q_text_cdc_dedup")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "chunker must not drag lang/source/n_chars through the scan")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("k-truss: every peeling round is equi-join only — no " +
    "cartesian/BNL in the unrolled plan") {
    val p = plan("q_graph_ktruss")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("CUSUM: a fold over per-type arrays, not a window — and only " +
    "the two aggregation exchanges plus the final sort") {
    val p = plan("q_time_cusum")
    assert(!p.contains("(Window") && !p.contains("WindowExec"),
      "the recurrence must be the in-row fold, not a window scan")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges")
  }

  test("WordPiece: segmentation is join-free — one token-count " +
    "exchange, one piece-count exchange, vocab as a literal") {
    val p = plan("q_text_wordpiece")
    assert(!p.contains("Join"), "vocab must be a literal, not a join")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges")
  }

  test("bucketed co-located join: SMJ reads bucket-to-bucket with NO " +
    "exchange on either join side") {
    val p = plan("q_join_bucketed")
    assert(p.contains("SortMergeJoin"), "merge hint must pin SMJ")
    assert(p.contains("Bucketed: true"),
      "scans must actually use the bucketed layout")
    // the only exchanges are AFTER the join (group-by + final sort):
    // no hashpartitioning on the join keys below the SMJ
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"),
      "bucketed sides must not re-shuffle for the join")
  }

  test("takedown: components memo + id-keyed joins only — no " +
    "cartesian, and document text never crosses a join") {
    val p = plan("q_curate_takedown")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("data-skipping lookups scan ONLY pruned bucket directories — " +
    "the range probe's file listing is one bucket, not the layout") {
    val p = plan("q_lake_skipping")
    // probe fixtures at sf0.001 have keys 0..1499 → one bucket (=0);
    // the absent-point probe prunes to zero dirs and must fall back to
    // the filter(false) footer-only read, never a full-table scan of
    // the source parquet beyond the fixture build
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("_bucket=0"),
      "pruned scans must list explicit bucket directories")
  }

  test("MV refresh: delta aggregates BEFORE the merge join; the merge " +
    "is a keyed outer join, never a nested loop") {
    val p = plan("q_cdc_mv_refresh")
    assert(p.contains("FullOuter"), "merge must be a full-outer join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the delta side reduces through a hash aggregate under the join —
    // the base table's rows never reach the merge unaggregated
    assert(p.contains("HashAggregate"))
  }

  test("Mann-Whitney: one aggregate to the distinct-value table, one " +
    "window prefix sum, one final reduction — no joins at all") {
    val p = plan("q_stat_mannwhitney")
    assert(!p.contains("Join"))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("feature hashing is dictionary-free: explode → map-side hash → " +
    "ONE aggregate exchange; no join against any vocabulary") {
    val p = plan("q_curate_feature_hash")
    assert(!p.contains("Join"), "hashing trick must not build a vocab")
  }

  test("VAD: codec fold stays in one typed pass; segmentation is " +
    "window + aggregate on (file, widx) — no joins") {
    val p = plan("q_multimodal_vad")
    assert(!p.contains("Join"))
    assert(p.contains("Window"))
  }

  test("dbscan: candidate generation is the (cx, cy) grid equi-join — " +
    "no cartesian/BNL pair enumeration anywhere") {
    val p = plan("q_sim_dbscan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the epsilon-neighbor join must block on grid cells")
    assert("keys \\[2\\]: \\[jcx#\\d+L, jcy#\\d+L\\]".r
      .findFirstIn(p).isDefined,
      "candidate join must carry both cell coordinates as equi-keys")
  }

  test("q18: qualifying orders reach customer via broadcast; global " +
    "top-100 is TakeOrderedAndProject, not a full sort") {
    val p = plan("q18_large_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("kendall-full: ONE fact scan; pair statistics ride the " +
    "broadcast histogram self-join (range condition → BNL over " +
    "≤550 rows is the intended shape)") {
    val p = plan("q_stat_kendall_full")
    // formatted mode re-prints the cached relation's inner scan once
    // per reference; the real property is that every consumer reads
    // the CACHED histogram, not the fact table
    assert("InMemoryTableScan".r.findAllIn(p).length >= 5,
      "all five histogram consumers must read the cache")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("k-center: every per-round join broadcasts (one new center / " +
    "k final rows) — no sort-merge join, no shuffle of the corpus " +
    "beyond the cache") {
    val p = plan("q_curate_kcenter")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("cluster-depth: file assignment rides the range-partitioned " +
    "two-pass rank — no corpus-sized single-partition window") {
    val p = plan("q_lake_cluster_depth")
    assert(p.contains("rangepartitioning"),
      "Prefix.denseRank's range exchange must be present")
    assert(!p.contains("CartesianProduct"))
  }

  test("bootstrap: the md5-derived uniform is evaluated ONCE per " +
    "(row, rep) — the 8-branch Poisson CASE ladder must reference it " +
    "as an attribute, not inline the hash into every WHEN") {
    // CollapseProject refuses to inline a non-cheap expression with
    // multiple consumers; this guard pins that against Catalyst changes
    // (and records that VERDICT r10 #2's 8× premise was checked: the
    // physical plan carries exactly one md5)
    val p = SparkEntry.queries("q_stat_bootstrap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("md5".r.findAllIn(p).length == 1,
      "md5 must appear exactly once in the physical plan")
  }
  test("boruvka msf (distributed-label path): every join in the round " +
    "lineage is an equi-join — no cartesian, no nested loop") {
    import spark.implicits._
    // the q_graph_mst registry entry takes the driver-label path on
    // fixture-sized graphs (its result is a local relation with no
    // plan to guard), so the guard drives the large-|V| path directly
    val edges = (1L to 40L).map(i => (i, i % 37 + 41L, i % 7 + 1L))
      .toDF("a", "b", "w")
    val got = graft.ops.Graph.boruvkaForest(edges, smallLabelLimit = 0)
    val p = got.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the final tree relabel joins stay keyed
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"))
  }

  test("pairwise selection probe: histogram meets the per-group " +
    "threshold by BROADCAST equi-join, prefix counts in one window — " +
    "no cartesian, no pair enumeration anywhere in the plan") {
    import spark.implicits._
    val hist = Seq((0, 1L, 3L), (0, 5L, 2L), (1, 2L, 4L))
      .toDF("gi", "v", "c")
    for (mode <- Seq(graft.ops.Selection.WalshSums,
        graft.ops.Selection.AbsDiffs)) {
      val probe = graft.ops.Selection.countPairsLE(
        hist, Map(0 -> Seq(3L, 6L), 1 -> Seq(4L)), mode)
      val p = probe.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), mode.toString)
      assert(p.contains("BroadcastHashJoin"), mode.toString)
      assert("\\(\\d+\\) Window\\b".r.findAllIn(p).size == 1,
        s"$mode: exactly one running-sum window")
    }
  }

  test("scale-adaptive scan repartition: filters and column pruning " +
    "still reach the parquet scan through the Repartition node") {
    // Tables.parallelized inserts repartition(defaultParallelism) above
    // small single-row-group scans (r16). The whole design rests on
    // Catalyst pushing predicates and pruning columns THROUGH
    // Repartition (PushPredicateThroughNonJoin / ColumnPruning) — pin
    // that here on the exact shape the loader produces.
    import org.apache.spark.sql.functions.col
    val p = spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .filter(col("l_shipdate") <= "1998-09-02")
      .select(col("l_quantity"), col("l_shipdate"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains(
      "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter must push below the repartition to the scan:\n$p")
    assert(!p.contains("l_orderkey"),
      "unused columns must stay pruned through the repartition")
  }

}
