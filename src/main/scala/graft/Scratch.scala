package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe main; regenerates PLANS.md (plan evidence doc). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q1_pricing_summary" ->
        "scan→filter→partial/final agg; filter pushed to parquet, columns pruned",
      "q_join_region_revenue" ->
        "fact + 3 broadcast dims; fact never shuffles before the agg",
      "q5_local_supplier" ->
        "6-way join: one fact-fact SMJ/BHJ + broadcast dims",
      "q_window_topk" ->
        "per-group top-k with pre-shuffle WindowGroupLimit",
      "q_sort_limit" ->
        "global top-k as TakeOrderedAndProject (no full sort)",
      "q_join_asof" ->
        "as-of via union timeline: ONE shuffle + sort, no range join",
      "q_dedup_embedding" ->
        ("exact all-pairs as a blocked equi-join over the block grid — " +
          "no BroadcastNestedLoopJoin, bounded per-task memory"),
      "q_text_bm25" ->
        ("BM25: ONE shuffle (per-doc tf+dl in a single hash aggregate); " +
          "corpus stats reduced to one row and broadcast back — scoring " +
          "is map-side"),
      "q_sim_quantize" ->
        "int8 quantization + RMSE: pure map-side, zero exchanges",
      "q_merge_upsert" ->
        ("SCD-1 MERGE: one full-outer join on the key; " +
          "whole-row replace is a map-side projection"),
      "q21_suppliers_waiting" ->
        ("Q21 shape: EXISTS + NOT EXISTS self-correlation as LeftSemi " +
          "+ LeftAnti equi self-joins — no cartesian/BNL"),
      "q_dedup_jaccard_banded" ->
        ("banded jaccard: (band, hash) equi-join candidates + " +
          "broadcast bitset popcount verify — no all-pairs join"),
      "q_quality_constraints" ->
        ("quality battery: all row-level checks in ONE aggregate per " +
          "table scan; RI checks as anti-joins"),
      "q_skyline" ->
        ("2-D skyline: hash agg to per-x maxima + prefix-max window " +
          "over distinct x — no quadratic dominance self-join"),
      "q_dedup_fuzzy_name" ->
        ("fuzzy linkage: (brand, length-bucket) equi-join candidates; " +
          "banded levenshtein residual — no cartesian"),
      "q_graph_label_prop" ->
        ("label propagation: per round one (vertex,label) equi-join + " +
          "two map-side-partial hash aggregates, no window"),
      "q_agg_equidepth" ->
        ("equi-depth: ONE array-percentile aggregate broadcast back; " +
          "bucket assignment map-side"),
      "q_cdc_apply" ->
        ("CDC apply: single hash aggregate (max_by over seq), " +
          "delete filter map-side — arrival-order-proof"),
      "q_join_asof_native" ->
        ("CUSTOM PHYSICAL OPERATOR (SortMergeAsOfJoinExec): one " +
          "co-partitioned shuffle + sort per side, single-pass merge — " +
          "the SortMergeJoin cost contract, ~half the compositional " +
          "form's shuffle bytes"),
      "q_agg_quantile_sketch" ->
        ("KLL propose→certify→select: sketch agg + ONE conditional-agg " +
          "certify scan + in-band-only selection — the full column is " +
          "never sorted"),
      "q_sim_pq" ->
        ("PQ search: broadcast codebook/LUT joins, map-side argmin " +
          "encode (min-of-struct partial agg), ADC equi-join — corpus " +
          "crosses the shuffle as codes, never vectors"),
      "q_multimodal_phash" ->
        ("dHash near-dup: pigeonhole-banded LSH equi-join + popcount " +
          "verify — the image twin of MinHash banding, no all-pairs"),
      // (q_graph_betweenness deliberately NOT printed: its cached
      // BFS-round lineage renders ~3000 plan lines of noise; the
      // no-cartesian property is asserted in PlanSpec instead)
      "q_sim_binary" ->
        ("binary ANN: one-long sign codes, popcount(xor) against a " +
          "bounded broadcast query set — corpus never shuffles for " +
          "scoring"),
      "q_text_dup_spans" ->
        ("cross-doc duplicated n-grams: grams hashed to 60-bit ints " +
          "BEFORE the shuffle; df aggregate + equi-join re-attach — " +
          "gram strings never leave the map side"),
      "q_curate_dsir" ->
        ("DSIR: ONE corpus-sized (doc,bucket) aggregate feeds BOTH " +
          "unigram models; 64-row log-ratio vector broadcasts back; " +
          "scoring map-side"),
      "q_event_funnel" ->
        ("funnel: chained key-partitioned min-aggregates; step " +
          "shuffles carry one row per (user, step); 1-row ratio " +
          "broadcast"),
      "q_sim_hard_negatives" ->
        ("hard negatives: broadcast anchors, map-side cosine + label " +
          "filter, per-anchor window over scored rows only"),
      "q_text_winnow_pairs" ->
        ("winnowing pairs: per-doc window-min selection; df-capped " +
          "fingerprint equi-join — the hot-key df² blowup is bounded " +
          "before the self-join"),
      "q_text_phrase" ->
        ("phrase search: token stream filtered to the phrase words " +
          "pre-shuffle; positional equi-joins on (doc, pos±offset)"),
      "q_skyline_4d" ->
        ("N-D skyline: local frontiers + coalesce-halving merge " +
          "rounds — no shuffle, no single-task full-candidate union"),
      "q_text_scrub_global" ->
        ("global pair-free ExactSubstr scrub: map-side gram hashing, " +
          "ONE corpus-linear shuffle for the per-gram first-occurrence " +
          "window; islands + scrub sized by true duplicate positions"),
      "q_dedup_exact_substr" ->
        ("suffix-rank ExactSubstr: 2 prefix-doubling rounds, each one " +
          "(doc,pos+k) equi-join + a range-partitioned two-pass dense " +
          "rank — collision-free, no single-partition window"),
      "q_text_heaps" ->
        ("Heaps curve: corpus-linear explode → two aggregates; BOTH " +
          "doc-axis running sums as range-partitioned two-pass prefix " +
          "scans"),
      "q_curate_quality_model" ->
        ("perceptron scorer: one feature map pass; bounded training " +
          "slice folds 33 integers; weights broadcast back, scoring " +
          "map-side"),
      "q_curate_decontam_bloom" ->
        ("bloom decontamination: filter built as a LAZY one-row " +
          "bit_or aggregate, broadcast as ~m/8 bytes; corpus grams " +
          "probed map-side; only bloom-positives reach the exact " +
          "verify semi-join"),
      "q_agg_kmv_intersect" ->
        ("KMV sketch: partial-aggregable bounded state (≤ k longs per " +
          "partition cross the shuffle); pairwise intersection over " +
          "the 20-row sketch table only"),
      "q_agg_countmin" ->
        ("count-min: additive d×w counter grid (partial agg ships " +
          "≤ d·w cells); probe joins the grid by BROADCAST"),
      "q_text_bigram_lm" ->
        ("stupid-backoff LM: bigram pairs built map-side from the " +
          "token array (no lag window); count tables shuffle once on " +
          "gram keys; corpus totals broadcast as one row"),
      "q_graph_sssp" ->
        ("weighted SSSP: 4 Bellman–Ford rounds, each ONE equi-join of " +
          "the |V|-bounded distance table against the edges + a min " +
          "aggregate — no frontier blowup, no cartesian"),
      "q_text_blocklist" ->
        ("blocklist gate: literal/broadcast term array evaluated " +
          "map-side in codegen — NO join, one per-source aggregate"),
      "q_agg_hll_union" ->
        ("HLL rollup: per-day sketch aggregate, monthly union " +
          "re-aggregates SKETCHES (never raw rows); exact side joins " +
          "by broadcast"),
      "q_window_sessionize" ->
        ("gaps-and-islands sessions: ONE hash exchange on user_id " +
          "feeds both window passes AND the session aggregate"),
      "q_sim_topk_ivfpq" ->
        ("IVFADC: broadcast coarse centroids + residual codebook; " +
          "map-side routing/residual; encode as min-of-struct partial " +
          "agg; per-probed-list residual LUTs broadcast; corpus " +
          "crosses the shuffle as (list_id, codes)"),
      "q_hybrid_rrf" ->
        ("hybrid RRF: each leg its own scale shape (BM25 one-shuffle; " +
          "dense broadcast scoring); fusion is a 20-row full-outer " +
          "join with exact integer rank folds"),
      "q_stat_ks" ->
        ("KS drift: corpus → (type, cents) cells map-side-partial; " +
          "per-pair ECDF merge folds domain-bounded arrays on one " +
          "row; tiny side broadcast"),
      "q_text_cdc_dedup" ->
        ("content-defined chunking: every cut decision local (window " +
          "hash mod), chunking+hashing map-side; the one shuffle " +
          "groups chunk digests"),
      "q_graph_ktruss" ->
        ("k-truss: per round triangle enumeration + support agg + " +
          "semi-join on a shrinking edge set; localCheckpoint " +
          "truncates the 4-refs-per-round lineage"),
      "q_join_spatial" ->
        ("spatial radius join: 3x3 neighborhood explode + cell " +
          "equi-join + exact integer verify — never an all-pairs " +
          "product"),
      "q_join_bucketed" ->
        ("co-located bucketed join: SMJ bucket-to-bucket, NO exchange " +
          "on either side — the prepared-layout fact join"),
      "q_rec_item_cf" ->
        ("item-item CF: degree-capped per-user wedge join; " +
          "(user,item) and (i,j) shuffles only, never item x item"),
      "q_event_attribution" ->
        ("attribution touch join: equi-keys (user, 24h bucket) with a " +
          "two-bucket probe — the exact window predicate prunes " +
          "same-bucket matches, never a per-user C*P expansion"),
      "q_er_dedupe" ->
        ("entity resolution: deletion-neighborhood blocking keys " +
          "(9 per record, each carrying 8 discriminating digits) — " +
          "equi-join candidates, Levenshtein verify on candidates only"),
      "q_text_pmi" ->
        ("PMI collocations: bigrams built map-side from token arrays; " +
          "two count aggregates; unigram re-attach joins only the " +
          "thresholded bigram table; top-30 is TakeOrdered"),
      "q_event_cep" ->
        ("CEP pattern match: ONE per-user ordered aggregate builds " +
          "the event string; regex evaluation is map-side"),
      "q18_large_volume" ->
        ("TPC-H Q18: per-order HAVING pre-aggregate (map-side " +
          "combine), qualifying set into a broadcast customer join, " +
          "TakeOrderedAndProject top-100"),
      "q_stat_kendall_full" ->
        ("full-table Kendall: ONE fact scan to the cached joint " +
          "histogram; all pair statistics on the broadcast <=550-row " +
          "self-join (intended BNL)"),
      "q_curate_kcenter" ->
        ("k-center coreset: per round one broadcast center + " +
          "map-side running-min + one-row argmax; corpus never " +
          "shuffles"),
      "q_lake_cluster_depth" ->
        ("clustering depth: range-partitioned two-pass rank for " +
          "file assignment; interval sweep as a distributed running " +
          "sum over the metadata-sized event list"),
      "q_er_em" ->
        ("unsupervised FS via EM: corpus reduces map-side to the " +
          "8-row agreement-pattern histogram; 3 Winkler rounds are " +
          "arithmetic on that broadcast frame — zero pair shuffles"),
      "q_sim_kdist" ->
        ("HDBSCAN core distance: 3x3 grid cell equi-join for the " +
          "eps-pairs, (d2, ib)-keyed rank window per point — never " +
          "an all-pairs kNN"),
      "q_sim_hdbscan" ->
        ("eps-bounded HDBSCAN: grid equi-join + rank window feed " +
          "mutual-reachability edges into the Boruvka MSF; at " +
          "fixture scale the MST+cuts resolve on the probe-bounded " +
          "driver tiers, so the final frame is a local relation — " +
          "the distributed round lineage is guarded in PlanSpec"),
      "q_graph_mst" ->
        ("Boruvka MSF: edge-side work is always the (edge x label) " +
          "equi-joins + min-struct aggregate; this fixture-sized " +
          "graph takes the driver-Kruskal tier (local-relation " +
          "result) — the distributed path's plan shape is the " +
          "PlanSpec boruvka guard"),
      "q_stat_mood" ->
        ("Brown-Mood median test: one scan to the cached (group, " +
          "cents) projection, exact-percentile median broadcast " +
          "back, map-side above/not-above counts, five-literal " +
          "pivot to ONE row — the k-sample screen with zero " +
          "rank shuffles"),
      "q_stat_hodges" ->
        ("Hodges-Lehmann by counting selection: the registered " +
          "frame is the driver-assembled result (local relation); " +
          "the per-probe plan — histogram x broadcast threshold, " +
          "ONE running-sum window, no pair enumeration — is the " +
          "PlanSpec pairwise-selection guard"),
      "q_graph_hyperball" ->
        ("HyperBall: sparse (v, j, r) HLL registers; per hop ONE " +
          "adjacency equi-join + (v, j) max-aggregate (union = " +
          "element-wise max) on checkpointed rounds; estimates are " +
          "one grouped BIGINT sum per vertex + a vertex-ordered " +
          "fold per hop - never an all-pairs join"),
      "q_stat_hodges_grouped_exec" ->
        ("grouped HL through the EXECUTOR-LOCAL group tier: one " +
          "exchange on the group key feeds MapGroups running the " +
          "shared local counting solver per group - zero barrier " +
          "rounds, no driver state; the registered frame is the " +
          "solved selection (the sibling _grouped query prices the " +
          "probe-loop tier on the same data)"),
      "q_stat_hodges_grouped" ->
        ("grouped HL at ~2k (nation, month) groups: the histogram " +
          "blows the driver tier by design, so the k-ary " +
          "distributed probe loop runs — the final frame is the " +
          "driver-assembled selection; each round's probe plan is " +
          "the PlanSpec pairwise-selection guard (broadcast probe " +
          "grid, one window, no cartesian)"),
      "q_sim_topk_rptree" ->
        ("RP-tree ANN: projections are map-side folds; fixture " +
          "corpus fits the driver tier so thresholds arrive as " +
          "broadcast literal frames and routing + leaf-key " +
          "candidate equi-join stay distributed — no " +
          "BroadcastNestedLoopJoin anywhere"),
      "q_sim_topk_rpforest" ->
        ("RP-forest spill multiprobe: per tree, corpus routed once " +
          "(broadcast thresholds), query probe rows fan out " +
          "through explode over the spill band, candidates union " +
          "through leaf-key equi-joins, DISTINCT, then one exact " +
          "re-rank window — corpus never duplicated"),
      "q_graph_ecc" ->
        ("landmark BFS, APPEND-ONLY reach: per hop ONE adjacency " +
          "equi-join of the checkpointed frontier + frontier-sized " +
          "dedup + LEFT ANTI membership probe against the reach " +
          "union — settled rows never re-shuffled or re-written; " +
          "eager per-hop localCheckpoint cuts the AQE replanning " +
          "chain (the captured plan reads checkpointed scans)"),
      "q_er_entities" ->
        ("ER entity formation: match pairs from the broadcast " +
          "8-pattern decision table close via the probe-bounded CC " +
          "tier (cluster-sized graphs -> driver union-find, local " +
          "relation); members aggregate by component key"),
      "q_event_seqpat" ->
        ("GSP level-2 support: the event scan collapses to ONE " +
          "(user, type) min/max hash aggregate (map-side partial), " +
          "then k^2-bounded per-user span pairs — the event list " +
          "is never squared"),
      "q_agg_cm_join_card" ->
        ("CM join-cardinality: two d x w sketch grids built by " +
          "independent hash aggregates meet in a LEFT broadcast " +
          "join on (r, c); raw event sides never co-shuffle — the " +
          "exact certifier join is the only key-level shuffle"),
      "q_time_granger_cond" ->
        ("conditional Granger: one lag window over the " +
          "calendar-bounded daily frame, fifteen moment sums in " +
          "ONE aggregate row, all OLS algebra scalar on the " +
          "driver-bound single row"),
      "q_graph_walks" ->
        ("random-walk corpus: ONE per-vertex rank window over the " +
          "symmetrized edges, then walkLen bounded equi-joins of " +
          "the |seeds|x|walks| frame against (vertex, rank) + " +
          "degree — md5 selects neighbors relationally, no " +
          "neighborhood ever collected"),
      "q_time_kalman" ->
        ("local-level Kalman: |types|x|days| cells from one " +
          "map-side-partial aggregate, then the adaptive-gain fold " +
          "as an ordered HOF inside the row — per-entity-model " +
          "class, no extra exchange"),
      "q_er_block_sorted" ->
        ("sorted-neighborhood blocking: one nation-partitioned " +
          "rank window + two SHIFTED equi-joins on (nat, rn + d) — " +
          "the window predicate never plans a range join; linear " +
          "candidates by construction"),
      "q_graph_densest" ->
        ("batched densest peel: ONE degree aggregate per round, " +
          "one-row round stats collected into map-side literal " +
          "keep rules, two semi-join survivor filters, per-round " +
          "localCheckpoint lineage cut — O(log n) rounds; the " +
          "registered frame is the driver-assembled round trace " +
          "(local relation)"),
      "q_stat_ansari" ->
        ("Ansari-Bradley: the event scan collapses to the " +
          "calendar-bounded value histogram (one hash aggregate); " +
          "after that everything is metadata-sized — one " +
          "single-partition running-count window (domain-bounded " +
          "by contract), a block-bounded position explode, one " +
          "one-row ordered tie fold"),
      "q_stat_moodscale" ->
        ("Mood squared-rank: histogram collapse + one " +
          "domain-bounded running-count window; every block score " +
          "is ONE exact BIGINT, the statistic is plain integer " +
          "SUMs into a one-row aggregate (q4 widened to " +
          "decimal(38,0) BEFORE the first multiply) — no ordered " +
          "fold at all"),
      "q_stream_kalman" ->
        ("state-store Kalman: the real work is the streaming " +
          "transformWithState pipeline ((level, P) carried across " +
          "micro-batches, one update row per type per batch); the " +
          "captured plan is the registered REPLAY READ of the " +
          "streamed output — scan + sort only, evidence the sink " +
          "side adds no extra exchange"))
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by graft.Scratch at sf0.001)\n\n")
    sb.append("Each plan shows the scale-relevant properties asserted in PlanSpec.\n")
    for ((name, why) <- picks) {
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode).trim)
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
