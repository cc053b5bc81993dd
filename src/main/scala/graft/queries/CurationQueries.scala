package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Decontaminate, Packing, Sampling, TextAnalysis}

/** Training-data curation operators: deterministic sampling and
  * benchmark decontamination. All oracle-checked — the samplers key off
  * an md5-derived uniform (reproducible cross-engine), and the
  * contamination rule is exact n-gram overlap.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Hash-deterministic stratified sample of documents by language:
    * half of en, a quarter of zh, 10% of everything else. Map-side
    * filter — no shuffle, composes with scan pruning.
    */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(spark, dir),
        "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.25), default = 0.1)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Exactly 20 docs per language, chosen by smallest id-hash — the
    * fixed-size mixture-spec sampler (one shuffle on the stratum key,
    * pre-shuffle WindowGroupLimit).
    */
  def qSampleQuota(spark: SparkSession, dir: String): DataFrame =
    Sampling.quotaSample(Tables.documents(spark, dir),
        "doc_id", "lang", quota = 20)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Weighted sample without replacement: 200 documents, probability
    * scaled by an integer weight derived from length (1 + n_chars mod
    * 7 — a stand-in for a quality score). Integer max-hash priorities;
    * global top-k plans TakeOrderedAndProject.
    */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedTopK(
        Tables.documents(spark, dir)
          .select(col("doc_id"), (col("n_chars") % 7 + 1).as("w")),
        "doc_id", col("w"), k = 200)
      .orderBy(col("priority").desc, col("doc_id"))

  /** Corpus minus every document sharing a word 8-gram with the
    * stand-in benchmark set (doc_id % 53 == 0 — which also catches the
    * fixture's planted near-duplicates of those docs). Benchmark grams
    * broadcast; the corpus never shuffles.
    */
  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 53 === 0)
    Decontaminate.decontaminate(docs, "doc_id", "text", bench, "text", n = 8)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** The Bloom-prefiltered decontamination FUNNEL over the same
    * benchmark rule as [[qDecontaminate]] (word 8-grams vs the
    * doc_id % 53 == 0 stand-in set): benchmark grams collapse to a
    * 32768-bit / 3-hash Bloom bitset (lazy one-row aggregate,
    * broadcast ~4 KB), corpus grams probe it map-side, and only
    * Bloom-positive grams reach the exact verification semi-join.
    * Output is the one-row funnel — including the false-positive
    * candidate counts, which the DuckDB twin replays exactly (the
    * md5 double-hash probe is engine-portable), so the oracle
    * certifies the filter CONSTRUCTION, not just the final kept set.
    */
  def qDecontamBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 53 === 0)
    Decontaminate.bloomFunnel(docs, "doc_id", "text", bench, "text",
      n = 8, m = 32768, k = 3)
  }

  /** Pack documents into 4096-char context-window bins across 8
    * hash-bucketed parallel streams (n_chars as the length proxy —
    * swap in a token count column for a tokenizer-accurate layout).
    */
  def qPack(spark: SparkSession, dir: String): DataFrame =
    Packing.packSequences(Tables.documents(spark, dir),
        "doc_id", "n_chars", capacity = 4096L, buckets = 8)
      .orderBy(col("doc_id"))

  /** Domain re-weighting toward target mixture shares (src0:50%,
    * src1:30%, src2:20%; every other source dropped) — downsample-only
    * static mixture balancing. With 25 docs/source, T = min(25/0.5,
    * 25/0.3, 25/0.2) = 50: src0 keeps everything (rate 1.0), src1/src2
    * thin to rates 0.6/0.4 via the deterministic id-hash.
    */
  def qRemix(spark: SparkSession, dir: String): DataFrame =
    Sampling.remixToTarget(Tables.documents(spark, dir), "doc_id",
        "source", Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source"))

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", 2023): score every raw
    * document by log p_target(features) − log p_raw(features) under two
    * hashed bag-of-words multinomials — target = the `en` subset, raw =
    * the whole corpus. Features are tokens hashed into 64 buckets with
    * the portable md5 family; both models use add-one smoothing.
    * High-weight documents "look like" the target domain and are what
    * importance resampling keeps.
    *
    * Scale plan: both models are 64-row tables built by one hash
    * aggregate each over (bucket) — broadcast back as a single log-ratio
    * row-vector; scoring is then a map-side per-doc sum over its bucket
    * counts (one shuffle of (doc_id, bucket, cnt)). The corpus is never
    * shuffled; model size is O(buckets), independent of corpus size.
    * Log is the only libm call — rounded to 6 dp (see bm25).
    */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val b = 64
    def toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
          lit(b.toLong)).as("bkt"))
    // per-doc bucket counts: the only corpus-sized shuffle
    val docBkt = graft.ops.CacheScope.cached(
      toks.groupBy(col("doc_id"), col("bkt"))
        .agg(count(lit(1)).as("cnt"),
          max(when(col("lang") === "en", 1L).otherwise(0L)).as("is_en")))
    // both unigram models reduce from docBkt — no second corpus pass
    val rawM = docBkt.groupBy(col("bkt")).agg(sum(col("cnt")).as("c_raw"))
    val tgtM = docBkt.filter(col("is_en") === 1L)
      .groupBy(col("bkt")).agg(sum(col("cnt")).as("c_tgt"))
    val totals = rawM.agg(sum(col("c_raw")).as("t_raw"))
      .crossJoin(tgtM.agg(sum(col("c_tgt")).as("t_tgt")))
    val ratio = rawM.join(tgtM, Seq("bkt"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        (log((coalesce(col("c_tgt"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_tgt") + lit(b.toLong)).cast("double")) -
          log((col("c_raw") + lit(1L)).cast("double") /
            (col("t_raw") + lit(b.toLong)).cast("double"))).as("lr"))
    docBkt.join(broadcast(ratio), "bkt")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        round(sum(col("cnt").cast("double") * col("lr")), 6).as("dsir_w"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum data ordering, domain-stratified: within each source,
    * rank documents by a difficulty proxy (length), cut rank-based
    * deciles, and emit the interleave keys (decile, pos_in_decile) —
    * reading the output in (decile, pos_in_decile, source, doc_id)
    * order yields the easy-to-hard round-robin schedule curriculum
    * training consumes (Bengio et al., ICML'09).
    *
    * Scale plan: every window partitions by `source` — state is one
    * stratum, never the corpus, so the plan is one shuffle on the
    * stratum key regardless of corpus size (the reason the schedule is
    * stratified rather than global: a global rank would need the
    * KLL-boundary path instead). Deciles are exact integer rank
    * arithmetic: (rn−1)·10 div n_src — no percentile calls to drift
    * cross-engine.
    */
  def qCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(ws))
      .withColumn("decile", expr("(rn - 1) * 10 div n_src"))
      .withColumn("pos_in_decile", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col("decile"))
          .orderBy(col("n_chars"), col("doc_id"))))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("decile"), col("pos_in_decile").cast("long")
          .as("pos_in_decile"))
      .orderBy(col("decile"), col("pos_in_decile"), col("source"),
        col("doc_id"))
  }

  /** DSIR with hashed BIGRAM features — the paper's actual feature
    * space (unigrams lose word-order signal): word bigrams hash into
    * 128 buckets; model shape, smoothing, scoring and scale plan are
    * identical to [[qDsirWeights]]. Documents under 2 tokens have no
    * bigrams and drop out (the paper's behavior — no features, no
    * weight).
    */
  def qDsirBigram(spark: SparkSession, dir: String): DataFrame = {
    val b = 128
    def toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        split(col("text"), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"), explode(
        graft.ops.TextAnalysis.wordNgramsFromTokens(col("t"), 2))
        .as("gram"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long"),
          lit(b.toLong)).as("bkt"))
    val docBkt = graft.ops.CacheScope.cached(
      toks.groupBy(col("doc_id"), col("bkt"))
        .agg(count(lit(1)).as("cnt"),
          max(when(col("lang") === "en", 1L).otherwise(0L)).as("is_en")))
    val rawM = docBkt.groupBy(col("bkt")).agg(sum(col("cnt")).as("c_raw"))
    val tgtM = docBkt.filter(col("is_en") === 1L)
      .groupBy(col("bkt")).agg(sum(col("cnt")).as("c_tgt"))
    val totals = rawM.agg(sum(col("c_raw")).as("t_raw"))
      .crossJoin(tgtM.agg(sum(col("c_tgt")).as("t_tgt")))
    val ratio = rawM.join(tgtM, Seq("bkt"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        (log((coalesce(col("c_tgt"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_tgt") + lit(b.toLong)).cast("double")) -
          log((col("c_raw") + lit(1L)).cast("double") /
            (col("t_raw") + lit(b.toLong)).cast("double"))).as("lr"))
    docBkt.join(broadcast(ratio), "bkt")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        round(sum(col("cnt").cast("double") * col("lr")), 6).as("dsir_w"))
      .orderBy(col("doc_id"))
  }

  /** GLOBAL curriculum buckets via the KLL boundary path — the
    * corpus-rank variant [[qCurriculum]]'s scaladoc defers to: exact
    * decile boundary VALUES come from the propose→certify sketch
    * (Quantiles.sketchDeciles — the full column is never sorted), the
    * 9-value boundary vector broadcasts, and bucket assignment is a
    * map-side strict-less count. Docs equal to a boundary fall in the
    * lower bucket (value-based semantics — deterministic under ties,
    * unlike a rank split). Output: per-bucket population + char range,
    * the balance report a curriculum schedule is validated against.
    */
  def qCurriculumGlobal(spark: SparkSession, dir: String): DataFrame = {
    val bounds = graft.ops.Quantiles.sketchDeciles(
        Tables.documents(spark, dir), "n_chars")
      .agg(sort_array(collect_list(col("exact_value"))).as("bs"))
    Tables.documents(spark, dir)
      .filter(col("n_chars").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_chars"),
        expr("size(filter(bs, b -> b < cast(n_chars as double)))")
          .cast("long").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("decile"))
  }

  /** Hash-proposal NEGATIVE SAMPLING — the recommender/contrastive
    * training-data op: for every customer, 5 parts they have NEVER
    * ordered, drawn deterministically. Candidate j of customer c is
    * part (md5(c ':' j) mod maxPartkey) + 1 over 16 proposals
    * (partkeys are dense 1..max, so every proposal is a real part);
    * positives anti-join out; duplicate proposals collapse to their
    * smallest j; the 5 smallest-j survivors publish with their rank.
    *
    * Scale shape: NO user×catalog cross join anywhere — proposals are
    * a map-side sequence explode (16 rows/user), rejection is one
    * equi anti-join on (cust, part), and the top-5 window sees ≤16
    * rows per key. This is how production samplers scale: propose by
    * hash, reject, never enumerate the catalog. maxPartkey rides a
    * lazy 1-row broadcast (no construction job).
    */
  def qNegSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxPk = Tables.part(spark, dir)
      .agg(max(col("p_partkey")).as("maxpk"))
    val custs = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust")).distinct()
    val pos = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
    custs.crossJoin(broadcast(maxPk))
      .select(col("cust"), col("maxpk"),
        explode(expr("sequence(0, 15)")).as("j"))
      .select(col("cust"), col("j"),
        (pmod(conv(substring(md5(concat_ws(":", col("cust"), col("j"))),
          1, 8), 16, 10).cast("long"), col("maxpk")) + 1).as("part"))
      .join(pos, Seq("cust", "part"), "left_anti")
      .groupBy(col("cust"), col("part")).agg(min(col("j")).as("j"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cust")).orderBy(col("j"), col("part"))))
      .filter(col("rank") <= 5)
      .select(col("cust"), col("rank").cast("long").as("rank"),
        col("part").as("neg_part"))
      .orderBy(col("cust"), col("rank"))
  }

  /** Training-shard assignment by GLOBAL token cumsum — the last step
    * of a curation pipeline: documents in deterministic doc_id order
    * are cut into shards of ~2000 tokens (a doc never splits; shard =
    * tokens-before div size). The cumsum is computed as a DISTRIBUTED
    * PREFIX SUM — per-bucket window cumsums plus a broadcast
    * bucket-offset table — because a global unpartitioned window is a
    * single task at 100 TB; the offsets table has |buckets| rows
    * (thousands), the only driver-free way to number shards
    * monotonically corpus-wide.
    */
  def qCurateShard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val shardSize = 2000L
    val docs = Tables.documents(spark, dir)
      .select($"doc_id",
        size(split($"text", "\\s+")).cast("long").as("toks"),
        ($"doc_id" / 100).cast("long").as("bucket"))
    val inBucket = docs.withColumn("cum_in",
      sum($"toks").over(Window.partitionBy($"bucket")
        .orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("cum_in", coalesce($"cum_in", lit(0L)))
    val offsets = docs.groupBy($"bucket")
      .agg(sum($"toks").as("btoks"))
      .withColumn("offset",
        coalesce(sum($"btoks").over(
          org.apache.spark.sql.expressions.Window.orderBy($"bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bucket", $"offset")
    inBucket.join(broadcast(offsets), "bucket")
      .withColumn("shard",
        expr(s"(cum_in + offset) div $shardSize"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"shard")
  }

  /** NEYMAN-OPTIMAL sample allocation (Neyman 1934) — the survey-
    * statistics answer to "how many docs per source for a fixed
    * labeling budget": stratum h gets budget · N_h·S_h / Σ N·S, which
    * minimizes the variance of the stratified mean (here over doc
    * length). Complements the existing samplers: q_curate_sample_quota
    * fixes counts, q_curate_sample_stratified fixes rates; Neyman
    * DERIVES the counts from within-stratum dispersion.
    *
    * Determinism discipline: S_h comes from exact integer moments in
    * one pinned double expression; the weight total folds over the
    * strata in SORTED source order (the q_stat_anova device); integer
    * seats assign by floor + largest-remainder with a (frac desc,
    * source) tie order — identical doubles, identical seats in both
    * engines. Single-doc strata are excluded (no variance estimate).
    *
    * Scale: one moment aggregate over the corpus; everything after
    * runs on the |strata|-row table (1-row broadcasts, tiny windows).
    */
  def qCurateNeyman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 200L
    val st = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("t"),
        sum(col("n_chars") * col("n_chars")).as("q"))
      .filter(col("n") >= 2)
      .withColumn("sd", expr(
        "sqrt(cast(n * q - t * t as double) / cast(n * (n - 1) as double))"))
      .withColumn("w", col("n") * col("sd"))
    val wtot = st
      .agg(expr("sort_array(collect_list(struct(source, w)))").as("ws"))
      .select(expr(
        "aggregate(ws, cast(0.0 as double), (a, x) -> a + x.w)")
        .as("wtot"))
    val based = st.crossJoin(broadcast(wtot))
      .withColumn("exact_share", lit(budget) * col("w") / col("wtot"))
      .withColumn("base", floor(col("exact_share")).cast("long"))
      .withColumn("frac", col("exact_share") - col("base"))
    val sums = based.agg(sum(col("base")).as("sumbase"))
    based.crossJoin(broadcast(sums))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("frac").desc, col("source"))))
      .select(col("source"), col("n").as("n_docs"),
        round(col("sd"), 6).as("sd_r6"),
        (col("base") + when(col("rk") <= lit(budget) - col("sumbase"),
          1L).otherwise(0L)).as("alloc"))
      .orderBy(col("source"))
  }

  /** MODEL-BASED QUALITY SCORER — the fastText-classifier pattern of
    * the modern curation stacks (CCNet/LLaMA: train a cheap linear
    * model on seed labels, then score the whole corpus map-side), as
    * an INTEGER PERCEPTRON (Rosenblatt 1958; the mistake-driven
    * update keeps every weight an exact BIGINT, so training and
    * scoring replay bit-identically in any engine — no sigmoid, no
    * log, no float anywhere):
    *
    *   - labels: the rule-based Gopher-style gate's `pass` verdict
    *     (the distillation target — a model that reproduces the gate
    *     from bag-of-words alone scores docs the gate's regexes never
    *     see at a fraction of the cost), y ∈ {+1, −1};
    *   - features: 32 md5-hashed token-count buckets + bias (the
    *     portable first-8-hex-digits hash the minhash family uses);
    *   - training: 2 epochs over the doc_id % 4 == 0 AND doc_id < 2000
    *     slice in doc_id order — an ABSOLUTELY bounded labeled sample
    *     (≤ 500 rows at any corpus size; the BPE-vocab collect class),
    *     folded through one ordered `aggregate` whose state
    *     is the 33-long weight vector; update w += y·x iff
    *     y·(w·x) ≤ 0;
    *   - scoring: the final w rides a one-row broadcast cross join;
    *     each doc's score is a 32-term integer dot product, map-side.
    *
    * The twin replays the SAME fold as a recursive CTE over the
    * ordered training rows (state = the weight LIST) and the same
    * dot-product scoring — every score matches exactly, not to 6dp.
    *
    * Scale: the corpus-sized work is one feature-extraction map pass
    * (tokens → 32-slot count vector); training state is 33 integers
    * over a bounded sample; no shuffle anywhere but the final sort.
    */
  def qCurateQualityModel(spark: SparkSession, dir: String): DataFrame =
    perceptronScore(TextAnalysis.qualityGate(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        "text")
      .withColumn("y", when(col("pass"), 1L).otherwise(-1L)))

  /** The reusable perceptron core: input (doc_id, text, y ∈ {+1,−1}),
    * output per-doc (doc_id, is_train, label_pass, score, pred,
    * correct). Training slice = doc_id % 4 == 0 AND doc_id < 2000 —
    * the cap makes the labeled cohort ABSOLUTELY bounded (≤ 500 rows
    * at any corpus size; ADVICE r10), so the ordered collect_list the
    * fold runs over is a fixture-sized row, not a corpus fraction.
    * 2 epochs, 32 hashed buckets + bias; every number BIGINT-exact. */
  private[graft] def perceptronScore(docs: DataFrame): DataFrame = {
    val B = 32
    val trainCap = 2000L
    val bucket = "cast(conv(substring(md5(t), 1, 8), 16, 10)" +
      s" as bigint) % $B"
    // feature extraction is RELATIONAL (explode → codegen'd hash
    // aggregate on (doc, bucket) — the qDsirWeights shape), not a
    // per-doc HOF lambda: hashing inside transform/filter lambdas
    // runs interpreted per (token, bucket) and measured 16+ s at
    // sf0.1; this form runs the md5 once per token inside codegen and
    // rebuilds the dense 32-slot array from a per-doc count map.
    // Cached: the train fold and the corpus scoring both read it.
    val toks = docs.select(col("doc_id"), col("y"),
      explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
    val counts = toks
      .groupBy(col("doc_id"), expr(bucket).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(expr("map_from_entries(collect_list(struct(b, cnt)))").as("m"))
    val feats = graft.ops.CacheScope.cached(
      docs.select(col("doc_id"), col("y"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("y"),
          expr(s"transform(sequence(0, ${B - 1})," +
            " b -> coalesce(element_at(m, cast(b as bigint))," +
            " cast(0 as bigint)))").as("x")))
    val dot = s"aggregate(sequence(1, $B), cast(0 as bigint)," +
      " (s, b) -> s + element_at(w, b + 1) * element_at(e.x, b))"
    val train = feats.filter(col("doc_id") % 4 === 0 &&
        col("doc_id") < trainCap)
      .agg(sort_array(collect_list(struct(
        col("doc_id"), col("y"), col("x")))).as("exs"))
      .select(expr(
        s"""aggregate(
           |  concat(exs, exs),
           |  transform(sequence(1, ${B + 1}), i -> cast(0 as bigint)),
           |  (w, e) -> case when e.y * (element_at(w, 1) + $dot) <= 0
           |    then transform(sequence(1, ${B + 1}),
           |      i -> element_at(w, i) + e.y *
           |        (case when i = 1 then cast(1 as bigint)
           |              else element_at(e.x, i - 1) end))
           |    else w end)""".stripMargin).as("w"))
    val score = s"element_at(w, 1) + aggregate(sequence(1, $B)," +
      " cast(0 as bigint)," +
      " (s, b) -> s + element_at(w, b + 1) * element_at(x, b))"
    feats.crossJoin(broadcast(train))
      .withColumn("score", expr(score))
      .select(col("doc_id"),
        (col("doc_id") % 4 === 0 && col("doc_id") < trainCap)
          .as("is_train"),
        (col("y") === 1L).as("label_pass"),
        col("score"), (col("score") > 0).as("pred"),
        ((col("score") > 0) === (col("y") === 1L)).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** EXACT TIE-AWARE AUC of the quality model (Mann–Whitney identity:
    * AUC = U/(n₁n₀), Hanley & McNeil 1982) — the ranking-quality
    * metric the accuracy column of [[qCurateQualityModel]] can't see.
    * Scores group to distinct values, average ranks DOUBLE to stay
    * integer (tie group at prefix c with t members: 2·r̄ = 2c + t + 1),
    * so U₂ = 2U = Σ_pos 2r̄ − n₁(n₁+1) is exact BIGINT and the single
    * division lands identically cross-engine.
    *
    * Scale: the model's map-side scoring reduces to a distinct-score
    * table; the global prefix sum runs through [[Prefix]]'s two-pass
    * range-partitioned scan — no single-partition window.
    */
  def qCurateQualityAuc(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Ranking.aucExact(
      qCurateQualityModel(spark, dir), "score", "label_pass")

  /** TEMPERATURE-SAMPLED source mixture at τ = 1/2 (the multilingual
    * rebalancing rule of mBERT/XLM-R: sample ∝ n^τ so head sources
    * shrink and tail sources grow vs proportional sampling): per
    * source, weight = isqrt(n_tokens) — the INTEGER square root,
    * certified exactly (seed from double sqrt, then the ±1 fix-up
    * r² ≤ n < (r+1)², so Spark's truncating double→long cast and
    * DuckDB's rounding one land on the SAME integer) — and a 100k
    * budget split by the largest-remainder rule with INTEGER
    * remainders (the qCurateNeyman pattern without its double frac:
    * rem = B·s − base·S).
    *
    * Scale: one map-side token count + per-source aggregate; totals
    * ride one-row broadcasts; the rank window orders |sources| rows
    * (dimension-bounded).
    */
  def qCurateTemperature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 100000L
    val st = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(regexp_count(col("text"), lit("\\S+")).cast("long"))
        .as("n"))
      .withColumn("r0", expr("cast(sqrt(cast(n as double)) as bigint)"))
      .withColumn("s", expr(
        """case when (r0 + 1) * (r0 + 1) <= n then r0 + 1
          |     when r0 * r0 > n then r0 - 1
          |     else r0 end""".stripMargin))
    val tot = st.agg(sum(col("s")).as("stot"))
    val based = st.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(${budget}L * s) div stot"))
      .withColumn("rem", expr(s"${budget}L * s - base * stot"))
    val sums = based.agg(sum(col("base")).as("sumbase"))
    based.crossJoin(broadcast(sums))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .select(col("source"), col("n").as("n_tokens"),
        col("s").as("sqrt_tokens"),
        expr("s * 1000000L div stot").as("share_ppm"),
        (col("base") + when(
          col("rk") <= lit(budget) - col("sumbase"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(col("source"))
  }

  /** CCNet-STYLE PERPLEXITY TIERING (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score every document against the reference bigram LM
    * (the shared Stupid-Backoff model of q_text_bigram_lm), rank the
    * corpus by perplexity, and cut it into the head / middle / tail
    * terciles CCNet feeds to training with different sampling rates.
    * The rank is a GLOBAL order over the corpus, so it runs through
    * [[graft.ops.Prefix.runningSumInclusive]] (range-partitioned
    * two-pass — no single-partition window over documents); ties in
    * the round-3 perplexity break by doc_id, making tier boundaries
    * deterministic in both engines.
    *
    * Scale: LM scoring is the bigram join (one corpus shuffle, model
    * tables broadcast-sized); ranking is the two-pass prefix scan;
    * the report is a 3-row aggregate.
    */
  def qCurateCcnetTiers(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.stupidBackoffScore(
      Tables.documents(spark, dir), "doc_id", "text",
      trainPred = col("doc_id") % 2 === 0)
    val ranked = graft.ops.Prefix.runningSumInclusive(
      scored, Seq(col("ppl"), col("doc_id")), lit(1L), "rk")
    val n = scored.agg(count(lit(1)).as("n_docs"))
    ranked.crossJoin(broadcast(n))
      .withColumn("tier", expr("((rk - 1) * 3) div n_docs"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"),
        min(col("ppl")).as("min_ppl"), max(col("ppl")).as("max_ppl"),
        sum(col("n_scored")).as("n_tokens"))
      .select(col("tier"),
        expr("element_at(array('head', 'middle', 'tail')," +
          " cast(tier + 1 as int))").as("tier_name"),
        col("n"), col("min_ppl"), col("max_ppl"), col("n_tokens"))
      .orderBy(col("tier"))
  }

  val defs: Map[String, Q] = Map(
    "q_curate_ccnet_tiers" -> (qCurateCcnetTiers(_, _)),
    "q_curate_temperature" -> (qCurateTemperature(_, _)),
    "q_curate_quality_model" -> (qCurateQualityModel(_, _)),
    "q_curate_quality_auc" -> (qCurateQualityAuc(_, _)),
    "q_curate_kappa" -> (qCurateKappa(_, _)),
    "q_curate_fleiss" -> (qCurateFleiss(_, _)),
    "q_curate_coverage" -> (qCurateCoverage(_, _)),
    "q_curate_fertility" -> (qCurateFertility(_, _)),
    "q_curate_mix_kl" -> (qCurateMixKl(_, _)),
    "q_curate_quantile_norm" -> (qCurateQuantileNorm(_, _)),
    "q_curate_wilson" -> (qCurateWilson(_, _)),
    "q_curate_neyman" -> (qCurateNeyman(_, _)),
    "q_curate_shard" -> (qCurateShard(_, _)),
    "q_curate_neg_sample" -> (qNegSample(_, _)),
    "q_curate_curriculum_global" -> (qCurriculumGlobal(_, _)),
    "q_curate_dsir_bigram" -> (qDsirBigram(_, _)),
    "q_curate_curriculum" -> (qCurriculum(_, _)),
    "q_curate_dsir" -> (qDsirWeights(_, _)),
    "q_curate_nb_langid" -> (qCurateNbLangid(_, _)),
    "q_curate_sample_weighted" -> (qSampleWeighted(_, _)),
    "q_curate_remix" -> (qRemix(_, _)),
    "q_curate_sample_stratified" -> (qSampleStratified(_, _)),
    "q_curate_sample_quota" -> (qSampleQuota(_, _)),
    "q_curate_decontaminate" -> (qDecontaminate(_, _)),
    "q_curate_decontam_bloom" -> (qDecontamBloom(_, _)),
    "q_curate_pack" -> (qPack(_, _)),
    "q_curate_split" -> (qSplit(_, _)),
    "q_curate_feature_hash" -> (qFeatureHash(_, _)),
    "q_curate_mix_epochs" -> (qMixEpochs(_, _)),
    "q_curate_datasheet" -> (qDatasheet(_, _))
  )

  /** DATA-CONSTRAINED MIXING PLAN (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models" — repeating a source up to ~4
    * epochs is near-free; beyond that returns decay): given a token
    * budget of half the corpus and a uniform per-source target, compute
    * each source's repeat factor `epochs_x1000 = min(4000,
    * 1000·target div n_tokens)`, the tokens it actually contributes,
    * and the unfilled deficit where the 4-epoch cap binds. Everything
    * is integer floor arithmetic on exact token counts — the planner's
    * output is a deterministic recipe table, the thing a 100 TB
    * pretraining run materializes ONCE and every shard-assignment job
    * reads. Shape: one aggregate + a broadcast 1-row totals frame.
    */
  def qMixEpochs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .select($"source",
        size(split($"text", "\\s+")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("n_tokens"))
    val tot = per.agg(sum($"n_tokens").as("total"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr("(total div 2) div n_sources"))
      .withColumn("epochs_x1000",
        least(lit(4000L), expr("(1000 * target_tokens) div n_tokens")))
      .withColumn("planned_tokens",
        expr("(epochs_x1000 * n_tokens) div 1000"))
      .select($"source", $"n_tokens", $"target_tokens", $"epochs_x1000",
        $"planned_tokens",
        ($"target_tokens" - $"planned_tokens").as("deficit_tokens"))
      .orderBy($"source")
  }

  /** HASHING-TRICK FEATURIZATION (Weinberger et al., ICML'09 — the
    * vocabulary-free sparse encoder behind fasttext/VW-style linear
    * models): every token maps to `md5-prefix mod 64` with a ±1 sign
    * from the next hex nibble, per-document signed counts collapse into
    * a sparse (doc, bucket, weight) triple table, exact-zero
    * cancellations dropped (they carry no information and a recompute
    * drops them identically). Sampled to every 37th document to keep
    * the gate output bounded; the encoder itself is corpus-wide.
    *
    * Scale: the whole point of feature hashing at 100 TB — there is NO
    * dictionary to build, broadcast, or keep consistent across a
    * 1000-executor fleet; the plan is explode → map-side hash → ONE
    * hash aggregate on (doc, bucket). Collisions are the accepted
    * trade (Weinberger's inner-product preservation bound), and the
    * oracle replays every hash, sign, and cancellation bit-for-bit.
    */
  def qFeatureHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % 37 === 0)
      .select($"doc_id", explode(split($"text", "\\s+")).as("tok"))
      .filter($"tok" =!= "")
      .withColumn("bucket",
        pmod(conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"),
          lit(64L)))
      .withColumn("sgn",
        when(conv(substring(md5($"tok"), 9, 1), 16, 10).cast("long")
          % 2 === 0, 1L).otherwise(-1L))
      .groupBy($"doc_id", $"bucket")
      .agg(sum($"sgn").as("w"))
      .filter($"w" =!= 0)
      .orderBy($"doc_id", $"bucket")
  }

  /** MODEL-BASED filtering: a Naive-Bayes classifier over hashed
    * bag-of-words features (the fasttext-shaped linear scorer the
    * GPT-3/LLaMA curation stacks run for quality/language filtering),
    * trained and applied in ONE relational plan — NB training is
    * closed-form counting, so no iteration or driver state exists.
    * The label is `lang`, trained on the even-doc_id half and scored
    * on the odd-doc_id HOLDOUT (a real split): per class,
    * Laplace-smoothed bucket likelihoods log((c+1)/(t+B)) over B=256
    * md5-hashed token buckets (the DSIR family), plus a smoothed
    * doc-count prior; prediction is the argmax, ties broken by class
    * name.
    *
    * HONEST fixture note: this corpus's `lang` (and `source`) labels
    * are measured to be INDEPENDENT of the text — every language's
    * docs draw from the same vocabulary at the same rates (zero
    * occurrences of any real language marker; per-token rates
    * identical across labels). On such data the Bayes-optimal
    * classifier IS the prior, and that calibration — converging to
    * majority-class prediction rather than hallucinating signal — is
    * exactly what the pinned oracle certifies, token for token, in
    * both engines. On a corpus whose labels correlate with text the
    * same plan learns the real signal; swap `lang` for any seed label
    * (quality votes, domain tags) unchanged.
    *
    * Scale: one corpus-sized shuffle (the (doc, bucket) count —
    * shared shape with qDsirWeights); the model is a (classes × 256)
    * grid broadcast back; scoring is map-side + one per-doc window.
    */
  def qCurateNbLangid(spark: SparkSession, dir: String): DataFrame = {
    val b = 256
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
          lit(b.toLong)).as("bkt"))
    val docBkt = graft.ops.CacheScope.cached(
      toks.groupBy(col("doc_id"), col("lang"), col("bkt"))
        .agg(count(lit(1)).as("cnt")))
    val train = docBkt.filter(col("doc_id") % 2 === 0)
    val classTok = train.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("cnt")).as("c"))
    val classTot = classTok.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    val priors = train.select(col("doc_id"), col("lang")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("d"))
    val totals = priors.agg(sum(col("d")).as("dd"),
      count(lit(1)).as("nl"))
    // dense (class × bucket) grid: zero-count buckets still smooth
    val grid = priors.select(col("lang").as("cls"))
      .crossJoin(spark.range(0, b).select(col("id").as("bkt")))
      .join(classTok.select(col("lang").as("cls"), col("bkt"), col("c")),
        Seq("cls", "bkt"), "left")
      .join(classTot.select(col("lang").as("cls"), col("t")), "cls")
      .select(col("cls"), col("bkt"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("t") + lit(b.toLong)).cast("double")).as("logp"))
    val logPrior = priors.crossJoin(broadcast(totals))
      .select(col("lang").as("cls"),
        log((col("d") + lit(1L)).cast("double") /
          (col("dd") + col("nl")).cast("double")).as("logprior"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls"))
    docBkt.filter(col("doc_id") % 2 === 1)
      .join(broadcast(grid), "bkt")
      .groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(sum(col("cnt").cast("double") * col("logp")).as("ll"))
      .join(broadcast(logPrior), "cls")
      .withColumn("score", col("ll") + col("logprior"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("pred_lang"), col("lang"),
        when(col("cls") === col("lang"), 1L).otherwise(0L).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** "Datasheet for datasets" (Gebru et al., CACM'21) summary card:
    * one long-format artifact uniting the corpus-level facts a model
    * team asks of a training set — volume, language mix, exact-dup
    * rate, length profile, split shares — every value an exact BIGINT
    * so the card is bit-reproducible. Each section is one aggregate
    * over the (cached) documents scan; the union is O(sections) rows.
    */
  def qDatasheet(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.ops.CacheScope.cached(
      Sampling.assignSplit(Tables.documents(spark, dir), "doc_id",
        valFrac = 0.1, testFrac = 0.1))
    def row(section: String, metric: Column, value: Column): DataFrame =
      d.agg(value.as("value"))
        .select(lit(section).as("section"), metric.as("metric"),
          col("value").cast("long"))
    val volume = row("volume", lit("n_docs"), count(lit(1)))
      .unionByName(row("volume", lit("total_chars"),
        sum(col("n_chars"))))
      .unionByName(row("volume", lit("max_chars"), max(col("n_chars"))))
    val langs = d.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("value"))
      .select(lit("lang_mix").as("section"),
        concat(lit("n_docs:"), col("lang")).as("metric"), col("value"))
    val dup = row("duplication", lit("exact_dup_docs"),
      count(lit(1)) - count_distinct(col("text")))
    val lengths = row("length", lit("docs_lt_100_chars"),
      count(when(col("n_chars") < 100, 1)))
      .unionByName(row("length", lit("docs_gt_1000_chars"),
        count(when(col("n_chars") > 1000, 1))))
    val splits = d.groupBy(col("split"))
      .agg(count(lit(1)).cast("long").as("value"))
      .select(lit("splits").as("section"),
        concat(lit("n_docs:"), col("split")).as("metric"), col("value"))
    volume.unionByName(langs).unionByName(dup).unionByName(lengths)
      .unionByName(splits)
      .orderBy(col("section"), col("metric"))
  }

  /** Deterministic 80/10/10 split profile: per split, document count
    * and exact ppm share — plus stability evidence (min/max doc id)
    * pinned by the hash compare.
    */
  def qSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.assignSplit(Tables.documents(spark, dir), "doc_id",
        valFrac = 0.1, testFrac = 0.1)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .withColumn("share_ppm", expr(
        "n_docs * 1000000L div sum(n_docs) over ()"))
      .orderBy(col("split"))

  /** COHEN'S κ — inter-annotator agreement (Cohen 1960), the QA gate
    * every labeled-data pipeline runs before trusting its raters. Two
    * deterministic "annotators" label each document's length class on
    * different evidence (A: raw chars; B: whitespace tokens), so they
    * correlate without being identical — exactly the situation κ is
    * for (chance-corrected agreement, unlike raw percent agreement).
    * κ = (N·Σdiag − Σᵢrᵢcᵢ)/(N² − Σᵢrᵢcᵢ) is a ratio of exact BIGINTs;
    * the Landis–Koch "substantial" verdict (κ > 0.4 here, their
    * moderate/substantial midline) is the cross-multiplied integer
    * comparison 5·(N·Σdiag − Σrᵢcᵢ) > 2·(N² − Σrᵢcᵢ) — no float in
    * the bit. Shape: one scan → k×k confusion aggregate (k=3), then
    * arithmetic on a 9-row frame; at 100 TB only the confusion counts
    * cross the shuffle.
    */
  /** FLEISS' KAPPA (Fleiss 1971) — multi-rater agreement beyond
    * [[qCurateKappa]]'s two-rater Cohen form: four deterministic
    * quality gates (length ≥ 400, ≥ 60 spaces, contains '.', contains
    * ',') act as n = 4 binary raters per document; κ measures their
    * agreement beyond the chance implied by the marginal pass rate —
    * the sanity check a curation pipeline runs before treating gate
    * consensus as a label.
    *
    * Exact rational form: with p_i = pass votes on doc i, f_i = 4−p_i,
    * A = Σ(p_i²+f_i²−4), S = Σp_i, F = 4N−S, D = 12N, M = 16N²:
    * P̄ = A/D, P̄_e = (S²+F²)/M, and
    * κ = (A·M − D·(S²+F²)) / (D·(M − (S²+F²))) — every term an exact
    * integer (DECIMAL(38,0) headroom: A·M ~ 10²⁰ at web-corpus N), one
    * identical division for κ_r6, and the "moderate agreement"
    * verdict κ > 0.4 is the integer cross-multiplication 5·num >
    * 2·den. Scale: one map-side scan to (p, f) per doc, one 3-sum
    * reduce.
    */
  def qCurateFleiss(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val votes = Tables.documents(spark, dir).select(
      ((length(col("text")) >= 400).cast("long") +
        ((length(col("text")) -
          length(expr("replace(text, ' ', '')"))) >= 60).cast("long") +
        (instr(col("text"), ".") > 0).cast("long") +
        (instr(col("text"), ",") > 0).cast("long")).as("p"))
    votes
      .agg(count(lit(1)).as("n"),
        sum(col("p")).as("s"),
        sum(col("p") * col("p") + (lit(4L) - col("p")) * (lit(4L) - col("p")) - 4L)
          .as("a"))
      .select(col("n"), col("s"), col("a"),
        // n and s promote to DECIMAL(38,0) BEFORE squaring (ADVICE
        // r11): 16n² wraps Int64 at n ≳ 7.6×10⁸ docs, so the headroom
        // claim only holds if no subexpression is evaluated in BIGINT
        expr("""cast(a as decimal(38,0))
               |    * (16 * cast(n as decimal(38,0)) * n)
               |  - cast(12 as decimal(38,0)) * n
               |    * (cast(s as decimal(38,0)) * s
               |       + (4 * cast(n as decimal(38,0)) - s) * (4 * n - s))"""
          .stripMargin.replace('\n', ' ')).as("num"),
        expr("""cast(12 as decimal(38,0)) * n
               |  * (16 * cast(n as decimal(38,0)) * n
               |     - cast(s as decimal(38,0)) * s
               |     - (4 * cast(n as decimal(38,0)) - s) * (4 * n - s))"""
          .stripMargin.replace('\n', ' ')).as("den"))
      .select(col("n"), col("s"), col("a"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("kappa_r6"),
        (col("num") * 5 > col("den") * 2).as("moderate"))
  }

  def qCurateKappa(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val lab = Tables.documents(spark, dir).select(
      when(col("n_chars") < 200, "short")
        .when(col("n_chars") < 400, "medium").otherwise("long").as("a"),
      when(TextAnalysis.tokenCount(col("text")) < 40, "short")
        .when(TextAnalysis.tokenCount(col("text")) < 80, "medium")
        .otherwise("long").as("b"))
    val conf = lab.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val rows = conf.groupBy(col("a")).agg(sum(col("c")).as("ra"))
    val cols = conf.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val pe = rows.join(cols, col("a") === col("b"))
      .agg(sum(col("ra") * col("cb")).as("pe_num"))
    val ag = conf.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    ag.crossJoin(broadcast(pe))
      .select(col("n"), col("agree"), col("pe_num"),
        round((col("n") * col("agree") - col("pe_num")).cast("double")
          / (col("n") * col("n") - col("pe_num")).cast("double"), 6)
          .as("kappa_r6"),
        (lit(5L) * (col("n") * col("agree") - col("pe_num"))
          > lit(2L) * (col("n") * col("n") - col("pe_num")))
          .as("substantial"))
  }

  /** CROSS-SOURCE QUANTILE NORMALIZATION (Bolstad et al. 2003
    * lineage, rank-mapping form): per-source quality scores are made
    * comparable by mapping each doc's WITHIN-SOURCE rank onto the
    * GLOBAL score distribution — source r-th of n maps to the global
    * value at position ⌊(2r−1)·N/(2n)⌋+1 (midpoint rule, always in
    * [1, N]). The mixing problem this solves: two classifiers score
    * on different scales, and quota sampling on raw scores would
    * over-draw from whichever source scores generously. All-integer
    * rank arithmetic; ties broken by doc_id so both engines rank
    * identically. Shape: one window per source + one global sort
    * (range-partitioned at scale, the q_curate_shard argument) + one
    * equi-join on position.
    */
  def qCurateQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("raw"))
    val bySrc = d
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("raw"), col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(
        Window.partitionBy(col("source"))))
    val global = d
      .select(col("raw").as("gval"),
        row_number().over(Window.orderBy(col("raw"), col("doc_id")))
          .as("gpos"))
    val n = d.agg(count(lit(1)).as("n_all"))
    bySrc.crossJoin(broadcast(n))
      .withColumn("gpos",
        expr("(2 * r - 1) * n_all div (2 * n_src) + 1"))
      .join(global, "gpos")
      .select(col("doc_id"), col("source"), col("raw"),
        col("gval").as("norm"))
      .orderBy(col("doc_id"))
  }

  /** WILSON LOWER BOUND source ranking (Wilson 1927; the "how not to
    * sort by average rating" rule): sources are ranked by the 95%
    * lower confidence bound of their quality-gate pass rate, so a
    * source with 3/3 passes ranks below one with 80/100 — small
    * samples can't buy top rank. Inputs (passes, n) are exact
    * integers; the one formula application is identical IEEE text in
    * both engines (√ is correctly rounded). Shape: scan → per-source
    * conditional count → 20-row arithmetic.
    */
  def qCurateWilson(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_chars") >= 100 && col("n_chars") <= 450, 1L)
          .otherwise(0L)).as("passes"))
      .withColumn("lb_r6", round(expr(
        """(passes / cast(n as double) + 1.96 * 1.96 / (2.0 * n)
          |  - 1.96 * sqrt((passes / cast(n as double)
          |      * (1.0 - passes / cast(n as double))
          |      + 1.96 * 1.96 / (4.0 * n)) / n))
          |/ (1.0 + 1.96 * 1.96 / n)""".stripMargin.replace('\n', ' ')), 6))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("lb_r6").desc, col("source"))))
      .select(col("rk"), col("source"), col("n"), col("passes"),
        col("lb_r6"))
      .orderBy(col("rk"))
  }

  /** VOCABULARY COVERAGE CURVE — the tokenizer-sizing question: what
    * share of the corpus's token OCCURRENCES does a top-k vocabulary
    * cover, at k ∈ {10, 100, 1000}? (Zipf makes the first points
    * steep; the curve's knee is where vocab growth stops paying —
    * the published basis for choosing BPE merge counts.) Rank is
    * (freq desc, token) — deterministic under ties; coverage is an
    * exact PPM integer. Shape: one explode + one aggregate, a global
    * rank over the VOCABULARY (not the corpus — |V| rows), one
    * broadcast totals frame.
    */
  def qCurateCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ranked = freq
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("c"), asc("w"))).cast("long"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("rk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = freq.agg(sum(col("c")).as("total"),
      count(lit(1)).as("vocab"))
    val ks = spark.range(1).select(
      explode(array(lit(10L), lit(100L), lit(1000L))).as("k"))
    ks.crossJoin(broadcast(tot))
      .withColumn("rk", least(col("k"), col("vocab")))
      .join(ranked.select(col("rk"), col("cum")), "rk")
      .select(col("k"), col("rk").as("vocab_used"), col("cum").as("covered"),
        col("total"),
        expr("cum * 1000000L div total").as("coverage_ppm"))
      .orderBy(col("k"))
  }

  /** TOKENIZER FERTILITY per source — BPE-ish segments per whitespace
    * word (the tokenizer-fit diagnostic: high fertility = the
    * tokenizer fragments this source's vocabulary, its documents cost
    * more context window per word). Exact PPM ratio of two corpus
    * token sums; the GPT-2-family pre-tokenizer regex is the same one
    * q_text_token_count pins. One map-side count pair + one rollup.
    */
  def qCurateFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long")
          .as("bp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
        sum(col("bp")).as("bpeish_tokens"))
      .withColumn("fertility_ppm",
        expr("bpeish_tokens * 1000000L div ws_tokens"))
      .orderBy(col("source"))

  /** MIXTURE DIVERGENCE — KL(target ‖ actual) of the source token
    * mix against the uniform target the remix/quota planners aim at:
    * the single drift number a recurring curation job alarms on
    * before re-planning (q_curate_remix fixes what this detects).
    * Token shares come from exact integer sums; the ln fold is
    * source-ordered (the q_stat_anova discipline); the worst
    * (most-underrepresented) source and its exact PPM deficit ride
    * along so the alarm names its culprit.
    */
  def qCurateMixKl(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("toks"))
    val tot = tok.agg(sum(col("toks")).as("total"),
      count(lit(1)).as("k"))
    val shared = tok.crossJoin(broadcast(tot))
    val worst = shared
      .withColumn("deficit_ppm",
        expr("1000000L div k - toks * 1000000L div total"))
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("deficit_ppm"), asc("source"))))
      .filter(col("rn") === 1)
      .select(col("source").as("worst_source"), col("deficit_ppm"))
    shared
      .groupBy()
      .agg(first(col("k")).as("k"), first(col("total")).as("total"),
        expr("aggregate(sort_array(collect_list(struct(source, toks," +
          " total, k))), cast(0.0 as double), (a, x) ->" +
          " a + (1.0 / x.k) * ln((cast(x.total as double) / x.k)" +
          " / x.toks))").as("kl"))
      .crossJoin(broadcast(worst))
      .select(col("k"), col("total"), round(col("kl"), 6).as("kl_r6"),
        col("worst_source"), col("deficit_ppm"))
  }

  private val u = Sampling.hashUniformSql("doc_id")

  /** The full quality-model twin (perceptron fold as a recursive CTE),
    * shared verbatim by q_curate_quality_model and nested as a
    * subquery by q_curate_quality_auc. */
  private lazy val qualityModelOracleSql: String = {
    val stopList =
      TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val bucket = "CAST(list_sum(list_transform(generate_series(1, 8)," +
      " d -> CAST(strpos('0123456789abcdef', substring(md5(t), d, 1))" +
      " - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))" +
      " AS BIGINT) % 32"
    val dotW = "CAST(list_sum(list_transform(generate_series(1, 32)," +
      " b -> w[b + 1] * e.x[b])) AS BIGINT)"
    val dotS = "CAST(w[1] + CAST(list_sum(list_transform(" +
      "generate_series(1, 32), b -> w[b + 1] * x[b])) AS BIGINT)" +
      " AS BIGINT)"
    s"""WITH RECURSIVE f AS (
       |  SELECT doc_id,
       |    CASE WHEN
       |      CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
       |        BETWEEN 20 AND 2000
       |      AND 3 * CAST(len(regexp_extract_all(text, '\\S+'))
       |        AS BIGINT)
       |        <= CAST(length(regexp_replace(text, '\\s+', '', 'g'))
       |          AS BIGINT)
       |      AND CAST(length(regexp_replace(text, '\\s+', '', 'g'))
       |          AS BIGINT)
       |        <= 5 * CAST(len(regexp_extract_all(text, '\\S+'))
       |          AS BIGINT)
       |      AND CAST(len(list_filter(
       |          string_split_regex(lower(text), '\\s+'),
       |          t -> list_contains($stopList, t))) AS BIGINT) >= 2
       |      THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
       |    list_transform(generate_series(0, 31),
       |      b -> CAST(len(list_filter(
       |        list_transform(
       |          list_filter(string_split(text, ' '), t -> t <> ''),
       |          t -> $bucket),
       |        v -> v = b)) AS BIGINT)) AS x
       |  FROM documents),
       |exs AS (
       |  SELECT y, x, row_number() OVER (ORDER BY doc_id) AS rn
       |  FROM f WHERE doc_id % 4 = 0 AND doc_id < 2000),
       |nn AS (SELECT CAST(max(rn) AS BIGINT) AS n FROM exs),
       |step(t, w) AS (
       |  SELECT CAST(0 AS BIGINT),
       |    list_transform(generate_series(1, 33),
       |      i -> CAST(0 AS BIGINT))
       |  UNION ALL
       |  SELECT t + 1,
       |    CASE WHEN e.y * (w[1] + $dotW) <= 0
       |      THEN list_transform(generate_series(1, 33),
       |        i -> w[i] + e.y * (CASE WHEN i = 1
       |          THEN CAST(1 AS BIGINT) ELSE e.x[i - 1] END))
       |      ELSE w END
       |  FROM step, nn, exs e
       |  WHERE e.rn = (t % nn.n) + 1 AND t < 2 * nn.n),
       |wf AS (SELECT w FROM step, nn WHERE t = 2 * nn.n)
       |SELECT doc_id, doc_id % 4 = 0 AND doc_id < 2000 AS is_train,
       |  y = 1 AS label_pass,
       |  $dotS AS score, $dotS > 0 AS pred,
       |  ($dotS > 0) = (y = 1) AS correct
       |FROM f, wf ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the shared bigram-LM twin nests as a CTE; rank by (round-3 ppl,
    // doc_id) and cut terciles with the same integer boundary rule
    "q_curate_ccnet_tiers" -> {
      val lm = TextQueries.oracles("q_text_bigram_lm")
      s"""WITH lm AS (
         |$lm
         |),
         |rk AS (
         |  SELECT *, row_number() OVER (ORDER BY ppl, doc_id) AS rk,
         |    count(*) OVER () AS n_docs
         |  FROM lm),
         |t AS (SELECT *, ((rk - 1) * 3) // n_docs AS tier FROM rk)
         |SELECT CAST(tier AS BIGINT) AS tier,
         |  ['head', 'middle', 'tail'][CAST(tier + 1 AS INT)] AS tier_name,
         |  count(*) AS n, min(ppl) AS min_ppl, max(ppl) AS max_ppl,
         |  CAST(sum(n_scored) AS BIGINT) AS n_tokens
         |FROM t GROUP BY tier ORDER BY tier""".stripMargin
    },
    // certified isqrt (rounding-direction-proof), integer remainders,
    // largest-remainder step identical to the engine
    "q_curate_temperature" ->
      """WITH st AS (
        |  SELECT source,
        |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |      AS n
        |  FROM documents GROUP BY source),
        |sq AS (
        |  SELECT source, n,
        |    CAST(sqrt(CAST(n AS DOUBLE)) AS BIGINT) AS r0
        |  FROM st),
        |w AS (
        |  SELECT source, n,
        |    CASE WHEN (r0 + 1) * (r0 + 1) <= n THEN r0 + 1
        |         WHEN r0 * r0 > n THEN r0 - 1
        |         ELSE r0 END AS s
        |  FROM sq),
        |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS stot FROM w),
        |based AS (
        |  SELECT source, n, s, stot,
        |    (100000 * s) // stot AS base,
        |    100000 * s - ((100000 * s) // stot) * stot AS rem
        |  FROM w, tot),
        |sums AS (SELECT CAST(SUM(base) AS BIGINT) AS sumbase FROM based),
        |rk AS (SELECT *, row_number() OVER (
        |    ORDER BY rem DESC, source) AS rk FROM based)
        |SELECT source, n AS n_tokens, s AS sqrt_tokens,
        |  CAST(s * 1000000 // stot AS BIGINT) AS share_ppm,
        |  CAST(base + CASE WHEN rk <= 100000 - sumbase
        |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM rk, sums ORDER BY source""".stripMargin,
    // perceptron fold replayed as a recursive CTE: state = the 33-long
    // weight LIST, one step per (epoch, example) in doc_id order; the
    // bucket hash is the portable first-8-md5-hex digit-sum; every
    // score is the identical integer dot product — exact, not 6dp
    "q_curate_quality_model" -> qualityModelOracleSql,
    // tie-aware rank AUC over the nested model twin: grouped scores,
    // doubled average ranks stay integer, one final division
    "q_curate_quality_auc" ->
      s"""WITH s AS (SELECT score, label_pass FROM (
         |$qualityModelOracleSql
         |) m),
         |g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS ct,
         |    CAST(SUM(CASE WHEN label_pass THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cp
         |  FROM s GROUP BY score),
         |p AS (SELECT *, CAST(SUM(ct) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum FROM g),
         |t AS (SELECT
         |    CAST(SUM(cp * (2 * (cum - ct) + ct + 1)) AS BIGINT)
         |      AS two_rank_sum,
         |    CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(ct - cp) AS BIGINT) AS n_neg
         |  FROM p)
         |SELECT n_pos, n_neg,
         |  two_rank_sum - n_pos * (n_pos + 1) AS u2,
         |  round(CAST(two_rank_sum - n_pos * (n_pos + 1) AS DOUBLE)
         |    / (2 * n_pos * n_neg), 6) AS auc_r6
         |FROM t""".stripMargin,
    // same exact token shares, source-ordered ln fold, PPM deficit
    "q_curate_mix_kl" ->
      """WITH tok AS (SELECT source,
        |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |      AS toks
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS k FROM tok),
        |w AS (SELECT source AS worst_source,
        |    1000000 // k - toks * 1000000 // total AS deficit_ppm,
        |    row_number() OVER (ORDER BY
        |      (1000000 // k - toks * 1000000 // total) DESC, source)
        |      AS rn
        |  FROM tok, tot),
        |f AS (SELECT MIN(k) AS k, MIN(total) AS total,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((1.0 / k) * ln((CAST(total AS DOUBLE) / k) / toks)
        |        ORDER BY source)), (a, b) -> a + b) AS kl
        |  FROM tok, tot)
        |SELECT f.k, f.total, round(f.kl, 6) AS kl_r6,
        |  w.worst_source, CAST(w.deficit_ppm AS BIGINT) AS deficit_ppm
        |FROM f, w WHERE w.rn = 1""".stripMargin,
    // same GPT-2-family pre-tokenizer regex as q_text_token_count
    "q_curate_fertility" ->
      """WITH d AS (SELECT source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws,
        |    CAST(len(regexp_extract_all(text,
        |      '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
        |      AS BIGINT) AS bp
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(bp) AS BIGINT) AS bpeish_tokens,
        |  CAST(SUM(bp) AS BIGINT) * 1000000 // CAST(SUM(ws) AS BIGINT)
        |    AS fertility_ppm
        |FROM d GROUP BY source
        |ORDER BY source""".stripMargin,
    // identical (freq desc, token) rank and exact PPM coverage
    "q_curate_coverage" ->
      """WITH freq AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |ranked AS (SELECT w, c,
        |    CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT)
        |      AS rk,
        |    CAST(SUM(c) OVER (ORDER BY c DESC, w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM freq),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS vocab FROM freq),
        |ks AS (SELECT unnest([10, 100, 1000]) AS k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  least(ks.k, tot.vocab) AS vocab_used,
        |  r.cum AS covered, tot.total,
        |  r.cum * 1000000 // tot.total AS coverage_ppm
        |FROM ks, tot
        |JOIN ranked r ON r.rk = least(ks.k, tot.vocab)
        |ORDER BY k""".stripMargin,
    // identical confusion-matrix integers; cross-multiplied verdict
    "q_curate_fleiss" ->
      """WITH v AS (SELECT
        |    (CASE WHEN length(text) >= 400 THEN 1 ELSE 0 END
        |     + CASE WHEN length(text) - length(replace(text, ' ', ''))
        |         >= 60 THEN 1 ELSE 0 END
        |     + CASE WHEN position('.' IN text) > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN position(',' IN text) > 0 THEN 1 ELSE 0 END)
        |      AS p
        |  FROM documents),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS s,
        |    CAST(SUM(p * p + (4 - p) * (4 - p) - 4) AS BIGINT) AS a
        |  FROM v),
        |f AS (SELECT n, s, a,
        |    CAST(a AS HUGEINT) * (16 * CAST(n AS HUGEINT) * n)
        |      - CAST(12 AS HUGEINT) * n
        |        * (CAST(s AS HUGEINT) * s
        |           + (4 * CAST(n AS HUGEINT) - s) * (4 * n - s)) AS num,
        |    CAST(12 AS HUGEINT) * n
        |      * (16 * CAST(n AS HUGEINT) * n - CAST(s AS HUGEINT) * s
        |         - (4 * CAST(n AS HUGEINT) - s) * (4 * n - s)) AS den
        |  FROM ag)
        |SELECT n, s, a,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |    AS kappa_r6,
        |  (num * 5 > den * 2) AS moderate
        |FROM f""".stripMargin,
    "q_curate_kappa" ->
      """WITH lab AS (SELECT
        |    CASE WHEN n_chars < 200 THEN 'short'
        |         WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS a,
        |    CASE WHEN len(regexp_extract_all(text, '\S+')) < 40
        |           THEN 'short'
        |         WHEN len(regexp_extract_all(text, '\S+')) < 80
        |           THEN 'medium' ELSE 'long' END AS b
        |  FROM documents),
        |conf AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
        |  FROM lab GROUP BY a, b),
        |r AS (SELECT a, SUM(c) AS ra FROM conf GROUP BY a),
        |cc AS (SELECT b, SUM(c) AS cb FROM conf GROUP BY b),
        |pe AS (SELECT CAST(SUM(ra * cb) AS BIGINT) AS pe_num
        |  FROM r JOIN cc ON r.a = cc.b),
        |ag AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
        |      AS agree
        |  FROM conf)
        |SELECT n, agree, pe_num,
        |  round(CAST(n * agree - pe_num AS DOUBLE)
        |    / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa_r6,
        |  (5 * (n * agree - pe_num) > 2 * (n * n - pe_num))
        |    AS substantial
        |FROM ag, pe""".stripMargin,
    // identical rank arithmetic with doc_id tie-breaks; midpoint rule
    "q_curate_quantile_norm" ->
      """WITH d AS (SELECT doc_id, source, n_chars AS raw
        |  FROM documents),
        |bysrc AS (SELECT doc_id, source, raw,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY raw, doc_id) AS r,
        |    COUNT(*) OVER (PARTITION BY source) AS n_src
        |  FROM d),
        |gtab AS (SELECT raw AS gval,
        |    row_number() OVER (ORDER BY raw, doc_id) AS gpos
        |  FROM d),
        |nn AS (SELECT COUNT(*) AS n_all FROM d),
        |pos AS (SELECT b.doc_id, b.source, b.raw,
        |    (2 * b.r - 1) * nn.n_all // (2 * b.n_src) + 1 AS gpos
        |  FROM bysrc b, nn)
        |SELECT p.doc_id, p.source, p.raw, g.gval AS norm
        |FROM pos p JOIN gtab g ON g.gpos = p.gpos
        |ORDER BY p.doc_id""".stripMargin,
    // identical IEEE formula text on exact (passes, n)
    "q_curate_wilson" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN n_chars >= 100 AND n_chars <= 450
        |      THEN 1 ELSE 0 END) AS BIGINT) AS passes
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n, passes,
        |    round((passes / CAST(n AS DOUBLE) + 1.96 * 1.96 / (2.0 * n)
        |      - 1.96 * sqrt((passes / CAST(n AS DOUBLE)
        |          * (1.0 - passes / CAST(n AS DOUBLE))
        |          + 1.96 * 1.96 / (4.0 * n)) / n))
        |    / (1.0 + 1.96 * 1.96 / n), 6) AS lb_r6
        |  FROM s)
        |SELECT CAST(row_number() OVER (ORDER BY lb_r6 DESC, source)
        |    AS INT) AS rk,
        |  source, n, passes, lb_r6
        |FROM w
        |ORDER BY rk""".stripMargin,
    "q_curate_mix_epochs" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
        |               count(*) AS n_sources FROM per),
        |pl AS (
        |  SELECT source, n_tokens,
        |    (total // 2) // n_sources AS target_tokens,
        |    LEAST(4000, (1000 * ((total // 2) // n_sources))
        |      // n_tokens) AS epochs_x1000
        |  FROM per, tot)
        |SELECT source, n_tokens, target_tokens, epochs_x1000,
        |  (epochs_x1000 * n_tokens) // 1000 AS planned_tokens,
        |  target_tokens - (epochs_x1000 * n_tokens) // 1000
        |    AS deficit_tokens
        |FROM pl ORDER BY source""".stripMargin,
    "q_curate_feature_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        |  FROM documents WHERE doc_id % 37 = 0),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef',
        |            substring(md5(tok), d, 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << (4 * (8 - d))))) AS BIGINT)
        |      % 64 AS bucket,
        |    CASE WHEN (strpos('0123456789abcdef',
        |        substring(md5(tok), 9, 1)) - 1) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM toks WHERE tok <> '')
        |SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS w
        |FROM h GROUP BY doc_id, bucket
        |HAVING SUM(sgn) <> 0
        |ORDER BY doc_id, bucket""".stripMargin,
    // identical moment arithmetic, source-ordered weight fold, and
    // floor + largest-remainder seat assignment
    "q_curate_neyman" ->
      """WITH st AS (SELECT source, count(*) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS t,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
        |  FROM documents GROUP BY source HAVING count(*) >= 2),
        |sd AS (SELECT source, n,
        |    sqrt(CAST(n * q - t * t AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE)) AS sd
        |  FROM st),
        |w AS (SELECT source, n, sd, n * sd AS w FROM sd),
        |wt AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(w ORDER BY source)), (a, b) -> a + b) AS wtot FROM w),
        |b AS (SELECT source, n, sd, w,
        |    200 * w / wtot AS exact_share,
        |    CAST(floor(200 * w / wtot) AS BIGINT) AS base
        |  FROM w CROSS JOIN wt),
        |s AS (SELECT *, exact_share - base AS frac,
        |    CAST(SUM(base) OVER () AS BIGINT) AS sumbase,
        |    row_number() OVER (ORDER BY exact_share - base DESC, source)
        |      AS rk
        |  FROM b)
        |SELECT source, n AS n_docs, round(sd, 6) AS sd_r6,
        |  base + CASE WHEN rk <= 200 - sumbase THEN 1 ELSE 0 END
        |    AS alloc
        |FROM s ORDER BY source""".stripMargin,
    // the two-level prefix sum must equal the plain global cumsum
    "q_curate_shard" ->
      """WITH d AS (SELECT doc_id,
        |    len(string_split_regex(text, '\s+')) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks,
        |    coalesce(SUM(toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum
        |  FROM d)
        |SELECT CAST(cum // 2000 AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY shard ORDER BY shard""".stripMargin,
    "q_curate_neg_sample" ->
      """WITH mx AS (SELECT max(p_partkey) AS maxpk FROM part),
        |custs AS (SELECT DISTINCT o_custkey AS cust FROM orders),
        |pos AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS part
        |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |props AS (
        |  SELECT cust, j,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef', substring(
        |             md5(CAST(cust AS VARCHAR) || ':'
        |               || CAST(j AS VARCHAR)), d, 1))
        |             - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) % maxpk + 1 AS part
        |  FROM custs CROSS JOIN mx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)),
        |neg AS (
        |  SELECT cust, part, min(j) AS j
        |  FROM props p WHERE NOT EXISTS (
        |    SELECT 1 FROM pos WHERE pos.cust = p.cust
        |      AND pos.part = p.part)
        |  GROUP BY cust, part)
        |SELECT cust, CAST(rank AS BIGINT) AS rank, part AS neg_part
        |FROM (
        |  SELECT cust, part, row_number() OVER (
        |    PARTITION BY cust ORDER BY j, part) AS rank
        |  FROM neg)
        |WHERE rank <= 5 ORDER BY cust, rank""".stripMargin,
    // boundaries = exact rank-selected decile values (the same
    // (i·n+9)//10 convention q_agg_quantile_sketch pins); assignment =
    // strict-less count against them
    "q_curate_curriculum_global" ->
      """WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
        |           WHERE n_chars IS NOT NULL),
        |cnt AS (SELECT count(*) AS n FROM v),
        |ps AS (SELECT unnest(generate_series(1, 9)) AS i),
        |rk AS (SELECT i, greatest(1, (i * n + 9) // 10) AS r
        |       FROM ps CROSS JOIN cnt),
        |s AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
        |b AS (SELECT s.x AS bv FROM rk JOIN s ON s.rn = rk.r),
        |a AS (SELECT doc_id, n_chars,
        |        (SELECT count(*) FROM b
        |         WHERE b.bv < CAST(d.n_chars AS DOUBLE)) AS decile
        |      FROM documents d WHERE n_chars IS NOT NULL)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM a GROUP BY decile ORDER BY decile""".stripMargin,
    "q_curate_dsir_bigram" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS t
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) >= 2),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |    generate_series(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1])) AS gram
        |  FROM t),
        |h AS (
        |  SELECT doc_id, lang,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef', substring(md5(gram), d, 1))
        |             - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) % 128 AS bkt
        |  FROM g),
        |db AS (
        |  SELECT doc_id, bkt, count(*) AS cnt,
        |    max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS is_en
        |  FROM h GROUP BY doc_id, bkt),
        |raw AS (SELECT bkt, sum(cnt) AS c_raw FROM db GROUP BY bkt),
        |tgt AS (SELECT bkt, sum(cnt) AS c_tgt FROM db
        |        WHERE is_en = 1 GROUP BY bkt),
        |tot AS (SELECT (SELECT sum(c_raw) FROM raw) AS t_raw,
        |               (SELECT sum(c_tgt) FROM tgt) AS t_tgt),
        |ratio AS (
        |  SELECT raw.bkt,
        |    ln((coalesce(tgt.c_tgt, 0) + 1) / (tot.t_tgt + 128.0)) -
        |    ln((raw.c_raw + 1) / (tot.t_raw + 128.0)) AS lr
        |  FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt CROSS JOIN tot)
        |SELECT db.doc_id, CAST(sum(db.cnt) AS BIGINT) AS n_bigrams,
        |  round(sum(db.cnt * ratio.lr), 6) AS dsir_w
        |FROM db JOIN ratio ON db.bkt = ratio.bkt
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,
    "q_curate_curriculum" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_src
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST((rn - 1) * 10 // n_src AS BIGINT) AS decile
        |  FROM r)
        |SELECT doc_id, source, n_chars, decile,
        |  row_number() OVER (PARTITION BY source, decile
        |    ORDER BY n_chars, doc_id) AS pos_in_decile
        |FROM d
        |ORDER BY decile, pos_in_decile, source, doc_id""".stripMargin,
    // full NB replay: same hashed buckets, Laplace likelihoods and
    // smoothed prior, argmax with the identical (score DESC, cls) tie
    "q_curate_nb_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(text, '\s+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef', substring(md5(tok), d, 1))
        |             - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) % 256 AS bkt
        |  FROM toks WHERE tok <> ''),
        |db AS (SELECT doc_id, lang, bkt, count(*) AS cnt
        |       FROM h GROUP BY doc_id, lang, bkt),
        |tr AS (SELECT * FROM db WHERE doc_id % 2 = 0),
        |ct AS (SELECT lang, bkt, sum(cnt) AS c FROM tr GROUP BY lang, bkt),
        |tt AS (SELECT lang, sum(c) AS t FROM ct GROUP BY lang),
        |pr AS (SELECT lang, count(DISTINCT doc_id) AS d FROM tr
        |       GROUP BY lang),
        |td AS (SELECT (SELECT sum(d) FROM pr) AS dd,
        |              (SELECT count(*) FROM pr) AS nl),
        |grid AS (
        |  SELECT pr.lang AS cls, g.bkt,
        |    ln((coalesce(ct.c, 0) + 1) / (tt.t + 256.0)) AS logp
        |  FROM pr
        |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS bkt) g
        |  JOIN tt ON tt.lang = pr.lang
        |  LEFT JOIN ct ON ct.lang = pr.lang AND ct.bkt = g.bkt),
        |lp AS (SELECT pr.lang AS cls,
        |         ln((pr.d + 1) / (td.dd + td.nl * 1.0)) AS logprior
        |       FROM pr CROSS JOIN td),
        |sc AS (
        |  SELECT ho.doc_id, ho.lang, grid.cls,
        |    sum(ho.cnt * grid.logp) AS ll
        |  FROM (SELECT * FROM db WHERE doc_id % 2 = 1) ho
        |  JOIN grid ON ho.bkt = grid.bkt
        |  GROUP BY ho.doc_id, ho.lang, grid.cls),
        |scored AS (SELECT sc.doc_id, sc.lang, sc.cls,
        |             sc.ll + lp.logprior AS score
        |           FROM sc JOIN lp ON sc.cls = lp.cls),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |         ORDER BY score DESC, cls) AS rn FROM scored)
        |SELECT doc_id, cls AS pred_lang, lang,
        |  CAST(CASE WHEN cls = lang THEN 1 ELSE 0 END AS BIGINT)
        |    AS correct
        |FROM rn WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_curate_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(text, '\s+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef', substring(md5(tok), d, 1))
        |             - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
        |      AS BIGINT) % 64 AS bkt
        |  FROM toks WHERE tok <> ''),
        |db AS (
        |  SELECT doc_id, bkt, count(*) AS cnt,
        |    max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS is_en
        |  FROM h GROUP BY doc_id, bkt),
        |raw AS (SELECT bkt, sum(cnt) AS c_raw FROM db GROUP BY bkt),
        |tgt AS (SELECT bkt, sum(cnt) AS c_tgt FROM db
        |        WHERE is_en = 1 GROUP BY bkt),
        |tot AS (SELECT (SELECT sum(c_raw) FROM raw) AS t_raw,
        |               (SELECT sum(c_tgt) FROM tgt) AS t_tgt),
        |ratio AS (
        |  SELECT raw.bkt,
        |    ln((coalesce(tgt.c_tgt, 0) + 1) / (tot.t_tgt + 64.0)) -
        |    ln((raw.c_raw + 1) / (tot.t_raw + 64.0)) AS lr
        |  FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt CROSS JOIN tot)
        |SELECT db.doc_id, CAST(sum(db.cnt) AS BIGINT) AS n_tokens,
        |  round(sum(db.cnt * ratio.lr), 6) AS dsir_w
        |FROM db JOIN ratio ON db.bkt = ratio.bkt
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,
    "q_curate_sample_weighted" -> {
      val h = Sampling.hashIntSql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
      s"""SELECT doc_id, w, priority FROM (
         |  SELECT doc_id, n_chars % 7 + 1 AS w,
         |    list_max(list_transform(generate_series(1,
         |      CAST(n_chars % 7 + 1 AS INTEGER)), i -> $h)) AS priority
         |  FROM documents)
         |ORDER BY priority DESC, doc_id LIMIT 200""".stripMargin
    },
    "q_curate_remix" ->
      s"""WITH w AS (
         |  SELECT source, COUNT(*) AS n,
         |    CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
         |      WHEN 'src2' THEN 0.2 END AS wt
         |  FROM documents WHERE source IN ('src0', 'src1', 'src2')
         |  GROUP BY source),
         |t AS (SELECT MIN(CAST(n AS DOUBLE) / wt) AS bigt FROM w)
         |SELECT d.source, COUNT(*) AS n_kept
         |FROM documents d JOIN w ON d.source = w.source, t
         |WHERE $u < w.wt * t.bigt / CAST(w.n AS DOUBLE)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_curate_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE $u < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
         |  ELSE 0.1 END
         |ORDER BY doc_id""".stripMargin,
    "q_curate_sample_quota" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,
    "q_curate_decontam_bloom" -> {
      // 60-bit md5-prefix pair: h1 = hex chars 1-15, h2 = chars 17-31
      // forced odd — the identical double-hash probe the Spark side runs
      def hexVal(off: Int) =
        s"""CAST(list_sum(list_transform(generate_series(1, 15),
           |      dd -> CAST(strpos('0123456789abcdef',
           |          substring(md5(g), $off + dd, 1)) - 1 AS BIGINT)
           |        * (CAST(1 AS BIGINT) << (4 * (15 - dd))))) AS BIGINT)"""
          .stripMargin
      s"""WITH bt AS (
         |  SELECT string_split_regex(text, '\\s+') AS t FROM documents
         |  WHERE doc_id % 53 = 0
         |    AND len(string_split_regex(text, '\\s+')) >= 8),
         |bg AS (
         |  SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS g
         |  FROM (SELECT t, unnest(generate_series(1, len(t) - 7)) AS i
         |        FROM bt)),
         |bh AS (SELECT g, ${hexVal(0)} AS h1,
         |         ${hexVal(16)} | 1 AS h2 FROM bg),
         |pos AS (
         |  SELECT DISTINCT (h1 + i * h2) % 32768 AS p
         |  FROM bh, (SELECT unnest(generate_series(0, 2)) AS i)),
         |dt AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS t
         |  FROM documents
         |  WHERE len(string_split_regex(text, '\\s+')) >= 8),
         |dg AS (
         |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
         |  FROM (SELECT doc_id, t,
         |          unnest(generate_series(1, len(t) - 7)) AS i FROM dt)),
         |dh AS (SELECT doc_id, g, ${hexVal(0)} AS h1,
         |         ${hexVal(16)} | 1 AS h2 FROM dg),
         |cand AS (
         |  SELECT doc_id, g FROM dh
         |  WHERE (h1 + 0 * h2) % 32768 IN (SELECT p FROM pos)
         |    AND (h1 + 1 * h2) % 32768 IN (SELECT p FROM pos)
         |    AND (h1 + 2 * h2) % 32768 IN (SELECT p FROM pos)),
         |contam AS (SELECT DISTINCT doc_id FROM cand
         |           WHERE g IN (SELECT g FROM bg))
         |SELECT
         |  (SELECT count(*) FROM bg) AS n_bench_grams,
         |  (SELECT count(*) FROM dg) AS n_corpus_grams,
         |  (SELECT count(*) FROM pos) AS n_set_bits,
         |  (SELECT count(*) FROM cand) AS n_candidate_grams,
         |  (SELECT count(DISTINCT doc_id) FROM cand) AS n_candidate_docs,
         |  (SELECT count(*) FROM contam) AS n_contaminated_docs,
         |  (SELECT count(*) FROM documents
         |   WHERE doc_id NOT IN (SELECT doc_id FROM contam))
         |    AS n_kept_docs""".stripMargin
    },
    "q_curate_decontaminate" ->
      """WITH bt AS (
        |  SELECT string_split_regex(text, '\s+') AS t FROM documents
        |  WHERE doc_id % 53 = 0
        |    AND len(string_split_regex(text, '\s+')) >= 8),
        |bg AS (
        |  SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS g
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 7)) AS i
        |        FROM bt)),
        |dt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) >= 8),
        |dg AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 7)) AS i FROM dt)),
        |bad AS (SELECT DISTINCT doc_id FROM dg
        |        WHERE g IN (SELECT g FROM bg))
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,
    "q_curate_pack" ->
      s"""WITH b AS (
         |  SELECT doc_id, n_chars,
         |    CAST(floor($u * 8) AS BIGINT) AS bucket
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_chars, bucket,
         |    SUM(n_chars) OVER (PARTITION BY bucket
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM b)
         |SELECT doc_id, bucket,
         |  CAST(CAST(cum - n_chars AS BIGINT) // 4096 AS BIGINT) AS bin,
         |  n_chars
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_curate_split" ->
      s"""WITH s AS (SELECT doc_id,
         |    CASE WHEN $u < 0.1 THEN 'test'
         |         WHEN $u < 0.2 THEN 'val'
         |         ELSE 'train' END AS split
         |  FROM documents),
         |g AS (SELECT split, count(*) AS n_docs,
         |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |  FROM s GROUP BY split)
         |SELECT split, n_docs, min_doc, max_doc,
         |  CAST(n_docs * 1000000 // (SELECT sum(n_docs) FROM g)
         |    AS BIGINT) AS share_ppm
         |FROM g ORDER BY split""".stripMargin,
    "q_curate_datasheet" ->
      s"""WITH d AS (SELECT *,
         |    CASE WHEN $u < 0.1 THEN 'test'
         |         WHEN $u < 0.2 THEN 'val'
         |         ELSE 'train' END AS split
         |  FROM documents),
         |rows0 AS (
         |  SELECT 'volume' AS section, 'n_docs' AS metric,
         |    count(*) AS value FROM d
         |  UNION ALL SELECT 'volume', 'total_chars',
         |    CAST(sum(n_chars) AS BIGINT) FROM d
         |  UNION ALL SELECT 'volume', 'max_chars', max(n_chars) FROM d
         |  UNION ALL SELECT 'lang_mix', 'n_docs:' || lang, count(*)
         |  FROM d GROUP BY lang
         |  UNION ALL SELECT 'duplication', 'exact_dup_docs',
         |    count(*) - count(DISTINCT text) FROM d
         |  UNION ALL SELECT 'length', 'docs_lt_100_chars',
         |    count(*) FILTER (n_chars < 100) FROM d
         |  UNION ALL SELECT 'length', 'docs_gt_1000_chars',
         |    count(*) FILTER (n_chars > 1000) FROM d
         |  UNION ALL SELECT 'splits', 'n_docs:' || split, count(*)
         |  FROM d GROUP BY split)
         |SELECT section, metric, value FROM rows0
         |ORDER BY section, metric""".stripMargin
  )
}
