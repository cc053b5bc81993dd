package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Dedup, TextAnalysis}

/** Deduplication battery over `documents` (north-star operators).
  * The fixture plants near-duplicate pairs at 5-gram Jaccard ≈ 0.99 and no
  * exact text duplicates — so exact dedup runs on a lower-cardinality key,
  * and the near-dup paths are expected to surface the planted pairs.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup, canonical-representative form: deterministic min-id per
    * key (dropDuplicates keeps an arbitrary row — never oracle-safe).
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("lang"), col("source"))

  /** Content-hash dedup over the normalized-text fingerprint: the 100 TB
    * pattern (hash once map-side, group on the 32-byte digest, never
    * shuffle full documents).
    */
  def qDedupFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(graft.ops.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Exact 5-gram Jaccard near-dup pairs (inverted-index join).
    *
    * The vocabulary-regime hint comes from a driver-side parquet-footer
    * probe (text column's uncompressed bytes — a strict upper bound on
    * the distinct-shingle count, since every distinct shingle occupies
    * ≥ 1 text byte), so plan CONSTRUCTION never runs a Spark job
    * (PlanSpec asserts this). An unprobeable footer falls back to the
    * operator's own eager count.
    */
  /** DEDUP IMPACT ACCOUNTING — the pipeline-economics table next to
    * the dedup operators themselves: per source, how many documents
    * and how many TOKENS does exact dedup remove (keep = smallest
    * doc_id per content digest — the q_dedup_exact keep rule)?
    * Token savings in exact PPM is the number a 100 TB curation run
    * budgets compute by — dedup decisions are priced in tokens, not
    * documents. Shape: one digest aggregate (map-side md5), one
    * keep-set broadcastable join back, one per-source rollup.
    */
  def qDedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
    val keep = docs.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    docs.join(keep, "h")
      .withColumn("removed", (col("doc_id") =!= col("keep_id"))
        .cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("removed")).as("docs_removed"),
        sum(col("toks")).as("tokens_total"),
        sum(col("toks") * col("removed")).as("tokens_removed"))
      .withColumn("saved_ppm",
        expr("tokens_removed * 1000000L div tokens_total"))
      .orderBy(col("source"))
  }

  /** MINHASH PRECISION/RECALL EVALUATION — the banded estimator
    * audited against exact PPJoin ground truth at the same threshold
    * (0.5), on the q_dedup_threshold_curve sample slice: TP/FP/FN as
    * exact set-intersection integers, precision/recall as PPM. This
    * is the table that justifies (or vetoes) replacing the exact pass
    * with the ~2× banded one at 100 TB — the estimator's misses and
    * false alarms priced on a representative sample before the corpus
    * commits to it.
    */
  def qDedupMinhashEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 250)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 5, minJaccard = 0.5).select(col("id_a"), col("id_b"))
    val approx = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 5, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val na = approx.agg(count(lit(1)).as("n_approx"))
    val ntp = approx.intersect(exact).agg(count(lit(1)).as("tp"))
    ne.crossJoin(broadcast(na)).crossJoin(broadcast(ntp))
      .select(col("n_exact"), col("n_approx"), col("tp"),
        (col("n_approx") - col("tp")).as("fp"),
        (col("n_exact") - col("tp")).as("fn"),
        expr("tp * 1000000L div nullif(n_approx, 0L)")
          .as("precision_ppm"),
        expr("tp * 1000000L div nullif(n_exact, 0L)").as("recall_ppm"))
  }

  /** THRESHOLD CALIBRATION CURVE — the tuning table every near-dedup
    * deployment builds before picking its cutoff: pair counts per
    * exact-Jaccard decile (bucket = ⌊10·inter/union⌋, an INTEGER so
    * no double ever decides a bucket) and the would-be-removed count
    * at each candidate threshold (descending cumulative). One PPJoin
    * pass at the curve's FLOOR (0.3) feeds every bucket above it.
    * Low thresholds inflate PPJoin prefixes (length n(1−t)+1), so the
    * calibration runs on a fixed doc slice (ids < 250 — the
    * q_dedup_jaccard_banded sampling precedent): calibration needs a
    * representative sample, not the corpus — that's what makes it
    * affordable at 100 TB, where the chosen threshold then drives the
    * full banded pass.
    */
  def qDedupThresholdCurve(spark: SparkSession, dir: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Dedup.ngramJaccardPairs(
      Tables.documents(spark, dir).filter(col("doc_id") < 250),
      "doc_id", "text", k = 5, minJaccard = 0.3)
    pairs
      .groupBy(expr("inter * 10 div union_n").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_at_or_above", sum(col("n_pairs")).over(
        Window.orderBy(desc("bucket")).rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("bucket"))
  }

  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documentsPar(spark, dir),
        "doc_id", "text", k = 5, minJaccard = 0.8,
        vocabHint = Tables.columnUncompressedBytes(
          spark, s"$dir/documents.parquet", "text"))
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash-LSH candidate pairs (32 hashes, 8 bands × 4). The PORTABLE
    * md5-derived universal family (Dedup.MinhashP) makes this
    * oracle-checkable: the DuckDB twin re-derives the identical
    * signatures and bands (band membership = slice equality — Spark's
    * xxhash64 band key only compresses the slice; equal slices always
    * share a key, and a colliding unequal slice has odds ~2⁻⁶⁴).
    * Recall vs exact Jaccard additionally pinned in DedupSpec.
    */
  /** Run-wide memo of the k=5 / 32-hash signature table over the full
    * documents fixture — per-doc signatures are independent of the
    * rest of the corpus, so q_dedup_minhash AND q_dedup_incremental
    * (whose corpus/batch are id-ranges of the same table) read the
    * SAME build. Within one harness run the shingle+md5 pass happens
    * once for the family — the same accounting as the winnow memo
    * (the first member's timing pays the build).
    */
  private def memoSigs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.CacheScope.memoizedDisk(s"dedup:sigs32:$dir") {
      // documentsPar: the shingle+md5 signature build is the family's
      // dominant map cost and lands on whichever member runs first
      Dedup.minhashSignatures(Tables.documentsPar(spark, dir),
        "doc_id", "text", k = 5, numHashes = 32)
    }

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 5, bands = 8, rowsPerBand = 4, threshold = 0.5,
        sigsHint = Some(memoSigs(spark, dir)))
      .orderBy(col("id_a"), col("id_b"))

  /** Incremental minhash dedup: docs with id ≥ 400 arrive as a "batch"
    * against the id < 400 corpus — candidates only touch the batch
    * (the corpus is never re-self-joined). Oracle-checked via the same
    * portable family as q_dedup_minhash; the candidate restriction is
    * equivalent to `id_b ≥ 400` (corpus ids < 400 ≤ batch ids, so
    * corpus-batch pairs always orient id_a < id_b); cross-batch recall
    * is additionally pinned in DedupSpec.
    */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    // corpus/batch signature tables are id-range slices of the shared
    // memo — per-doc signatures don't depend on the split, so this is
    // exactly minhashPairsIncremental's own build, computed once per run
    val sigs = memoSigs(spark, dir)
    Dedup.minhashPairsFromSigs(
        sigs.filter(col("id") < 400), sigs.filter(col("id") >= 400),
        bands = 8, rowsPerBand = 4, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Banded n-gram Jaccard near-dup pairs: LSH-banded candidates +
    * exact verification — the ~2× opt-in over the exact PPJoin
    * (`q_dedup_ngram_jaccard` stays the zero-false-negative default).
    * Deterministic (fixed portable hash family) and therefore
    * oracle-checked even though recall < 1: the DuckDB twin replays
    * the 8×4 banding and the exact intersection.
    */
  def qDedupJaccardBanded(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsBanded(Tables.documentsPar(spark, dir),
        "doc_id", "text", k = 5, minJaccard = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** Near-dup clusters: exact-jaccard pairs (≥0.8, docs with id < 250
    * to bound the pair join's bench cost) fed through min-label
    * connected components. Oracle = the same pairs in SQL + a recursive
    * CTE computing the transitive-closure min label.
    */
  /** Run-wide memo of the <250-doc near-dup component table —
    * q_dedup_components publishes it and q_dedup_keep_best consumes
    * the identical build; one pair-join + pointer-doubling pass per
    * harness run instead of two.
    */
  private[queries] def memoComponents250(spark: SparkSession, dir: String)
      : DataFrame =
    graft.ops.CacheScope.memoizedDisk(s"dedup:components250:$dir") {
      val docs = Tables.documents(spark, dir)
        .filter(col("doc_id") < 250)
      // 2 pointer-doubling rounds reach ≥6 hops — comfortably past the
      // pair graph's diameter (planted near-dup clusters are pairs/
      // triples, diameter ≤ 2; the oracle's recursive CTE computes the
      // full transitive closure, so an undershoot would fail the
      // hash-compare)
      Dedup.dedupComponents(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          k = 5, minJaccard = 0.8).select(col("id_a"), col("id_b")),
        iters = 2)
    }

  def qDedupComponents(spark: SparkSession, dir: String): DataFrame =
    memoComponents250(spark, dir).orderBy(col("doc_id"))

  /** Keep-best dedup policy: duplicate CLUSTERS (transitive closure of
    * the near-dup pairs) each keep their highest-quality member — here
    * the longest document (n_chars), ties to the smallest id — instead
    * of the naive min-id survivor. The argmax is made deterministic
    * with a unique ordering key (n_chars·1000 + (250−id); ids < 250).
    * Singleton docs are their own component. This is the production
    * curation policy: quality decides who survives, not arrival order.
    */
  def qDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 250)
    val comps = memoComponents250(spark, dir)
    docs.join(comps, Seq("doc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), col("doc_id")))
      .groupBy(col("component"))
      .agg(
        max_by(col("doc_id"),
          col("n_chars") * lit(1000L) + (lit(250L) - col("doc_id")))
          .as("keep_id"),
        count(lit(1)).as("n_docs"),
        max(col("n_chars")).as("best_len"))
      .orderBy(col("component"))
  }

  /** Takedown propagation through near-dup clusters — the governance
    * pass a training corpus runs on a removal request (DMCA / RTBF /
    * opt-out): removing a document must also reconsider the duplicates
    * that were DROPPED in its favor, or their content silently stays in
    * the corpus attributed to nothing. Each cluster (same transitive
    * closure as q_dedup_components, shared via the run-wide memo)
    * re-elects its keep-best survivor among NON-removed members;
    * a member that only now becomes the survivor is flagged `promoted`
    * (the re-admission audit row), and a cluster whose members are all
    * removed retires with no survivor. Removal list here: the
    * deterministic fixture predicate doc_id % 9 = 8 (chosen to hit
    * cluster survivors at sf0.01, exercising promotion).
    *
    * Scale shape: one extra aggregate + equi-join over the components
    * table beyond keep-best — the removal list joins by id (broadcast
    * at real scale), never touching document text.
    */
  def qCurateTakedown(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 250)
    val comps = memoComponents250(spark, dir)
    val d = docs.join(comps, Seq("doc_id"), "left")
      .withColumn("component",
        coalesce(col("component"), col("doc_id")))
      .withColumn("removed", col("doc_id") % 9 === 8)
      .withColumn("qkey",
        col("n_chars") * lit(1000L) + (lit(250L) - col("doc_id")))
    val reps = d.groupBy(col("component"))
      .agg(
        max_by(col("doc_id"), col("qkey")).as("orig_rep"),
        max_by(
          when(col("removed"), lit(null).cast("long"))
            .otherwise(col("doc_id")),
          when(col("removed"), lit(null).cast("long"))
            .otherwise(col("qkey"))).as("new_rep"))
    d.join(reps, "component")
      .select(col("doc_id"), col("component"),
        when(col("removed"), lit("removed"))
          .when(col("doc_id") === col("new_rep"), lit("kept"))
          .otherwise(lit("dup")).as("status"),
        (!col("removed") && col("doc_id") === col("new_rep") &&
          col("orig_rep") =!= col("doc_id")).as("promoted"))
      .orderBy(col("doc_id"))
  }

  /** Shingle CONTAINMENT pairs — the asymmetric companion to Jaccard:
    * C = |A∩B| / min(|A|,|B|) flags a document EMBEDDED in a larger
    * one (quote-plus-commentary, concatenated dumps), which symmetric
    * Jaccard dilutes below any usable threshold as the size ratio
    * grows (Broder 1997 distinguishes resemblance vs containment; the
    * ExactSubstr literature hits the same failure mode). Same 5-gram
    * universe as q_dedup_ngram_jaccard, bounded to ids < 250 like the
    * components family; at 100 TB the candidate stage is the same
    * prefix-filtered inverted index (containment admits the analogous
    * |A|-side prefix bound), never the raw shingle self-join.
    */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 250)
    val sh = docs.select(col("doc_id"), col("text"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(
          |  sequence(1, greatest(length(text) - 4, 1)),
          |  i -> substring(text, i, 5)))""".stripMargin)).as("s"))
    val lens = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(lens.select(col("doc_id").as("id_a"), col("len").as("len_a")),
        "id_a")
      .join(lens.select(col("doc_id").as("id_b"), col("len").as("len_b")),
        "id_b")
      .withColumn("containment",
        col("inter").cast("double") / least(col("len_a"), col("len_b")))
      .filter(col("containment") >= 0.8)
      .select(col("id_a"), col("id_b"), col("inter"), col("len_a"),
        col("len_b"), col("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** TRAIN/VAL/TEST LEAKAGE AUDIT: near-duplicate pairs that STRADDLE
    * the split boundary — the eval-hygiene check a benchmark split
    * must pass, because a test document whose near-copy sits in train
    * inflates every metric (the reason Lee et al. 2022 dedup before
    * splitting). Reuses the run-wide minhash signature memo and the
    * SAME hash-deterministic split rule as q_curate_split, so the
    * audit sees exactly the split the pipeline would ship. Same-split
    * pairs ride along as the base rates.
    */
  def qCurateSplitLeakage(spark: SparkSession, dir: String)
      : DataFrame = {
    val docs = Tables.documentsPar(spark, dir)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 5, bands = 8, rowsPerBand = 4, threshold = 0.5,
      sigsHint = Some(memoSigs(spark, dir)))
    val split = graft.ops.Sampling.assignSplit(docs, "doc_id",
        valFrac = 0.1, testFrac = 0.1)
      .select(col("doc_id"), col("split"))
    pairs
      .join(split.select(col("doc_id").as("id_a"),
        col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"),
        col("split").as("sb")), "id_b")
      .groupBy(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"),
        (col("sa") =!= col("sb")).as("cross_split"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("id_a") * lit(1000000L) + col("id_b"))
          .as("example_pair"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** SimHash per document. The md5-derived portable hash family makes
    * this oracle-checkable: the DuckDB twin reproduces the exact same
    * 63-bit hash from md5 hex digits (Hamming-pair behavior additionally
    * pinned in DedupSpec).
    */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documentsPar(spark, dir), "doc_id", "text")
      .orderBy(col("id"))

  /** Embedding cosine near-dup pairs, EXACT, via the blocked all-pairs
    * equi-join (Dedup.embeddingExactPairs): no BroadcastNestedLoopJoin —
    * the quadratic work is spread over a block grid by shuffle, per-pair
    * scoring uses the native codegen'd cosine expression (measured 147 s
    * HOF vs 2.4 s native for this plan at sf0.1). The fixture's max
    * pair-cosine ≈ 0.51, so the 0.45 threshold sits below that; its
    * cosine distribution is continuous through 0.45, which is exactly why
    * the exact form (not LSH) is the registered operator — the LSH
    * variant (Dedup.embeddingNearDups) is the high-threshold scale path,
    * spec-checked in DedupSpec.
    */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingExactPairs(Tables.embeddings(spark, dir),
        "vec_id", "embedding", minCosine = 0.45)
      .orderBy(col("id_a"), col("id_b"))

  /** End-to-end curation pipeline — the composition story: exact
    * fingerprint dedup (keep the min doc_id per normalized content) →
    * quality gates (stopword ratio and BPE-ish token budget) → per-lang
    * accounting. Every stage is one of the registry's own operators;
    * the whole pipeline stays a single Catalyst plan (dedup is one
    * shuffle; the gates are map-side expressions on the survivors).
    */
  def qPipelineCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keep = docs
      .groupBy(graft.ops.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keep, "doc_id")
      .withColumn("n_tokens",
        graft.ops.TextAnalysis.bpeishTokenCount(col("text")).cast("long"))
      .withColumn("n_stop",
        graft.ops.TextAnalysis.stopwordCount(col("text")).cast("long"))
      .filter(col("n_tokens") >= 20 && col("n_tokens") <= 5000 &&
        col("n_stop") * 10 >= col("n_tokens")) // ≥10% stopwords ⇒ prose
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** Record-linkage fuzzy join: part-name pairs within one edit of each
    * other, BLOCKED on brand — the classic blocking-key pattern (Fellegi
    * & Sunter linkage; blocking surveyed in Christen 2012). The
    * quadratic candidate space is bounded to within-block pairs, a
    * provably-safe |len(a) − len(b)| ≤ d length filter prunes before
    * the O(len²) distance runs, and `levenshtein` is a codegen'd
    * builtin on both engines — the oracle is the same join verbatim.
    */
  /** Distinct-name fuzzy edges for the linkage: EXACT-COLLAPSE first
    * (Christen 2012's standard pre-step) — identical (brand, name)
    * rows form one group keyed by its min partkey — then compare only
    * DISTINCT names, blocked by (brand, length-bucket): the probe side
    * emits one row per length in {len−1, len, len+1} so each
    * admissible group pair matches exactly once, at the build side's
    * true length. The distance predicate is Spark's 3-arg banded
    * levenshtein (O(len·k), early exit). Distance work drops from
    * O(parts²/blocks) to O(distinct-names²/blocks) — the fixture
    * reuses names heavily, as real catalogs do.
    *
    * @return (b, na, nb, ga, gb): brand, the two names, their group
    *         rep ids (ga < gb).
    */
  private def fuzzyGroupEdges(spark: SparkSession, dir: String)
      : DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val grp = p.groupBy(col("p_brand"), col("p_name"))
      .agg(min(col("p_partkey")).as("gid"))
      .withColumn("__len", length(col("p_name")))
    val probe = grp.select(col("p_brand"), col("p_name"), col("gid"),
      explode(array(col("__len") - 1, col("__len"),
        col("__len") + 1)).as("__lb"))
    probe.as("x").join(grp.as("y"),
        col("x.p_brand") === col("y.p_brand")
          && col("x.__lb") === col("y.__len")
          && col("x.gid") < col("y.gid")
          && expr("levenshtein(x.p_name, y.p_name, 1) >= 0"))
      .select(col("x.p_brand").as("b"), col("x.p_name").as("na"),
        col("y.p_name").as("nb"), col("x.gid").as("ga"),
        col("y.gid").as("gb"))
  }

  /** Pair expansion of [[fuzzyGroupEdges]] back to part keys: the
    * same-name pairs (edit distance 0) are each group's internal
    * C(cnt, 2) self-join; cross-name pairs are member × member over
    * the group edge. Output is identical to the naive blocked join —
    * the oracle certifies exactly that.
    */
  private def fuzzyNamePairs(spark: SparkSession, dir: String)
      : DataFrame = {
    val mem = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val cross = fuzzyGroupEdges(spark, dir)
      .join(mem.as("ma"), col("b") === col("ma.p_brand")
        && col("na") === col("ma.p_name"))
      .join(mem.as("mb"), col("b") === col("mb.p_brand")
        && col("nb") === col("mb.p_name"))
      .select(
        least(col("ma.p_partkey"), col("mb.p_partkey")).as("key_a"),
        greatest(col("ma.p_partkey"), col("mb.p_partkey")).as("key_b"),
        when(col("ma.p_partkey") < col("mb.p_partkey"), col("na"))
          .otherwise(col("nb")).as("name_a"),
        when(col("ma.p_partkey") < col("mb.p_partkey"), col("nb"))
          .otherwise(col("na")).as("name_b"))
    val same = mem.as("x").join(mem.as("y"),
        col("x.p_brand") === col("y.p_brand")
          && col("x.p_name") === col("y.p_name")
          && col("x.p_partkey") < col("y.p_partkey"))
      .select(col("x.p_partkey").as("key_a"),
        col("y.p_partkey").as("key_b"),
        col("x.p_name").as("name_a"), col("y.p_name").as("name_b"))
    cross.unionByName(same)
  }

  def qDedupFuzzyName(spark: SparkSession, dir: String): DataFrame =
    fuzzyNamePairs(spark, dir).orderBy(col("key_a"), col("key_b"))

  /** End-to-end entity resolution (Fellegi–Sunter pipeline shape):
    * blocking-key fuzzy match ([[qDedupFuzzyName]]'s join) → transitive
    * closure into entity clusters (pointer-doubling connected
    * components) → one canonical record per cluster (min-key
    * representative + cluster size). The composition every MDM /
    * customer-360 load runs; each stage is the already-plan-audited
    * operator, so the pipeline inherits their scale shapes.
    */
  def qErPipeline(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    // closure runs on the COMPACT graph: membership edges (member →
    // its group rep, the edit-distance-0 links) + one edge per fuzzy
    // GROUP pair — connectivity (and min-id labels) are identical to
    // the fully-expanded member-pair graph at a fraction of the edges
    val grp = p.groupBy(col("p_brand"), col("p_name"))
      .agg(min(col("p_partkey")).as("gid"))
    val membership = p.join(grp, Seq("p_brand", "p_name"))
      .filter(col("p_partkey") =!= col("gid"))
      .select(col("p_partkey").as("id_a"), col("gid").as("id_b"))
    val groupEdges = fuzzyGroupEdges(spark, dir)
      .select(col("ga").as("id_a"), col("gb").as("id_b"))
    val pairs = membership.unionByName(groupEdges)
    // fixed-iters pointer doubling (measured faster here than the
    // convergence-detected variant: the per-round checksum actions cost
    // more than the rounds they save). 4 rounds reach 2⁴ = 16 hops —
    // the compact graph's diameter is 2 (membership) + the name-graph
    // diameter, which is bounded by the FIXED 64-name vocabulary (the
    // same at every scale factor), so the sf0.01 oracle's certification
    // of the round count carries to any SF of this catalog.
    val comps = Dedup.dedupComponents(pairs, iters = 4)
    comps.groupBy(col("component").as("canonical_key"))
      .agg(count(lit(1)).as("cluster_size"))
      .join(p.select(col("p_partkey"),
          col("p_name").as("canonical_name")),
        col("canonical_key") === col("p_partkey"))
      .select(col("canonical_key"), col("cluster_size"),
        col("canonical_name"))
      .orderBy(col("canonical_key"))
  }

  /** ExactSubstr duplicated spans by distributed SUFFIX RANK
    * ([[graft.ops.SuffixRank]] — Manber-Myers prefix doubling; the
    * suffix-array path of Lee et al. 2022 §4.2): every maximal ≥
    * 20-char region whose content occurs anywhere else in the corpus,
    * with EXACT boundaries and the keep-first rule (the globally
    * first occurrence of each window survives), reported as one
    * (doc_id, start, span_len) row per span. Semantically identical
    * to q_text_scrub_global's hashed-gram islands, but collision-FREE:
    * rank ties are exact string equality, so there is no 60-bit hash
    * width to widen at 100 TB (SuffixRankSpec pins the two paths
    * equal on the fixture and on planted overlaps vs brute force).
    *
    * Scale: O(n log L) — two doubling rounds over corpus positions,
    * each one equi-join + one range-partitioned two-pass dense rank
    * ([[graft.ops.Prefix.denseRank]]; no single-partition window).
    * The twin replays the same doubling with dense_rank() windows.
    */
  def qDedupExactSubstr(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SuffixRank.duplicatedSpans(
      Tables.documentsPar(spark, dir).select(col("doc_id"), col("text")),
      l0 = 5, doublings = 2)
      .orderBy(col("doc_id"), col("start"))

  val defs: Map[String, Q] = Map(
    "q_dedup_exact_substr" -> (qDedupExactSubstr(_, _)),
    "q_er_pipeline" -> (qErPipeline(_, _)),
    "q_dedup_fuzzy_name" -> (qDedupFuzzyName(_, _)),
    "q_pipeline_curation" -> (qPipelineCuration(_, _)),
    "q_dedup_exact" -> (qDedupExact(_, _)),
    "q_dedup_fingerprint" -> (qDedupFingerprint(_, _)),
    "q_dedup_ngram_jaccard" -> (qDedupNgramJaccard(_, _)),
    "q_dedup_threshold_curve" -> (qDedupThresholdCurve(_, _)),
    "q_dedup_impact" -> (qDedupImpact(_, _)),
    "q_dedup_minhash_eval" -> (qDedupMinhashEval(_, _)),
    "q_dedup_jaccard_banded" -> (qDedupJaccardBanded(_, _)),
    "q_dedup_minhash" -> (qDedupMinhash(_, _)),
    "q_dedup_incremental" -> (qDedupIncremental(_, _)),
    "q_dedup_components" -> (qDedupComponents(_, _)),
    "q_dedup_keep_best" -> (qDedupKeepBest(_, _)),
    "q_curate_takedown" -> (qCurateTakedown(_, _)),
    "q_dedup_containment" -> (qDedupContainment(_, _)),
    "q_curate_split_leakage" -> (qCurateSplitLeakage(_, _)),
    "q_dedup_simhash" -> (qDedupSimhash(_, _)),
    "q_dedup_embedding" -> (qDedupEmbedding(_, _))
  )

  /** DuckDB CTE chain reproducing Dedup.minhashSignatures' portable
    * family exactly: 5-shingles → h = first-8-md5-hex-digits as BIGINT
    * (digit-sum — DuckDB has no conv()) → per-doc columns s0..s{H−1},
    * each MIN((a_j·h + b_j) mod P) with the coefficients interpolated
    * from Dedup.minhashCoeffs (same driver-side derivation both sides).
    */
  private def minhashSigCtes(numHashes: Int,
                             docsWhere: String = ""): String = {
    val sigCols = Dedup.minhashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), j) =>
        s"MIN(($a * h + $b) % ${Dedup.MinhashP}) AS s$j"
      }.mkString(",\n    ")
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(length(text) - 4, 1)),
       |    i -> substring(text, i, 5)))) AS s
       |  FROM documents$docsWhere),
       |hs AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(generate_series(1, 8),
       |    d -> CAST(strpos('0123456789abcdef', substring(md5(s), d, 1)) - 1
       |           AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (8 - d)))))
       |    AS BIGINT) AS h
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hs GROUP BY doc_id)""".stripMargin
  }

  /** Band-match predicate (any of `bands` slices entirely equal) and the
    * equal-component-fraction est_jaccard, over the a/b sig columns. */
  private def bandCondSql(bands: Int, rowsPerBand: Int): String =
    (0 until bands).map { b =>
      (0 until rowsPerBand).map { r =>
        val j = b * rowsPerBand + r
        s"a.s$j = b.s$j"
      }.mkString("(", " AND ", ")")
    }.mkString("\n    OR ")

  private def estJaccardSql(numHashes: Int): String =
    "CAST(" + (0 until numHashes)
      .map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END")
      .mkString(" + ") + s" AS DOUBLE) / $numHashes"

  /** Oracle twin of minhashPairs / minhashPairsIncremental: all-pairs
    * with band-slice-equality candidates (fine at oracle scale; the
    * engine's banded equi-join is the scale path). `extraPred`
    * restricts the pair set (incremental: id_b ≥ 400). */
  /** Twin of q_dedup_minhash_eval: the banded-estimate pair rule and
    * the exact brute-force rule on the same ids<250 slice, joined as
    * sets for TP/FP/FN. */
  private def minhashEvalOracle: String = {
    val h = 32
    s"""WITH ${minhashSigCtes(h, " WHERE doc_id < 250")},
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${estJaccardSql(h)} AS ej
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE ${bandCondSql(8, 4)}),
       |ap AS (SELECT id_a, id_b FROM cand WHERE ej >= 0.5),
       |shl AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(length(text) - 4, 1)),
       |    i -> substring(text, i, 5))) AS s
       |  FROM documents WHERE doc_id < 250),
       |ex AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM shl a JOIN shl b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s)) * 1.0
       |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
       |    >= 0.5),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
       |na AS (SELECT CAST(count(*) AS BIGINT) AS n_approx FROM ap),
       |tp AS (SELECT CAST(count(*) AS BIGINT) AS tp
       |  FROM ap JOIN ex ON ap.id_a = ex.id_a AND ap.id_b = ex.id_b)
       |SELECT n_exact, n_approx, tp.tp,
       |  n_approx - tp.tp AS fp, n_exact - tp.tp AS fn,
       |  tp.tp * 1000000 // nullif(n_approx, 0) AS precision_ppm,
       |  tp.tp * 1000000 // nullif(n_exact, 0) AS recall_ppm
       |FROM ne, na, tp""".stripMargin
  }

  private def minhashOracle(bands: Int, rowsPerBand: Int,
                            threshold: Double, extraPred: String): String = {
    val h = bands * rowsPerBand
    s"""WITH ${minhashSigCtes(h)},
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${estJaccardSql(h)} AS est_jaccard
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id$extraPred
       |  WHERE ${bandCondSql(bands, rowsPerBand)})
       |SELECT id_a, id_b, est_jaccard FROM cand
       |WHERE est_jaccard >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Twin of q_curate_split_leakage: the q_dedup_minhash pair rule +
    * the q_curate_split assignment rule, grouped by boundary side. */
  private[queries] def splitLeakageOracleSql: String = {
    val h = 32
    val u = graft.ops.Sampling.hashUniformSql("doc_id")
    s"""WITH ${minhashSigCtes(h)},
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${estJaccardSql(h)} AS ej
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE ${bandCondSql(8, 4)}),
       |p AS (SELECT id_a, id_b FROM cand WHERE ej >= 0.5),
       |sp AS (SELECT doc_id,
       |    CASE WHEN $u < 0.1 THEN 'test'
       |         WHEN $u < 0.2 THEN 'val'
       |         ELSE 'train' END AS split
       |  FROM documents),
       |j AS (SELECT p.id_a, p.id_b, sa.split AS sa, sb.split AS sb
       |  FROM p JOIN sp sa ON sa.doc_id = p.id_a
       |  JOIN sp sb ON sb.doc_id = p.id_b)
       |SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
       |  sa <> sb AS cross_split, COUNT(*) AS n_pairs,
       |  MIN(id_a * 1000000 + id_b) AS example_pair
       |FROM j GROUP BY 1, 2, 3
       |ORDER BY split_a, split_b""".stripMargin
  }

  /** Twin of q_stream_dedup_ingest: replay the two-micro-batch ingest
    * exactly — batch A (doc_id < 250) near-dedups internally, its
    * survivors become the corpus; batch B near-dedups against that
    * corpus AND internally; a pair always drops its batch side (the
    * larger id within a batch). Same portable signature family,
    * band-slice-equality candidates, 0.9 threshold, NO transitive
    * reasoning (every qualifying pair's id_b drops, matching the
    * engine's greedy anti-join).
    */
  private[queries] def streamIngestOracleSql: String = {
    val h = 32
    val bands = 8
    val rpb = 4
    val cond = s"(${bandCondSql(bands, rpb)})\n    AND ${estJaccardSql(h)} >= 0.9"
    s"""WITH ${minhashSigCtes(h, " WHERE doc_id < 1000")},
       |p1 AS (
       |  SELECT b.doc_id AS id_b FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND a.doc_id < 250 AND b.doc_id < 250
       |  WHERE $cond),
       |acc1 AS (SELECT doc_id FROM sig WHERE doc_id < 250
       |         AND doc_id NOT IN (SELECT id_b FROM p1)),
       |p2 AS (
       |  SELECT b.doc_id AS id_b FROM sig a JOIN sig b
       |    ON b.doc_id >= 250
       |      AND a.doc_id IN (SELECT doc_id FROM acc1)
       |  WHERE $cond
       |  UNION
       |  SELECT b.doc_id FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND a.doc_id >= 250
       |  WHERE $cond),
       |acc AS (SELECT doc_id FROM acc1
       |        UNION ALL
       |        SELECT doc_id FROM sig WHERE doc_id >= 250
       |          AND doc_id NOT IN (SELECT id_b FROM p2))
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN acc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_er_pipeline" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT x.p_partkey AS id_a, y.p_partkey AS id_b
        |  FROM part x JOIN part y
        |    ON x.p_brand = y.p_brand AND x.p_partkey < y.p_partkey
        |  WHERE abs(len(x.p_name) - len(y.p_name)) <= 1
        |    AND levenshtein(x.p_name, y.p_name) <= 1),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
        |comp AS (SELECT node, MIN(lab) AS component
        |         FROM reach GROUP BY node),
        |agg AS (SELECT component AS canonical_key, count(*)
        |          AS cluster_size
        |        FROM comp GROUP BY component)
        |SELECT canonical_key, cluster_size, p.p_name AS canonical_name
        |FROM agg JOIN part p ON p.p_partkey = canonical_key
        |ORDER BY canonical_key""".stripMargin,
    "q_dedup_fuzzy_name" ->
      """SELECT x.p_partkey AS key_a, y.p_partkey AS key_b,
        |  x.p_name AS name_a, y.p_name AS name_b
        |FROM part x JOIN part y
        |  ON x.p_brand = y.p_brand AND x.p_partkey < y.p_partkey
        |WHERE abs(len(x.p_name) - len(y.p_name)) <= 1
        |  AND levenshtein(x.p_name, y.p_name) <= 1
        |ORDER BY key_a, key_b""".stripMargin,
    "q_dedup_minhash" -> minhashOracle(8, 4, 0.5, ""),
    "q_dedup_minhash_eval" -> minhashEvalOracle,
    "q_dedup_incremental" ->
      minhashOracle(8, 4, 0.5, " AND b.doc_id >= 400"),
    // Banded candidates (8×4 over the same portable family) + EXACT
    // list_intersect verification — deterministic subset of the exact
    // jaccard join, replayed fully.
    "q_dedup_jaccard_banded" ->
      s"""WITH ${minhashSigCtes(32)},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, greatest(length(text) - 4, 1)),
         |    i -> substring(text, i, 5))) AS s
         |  FROM documents),
         |cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  WHERE ${bandCondSql(8, 4)}),
         |verified AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS inter,
         |    CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))
         |      AS BIGINT) AS union_n
         |  FROM cand c
         |  JOIN sets x ON x.doc_id = c.id_a
         |  JOIN sets y ON y.doc_id = c.id_b)
         |SELECT id_a, id_b, inter, union_n,
         |  CAST(inter AS DOUBLE) / union_n AS jaccard
         |FROM verified
         |WHERE CAST(inter AS DOUBLE) / union_n >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "q_pipeline_curation" ->
      """WITH keep AS (
        |  SELECT MIN(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |gated AS (
        |  SELECT d.lang,
        |    CAST(len(regexp_extract_all(d.text,
        |      '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
        |      AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split_regex(lower(d.text), '\s+'),
        |      t -> list_contains(['the','a','an','of','to','in','and','is',
        |                          'on','for','with'], t))) AS BIGINT) AS n_stop
        |  FROM documents d JOIN keep USING (doc_id))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM gated
        |WHERE n_tokens >= 20 AND n_tokens <= 5000
        |  AND n_stop * 10 >= n_tokens
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_exact" ->
      """SELECT lang, source, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // prefix doubling replayed with dense_rank() windows: rank5 over
    // exact 5-char substrings, rank10 = (rank5, rank5@+5), rank20 =
    // (rank10, rank10@+10); final rank groups = exact 20-char-window
    // equality, first (doc_id, pos) of each group survives, the rest
    // merge into islands of c positions = c+19-char spans
    "q_dedup_exact_substr" ->
      """WITH p AS (
        |  SELECT doc_id, pos, length(text) - pos + 1 AS rem,
        |    substr(text, CAST(pos AS INT), 5) AS g0
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text))) AS pos
        |        FROM documents)),
        |r0 AS (
        |  SELECT doc_id, pos, rem,
        |    CAST(dense_rank() OVER (ORDER BY g0) AS BIGINT) AS rank
        |  FROM p),
        |r1 AS (
        |  SELECT a.doc_id, a.pos, a.rem,
        |    CAST(dense_rank() OVER (
        |      ORDER BY a.rank, COALESCE(b.rank, 0)) AS BIGINT) AS rank
        |  FROM r0 a LEFT JOIN r0 b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 5),
        |r2 AS (
        |  SELECT a.doc_id, a.pos, a.rem,
        |    CAST(dense_rank() OVER (
        |      ORDER BY a.rank, COALESCE(b.rank, 0)) AS BIGINT) AS rank
        |  FROM r1 a LEFT JOIN r1 b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 10),
        |dup AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, row_number() OVER (
        |      PARTITION BY rank ORDER BY doc_id, pos) AS rn
        |    FROM r2 WHERE rem >= 20)
        |  WHERE rn > 1),
        |isl AS (
        |  SELECT doc_id, pos, pos - row_number() OVER (
        |    PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM dup)
        |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start,
        |  CAST(COUNT(*) + 19 AS BIGINT) AS span_len
        |FROM isl GROUP BY doc_id, isl
        |ORDER BY doc_id, start""".stripMargin,
    "q_dedup_fingerprint" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY fp ORDER BY keep_id""".stripMargin,
    "q_dedup_components" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents WHERE doc_id < 250),
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
    "q_dedup_keep_best" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents WHERE doc_id < 250),
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
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
        |comp AS (SELECT node AS doc_id, MIN(lab) AS component
        |         FROM reach GROUP BY node)
        |SELECT coalesce(c.component, d.doc_id) AS component,
        |  arg_max(d.doc_id,
        |    d.n_chars * 1000 + (250 - d.doc_id)) AS keep_id,
        |  COUNT(*) AS n_docs, MAX(d.n_chars) AS best_len
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |WHERE d.doc_id < 250
        |GROUP BY coalesce(c.component, d.doc_id)
        |ORDER BY component""".stripMargin,
    "q_curate_takedown" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents WHERE doc_id < 250),
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
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
        |comp AS (SELECT node AS doc_id, MIN(lab) AS component
        |         FROM reach GROUP BY node),
        |d AS (SELECT dd.doc_id,
        |    coalesce(c.component, dd.doc_id) AS component,
        |    (dd.doc_id % 9 = 8) AS removed,
        |    dd.n_chars * 1000 + (250 - dd.doc_id) AS qkey
        |  FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.doc_id
        |  WHERE dd.doc_id < 250),
        |reps AS (SELECT component,
        |    arg_max(doc_id, qkey) AS orig_rep,
        |    arg_max(CASE WHEN removed THEN NULL ELSE doc_id END,
        |      CASE WHEN removed THEN NULL ELSE qkey END) AS new_rep
        |  FROM d GROUP BY component)
        |SELECT d.doc_id, d.component,
        |  CASE WHEN d.removed THEN 'removed'
        |    WHEN d.doc_id = r.new_rep THEN 'kept'
        |    ELSE 'dup' END AS status,
        |  (NOT d.removed AND d.doc_id = r.new_rep
        |    AND r.orig_rep <> d.doc_id) AS promoted
        |FROM d JOIN reps r USING (component)
        |ORDER BY d.doc_id""".stripMargin,
    "q_curate_split_leakage" -> splitLeakageOracleSql,
    "q_dedup_containment" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents WHERE doc_id < 250),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.s, b.s)) AS inter,
        |    len(a.s) AS len_a, len(b.s) AS len_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(len_a AS BIGINT) AS len_a, CAST(len_b AS BIGINT) AS len_b,
        |  inter * 1.0 / least(len_a, len_b) AS containment
        |FROM pairs
        |WHERE inter * 1.0 / least(len_a, len_b) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // identical keep-min rule, whitespace token counts, PPM savings
    "q_dedup_impact" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
        |      AS toks
        |  FROM documents),
        |keep AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h),
        |m AS (SELECT d.source, d.toks,
        |    CASE WHEN d.doc_id <> k.keep_id THEN 1 ELSE 0 END AS rm
        |  FROM d JOIN keep k ON d.h = k.h),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(rm) AS BIGINT) AS docs_removed,
        |    CAST(SUM(toks) AS BIGINT) AS tokens_total,
        |    CAST(SUM(toks * rm) AS BIGINT) AS tokens_removed
        |  FROM m GROUP BY source)
        |SELECT source, n_docs, docs_removed, tokens_total,
        |  tokens_removed,
        |  tokens_removed * 1000000 // tokens_total AS saved_ppm
        |FROM g ORDER BY source""".stripMargin,
    // identical integer decile buckets over the brute-force slice
    "q_dedup_threshold_curve" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents WHERE doc_id < 250),
        |pairs AS (
        |  SELECT len(list_intersect(a.s, b.s)) AS inter,
        |    len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |      AS union_n
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |bk AS (SELECT CAST(inter * 10 // union_n AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pairs WHERE inter * 1.0 / union_n >= 0.3
        |  GROUP BY 1)
        |SELECT bucket, n_pairs,
        |  CAST(SUM(n_pairs) OVER (ORDER BY bucket DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_at_or_above
        |FROM bk
        |ORDER BY bucket""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 4, 1)),
        |    i -> substring(text, i, 5))) AS s
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.s, b.s)) AS inter,
        |    len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_n
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(union_n AS BIGINT) AS union_n,
        |  inter * 1.0 / union_n AS jaccard
        |FROM pairs WHERE inter * 1.0 / union_n >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // Portable simhash twin: reproduces the engine's md5-derived 63-bit
    // hash family digit-by-digit (see Dedup.simhash scaladoc).
    "q_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, md5(t) AS h
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
        |        FROM documents)),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN ((((strpos('0123456789abcdef',
        |          substring(h, CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
        |          >> CAST(b % 4 AS INTEGER)) & 1) = 1)
        |        THEN 1 ELSE -1 END) AS s
        |  FROM toks, (SELECT unnest(generate_series(0, 62)) AS b)
        |  GROUP BY doc_id, b)
        |SELECT doc_id AS id,
        |  CAST(SUM(CASE WHEN s > 0
        |    THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
        |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY id""".stripMargin,
    "q_dedup_embedding" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |    / (a.nrm * b.nrm) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |    / (a.nrm * b.nrm) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin
  )
}
