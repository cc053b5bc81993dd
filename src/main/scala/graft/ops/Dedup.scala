package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Deduplication operators for LLM-pipeline data at scale.
  *
  * Design point (100 TB): every variant is a pure DataFrame plan — shingle /
  * signature generation is per-row (map-side, codegen'd), and candidate
  * generation is an equi-join on (band, bucket) keys so the shuffle carries
  * signatures, not documents. No driver-side collection anywhere.
  *
  * Algorithms (public literature): MinHash resemblance sketches
  * [Broder, "On the resemblance and containment of documents", 1997];
  * LSH banding [Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
  * ch.3]; SimHash [Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC 2002; Manku et al., WWW 2007]; prefix /
  * length / positional filtering for exact set-similarity joins
  * [Chaudhuri et al., ICDE 2006; Xiao et al., "Efficient similarity
  * joins for near duplicate detection" (PPJoin), WWW 2008].
  */
object Dedup {

  /** Modulus of the portable universal-hash minhash family: the Mersenne
    * prime 2^31−1. Family member j is h_j(s) = (a_j·h32(s) + b_j) mod P
    * [Carter & Wegman 1979 universal hashing — the standard minwise
    * family construction], where h32(s) is the first 8 hex digits of
    * md5(s) as an integer. Every term stays under 2^63 (a_j < 2^31,
    * h32 < 2^32), so the arithmetic is exact, overflow-free BIGINT math
    * in ANY engine — which is what makes minhash outputs
    * oracle-checkable cross-engine (DuckDB raises on BIGINT overflow, so
    * a wrapping xxhash64 family is not portable; see the simhash
    * portable-family precedent in `simhash` below).
    */
  val MinhashP: Long = 2147483647L

  /** Driver-side md5 (the same function as SQL `md5`) — used only to
    * derive the fixed family coefficients, never applied to data.
    */
  private[graft] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic (a_j, b_j) coefficient pairs for the portable minhash
    * family — derived from md5 of a fixed label so any engine (or the
    * oracle-SQL generator) can re-derive the identical family.
    * a_j ∈ [1, P−1], b_j ∈ [0, P−1].
    */
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { j =>
      val a = (BigInt(md5Hex(s"graft-minhash-a:$j").take(15), 16) %
        (MinhashP - 1)).toLong + 1
      val b = (BigInt(md5Hex(s"graft-minhash-b:$j").take(15), 16) %
        MinhashP).toLong
      (a, b)
    }

  /** Portable 32-bit string hash: first 8 hex digits of md5 as a long —
    * replicable in any engine with md5 (DuckDB: strpos digit-sum).
    */
  def portableHash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Exact dedup: canonical representative (min id) per key column. */
  def exactGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Character k-shingles of a text column, distinct, as array<string>.
    * Cheap per-row expression; O(len) array only in flight, never stored.
    */
  def shingles(text: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(length(text) - k, lit(0))),
        i => text.substr(i + 1, lit(k))))

  /** MinHash signature: array of `numHashes` Long minima over shingle
    * hashes, using the portable universal family (see `MinhashP`) —
    * deterministic, stateless, identical on every executor AND every
    * engine.
    *
    * NOTE: column-composition form — Catalyst re-evaluates the lambda
    * body per (j, shingle) (no CSE inside lambdas), so this is
    * O(numHashes · |shingles|) md5 calls. Kept for column-level
    * composition on small inputs; the scalable path is
    * `minhashSignatures` below (explode-based, one md5 per shingle).
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array(minhashCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(shingleArr,
        s => (lit(a) * portableHash32(s) + lit(b)) % lit(MinhashP)))
    }: _*)

  /** MinHash signature table [id, sig: array<long>], one aggregation pass.
    *
    * Shape chosen for scale: shingle each doc ONCE, hash each shingle
    * ONCE to 32 bits (md5 prefix), then derive the j-th family member by
    * an affine map mod 2^31−1 — fixed-width integer math, no re-walk of
    * strings. All `numHashes` minima are computed as separate
    * min-aggregates in ONE hash aggregate over the (id, h0) rows:
    * map-side partial combine means the shuffle carries numHashes longs
    * per (doc × partition), and no row explosion by numHashes ever
    * happens (an explode-by-j form pushed rows × numHashes through a
    * shuffle — measured 30 s vs ~7 s for this plan at sf0.1).
    *
    * The family is the PORTABLE universal family (`MinhashP`): every
    * operation (md5, hex-digit extraction, affine mod) is exactly
    * replicable in DuckDB, so minhash-derived queries are
    * oracle-checkable — the same recipe that made simhash oracle-green.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, numHashes: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), k)).as("s"))
      .select(col("id"), portableHash32(col("s")).as("h0"))
      .groupBy(col("id"))
      .agg(array(minhashCoeffs(numHashes).map { case (a, b) =>
        min((lit(a) * col("h0") + lit(b)) % lit(MinhashP))
      }: _*).as("sig"))

  /** LSH banding: (band_idx, band_hash) rows per doc. Docs sharing any
    * band bucket become candidate pairs via equi-join — the scalable path
    * (shuffle on band keys) vs O(N²) all-pairs.
    */
  def minhashBands(df: DataFrame, sigCol: String, idCol: String,
                   bands: Int, rowsPerBand: Int): DataFrame =
    df.select(
        col(idCol),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band_idx", "band_hash")))

  /** Estimated Jaccard from two minhash signatures: fraction of equal
    * components.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** End-to-end MinHash-LSH near-duplicate candidate pairs.
    *
    * @return DataFrame[id_a, id_b, est_jaccard] with id_a < id_b,
    *         est_jaccard >= threshold, deduplicated across bands.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
                   threshold: Double = 0.5,
                   sigsHint: Option[DataFrame] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    // persisted (scope-tracked): the self-join DAG traverses signatures
    // three times (banding ×2 sides + verification); without persist the
    // full shingle+hash pipeline re-runs per branch. At cluster scale this
    // is a checkpoint of the signature table — tiny (numHashes longs per
    // doc) relative to the corpus. Wrap the consuming action in
    // CacheScope.scoped to reclaim it. `sigsHint` supplies an
    // already-built [id, sig] table (a persisted index or a run-wide
    // memo) — then no shingling happens here at all.
    val sigs = sigsHint.getOrElse(CacheScope.cached(
      minhashSignatures(docs, idCol, textCol, k, numHashes)))
    val banded = minhashBands(sigs, "sig", "id", bands, rowsPerBand)
    val a = banded.select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("band_idx"), col("band_hash"))
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Incremental MinHash-LSH near-dup pairs: candidates are only
    * (corpus × batch) and (batch × batch) — the corpus is never
    * self-joined. This is the 100 TB ingest shape: after the initial
    * corpus-wide dedup, each incoming batch pays
    * O(|batch| · bucket-occupancy), not another O(|corpus|²) pass, and
    * at steady state corpus band tables persist as a bucketed table so
    * only the batch side is (re)hashed. Ids must be distinct across the
    * two inputs (they identify rows in the output pairs).
    *
    * @return DataFrame[id_a, id_b, est_jaccard] where id_b is always a
    *         batch doc; for batch-batch pairs id_a < id_b.
    */
  def minhashPairsIncremental(corpus: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              k: Int = 5, bands: Int = 8,
                              rowsPerBand: Int = 4,
                              threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val cSigs = CacheScope.cached(
      minhashSignatures(corpus, idCol, textCol, k, numHashes))
    val bSigs = CacheScope.cached(
      minhashSignatures(batch, idCol, textCol, k, numHashes))
    minhashPairsFromSigs(cSigs, bSigs, bands, rowsPerBand, threshold)
  }

  /** Signature-level core of the incremental near-dup join: the corpus
    * side is an ALREADY-COMPUTED signature table [id, sig] — the
    * persisted incremental index a streaming ingest maintains
    * (StreamOps.dedupIngest). Only the batch side pays shingling; the
    * corpus contributes numHashes longs per doc, read straight from
    * the index. Candidates are (corpus × batch) + (batch × batch);
    * the corpus is never self-joined.
    */
  def minhashPairsFromSigs(cSigs: DataFrame, bSigs: DataFrame,
                           bands: Int, rowsPerBand: Int,
                           threshold: Double): DataFrame = {
    val cb = minhashBands(cSigs, "sig", "id", bands, rowsPerBand)
    val bb = minhashBands(bSigs, "sig", "id", bands, rowsPerBand)
    val bbA = bb.select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
    val bbB = bb.select(col("id").as("id_b"), col("band_idx"), col("band_hash"))
    val corpusBatch = cb
      .select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
      .join(bbB, Seq("band_idx", "band_hash"))
      .select("id_a", "id_b")
    val batchBatch = bbA.join(bbB, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val allSigs = cSigs.unionByName(bSigs)
    corpusBatch.unionByName(batchBatch).distinct()
      .join(allSigs.select(col("id").as("id_a"), col("sig").as("sig_a")),
        "id_a")
      .join(allSigs.select(col("id").as("id_b"), col("sig").as("sig_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs with **prefix filtering** — the
    * canonical exact set-similarity join.
    *
    * A naive inverted-index self-join on all shingles is quadratic in the
    * hottest shingle's document frequency ("the q" appears in most docs →
    * |df|² candidate pairs; measured 487 s at sf0.1 vs ~seconds with the
    * filter). Prefix filter: order each doc's shingle set by a global
    * total order (xxhash64), index only the first
    * `p = n − ⌈t·n⌉ + 1` shingles. If J(a,b) ≥ t, the two prefixes must
    * share a shingle — so candidates generated from prefix keys have NO
    * false negatives; exact Jaccard is then verified per candidate on the
    * full sets.
    *
    * Exactness: the small-vocabulary branch (≤ 2^16 distinct shingles) is
    * EXACTLY the naive join for pairs ≥ t. The large-vocabulary branch
    * inserts a minhash est-Jaccard prefilter (margin t−0.25) before the
    * exact verify; a qualifying pair is dropped only if its 64-hash
    * estimate undershoots by > 0.25 — probability ~3e-7 per pair — so that
    * regime is exact-with-negligible-false-negative-odds, not exact.
    *
    * Side effect: plan CONSTRUCTION runs one eager Spark job (a count of
    * the shingle vocabulary) to pick the verification strategy — unless
    * the caller supplies `vocabHint` (e.g. from table stats or a prior
    * run), which keeps construction fully lazy. The hint MUST be an
    * upper bound on the true distinct-shingle count: in the
    * small-vocabulary regime it also sizes the verification bitsets, and
    * an undersized width would silently drop shingles (an oversized one
    * just pads zero words).
    *
    * `exact = true` forces the exact verifier even in the
    * large-vocabulary regime (no minhash prefilter, array_intersect on
    * every candidate): zero false negatives at the cost of verifying the
    * full candidate stream.
    *
    * @return DataFrame[id_a, id_b, inter, union_n, jaccard], id_a < id_b.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJaccard: Double,
                        vocabHint: Option[Long] = None,
                        exact: Boolean = false): DataFrame = {
    // global order = ascending document frequency (rarest first), ties by
    // shingle value: prefixes then hold each doc's RAREST shingles, so
    // prefix-index buckets are small by construction and the hot-shingle
    // quadratic blowup never happens. df is one cheap global agg.
    val exploded = CacheScope.cached(docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("s")))
      // feeds df-table, sorted sets AND minhash sigs below
    val dfTbl = exploded.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
    val sh = CacheScope.cached(exploded.join(dfTbl, "s")
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("s")))),
        x => x.getField("s")).as("sh"))
      .withColumn("n", size(col("sh"))))
    val prefix = sh.select(col("id"), col("n"),
      posexplode(slice(col("sh"), lit(1),
        (col("n") - ceil(col("n") * minJaccard) + 1).cast("int")))
        .as(Seq("p", "s")))
    // candidate pairs: shared prefix shingle + PPJoin length filter
    // (J ≥ t ⇒ t·max(n_a,n_b) ≤ min(n_a,n_b)) + positional filter
    // (overlap still reachable past this match position must be ≥ the
    // required overlap α = ⌈t/(1+t)·(n_a+n_b)⌉) — all exact pruning
    val alpha = ceil(lit(minJaccard / (1 + minJaccard)) *
      (col("x.n") + col("y.n")))
    // NOTE: cand is NOT deduplicated here — a pair sharing several prefix
    // shingles appears once per share. Each branch decides where dedup is
    // cheapest for its verification cost (see below).
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id") &&
          col("x.n") >= col("y.n") * minJaccard &&
          col("y.n") >= col("x.n") * minJaccard &&
          least(col("x.n") - col("x.p"), col("y.n") - col("y.p")) >= alpha)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val vocab = vocabHint.getOrElse(dfTbl.count())
    val verified = if (vocab <= (1L << 16)) {
      // SMALL-VOCABULARY regime (the regime where prefix buckets stay
      // hot): exact bitset verification, verify BEFORE dedup — the
      // popcount is map-side (bitmap table joins broadcast under AQE),
      // so re-verifying a pair once per shared prefix shingle costs
      // ~ns each, while a distinct over the raw candidate stream is a
      // full shuffle of it. The post-threshold survivor set is tiny —
      // dedup happens there (the shared .distinct() after the jaccard
      // filter below). Measured ~4 s cheaper at sf0.1.
      bitsetVerify(cand, exploded, dfTbl, vocab)
    } else {
      // LARGE-VOCABULARY regime: est-Jaccard prefilter on 64-hash minhash
      // sigs (64 longs per candidate vs full shingle arrays; margin
      // t−0.25 has false-negative odds ~3e-7 per qualifying pair), then
      // exact array_intersect on survivors. Sigs derive from the SAME
      // persisted exploded table (no re-shingle). `exact` skips the
      // prefilter: every distinct candidate goes to array_intersect.
      // here verification (array_intersect over full shingle sets) is far
      // more expensive than a shuffle, so dedup the candidate stream FIRST
      val distinctCand = cand.distinct()
      val likely = if (exact) distinctCand else {
        val sigs = CacheScope.cached(exploded
          .select(col("id"), xxhash64(col("s")).as("h0"))
          .groupBy(col("id"))
          .agg(array((0 until 64).map(j =>
            min(xxhash64(lit(j), col("h0")))): _*).as("sig")))
        val margin = math.max(0.0, minJaccard - 0.25)
        distinctCand
          .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")),
            "id_a")
          .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")),
            "id_b")
          .filter(estJaccard(col("sig_a"), col("sig_b")) >= margin)
          .select(col("id_a"), col("id_b"))
      }
      likely
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
            .as("inter"),
          (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("nn"))
    }
    verified
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("nn") - col("inter")).as("union_n"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_n"))
      .filter(col("jaccard") >= minJaccard)
      // dedup of the (tiny) post-threshold set — identical rows per pair,
      // so distinct here equals distinct on (id_a, id_b)
      .distinct()
  }

  /** DELTA exact-Jaccard pairs for incremental graph maintenance:
    * every pair with AT LEAST ONE endpoint in `delta`, scored exactly
    * against `all` (= accepted corpus ∪ delta) — the old×old pairs are
    * NEVER recomputed, which is the whole point of an incremental
    * batch: cost is Σ(delta-shingle df), not the corpus pair join.
    * Intersections come from one shingle equi-join of the delta side
    * (small by definition) against the full side; Jaccard is exact
    * (|A∩B| / (|A|+|B|−|A∩B|)) on distinct-shingle set sizes. At
    * 100 TB the full side's explode is the persisted shingle sidecar
    * (the dedupIngest pattern), and the df-capped/banded variants slot
    * in for recall/cost trade — this exact form is the semantics
    * anchor. New×new pairs surface from both sides and canonicalize
    * via (least, greatest) + distinct.
    */
  def ngramJaccardPairsDelta(all: DataFrame, delta: DataFrame,
                             idCol: String, textCol: String,
                             k: Int, minJaccard: Double): DataFrame = {
    def sh(df: DataFrame, idAs: String, nAs: String, explodeAs: String) =
      df.select(col(idCol).as(idAs), shingles(col(textCol), k).as("_sh"))
        .withColumn(nAs, size(col("_sh")))
        .select(col(idAs), col(nAs), explode(col("_sh")).as(explodeAs))
    val dn = CacheScope.cached(sh(delta, "id", "na", "s"))
    val an = sh(all, "other", "nb", "s")
    val inter = dn.join(an, "s")
      .filter(col("other") =!= col("id"))
      .groupBy(col("id"), col("na"), col("other"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")) >= minJaccard)
      .select(least(col("id"), col("other")).as("id_a"),
        greatest(col("id"), col("other")).as("id_b"))
      .distinct()
  }

  /** Connected components over near-dup pairs — the step that turns a
    * pair list into dedup CLUSTERS (keep min id per component, drop the
    * rest). Near-dup similarity is not transitive, so clusters are the
    * transitive closure of the pair graph, not the pairs themselves.
    *
    * Min-label propagation WITH pointer doubling: every node starts
    * labeled with its own id; each round (1) takes the min of its own
    * and its neighbors' labels (one equi-join on node ids + partial-agg
    * min), then (2) shortcuts label ← label(label) (one self-join of
    * the label table — no aggregate: labels are functional). Labels only
    * decrease, and a label is always the id of a node in the same
    * component, so the shortcut is safe; it doubles the propagation
    * distance already covered, giving convergence in O(log diameter)
    * rounds instead of O(diameter) — the property that matters at
    * 100 TB, where each round is a full O(|edges|) shuffle barrier and a
    * long-chain component would otherwise force a deep sequential plan.
    * Reach after k rounds ≥ 2^(k+1)-2 hops (d₀=0, dₖ₊₁=2(dₖ+1)).
    * Shuffles carry 16-byte (id, label) pairs — documents never enter
    * the graph. `iters` is a fixed bound (deterministic, no mid-plan
    * actions); production callers monitoring convergence can compare
    * consecutive label checksums per round.
    *
    * @param pairs DataFrame[id_a, id_b] (+ any extra columns, ignored)
    * @return DataFrame[doc_id, component] for every id appearing in
    *         pairs; component = min id of the connected component.
    */
  def dedupComponents(pairs: DataFrame, iters: Int = 8): DataFrame = {
    val undirected = pairs
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    // self-loops fold "keep own label" into the SAME join, so each
    // round references the previous labels exactly once — a plan that
    // grows linearly in `iters` (a labels ∪ join(edges, labels) form
    // references labels twice per round: exponential plan tree, OOM at
    // analysis time long before any data moves)
    val edges = CacheScope.cached(undirected.unionByName(
      undirected.select(col("a")).distinct()
        .select(col("a"), col("a").as("b"))))
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 0 until iters) {
      // lazy localCheckpoint: the jump below references `propagated`
      // TWICE — without cutting lineage the logical plan would double
      // every round (exponential tree: analysis-time OOM long before
      // any data moves). The checkpoint truncates the plan to a leaf
      // while staying lazy (computed + stored on first action, shared
      // by both join branches). At cluster scale swap for reliable
      // `checkpoint()` — local checkpoints don't survive executor loss.
      val propagated = edges
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a")).agg(min(col("label")).as("label"))
        .select(col("a").as("node"), col("label"))
        .localCheckpoint(false)
      // pointer jump: label ← label(label). Every label is itself a node
      // id present in `propagated` (labels are mins over node ids), so
      // the inner self-join is total.
      labels = propagated
        .join(propagated.select(col("label").as("jump_to"),
          col("node").as("label")), "label")
        .select(col("node"), col("jump_to").as("label"))
    }
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }

  /** Exact bitset verification of a candidate pair stream (shared by
    * the prefix-filtered and banded set-similarity joins):
    * dictionary-encode the (≤ 2¹⁶) distinct shingles to dense ranks,
    * pack each doc's set into ⌈V/64⌉ longs, and score candidates with
    * the codegen'd popcount(AND) — exact, collision-free, and a
    * fraction of the bytes of shipping shingle arrays. One output row
    * per INPUT candidate row (duplicates pass through: verification is
    * map-side cheap, dedup belongs after thresholding).
    *
    * @param distinctShingles DataFrame with one row per distinct
    *        shingle in column `s` (document frequencies ignored)
    * @return DataFrame[id_a, id_b, inter, nn]
    */
  private def bitsetVerify(cand: DataFrame, exploded: DataFrame,
                           distinctShingles: DataFrame,
                           vocab: Long): DataFrame = {
    val w = ((vocab + 63) / 64).toInt
    val dict = distinctShingles.select(col("s"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("s"))) - 1).as("r"))
    graft.functions.GraftFunctions.register(exploded.sparkSession)
    val bitmaps = CacheScope.cached(exploded.join(dict, "s")
      .select(col("id"), (col("r") / 64).cast("int").as("wi"),
        expr("shiftleft(cast(1 as bigint), cast(r % 64 as int))").as("b"))
      .groupBy(col("id"), col("wi")).agg(expr("bit_or(b)").as("bw"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("wi"), col("bw"))))
        .as("m"))
      .select(col("id"), transform(sequence(lit(0), lit(w - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bm"))
      // per-doc cardinality precomputed once, not per candidate pair
      .withColumn("n", expr("bitmap_and_count(bm, bm)")))
    cand
      .join(bitmaps.select(col("id").as("id_a"), col("bm").as("bm_a"),
        col("n").as("n_a")), "id_a")
      .join(bitmaps.select(col("id").as("id_b"), col("bm").as("bm_b"),
        col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        expr("bitmap_and_count(bm_a, bm_b)").as("inter"),
        (col("n_a") + col("n_b")).as("nn"))
  }

  /** Banded-candidate n-gram Jaccard pairs — the opt-in that trades the
    * exact PPJoin contract for ~2× at scale: candidates come from
    * portable-minhash LSH banding (equi-join on (band, hash) keys, the
    * same index `minhashPairs` uses) instead of the exact prefix
    * filter, and every candidate is then verified with EXACT
    * set-intersection Jaccard. Output rows are therefore exactly
    *   { pairs sharing ≥1 of the `bands` signature bands } ∩
    *   { exact Jaccard ≥ minJaccard }
    * — a DETERMINISTIC subset of `ngramJaccardPairs` (the hash family
    * is fixed), so the operator is still oracle-checkable even though
    * its recall < 1: the DuckDB twin replays the banding.
    *
    * The banding IS the recall/cost contract — per qualifying pair at
    * Jaccard J, collision odds are 1−(1−J^r)^b, and the same curve
    * decides how much sub-threshold mass becomes candidates. The 8×4
    * default targets t ≈ 0.8 (recall 0.997 at J = 0.8; a 0.35
    * background pair is admitted 11% of the time); 16×2 pushes recall
    * to ~1 down to J ≈ 0.7 but on a dense corpus floods verification
    * with background candidates (measured 87% admission at J = 0.35 —
    * the whole 2× disappears). `ngramJaccardPairs` stays the
    * zero-false-negative default; this opt-in pays off when the corpus
    * defeats prefix filtering (hot shingles, very long documents).
    *
    * @return DataFrame[id_a, id_b, inter, union_n, jaccard], id_a < id_b
    */
  def ngramJaccardPairsBanded(docs: DataFrame, idCol: String,
                              textCol: String, k: Int, minJaccard: Double,
                              bands: Int = 8, rowsPerBand: Int = 4,
                              vocabHint: Option[Long] = None): DataFrame = {
    val exploded = CacheScope.cached(docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("s")))
    val numHashes = bands * rowsPerBand
    val sigs = CacheScope.cached(exploded
      .select(col("id"), portableHash32(col("s")).as("h0"))
      .groupBy(col("id"))
      .agg(array(minhashCoeffs(numHashes).map { case (a, b) =>
        min((lit(a) * col("h0") + lit(b)) % lit(MinhashP))
      }: _*).as("sig")))
    val banded = minhashBands(sigs, "sig", "id", bands, rowsPerBand)
    // NOT deduplicated — a pair colliding in several bands appears once
    // per collision; each verification regime picks its own dedup point
    val cand = banded.select(col("id").as("id_a"), col("band_idx"),
        col("band_hash"))
      .join(banded.select(col("id").as("id_b"), col("band_idx"),
        col("band_hash")), Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val dfTbl = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val vocab = vocabHint.getOrElse(dfTbl.count())
    val verified = if (vocab <= (1L << 16)) {
      // bitset verify straight on the duplicated candidate stream
      // (popcount is map-side ~ns; a distinct first would shuffle the
      // raw stream) — on a dense corpus the banding S-curve admits a
      // large sub-threshold candidate mass, and array_intersect on it
      // measured 33.7 s vs 9.5 s for the bitset plan at sf0.1 (16×2;
      // the 8×4 default lands at ~11 s vs the exact op's ~12.6 s on
      // the fixture — see NEXT.md for why this corpus is the prefix
      // filter's best case)
      bitsetVerify(cand, exploded, dfTbl, vocab)
    } else {
      // large vocabulary: dedup first, then exact set intersection
      // (verification dominates the shuffle in this regime)
      val sh = CacheScope.cached(exploded.groupBy(col("id"))
        .agg(collect_set(col("s")).as("sh")))
      cand.distinct()
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")),
          "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")),
          "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
            .as("inter"),
          (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("nn"))
    }
    verified
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("nn") - col("inter")).as("union_n"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_n"))
      .filter(col("jaccard") >= minJaccard)
      .distinct()
  }

  /** Connected components with an automatic SMALL-GRAPH fast path —
    * the [[graft.ops.Graph.boruvkaForest]] hybrid applied to CC: one
    * bounded probe collects up to `smallLimit`+1 edge pairs; if the
    * whole pair list fits, the components are a driver union-find
    * (min-id representative — the same (doc_id, component) contract)
    * returned as a local frame with ZERO label shuffles and zero
    * per-round checksum actions. Pair lists above the limit fall
    * through to [[dedupComponentsConverged]], the
    * checksum-to-fixpoint distributed path. The probe bounds driver
    * memory by construction (≤ smallLimit 16-byte pairs ≈ 16 MB at
    * the default), so the fast path can never be tripped into an
    * unbounded collect by a misestimated input.
    *
    * When to use: iterative operators whose per-round component
    * graphs are KNOWN to be vertex-bounded (MST dendrogram cuts,
    * contracted component graphs) — the driver path turns an
    * O(log diameter)-action convergence loop into one action. Corpus-
    * scale pair graphs (near-dup candidates over 10⁹ docs) blow the
    * probe and take the distributed path unchanged.
    */
  def dedupComponentsAuto(pairs: DataFrame,
      smallLimit: Long = 1L << 20, maxIters: Int = 16): DataFrame = {
    val probe = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .limit((smallLimit + 1).toInt).collect()
    if (probe.length > smallLimit)
      return dedupComponentsConverged(pairs, maxIters)._1
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
    val nodes = scala.collection.mutable.LongMap.empty[Long]
    probe.foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      nodes(a) = a; nodes(b) = b
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    nodes.keys.foreach { v =>
      rows.add(org.apache.spark.sql.Row(v, find(v))) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("component",
        org.apache.spark.sql.types.LongType, nullable = false)))
    pairs.sparkSession.createDataFrame(rows, schema)
  }

  /** Convergence-detecting variant of `dedupComponents` — the
    * production driver when the pair graph's diameter is unknown: after
    * each pointer-doubling round, an 8-byte checksum action
    * (order-independent sum of xxhash64(node, label)) is compared with
    * the previous round's; identical checksums ⇒ no label moved ⇒
    * converged (labels only decrease, so an unchanged checksum is a
    * fixed point up to a ~2⁻⁶⁴ collision). Stops one round after
    * convergence instead of running `maxIters` blind.
    *
    * Cost model at cluster scale: the checksum is one extra
    * O(|nodes|) scan + a driver-side Long per round — noise next to
    * the round's own O(|edges|) shuffle barrier — and because each
    * round's result is (local)checkpointed, the checksum action does
    * not recompute prior rounds. Keep `dedupComponents(iters = k)` for
    * fully-lazy plan construction when the diameter bound is known
    * (e.g. the oracle queries' planted pair/triple clusters).
    *
    * @return (components DataFrame — same contract as dedupComponents,
    *         rounds actually run including the detection round)
    */
  def dedupComponentsConverged(pairs: DataFrame,
                               maxIters: Int = 16): (DataFrame, Int) = {
    val undirected = pairs
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    val edges = CacheScope.cached(undirected.unionByName(
      undirected.select(col("a")).distinct()
        .select(col("a"), col("a").as("b"))))
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var prev = Option.empty[String]
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val propagated = edges
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a")).agg(min(col("label")).as("label"))
        .select(col("a").as("node"), col("label"))
        .localCheckpoint(false)
      labels = propagated
        .join(propagated.select(col("label").as("jump_to"),
          col("node").as("label")), "label")
        .select(col("node"), col("jump_to").as("label"))
        .localCheckpoint(false)
      // decimal sum: overflow-free under ANSI mode (a Long sum of 64-bit
      // hashes throws), order-independent, collision odds ~2^-64
      val sum = labels
        .agg(coalesce(org.apache.spark.sql.functions.sum(
            xxhash64(col("node"), col("label")).cast("decimal(20,0)")),
          lit(0).cast("decimal(38,0)")).cast("string"))
        .head().getString(0)
      rounds += 1
      if (prev.contains(sum)) converged = true else prev = Some(sum)
    }
    (labels.select(col("node").as("doc_id"), col("label").as("component")),
      rounds)
  }

  /** 63-bit SimHash over whitespace tokens, as a pure DataFrame plan:
    * explode bits → per-(doc,bit) ±1 sums → pack.
    *
    * The token-hash family is PORTABLE by construction: bit b is bit
    * (b mod 4) of hex digit (b div 4) of md5(token) — any engine with an
    * md5 function can replicate it exactly, which is what makes this
    * operator oracle-checkable cross-engine (vs an engine-local xxhash64
    * family). Bits 0..62 only: engines disagree on `1 << 63` (Spark wraps,
    * DuckDB raises), and 63 bits loses nothing for Hamming comparison.
    * (A typed Aggregator variant lives in graft.functions.SimHashAgg,
    * parity-tested bit-for-bit in CustomFunctionsSpec.)
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // all 63 bit-sums as separate aggregates in ONE hash-aggregate pass
    // over the (id, md5) token rows — no explosion by bit count, map-side
    // partial combine, 63 ints per (doc × partition) on the shuffle (the
    // same shape as minhashSignatures; an exploded (id, b) variant
    // measured 9.8 s vs ~1 s for this plan at sf0.1)
    def bit(b: Int): Column =
      (shiftright(conv(substring(col("h"), b / 4 + 1, 1), 16, 10)
        .cast("int"), b % 4).bitwiseAND(lit(1)) === 1)
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .select(col("id"), md5(col("tok")).as("h"))
      .groupBy("id")
      .agg(
        sum(when(bit(0), 1).otherwise(-1)).as("s0"),
        (1 until 63).map(b =>
          sum(when(bit(b), 1).otherwise(-1)).as(s"s$b")): _*)
      .select(col("id"),
        (0 until 63).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** EXACT embedding near-dup pairs above a cosine threshold, as a
    * blocked all-pairs join — the shuffle-native form of the quadratic
    * scan, with no BroadcastNestedLoopJoin anywhere in the plan.
    *
    * Exact low-threshold cosine join over unstructured vectors is
    * inherently O(N²) (the fixture's pair-cosine distribution is
    * continuous through any usable threshold, so no bucketing scheme has
    * recall 1). What CAN be fixed is the execution shape: a driver
    * broadcast + nested loop pins the whole corpus in every task. Here
    * each vector gets a block id (hash mod `blocks`) and each side is
    * replicated across the block grid, so the join is a plain equi-join on
    * the (block_a, block_b) cell key: the N² work spreads uniformly over
    * blocks² cells, per-task memory is one cell (N/blocks vectors per
    * side), and the shuffle is sized N·blocks — all tunable. Each
    * unordered pair meets in exactly one orientation per cell pair and
    * `id_a < id_b` keeps one. For the high-threshold near-dup regime use
    * `embeddingNearDups` (LSH, linear) instead.
    */
  def embeddingExactPairs(embs: DataFrame, idCol: String, vecCol: String,
                          minCosine: Double, blocks: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(embs.sparkSession)
    val e = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      pmod(xxhash64(col(idCol)), lit(blocks)).cast("int").as("blk"))
    val grid = explode(sequence(lit(0), lit(blocks - 1)))
    val a = e.select(col("id").as("id_a"), col("v").as("va"),
      col("blk").as("ba"), grid.as("bb"))
    val b = e.select(col("id").as("id_b"), col("v").as("vb"),
      grid.as("ba"), col("blk").as("bb"))
    a.join(b, Seq("ba", "bb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("cosine_sim(va, vb)").as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Cross-document duplicated-span REMOVAL — the transform half of the
    * Lee et al. (2022) exact-substring discipline (detection lives in
    * the dup-spans query): drop every token covered by a word-`n`-gram
    * that also occurs in at least one OTHER document, and re-join the
    * survivors in order. Returns one row per document with ≥1 token:
    * (id, n_tokens, n_kept, trimmed).
    *
    * Scale plan: grams hash to 60 bits pre-shuffle (portable md5
    * family); corpus doc-frequency is one aggregate over deduped
    * (doc, gram) pairs; coverage expands each shared occurrence to its
    * `n` positions as (doc, int) pairs — shuffles carry ints, never
    * text. The trimmed string materializes once per doc in the final
    * per-doc aggregate. Within-doc repetition alone never trims (df
    * counts distinct documents).
    */
  def trimSharedNgramSpans(docs: DataFrame, idCol: String,
                           textCol: String, n: Int): DataFrame = {
    require(n >= 2, "span n-gram size must be >= 2")
    val toks = docs.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("__pos", "__tok")))
    def gramsIdx = docs
      .select(col(idCol).as("__id"), split(col(textCol), "\\s+").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("__id"), posexplode(
        TextAnalysis.wordNgramsFromTokens(col("t"), n)).as(Seq("__i", "g")))
      .select(col("__id"), col("__i"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("g"))
    val shared = gramsIdx.select(col("__id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
    val covered = gramsIdx.join(shared, "g")
      .select(col("__id"),
        explode(sequence(col("__i"), col("__i") + (n - 1))).as("__pos"))
      .distinct()
    toks.join(covered, Seq("__id", "__pos"), "left_anti")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          x => x.getField("__tok")), " ").as("trimmed"))
      .join(toks.groupBy(col("__id"))
        .agg(count(lit(1)).as("n_tokens")), Seq("__id"), "right")
      .select(col("__id").as(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("trimmed"), lit("")).as("trimmed"))
  }

  /** Embedding near-duplicate pairs above a cosine threshold, LSH-bucketed
    * by hyperplane signature prefix so the join is on bucket keys.
    */
  def embeddingNearDups(embs: DataFrame, idCol: String, vecCol: String,
                        nBits: Int, seed: Int,
                        minCosine: Double): DataFrame = {
    val sigs = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.hyperplaneSignature(col(vecCol), nBits, seed).as("sig"))
    sigs.as("a").join(sigs.as("b"), col("a.sig") === col("b.sig"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
