package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed SUFFIX-RANK construction by prefix doubling
  * (Manber & Myers 1993's doubling, in its sort/rank formulation —
  * the standard distributed / external-memory suffix-array scheme)
  * and the ExactSubstr duplicated-span detection built on it
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better" §4.2 — their suffix-array path, where the repo's
  * `q_text_scrub_global` implements the hashed-gram path).
  *
  * Rank tables compare document suffixes EXACTLY — no hash anywhere,
  * so unlike the 60-bit rolling-gram pass there is no collision knob
  * to widen at scale: rank_k(doc, pos) ties with rank_k(doc', pos')
  * iff the two suffixes' first min(k, remaining) characters are
  * IDENTICAL strings (truncation included: a suffix that ends inside
  * the window only ties with one that ends at the same offset, since
  * the truncated component substrings differ from every full-width
  * one as strings, and exhausted components carry the 0 sentinel).
  *
  * Doubling invariant: rank_{2k}(pos) = denseRank(rank_k(pos),
  * rank_k(pos + k)), with 0 for a missing (exhausted) right half —
  * ceil(log2(L / l0)) rounds lift an l0-char base rank to an L-char
  * rank, so comparisons double per round rather than extending by
  * one gram. Every rank assignment is [[Prefix.denseRank]] — the
  * range-partitioned two-pass dense rank, NO single-partition window
  * on any data-sized table.
  *
  * Scale ledger (corpus of n characters):
  *   1. position explode — map-side, n rows of (doc, pos, width-l0
  *      substring);
  *   2. per round: one (doc, pos+k) self-equi-join shuffle + one
  *      range exchange for the dense rank — O(n) rows each, log(L/l0)
  *      rounds total: the published O(n log L) suffix-rank cost class
  *      (each round's lineage is cut with a lazy localCheckpoint, the
  *      kTruss doctrine);
  *   3. duplicate marking — one window over rank groups (skew bounded
  *      by the most frequent L-gram, the same class as the hashed
  *      global pass);
  *   4. islands — one per-doc window; output sized by true duplicate
  *      positions, not the corpus.
  */
object SuffixRank {

  /** Suffix ranks comparing the first l0·2^doublings characters:
    * (doc_id, pos, rem, rank) with 1-based pos, rem = chars remaining
    * at pos, and rank dense over the global suffix-prefix order. */
  def ranks(docs: DataFrame, l0: Int, doublings: Int): DataFrame = {
    require(l0 >= 1 && doublings >= 0,
      s"need l0 >= 1, doublings >= 0; got l0=$l0, doublings=$doublings")
    // when() guards empty texts: Spark's sequence(1, 0) DESCENDS
    // ([1, 0]); explode(null) yields zero rows instead
    val pos = docs
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= 1,
          sequence(lit(1), length(col("text"))))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (length(col("text")) - col("pos") + 1).cast("long").as("rem"),
        col("text").substr(col("pos"), lit(l0)).as("g0"))
    // rank the KEY SPACE, not the rows: Prefix.denseRank runs on the
    // DISTINCT keys of each round (5-grams, then rank pairs) and the
    // ranked key table joins back — broadcast when small. Range-
    // exchanging the full position table through a sorting window
    // every round measured ~3× slower at sf0.1; the distinct table is
    // never larger than the position table and usually far smaller
    // (early rounds are bounded by the gram space). Each round's
    // output is cached — the next round reads it twice (left + the
    // pos+k shift).
    // EAGER localCheckpoint per round (the Graph.roundCut finding,
    // r15): a lazy persist chain nests one InMemoryRelation per round
    // inside the next round's plan and the AQE re-planning of that
    // stack goes superlinear in round count — measured on
    // q_dedup_exact_substr at sf0.1 (see SCALING.md). Rounds are
    // inherently serial (round h+1 reads round h's ranks), so eager
    // materialization costs no pipelining; blocks die with the
    // Dataset reference (ContextCleaner), and a cluster deployment
    // swaps in reliable checkpoint() for fault tolerance.
    var r = withDenseRank(pos, Seq("g0"), "rank")
      .select(col("doc_id"), col("pos"), col("rem"), col("rank"))
      .localCheckpoint(true)
    var k = l0.toLong
    for (_ <- 1 to doublings) {
      val right = r.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("rank").as("r2"))
      val paired = r.join(right, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rem"),
          col("rank").as("r1"), coalesce(col("r2"), lit(0L)).as("r2"))
      r = withDenseRank(paired, Seq("r1", "r2"), "rank")
        .select(col("doc_id"), col("pos"), col("rem"), col("rank"))
        .localCheckpoint(true)
      k *= 2
    }
    r
  }

  /** Dense-rank `df` by `keys` via the distinct-key table: hash-agg
    * distinct → [[Prefix.denseRank]] over the (smaller) key table →
    * equi-join the ranks back (auto-broadcast when the key table is
    * small). Same result as ranking the rows directly; the expensive
    * range-partitioned sort only ever sees distinct keys. */
  private def withDenseRank(df: DataFrame, keys: Seq[String],
                            out: String): DataFrame = {
    // cached: read once for the distinct key table, once for the
    // join-back — df is an exchange-bearing join in the doubling
    // rounds, and replaying it doubled the round cost
    val dfc = CacheScope.cached(df)
    val dk = dfc.select(keys.map(col): _*).distinct()
    dfc.join(Prefix.denseRank(dk, keys.map(col), out), keys)
  }

  /** Above this window width the prefix-doubling path takes over: a
    * direct group-by-window shuffle moves L bytes per position, the
    * doubling path O(log(L/l0)) rounds of ~24-byte rank rows — the
    * crossover sits around a few rank-round-equivalents of key bytes.
    */
  private[ops] val DirectMaxLen = 64L

  /** Maximal duplicated spans ≥ L = l0·2^doublings chars with EXACT
    * boundaries: a position is duplicated iff its L-char window
    * occurs anywhere else in the corpus (any doc, any position) and
    * is not the globally FIRST occurrence (min (doc_id, pos) of its
    * rank group survives — the keep-first rule of the hashed global
    * pass, here collision-free). Consecutive duplicated positions
    * merge into maximal islands; an island of c positions covers
    * c+L−1 chars — exactly the shared region, since windows
    * straddling a region boundary are unique. Returns one row per
    * span: (doc_id, start, span_len), start 1-based.
    *
    * Two physically different, semantically IDENTICAL plans (both
    * group positions by exact string equality of their L-char
    * window; SuffixRankSpec pins them equal on planted overlaps):
    *   - L ≤ [[DirectMaxLen]]: ONE corpus-linear shuffle — each
    *     position ships (window, doc_id, pos) once and a window
    *     partitioned by the L-char string marks non-first
    *     occurrences. For small L this moves ~L+16 bytes per
    *     position ONCE, where the doubling path moves ~24-byte rank
    *     rows through 2·log2(L/l0)+1 exchanges (join + dense-rank
    *     per round) — measured 4× cheaper at L=20, sf0.1, and the
    *     same arithmetic holds on a cluster (shuffle bytes:
    *     36n vs ~6·24n).
    *   - large L: the prefix-doubling rank path — window bytes grow
    *     with L, rank rows do not, so past ~[[DirectMaxLen]] chars
    *     the O(n log L) rank construction wins.
    */
  def duplicatedSpans(docs: DataFrame, l0: Int, doublings: Int)
      : DataFrame = {
    require(doublings >= 1,
      s"duplicatedSpans needs doublings >= 1, got $doublings")
    val L = l0.toLong << doublings
    val dup = if (L <= DirectMaxLen) dupPositionsDirect(docs, L)
              else dupPositionsDoubling(docs, l0, doublings)
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dup
      .withColumn("isl",
        col("pos") - row_number().over(wd).cast("long"))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("start"),
        (count(lit(1)) + (L - 1)).as("span_len"))
      .select(col("doc_id"), col("start"), col("span_len"))
  }

  /** Duplicated positions by DIRECT window grouping: explode only the
    * full-width positions (pos ≤ len−L+1), carry the L-char window
    * itself as the shuffle key, keep-first by (doc_id, pos) within
    * each identical-window group. Exact string equality — the same
    * tie rule as the rank path, with zero rank construction. */
  private[ops] def dupPositionsDirect(docs: DataFrame, L: Long)
      : DataFrame = {
    val pos = docs
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= L.toInt,
          sequence(lit(1), length(col("text")) - lit(L.toInt - 1))))
          .as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("text").substr(col("pos"), lit(L.toInt)).as("w"))
    pos
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("w"))
          .orderBy(col("doc_id"), col("pos"))))
      .where(col("rn") > 1)
      .select(col("doc_id"), col("pos"))
  }

  /** Duplicated positions via the suffix-rank doubling path (large L). */
  private[ops] def dupPositionsDoubling(docs: DataFrame, l0: Int,
      doublings: Int): DataFrame = {
    val L = l0.toLong << doublings
    // the LAST doubling never materializes a rank number: duplicate
    // detection only needs the equality GROUPS of the final level,
    // so the window partitions by the (rank_k, rank_k@pos+k) PAIR
    // directly — one whole dense-rank pass (distinct + rank + join
    // back over corpus-sized keys, the most expensive round by far)
    // deleted with identical semantics
    val k = l0.toLong << (doublings - 1)
    val half = ranks(docs, l0, doublings - 1)
    val right = half.select(col("doc_id"), (col("pos") - k).as("pos"),
      col("rank").as("r2"))
    val full = half.join(right, Seq("doc_id", "pos"), "left")
      .filter(col("rem") >= L)
      .select(col("doc_id"), col("pos"), col("rank").as("r1"),
        coalesce(col("r2"), lit(0L)).as("r2"))
    full
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("r1"), col("r2"))
          .orderBy(col("doc_id"), col("pos"))))
      .where(col("rn") > 1)
      .select(col("doc_id"), col("pos"))
  }
}
