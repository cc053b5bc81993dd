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
    var r = Prefix.denseRank(pos, Seq(col("g0")), "rank")
      .select(col("doc_id"), col("pos"), col("rem"), col("rank"))
      .localCheckpoint(false)
    var k = l0.toLong
    for (_ <- 1 to doublings) {
      val right = r.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("rank").as("r2"))
      val paired = r.join(right, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rem"),
          col("rank").as("r1"), coalesce(col("r2"), lit(0L)).as("r2"))
      r = Prefix.denseRank(paired, Seq(col("r1"), col("r2")), "rank")
        .select(col("doc_id"), col("pos"), col("rem"), col("rank"))
        .localCheckpoint(false)
      k *= 2
    }
    r
  }

  /** Maximal duplicated spans ≥ L = l0·2^doublings chars with EXACT
    * boundaries: a position is duplicated iff its L-char window
    * occurs anywhere else in the corpus (any doc, any position) and
    * is not the globally FIRST occurrence (min (doc_id, pos) of its
    * rank group survives — the keep-first rule of the hashed global
    * pass, here collision-free). Consecutive duplicated positions
    * merge into maximal islands; an island of c positions covers
    * c+L−1 chars — exactly the shared region, since windows
    * straddling a region boundary are unique. Returns one row per
    * span: (doc_id, start, span_len), start 1-based. */
  def duplicatedSpans(docs: DataFrame, l0: Int, doublings: Int)
      : DataFrame = {
    val L = l0.toLong << doublings
    val full = ranks(docs, l0, doublings).filter(col("rem") >= L)
    val dup = full
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("rank"))
          .orderBy(col("doc_id"), col("pos"))))
      .where(col("rn") > 1)
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dup
      .withColumn("isl",
        col("pos") - row_number().over(wd).cast("long"))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("start"),
        (count(lit(1)) + (L - 1)).as("span_len"))
      .select(col("doc_id"), col("start"), col("span_len"))
  }
}
