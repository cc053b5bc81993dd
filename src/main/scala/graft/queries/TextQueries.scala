package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.TextAnalysis

/** Text-analysis battery over `documents` (north-star operators). */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Per-document quality features (token stats + ratios). */
  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(Tables.documents(spark, dir), "text")
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_stopwords").cast("long").as("n_stopwords"),
        col("mean_token_len"), col("stopword_ratio"))
      .orderBy(col("doc_id"))

  /** Token counting, whitespace vs BPE-style segmentation side by side —
    * the LLM-pipeline budget signal (BPE-ish segments track model token
    * counts; whitespace tokens undercount contractions/punctuation).
    */
  def qTextTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long")
          .as("n_bpeish"))
      .orderBy(col("doc_id"))

  /** Language-ID heuristic accuracy matrix: labeled lang × guess. */
  def qTextLangid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), TextAnalysis.langGuess(col("text")).as("guess"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))

  /** Top-20 word bigrams corpus-wide (n-gram generation + count + top-k).
    * Tokens are projected ONCE, then n-grams derive from the attribute —
    * see TextAnalysis.wordNgramsFromTokens on why (lambda-CSE).
    */
  def qTextNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(
        TextAnalysis.wordNgramsFromTokens(col("toks"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** LEXICAL-DIVERSITY PANEL per source — the corpus-quality battery a
    * training-data pipeline runs before mixing sources: type-token
    * ratio (unigram and bigram) and hapax share, the standard
    * repetitiveness / template-content indicators (a scraped boilerplate
    * source shows low TTR and low hapax share; natural prose runs
    * high). All ratios are ppm FLOOR DIVISIONS of exact counts — no
    * float anywhere, so both engines agree bit-for-bit.
    *
    * Shape: two explode → hash-aggregate chains (per-term counts, then
    * per-source reductions) + one tiny join of the two per-source
    * frames. Only (source, term) counts cross a shuffle — at 100 TB the
    * text never leaves the scan stage.
    */
  def qTextDiversity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val uni = docs
      .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val big = docs
      .select(col("source"), split(col("text"), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(
        TextAnalysis.wordNgramsFromTokens(col("t"), 2)).as("bg"))
      .groupBy(col("source"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
    uni.join(big, "source")
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        col("n_hapax"),
        expr("(1000000 * n_distinct) div n_tokens").as("ttr_ppm"),
        expr("(1000000 * n_hapax) div n_tokens").as("hapax_ppm"),
        col("n_bigrams"), col("n_distinct_bigrams"),
        expr("(1000000 * n_distinct_bigrams) div n_bigrams")
          .as("bigram_ttr_ppm"))
      .orderBy(col("source"))
  }

  /** PER-DOCUMENT N-GRAM NOVELTY — the "how much does each document add
    * to the corpus" curve used to spot template/boilerplate sources and
    * to order curriculum dedup passes: a document's distinct 8-grams
    * are NOVEL iff their corpus-wide first occurrence (min doc_id) is
    * this document. One shuffle on the gram (the scrub_global cost
    * class: a per-gram min window, never a pairwise stage), then a
    * per-doc reduction; novelty as an exact ppm floor division. Output
    * sampled to every 23rd document AFTER the corpus-wide pass — the
    * sample bounds the gate rows, not the computation.
    */
  def qTextNovelty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dg = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(
        TextAnalysis.wordNgramsFromTokens(col("t"), 8)).as("g"))
      .distinct()
    dg.withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy(col("g"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .filter(col("doc_id") % 23 === 0)
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("(1000000 * n_novel) div n_grams").as("novelty_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprints: md5 (oracle-checked) per document. */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
      .orderBy(col("doc_id"))

  /** Token-frequency head: top-30 tokens with doc frequency. */
  /** GOOD–TURING frequency smoothing (Good 1953; the foundation of
    * Katz-smoothed LMs) over the corpus unigram counts: the
    * count-of-counts table N_r (how many distinct tokens occur exactly
    * r times), the smoothed count r* = (r+1)·N_{r+1}/N_r, and the
    * unseen-mass estimate p₀ = N₁/N. Simple GT (no Gale
    * log-regression fill — absent N_{r+1} reports NULL, the honest
    * raw-estimator gap the regression variant would interpolate).
    *
    * Exactness: r* rides as the exact integer pair (num, den) =
    * ((r+1)·N_{r+1}, N_r) with ONE correctly-rounded double division —
    * bit-identical cross-engine; p₀ likewise (N₁, N).
    *
    * Scale: the corpus reduces through the token-count aggregate; the
    * count-of-counts table is O(√N) rows (Σ r·N_r = N bounds distinct
    * r values), so the r+1 self-join and the one-row total broadcast
    * are dimension-bounded.
    */
  def qTextGoodTuring(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("r"))
    val coc = counts.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val nxt = coc.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
    val tot = coc.agg(sum(col("r") * col("n_r")).as("n_total"),
      sum(when(col("r") === 1, col("n_r"))).as("n1"))
    coc.join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        ((col("r") + 1) * col("n_next")).as("r_star_num"),
        col("n_r").as("r_star_den"),
        (((col("r") + 1) * col("n_next")).cast("double")
          / col("n_r")).as("r_star"),
        col("n1").as("p0_num"), col("n_total").as("p0_den"),
        (col("n1").cast("double") / col("n_total")).as("p0"))
      .orderBy(col("r"))
  }

  def qTextTokenFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(30)

  /** YULE'S CHARACTERISTIC K (Yule 1944) — the length-invariant
    * lexical-repetitiveness constant: K = 10⁴·(Σf² − N)/N² over the
    * corpus token-frequency spectrum (equivalently Σm²V_m with V_m =
    * types of frequency m). Complements Heaps (vocabulary growth) and
    * TTR/burstiness (per-doc) with the corpus-level constant quality
    * pipelines use because, unlike TTR, K does not drift with corpus
    * size. Exact integer num/den (Σf² ≤ ~10¹² at sf0.1; decimal route
    * documented for web scale) + one identical division.
    *
    * Scale: token explode → one map-side-combined frequency aggregate
    * → a 3-sum reduce. Same whitespace tokenization as
    * [[qTextTokenFreq]].
    */
  def qTextYuleK(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .agg(sum(col("f")).as("n"), count(lit(1)).as("v"),
        sum(col("f") * col("f")).as("s2"))
      .select(col("n"), col("v"),
        (lit(10000L) * (col("s2") - col("n"))).as("num"),
        (col("n") * col("n")).as("den"))
      .select(col("n"), col("v"), col("num"), col("den"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("k_r6"))

  /** Duplicate-n-gram repetition ratios (2- and 3-grams) — the Gopher-
    * style boilerplate/degenerate-text gate. Ratios are divisions of two
    * exact integers, so no rounding is needed for the oracle.
    */
  def qTextRepetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsPar(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .select(col("doc_id"),
        TextAnalysis.duplicateNgramRatio(col("t"), 2).as("dup2"),
        TextAnalysis.duplicateNgramRatio(col("t"), 3).as("dup3"))
      .orderBy(col("doc_id"))

  /** BM25 retrieval: top-20 documents for a fixed bag-of-words query.
    * Default k1=1.25 / b=0.75 are binary-exact doubles, so Spark and the
    * oracle compute bit-identical arithmetic everywhere except `ln`
    * (absorbed by round-6; see TextAnalysis.bm25). Ordered by the
    * ROUNDED score so the two engines agree on the top-k boundary.
    */
  val bm25Terms = Seq("vector", "hash", "stream")
  def qTextBm25(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(Tables.documents(spark, dir), "doc_id", "text",
        bm25Terms)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  /** Hybrid retrieval fusion (Cormack, Clarke & Büttcher, SIGIR'09 —
    * Reciprocal Rank Fusion, the standard lexical+dense combiner in
    * retrieval stacks): the BM25 top-20 for the fixed term query and
    * the dense cosine top-20 for query vector 0 fuse as
    * Σ 1/(60 + rank); a doc on only one list contributes only that
    * term. RRF consumes RANKS, not scores, so the fused score is exact
    * integer arithmetic — published 1e12-scaled via floor division,
    * zero float drift across engines.
    *
    * Scale shape: each leg is its own already-scale-shaped pipeline
    * (BM25: one token shuffle + broadcast stats; dense: broadcast
    * 1-query scoring); the fusion itself joins two 20-row frames.
    */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lexTop = TextAnalysis.bm25(Tables.documents(spark, dir),
        "doc_id", "text", bm25Terms)
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("r_lex"))
    val emb = Tables.embeddings(spark, dir)
    val dense = graft.ops.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", 20)
      .select(col("neighbor_id").as("id"),
        col("rank").cast("long").as("r_dense"))
    lexTop.join(dense, Seq("id"), "full_outer")
      .select(col("id"), col("r_lex"), col("r_dense"),
        (coalesce(expr("1000000000000 div (60 + r_lex)"), lit(0L))
          + coalesce(expr("1000000000000 div (60 + r_dense)"), lit(0L)))
          .as("rrf_e12"))
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf_e12").desc, col("id"))).cast("long"))
      .orderBy(col("fused_rank"))
  }

  /** Perplexity-proxy quality score: mean token log-prob under the
    * corpus's own add-one unigram model.
    */
  def qTextUnigramLp(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Bigram Stupid-Backoff perplexity scoring (Brants et al. 2007) —
    * the CCNet-style LM quality signal: the model is bigram+unigram
    * count tables from the even-doc_id half (the stand-in trusted
    * reference corpus), every document scores its mean log-score and
    * perplexity against it. Odd docs exercise the backoff path on
    * their unseen bigrams; the α=0.4 backoff weight and add-1 unigram
    * floor make every token scoreable (OOV included).
    */
  def qTextBigramLm(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.stupidBackoffScore(Tables.documents(spark, dir),
        "doc_id", "text", trainPred = col("doc_id") % 2 === 0)
      .orderBy(col("doc_id"))

  /** INTERPOLATED KNESER–NEY bigram smoothing (Kneser & Ney, ICASSP
    * 1995; the Chen–Goodman 1999 interpolated form) — the LM-smoothing
    * complement of [[qTextGoodTuring]] (count-of-counts) and the
    * Stupid-Backoff scorer (which skips discounting entirely for
    * scale):
    *
    *   P_KN(w2|w1) = (c(w1,w2) − D)/c(w1·)
    *               + D·N1+(w1·)/c(w1·) · N1+(·w2)/B
    *
    * with continuation counts N1+ (distinct-neighbor counts — the
    * insight that "Francisco" is frequent but only ever follows "San")
    * and B = distinct bigram types. D = 3/4 — Chen–Goodman's fitted
    * discounts land near 0.75, and the exact DYADIC value keeps every
    * probability a ratio of integers: with ×4 clearing, p =
    * ((4c₁₂−3)·B + 3·N1f·N1p) / (4·c₁·B), published as exact (num,
    * den) plus ONE correctly-rounded division. Seen bigrams have
    * c₁₂ ≥ 1 > D, so the max(·,0) clamp never binds on the reported
    * rows. Top-30 by (c₁₂ desc, w1, w2) — a total order, so the cut is
    * deterministic.
    *
    * Scale: three count aggregates and two dimension-bounded joins on
    * w1/w2; the one-row B total broadcasts. The per-doc bigram window
    * is partitioned by doc — no global window anywhere.
    */
  def qTextKneserNey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(
        expr("filter(split(text, '\\\\s+'), t -> t <> '')"))
        .as(Seq("pos", "w")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val big = toks.withColumn("w2", lead(col("w"), 1).over(wd))
      .filter(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
    val c12 = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val n1f = c12.groupBy(col("w1")).agg(count(lit(1)).as("n1f"))
    val n1p = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1p"))
    val btot = c12.agg(count(lit(1)).as("btypes"))
    c12.join(c1, "w1").join(n1f, "w1").join(n1p, "w2")
      .crossJoin(broadcast(btot))
      .withColumn("p_num",
        (lit(4L) * col("c12") - 3L) * col("btypes")
          + lit(3L) * col("n1f") * col("n1p"))
      .withColumn("p_den", lit(4L) * col("c1") * col("btypes"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1f"), col("n1p"), col("p_num"), col("p_den"),
        (col("p_num").cast("double") / col("p_den")).as("p_kn"))
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(30)
  }

  /** PII redaction over text with deterministically-injected email +
    * phone strings (the raw fixture text has neither, which would make
    * the scrub vacuous — the injection is computed identically by both
    * engines, so the redaction itself is what the oracle verifies).
    */
  def qTextRedact(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"), lit(" Contact user"),
      col("doc_id").cast("string"), lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now."))
    Tables.documents(spark, dir)
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(TextAnalysis.emailRe)).cast("long")
          .as("n_emails"),
        regexp_count(col("aug"), lit(TextAnalysis.phoneRe)).cast("long")
          .as("n_phones"),
        TextAnalysis.redactPii(col("aug")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** CREDIT-CARD (PAN) redaction with LUHN VALIDATION — the PII scrub
    * pass regex alone gets wrong: a 13–19 digit run is only a payment
    * card if its Luhn checksum (ISO/IEC 7812 mod-10) holds, and
    * redacting every long digit run destroys invoice/order numbers. The
    * fixture text carries no card numbers, so two are injected
    * deterministically per doc (both engines compute the same strings):
    * one VALID — 15 doc-id-derived digits plus the COMPUTED Luhn check
    * digit — and one INVALID (same digits, check digit +1 mod 10). The
    * operator must redact exactly the valid one.
    *
    * Whitespace-token candidates (no lookarounds — portable to RE2
    * twins), pure-digit tokens of 13–19 chars, checksum as an integer
    * fold over the reversed digits (double every second, subtract 9
    * past 9). Everything is map-side integer arithmetic in one
    * projection — no shuffle at any corpus scale.
    */
  def qTextRedactCc(spark: SparkSession, dir: String): DataFrame = {
    // 15 payload digits: '4' + zero-padded doc-id-derived body
    val body = concat(lit("4"),
      lpad((col("doc_id") * 7919 % 100000000L).cast("string"), 8, "0"),
      lit("990001"))
    val aug = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), body.as("payload"))
      // check digit: payload digits double at odd positions from the
      // right (they shift left once the check digit is appended)
      .withColumn("chk", expr(
        """(10 - aggregate(sequence(1, length(payload)), 0, (acc, i) ->
          |  acc + CASE WHEN i % 2 = 1 THEN
          |    CASE WHEN 2 * (ascii(substring(reverse(payload), i, 1)) - 48) > 9
          |      THEN 2 * (ascii(substring(reverse(payload), i, 1)) - 48) - 9
          |      ELSE 2 * (ascii(substring(reverse(payload), i, 1)) - 48) END
          |    ELSE ascii(substring(reverse(payload), i, 1)) - 48 END)
          |  % 10) % 10""".stripMargin))
      .withColumn("aug", concat(col("text"), lit(" pay "),
        col("payload"), col("chk").cast("string"),
        lit(" ref "), col("payload"),
        ((col("chk") + 1) % 10).cast("string"), lit(" now")))
    aug
      .select(col("doc_id"), expr(
        """transform(split(aug, ' '), t ->
          |  CASE WHEN t RLIKE '^[0-9]{13,19}$' AND
          |    aggregate(sequence(1, length(t)), 0, (acc, i) -> acc +
          |      CASE WHEN i % 2 = 0 THEN
          |        CASE WHEN 2 * (ascii(substring(reverse(t), i, 1)) - 48) > 9
          |          THEN 2 * (ascii(substring(reverse(t), i, 1)) - 48) - 9
          |          ELSE 2 * (ascii(substring(reverse(t), i, 1)) - 48) END
          |        ELSE ascii(substring(reverse(t), i, 1)) - 48 END) % 10 = 0
          |  THEN '<CC>' ELSE t END)""".stripMargin).as("toks"))
      .select(col("doc_id"),
        expr("size(filter(toks, t -> t = '<CC>'))").cast("long")
          .as("n_cards"),
        expr("md5(array_join(toks, ' '))").as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf·ln(N/df), ties broken by term. Shuffle ledger: one (doc,term)
    * aggregate over the token stream, a term-level reduction of that
    * (already-small) table, a broadcast-able re-join on term, and the
    * per-doc top-k window — documents themselves never shuffle. Scores
    * rounded to 6 dp (ln drift) and ORDERED BY the rounded score so
    * both engines agree on the top-3 boundary.
    */
  def qTextTfidf(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(dft, "tok").crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("n").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("tok"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Overlapping document chunking (size 200, overlap 50) — the RAG/
    * context-window splitter. Emits length + md5 per chunk (full chunk
    * text would bloat the compare; the md5 pins content exactly).
    */
  def qTextChunk(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(Tables.documents(spark, dir), "doc_id", "text",
        size = 200, overlap = 50)
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** CHUNK-level exact dedup (the CCNet/RefinedWeb paragraph-dedup
    * pass, with fixed 25-word chunks standing in for paragraphs on this
    * fixture's flat word streams): every chunk keeps its single GLOBAL
    * FIRST occurrence — the minimal (doc_id, idx) among all occurrences
    * of its hash — and every later copy is dropped, corpus-wide, in ONE
    * pass. Complements the pairwise span scrub: no candidate pairs, no
    * thresholds; boilerplate shared by thousands of docs costs one
    * hash-group, not Σ df² join rows.
    *
    * Scale: chunk hashing is map-side (60-bit md5 prefix — shuffles
    * carry (hash, doc, idx) longs, never chunk text); the winner per
    * hash is one hash aggregate; survivorship is an equi-join back on
    * the hash; the rebuild groups each doc's kept chunks. Output
    * md5-certifies the rebuilt text so the cross-engine compare stays
    * row-sized.
    */
  def qTextChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = 25
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(t) / $w.0) as int) - 1)," +
          s" i -> array_join(slice(t, i * $w + 1, $w), ' '))"))
        .as(Seq("idx", "chunk")))
      .withColumn("h",
        conv(substring(md5(col("chunk")), 1, 15), 16, 10).cast("long"))
    val first = chunks.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
    val kept = chunks.join(first, "h")
      .filter(col("doc_id") === col("f.doc_id") &&
        col("idx") === col("f.idx"))
    val tot = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    val agg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept0"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("chunk")))),
          x => x.getField("chunk")), " ")).as("md50"))
    tot.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("kept0"), lit(0L)).as("n_kept"),
        coalesce(col("md50"), md5(lit(""))).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  /** CONTENT-DEFINED chunk dedup (the LBFS cut-point scheme,
    * Muthitacharoen et al. SOSP'01): a chunk boundary falls after
    * position i exactly when the hash of the 8-char window ending at i
    * satisfies H % 32 == 0 — so boundaries move WITH the content, and
    * an insertion near a doc's head re-synchronizes within one window
    * instead of shifting every later chunk the way q_text_chunk_dedup's
    * fixed-width grid does (re-sync pinned in CdcDedupSpec). Chunks are
    * then exact-deduped keep-first on their md5, same as the fixed
    * variant.
    *
    * The window hash is the portable rolling family
    * ([[graft.functions.RollingHash]]): the native expression emits all
    * window hashes in one fused O(len) loop (previously one md5 PLUS an
    * O(i) UTF8String substring seek per position — quadratic in doc
    * length), and the twin replays the identical integer recurrence
    * with a list_reduce fold. No min/max chunk clamps: the pure
    * window-mod rule keeps every boundary decision LOCAL (FastCDC's
    * normalization adds a sequential dependence), so chunking is
    * embarrassingly parallel — at 100 TB both cutting and hashing are
    * map-side; the only shuffle is the chunk-hash group, carrying
    * digests, never text.
    */
  def qTextCdcDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (w, d) = (8, 32)
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      // a boundary falls after position i (i ≥ w) iff the hash of the
      // window at start ix = i−w+1 — 0-based array index i−w — is
      // ≡ 0 mod d; the hash array is empty for sub-window docs, so no
      // explicit length guard is needed
      .withColumn("cuts", expr(
        s"""array_sort(array_distinct(concat(array(0),
           |  filter(transform(rolling_gram_hash(text, $w),
           |    (h, ix) -> CASE WHEN h % $d = 0 THEN ix + $w
           |               ELSE -1 END), x -> x >= 0),
           |  array(length(text)))))""".stripMargin))
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(cuts) < 2 THEN CAST(array() AS array<string>)
          |ELSE transform(sequence(1, size(cuts) - 1),
          |  j -> substring(text, element_at(cuts, j) + 1,
          |    element_at(cuts, j + 1) - element_at(cuts, j))) END"""
          .stripMargin)).as(Seq("idx", "chunk")))
      .withColumn("k", col("doc_id") * lit(1000000L) + col("idx"))
      .withColumn("h", md5(col("chunk")))
    val first = chunks.groupBy(col("h")).agg(min(col("k")).as("fk"))
    chunks.join(first, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count_if(col("k") === col("fk")).as("n_kept"),
        sum(when(col("k") =!= col("fk"), length(col("chunk")))
          .otherwise(0)).as("dup_chars"))
      .orderBy(col("doc_id"))
  }

  /** WordPiece pieces shared by the query and its twin: single-letter
    * starts, a handful of multi-char roots, and ##-continuations
    * (Schuster & Nakajima 2012 / Devlin et al. 2019 conventions). */
  private[queries] val wordpieceVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++
      Seq("the", "scan", "sort", "cus", "qu", "jo", "ha", "fil") ++
      ('a' to 'z').map(c => s"##$c") ++
      Seq("##tomer", "##ery", "##in", "##sh", "##ter")

  /** Greedy longest-match-first WordPiece segmentation of one word —
    * plain JVM on purpose: this runs on the DISTINCT-WORD table (tiny
    * by construction), and the equivalent higher-order-function fold
    * was measured to spend ~10 s per run recompiling its generated
    * code (fresh expression ids defeat the Janino source cache), three
    * orders of magnitude more than the actual work. */
  private[queries] def wordpieceSegment(w: String): Seq[String] = {
    val vocab = wordpieceVocab.toSet
    val out = scala.collection.mutable.Buffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val prefix = if (pos == 0) "" else "##"
      var l = math.min(6, w.length - pos)
      while (l > 0 && !vocab.contains(prefix + w.substring(pos, pos + l)))
        l -= 1
      if (l == 0) return Seq("[UNK]")
      out += prefix + w.substring(pos, pos + l)
      pos += l
    }
    out.toSeq
  }

  /** WordPiece tokenization (greedy longest-match-first with ##
    * continuation pieces) — the second tokenizer family next to the
    * BPE battery, applied corpus-wide and reported as the global piece
    * distribution. A word with an unmatchable position collapses to
    * [UNK] wholesale (the standard rule — partial pieces are
    * discarded).
    *
    * Scale shape — the part that matters at 100 TB: segmentation runs
    * once per DISTINCT word over the token-count table (one corpus
    * shuffle), never per occurrence; piece counts then weight by word
    * frequency in a second tiny aggregate. The matcher is a typed map
    * over that distinct-word table (see [[wordpieceSegment]] for why
    * not an expression fold); the corpus-scale stages stay fully
    * declarative.
    */
  def qTextWordpiece(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tokc = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    tokc.as[(String, Long)]
      .flatMap { case (w, c) => wordpieceSegment(w).map((_, c)) }
      .toDF("piece", "c")
      .groupBy(col("piece")).agg(sum(col("c")).as("n"))
      .orderBy(col("piece"))
  }

  /** UNIGRAM-LM TOKENIZER (Kudo, ACL'18 — the SentencePiece unigram
    * model), the THIRD tokenizer family next to BPE and WordPiece:
    * Viterbi-optimal segmentation of every distinct word under a piece
    * vocabulary scored by corpus log-frequency. Vocabulary = all
    * single characters (coverage guarantee) plus the top-200 substrings
    * of length 2–4 by corpus-weighted occurrence count; piece score =
    * floor(10⁶·ln(cnt/total)) — an INTEGER, so the DP sums and argmax
    * are exact cross-engine (the one ln per piece is the identical
    * IEEE op on identical integers in both engines, the q_stat_psi
    * doctrine). Viterbi: best(j) = max over last-piece lengths 1..4 of
    * best(i) + score(w[i+1..j]), ties → longest last piece (smallest
    * i) — pinned in both engines (strict-improvement ascending scan
    * here, ORDER BY tot DESC, i ASC in the twin's unrolled DP CTEs).
    *
    * Scale: counting is corpus-wide but the DP runs on the DISTINCT
    * word table (the q_text_wordpiece lesson — typed map, no
    * per-occurrence work); the vocabulary collect is bounded by
    * construction (≤ 200 + alphabet — the BPE-trainer bounded-collect
    * class) and broadcasts as a plain map.
    */
  def qTextUnigramTok(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxW = 16 // explicit word-length cap, mirrored by the twin's DP depth
    val tokc = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxW)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pieceCnts = tokc.as[(String, Long)].flatMap { case (w, c) =>
      for { i <- 0 until w.length; l <- 1 to 4 if i + l <= w.length }
        yield (w.substring(i, i + l), c)
    }.toDF("p", "c").groupBy(col("p")).agg(sum(col("c")).as("cnt"))
    val vocabDf = pieceCnts.filter(length(col("p")) === 1)
      .unionByName(pieceCnts.filter(length(col("p")) > 1)
        .orderBy(col("cnt").desc, col("p")).limit(200))
    val vocab = vocabDf.as[(String, Long)].collect().toMap
    val total = vocab.values.sum
    val score: Map[String, Long] = vocab.map { case (p, cnt) =>
      p -> math.floor(math.log(cnt.toDouble / total) * 1e6).toLong }
    val bScore = spark.sparkContext.broadcast(score)
    tokc.as[(String, Long)].map { case (w, c) =>
      val sc = bScore.value
      val n = w.length
      val NEG = Long.MinValue / 4
      val best = Array.fill(n + 1)(NEG)
      val seg = Array.fill(n + 1)("")
      val np = Array.fill(n + 1)(0L)
      best(0) = 0L
      var j = 1
      while (j <= n) {
        var i = math.max(0, j - 4)
        while (i < j) { // ascending i + strict > ⇒ smallest i wins ties
          if (best(i) != NEG) {
            val p = w.substring(i, j)
            sc.get(p).foreach { s =>
              val tot = best(i) + s
              if (tot > best(j)) {
                best(j) = tot
                seg(j) = if (seg(i).isEmpty) p else seg(i) + "|" + p
                np(j) = np(i) + 1
              }
            }
          }
          i += 1
        }
        j += 1
      }
      (w, c, seg(n), np(n), best(n))
    }.toDF("w", "c", "segmentation", "n_pieces", "score_total")
      .orderBy(col("w"))
  }

  /** Twin of [[qTextUnigramTok]]: the Viterbi DP unrolled as one CTE
    * pair (candidates → per-position argmax) per character position —
    * the generated-CTE pattern of the BPE twin. */
  private def unigramTokOracleSql: String = {
    val maxW = 16
    val jCtes = (1 to maxW).map { j =>
      val prevs = (math.max(0, j - 4) until j)
        .map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")
      s"""c$j AS (SELECT b.w, b.c, $j AS j, b.tot + sc.s AS tot,
         |    CASE WHEN b.seg = '' THEN sc.p
         |      ELSE b.seg || '|' || sc.p END AS seg,
         |    b.np + 1 AS np, b.j AS i
         |  FROM ($prevs) b JOIN sc
         |    ON length(b.w) >= $j
         |   AND sc.p = substring(b.w, CAST(b.j + 1 AS INT), $j - b.j)),
         |b$j AS MATERIALIZED (SELECT w, c, j, tot, seg, np FROM (
         |    SELECT *, row_number() OVER (PARTITION BY w
         |      ORDER BY tot DESC, i ASC) AS rn FROM c$j)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH u AS (SELECT unnest(string_split_regex(text, '\\s+')) AS w
       |  FROM documents),
       |tokc AS MATERIALIZED (SELECT w, count(*) AS c FROM u
       |  WHERE w <> '' AND length(w) <= $maxW GROUP BY w),
       |cand AS (SELECT substring(w, CAST(i AS INT), CAST(l AS INT))
       |    AS p, c
       |  FROM tokc,
       |    (SELECT unnest(generate_series(1, $maxW)) AS i),
       |    (SELECT unnest(generate_series(1, 4)) AS l)
       |  WHERE i + l - 1 <= length(w)),
       |cnts AS (SELECT p, CAST(SUM(c) AS BIGINT) AS cnt
       |  FROM cand GROUP BY p),
       |vocab AS (SELECT p, cnt FROM cnts WHERE length(p) = 1
       |  UNION ALL
       |  SELECT p, cnt FROM (SELECT p, cnt FROM cnts
       |    WHERE length(p) > 1 ORDER BY cnt DESC, p LIMIT 200)),
       |tot0 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vocab),
       |sc AS MATERIALIZED (SELECT p, CAST(floor(ln(CAST(cnt AS DOUBLE)
       |    / t) * 1000000) AS BIGINT) AS s FROM vocab, tot0),
       |b0 AS MATERIALIZED (SELECT w, c, 0 AS j, CAST(0 AS BIGINT)
       |    AS tot, '' AS seg, CAST(0 AS BIGINT) AS np FROM tokc),
       |$jCtes,
       |allb AS (${(1 to maxW).map(j => s"SELECT * FROM b$j")
         .mkString(" UNION ALL ")})
       |SELECT w, c, seg AS segmentation, np AS n_pieces,
       |  tot AS score_total
       |FROM allb WHERE j = length(w)
       |ORDER BY w""".stripMargin
  }

  /** POSTINGS-LIST COMPRESSION SIZING — the index-storage planning
    * pass behind every inverted index (Manning et al. IIR §5:
    * gap + variable-byte encoding): per token, the sorted posting list
    * becomes doc-id GAPS (first gap encodes from −1 so absolute ids
    * need no special case) and each gap costs ⌈bits(gap)/7⌉
    * variable-byte bytes, with bits(gap) = length of the minimal
    * binary string — integer-exact in both engines via bin(). Reports
    * the top-30 tokens by document frequency with varint vs raw
    * (8 B/id) bytes and savings ppm — the "should we compress, and
    * what does the index cost" answer.
    *
    * Scale: distinct (token, doc) reduction + one per-token window
    * (state = one token's postings) + one aggregate; arithmetic is
    * map-side.
    */
  def qTextPostingsSize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pl = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    val w = Window.partitionBy(col("tok")).orderBy(col("doc_id"))
    pl.withColumn("gap", col("doc_id") -
        coalesce(lag(col("doc_id"), 1).over(w), lit(-1L)))
      .withColumn("vb", expr("(length(bin(gap)) + 6) div 7"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("vb")).as("varint_bytes"))
      .withColumn("raw_bytes", col("df") * 8)
      .withColumn("savings_ppm", expr(
        "(raw_bytes - varint_bytes) * 1000000 div raw_bytes"))
      .orderBy(col("df").desc, col("tok"))
      .limit(30)
  }

  /** MULTI-PATTERN SUBSTRING SCAN via Aho–Corasick
    * ([[graft.ops.TextScan]]) — the substring-dictionary counterpart
    * of the word-level blocklist gate: all four patterns match in ONE
    * O(len) pass per document regardless of dictionary size. The
    * pattern set (ha / sh / has / ash) nests inside the corpus-common
    * token "hash", so one token fires all four outputs — two of them
    * ending at the same position — through the automaton's fail-chain
    * output links — the machinery a naive
    * per-pattern scan only reproduces at |dictionary|× the cost.
    *
    * Oracle note: the twin counts per pattern with the
    * length-difference replace trick, which equals the automaton's
    * every-occurrence count exactly when no pattern can overlap
    * ITSELF — true for all four (none has a border); self-overlapping
    * patterns (e.g. "aa") are pinned against brute force in
    * TextScanSpec instead.
    */
  def qTextMultiscan(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextScan.multiPatternCounts(
        Tables.documents(spark, dir), "doc_id", "text",
        Seq("ha", "sh", "has", "ash"))
      .orderBy(col("doc_id"), col("pattern"))

  /** COLLOCATION EXTRACTION by pointwise mutual information (Church &
    * Hanks 1990) — the classic "which word pairs belong together"
    * statistic: PMI(x,y) = ln(p(x,y) / (p(x)·p(y))) over adjacent
    * token bigrams, reported for pairs seen ≥ 5 times, top-30 by
    * (rounded) PMI. The ratio is assembled from EXACT integer counts
    * in one pinned double expression — c_xy·N_u·N_u / (N_b·c_x·c_y) —
    * so both engines evaluate identical IEEE ops on identical integers
    * (products past 2⁵³ round, but identically; the overflow-free form
    * for petabyte token counts is ln c_xy + 2 ln N_u − ln N_b −
    * ln c_x − ln c_y, at the cost of five ln calls).
    *
    * Scale: bigrams build MAP-SIDE from each doc's token array (no
    * lag-window shuffle — the q_text_bigram_lm discipline); one count
    * aggregate per arity; the unigram re-attach joins the (already
    * tiny) thresholded bigram table; top-30 is TakeOrdered.
    */
  def qTextPmi(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(split(col("text"), "\\s+").as("ts"))
      .select(expr("filter(ts, t -> t <> '')").as("ts"))
    val uni = toks.select(explode(col("ts")).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("cx"))
    val bi = toks.select(explode(expr(
        "transform(sequence(1, size(ts) - 1)," +
          " i -> struct(element_at(ts, i) AS x," +
          " element_at(ts, i + 1) AS y))")).as("b"))
      .groupBy(col("b.x").as("x"), col("b.y").as("y"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
    val nu = uni.agg(sum(col("cx")).as("n_u"))
    val nb = toks.agg(sum(expr("size(ts) - 1")).as("n_b"))
    bi.join(uni, "x")
      .join(uni.select(col("x").as("y"), col("cx").as("cy")), "y")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("x"), col("y"), col("cxy"),
        round(log(col("cxy").cast("double") * col("n_u") * col("n_u") /
          (col("n_b").cast("double") * col("cx") * col("cy"))), 6)
          .as("pmi_r6"))
      .orderBy(col("pmi_r6").desc, col("x"), col("y"))
      .limit(30)
  }

  /** Composite Gopher-style quality gate: per-rule verdicts + overall
    * pass. Thresholds chosen to split the fixture non-vacuously (at
    * sf0.01: 457/500 pass length, 493/500 mean-length, 388/500
    * stopwords, 379/500 pass all).
    */
  def qTextQualityGate(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityGate(Tables.documents(spark, dir), "text")
      .select(col("doc_id"), col("n_tokens"), col("n_nonspace"),
        col("n_stopwords"), col("ok_length"), col("ok_mean_len"),
        col("ok_stopwords"), col("pass"))
      .orderBy(col("doc_id"))

  /** Heavy-hitter character trigrams by the two-pass mergeable-sketch
    * pattern: (1) one Misra-Gries aggregate finds a ≤ k candidate
    * superset of every trigram with frequency > n/(k+1) — only k
    * counters per partition cross the shuffle, never the full gram
    * space; (2) the candidates (a ≤ k-string literal, broadcast-sized —
    * the single-row `.head()` here is the same corpus-stats class as
    * `Profile.profile`) are recounted EXACTLY with a filtered map-side
    * aggregate. The recount makes the output deterministic — exactly
    * {gram : freq > n/(k+1)} under any partitioning (spec-pinned) — so
    * a plain GROUP BY twin can oracle a sketch-based plan. The gram
    * stream is rescanned rather than persisted: at 100 TB the second
    * pass is a map-side filtered count, cheaper than materializing a
    * trillion-row gram table.
    */
  def qTextHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val k = 100
    def grams = Tables.documentsPar(spark, dir)
      .select(lower(col("text")).as("t"))
      .select(col("t"),
        explode(when(length(col("t")) >= 3,
          sequence(lit(1), length(col("t")) - 2))).as("p"))
      .select(col("t").substr(col("p"), lit(3)).as("gram"))
    val mg = new graft.functions.MisraGriesAgg(k).asUdaf
    val row = grams.agg(mg(col("gram")).as("cands"),
      count(lit(1)).as("n")).head()
    val cands = row.getSeq[String](0)
    val n = row.getLong(1)
    grams.filter(col("gram").isin(cands: _*))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
      .orderBy(col("cnt").desc, col("gram"))
  }

  /** GROUPED heavy hitters: per-source frequent tokens via one
    * Misra-Gries sketch PER GROUP (the udaf's mergeable ≤k-counter
    * state crosses the shuffle per source), then a JOIN-based exact
    * recount — unlike the global variant there is no driver collect of
    * candidates: the candidate set re-attaches by equi-join, so the
    * plan is fully distributed at any group count. Output = every
    * (source, token) with freq > n_source/(k+1) — the sketch's
    * superset guarantee makes that an exact frequency filter, which is
    * what the plain GROUP BY twin certifies.
    */
  def qTextHeavyHittersGrouped(spark: SparkSession, dir: String)
      : DataFrame = {
    val k = 50
    def toks = Tables.documents(spark, dir)
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val mg = new graft.functions.MisraGriesAgg(k).asUdaf
    val cands = toks.groupBy(col("source"))
      .agg(mg(col("tok")).as("cands"), count(lit(1)).as("n"))
    val candRows = cands.select(col("source"),
      explode(col("cands")).as("tok"), col("n"))
    toks.join(candRows, Seq("source", "tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"), min(col("n")).as("n"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .orderBy(col("source"), col("cnt").desc, col("tok"))
  }

  /** Multi-round BPE TRAINER (Sennrich et al., ACL'16): N greedy merge
    * rounds, each = count adjacent segment pairs → take the single most
    * frequent (ties broken lexicographically on both engines) → greedy
    * left-to-right re-segmentation by an ordered fold. Segments are
    * kept as a '|'-joined string per token (identical representation to
    * the DuckDB twin, which replays every round with list_reduce), so
    * cross-engine behavior matches fold-step for fold-step. The learned
    * merge table (round, pair, frequency-at-learn-time) is the
    * tokenizer-training artifact.
    *
    * Scale shape per round: one map-side explode + hash agg for pair
    * counts, a 1-row broadcast of the learned merge, and a map-side
    * fold for re-segmentation — no shuffle grows with rounds, and the
    * corpus is never collected. Tokens containing the separator are
    * excluded on both engines (defensive; segment strings must not
    * contain '|').
    */
  def qTextBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeRounds(spark, dir, 5)._1

  /** Tokenizer APPLICATION: segment the corpus with the 5 learned
    * merges (the production tokenize step after qTextBpeTrain) and
    * publish the resulting vocabulary head — final-segment frequencies
    * top-30. Same per-round plan; one extra map-side explode + hash
    * aggregate past the last merge.
    */
  def qTextBpeApply(spark: SparkSession, dir: String): DataFrame =
    bpeRounds(spark, dir, 5)._2
      .select(explode(split(col("s"), "[|]")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(30)

  /** Multi-round BPE trainer core. Per round: one map-side
    * adjacent-pair count (a string-keyed explode + hash aggregate),
    * top-1 selection as a BOUNDED 1-row driver collect (same contract
    * as the heavy-hitter ≤k collect — it also truncates plan lineage:
    * an in-plan `top` nests the whole counts chain into every later
    * round and planning alone grows exponentially with rounds), then
    * greedy re-segmentation of ONLY the tokens containing the literal
    * `pa|pb` substring (a mergeable occurrence is exactly segment pa
    * followed by segment pb, so the containment guard is exact —
    * non-matching tokens pass through the fold unchanged and skip it).
    *
    * Scale note: an incremental-delta trainer (full pair count once,
    * then ±deltas from changed tokens only) also exists
    * (`q_text_bpe_train_delta`). Measured sf0.1 costs are strongly
    * FIXTURE-dependent: on the pre-2026-08-13 documents fixture the
    * delta form was far slower (round-5 bench: 118.5 s vs 23.0 s for
    * this recount form) because early BPE merges hit a large fraction
    * of tokens — "changed" ≈ the corpus and the delta machinery is
    * pure overhead; on the regenerated fixture both are cheap
    * (round-6 bench: 8.2 s vs 6.0 s). The recount-per-round form also
    * matches the DuckDB twin structurally. At 100 TB with many rounds
    * (merges get rare as the vocab grows), the delta form wins — flip
    * when rounds ≫ 10.
    */
  private def bpeRounds(spark: SparkSession, dir: String, rounds: Int)
      : (DataFrame, DataFrame) = {
    // both outputs memoized per run: the second family member
    // (q_text_bpe_train vs q_text_bpe_apply) runs ZERO training jobs
    var computed: (DataFrame, DataFrame) = null
    def compute(): (DataFrame, DataFrame) = {
      if (computed == null) computed = bpeRoundsCompute(spark, dir, rounds)
      computed
    }
    val merged = graft.ops.CacheScope
      .memoized(s"bpe:merged:$dir:$rounds")(compute()._1)
    val segs = graft.ops.CacheScope
      .memoized(s"bpe:segs:$dir:$rounds")(compute()._2)
    (merged, segs)
  }

  /** Adjacent segment-pair counts (char(1)-separated `p`, count `n`)
    * over any round's segment table — the trainer's inner-loop
    * statistic. */
  private def bpePairsOf(df: DataFrame): DataFrame =
    df.select(split(col("s"), "[|]").as("l"))
      .filter(size(col("l")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(l) - 1)," +
          " i -> concat(element_at(l, i), char(1)," +
          " element_at(l, i + 1)))")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))

  /** Round-`round` pair-count table, memoized run-wide under the same
    * key family as the trainers' inner loop — q_text_bpe_pairs (round
    * 0) and q_text_bpe_merge2 (round 1) read the identical lineage the
    * trainers walk, so the whole BPE family computes each generation
    * once per run. */
  private def bpePairCounts(spark: SparkSession, dir: String,
      round: Int): DataFrame =
    graft.ops.CacheScope.memoized(s"bpe:pairs:$dir:$round") {
      val segs = if (round == 0) bpeBaseSegs(spark, dir)
                 else bpeRounds(spark, dir, round)._2
      bpePairsOf(segs)
    }

  private def bpeRoundsCompute(spark: SparkSession, dir: String,
      rounds: Int): (DataFrame, DataFrame) = {
    val sep = "" // can't appear between segments: filtered below
    // memoized per ROUND: merges are deterministic, so round r's
    // segment table is a pure function of (dir, r) — q_text_bpe_train
    // and q_text_bpe_apply (and the delta trainer's base) share every
    // generation within one harness run instead of re-training twice
    var segs = bpeBaseSegs(spark, dir)
    val merged = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val topRow = graft.ops.CacheScope
        .memoized(s"bpe:pairs:$dir:${r - 1}")(bpePairsOf(segs))
        .orderBy(col("n").desc, col("p")).limit(1)
        .collect()(0)
      val Array(pa, pb) = topRow.getString(0).split(sep, 2)
      merged += ((r, s"$pa+$pb", topRow.getLong(1)))
      val hit = col("s").contains(lit(s"$pa|$pb"))
      val prev = segs
      // (r16 note: a one-pass CASE projection replacing this
      // filter ∪ fold shape was measured and REVERTED — interleaved
      // A/B showed the union no slower, and the fold already runs
      // only on hit rows in both shapes.)
      segs = graft.ops.CacheScope.memoized(s"bpe:segs:$dir:$r") {
        prev.filter(!hit).unionByName(
          prev.filter(hit)
            .withColumn("pa", lit(pa)).withColumn("pb", lit(pb))
            .select(expr(
              """aggregate(
                |  slice(split(s, '[|]'), 2, size(split(s, '[|]')) - 1),
                |  cast(element_at(split(s, '[|]'), 1) as string),
                |  (acc, x) -> CASE
                |    WHEN x = pb AND (acc = pa OR endswith(acc, concat('|', pa)))
                |    THEN concat(acc, x)
                |    ELSE concat(acc, '|', x) END)""".stripMargin)
              .as("s")))
      }
    }
    import spark.implicits._
    (merged.result().toDF("round", "pair", "n"), segs)
  }

  /** Round-0 BPE segment table (one row per token, chars '|'-joined),
    * shared by both trainers via the run-wide memo. */
  private def bpeBaseSegs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.CacheScope.memoized(s"bpe:segs:$dir:0") {
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= "" && !col("tok").contains("|")
          && !col("tok").contains("\u0001"))
        .select(concat_ws("|", split(col("tok"), "")).as("s"))
    }

  /** CROSS-document duplicated n-gram coverage — the exact-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better" (2022), at word-5-gram granularity: for
    * each document, the fraction of its 5-gram positions whose gram
    * also occurs in at least one OTHER document. Pipelines drop or
    * trim documents above a threshold.
    *
    * Scale plan: grams are hashed to 60 bits (first 15 md5 hex digits —
    * the portable family of Dedup.portableHash32, widened so corpus-level
    * collision count stays ~0 at 10^10 grams) BEFORE any shuffle, so the
    * exchanges carry (doc_id, int64), never gram strings. Corpus doc-
    * frequency is one hash aggregate over the deduped (doc, gram) pairs;
    * re-attachment is an equi-join on the hash. No driver state, no
    * all-pairs anything.
    */
  def qTextDupSpans(spark: SparkSession, dir: String): DataFrame = {
    val w = 5
    def grams = Tables.documentsPar(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), explode(
        TextAnalysis.wordNgramsFromTokens(col("t"), w)).as("gram"))
      .select(col("doc_id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long")
          .as("g"))
    val perDoc = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val shared = grams.distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
    val dup = grams.join(shared, "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup0"))
    perDoc.join(dup, Seq("doc_id"), "left")
      .withColumn("n_dup", coalesce(col("dup0"), lit(0L)))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("n_dup * 1000000 div n_grams").as("dup_ppm"))
      .orderBy(col("doc_id"))
  }

  /** INCREMENTAL-DELTA BPE trainer for the many-round regime (the
    * measured crossover bpeRounds documents): instead of a full
    * pair-count scan per round, maintain the pair-count table and
    * update it with the count DELTA of only the segments containing
    * the merged pair — subtract their old pairs, add their re-folded
    * pairs. Early merges touch ~half the corpus (where the full rescan
    * wins); later merges touch a sliver, which is where real
    * tokenizer training (10k-100k merges) lives. Merges are identical
    * to the rescan trainer by construction, so the SAME replay oracle
    * certifies both. Both evolving tables are localCheckpoint'd each
    * round: caching alone reuses computed BLOCKS but not PLAN size —
    * segs_r references segs_{r-1} twice (filter + fold), so the
    * analyzed tree doubles per round and Catalyst analysis goes
    * exponential (measured: the 8-round plan pinned the driver for
    * minutes); the checkpoint cuts each round's plan to a leaf.
    */
  private def bpeRoundsDelta(spark: SparkSession, dir: String,
                             rounds: Int): DataFrame = {
    def pairsOf(df: DataFrame): DataFrame = bpePairsOf(df)
    var segs = bpeBaseSegs(spark, dir)
    // seed from the family's shared round-0 memo (same table the full
    // trainer and q_text_bpe_pairs read); later rounds maintain the
    // count table incrementally
    var counts = bpePairCounts(spark, dir, 0)
    val merged = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val topRow = counts.orderBy(col("n").desc, col("p")).limit(1)
        .collect()(0)
      val Array(pa, pb) = topRow.getString(0).split("", 2)
      merged += ((r, s"$pa+$pb", topRow.getLong(1)))
      val hit = col("s").contains(lit(s"$pa|$pb"))
      val affected = graft.ops.CacheScope.cached(segs.filter(hit))
      val folded = graft.ops.CacheScope.cached(affected
        .withColumn("pa", lit(pa)).withColumn("pb", lit(pb))
        .select(expr(
          """aggregate(
            |  slice(split(s, '[|]'), 2, size(split(s, '[|]')) - 1),
            |  cast(element_at(split(s, '[|]'), 1) as string),
            |  (acc, x) -> CASE
            |    WHEN x = pb AND (acc = pa OR endswith(acc, concat('|', pa)))
            |    THEN concat(acc, x)
            |    ELSE concat(acc, '|', x) END)""".stripMargin)
          .as("s")))
      counts = counts.unionByName(pairsOf(folded))
        .unionByName(pairsOf(affected)
          .select(col("p"), (-col("n")).as("n")))
        .groupBy(col("p")).agg(sum(col("n")).as("n"))
        .filter(col("n") > 0)
        .localCheckpoint()
      segs = segs.filter(!hit).unionByName(folded).localCheckpoint()
    }
    import spark.implicits._
    merged.result().toDF("round", "pair", "n")
  }

  /** 8 merge rounds through the delta trainer (see bpeRoundsDelta). */
  def qTextBpeTrainDelta(spark: SparkSession, dir: String): DataFrame =
    bpeRoundsDelta(spark, dir, 8)

  /** Duplicated-span removal (Dedup.trimSharedNgramSpans): the
    * transform half of q_text_dup_spans — documents come back with
    * every cross-document 5-gram span cut out.
    */
  def qTextDupTrim(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.trimSharedNgramSpans(
        Tables.documentsPar(spark, dir), "doc_id", "text", 5)
      .orderBy(col("doc_id"))

  /** PHRASE SEARCH over a positional inverted index: all documents
    * containing the exact 3-word phrase "slow hash batch", with
    * per-document occurrence counts — the classic IR positional-join
    * evaluation (Manning et al., IIR §2.4): each phrase word's posting
    * rows (doc, pos) equi-join on (doc, pos+offset).
    *
    * Scale plan: the token stream filters to the THREE phrase words
    * BEFORE any shuffle — postings for non-phrase words are never
    * materialized — so the joins carry (doc, int) rows for three terms
    * only; the join keys are (doc, adjusted position), both exact
    * ints. At 100 TB this is the standard "intersect shortest postings
    * first" shape (Catalyst reorders the two equi-joins freely since
    * all sides are filtered scans).
    */
  def qTextPhrase(spark: SparkSession, dir: String): DataFrame = {
    val phrase = Seq("slow", "hash", "batch")
    def toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
    val Seq(w0, w1, w2) = phrase.zipWithIndex.map { case (w, i) =>
      toks.filter(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("p"))
    }
    w0.join(w1, Seq("doc_id", "p"))
      .join(w2, Seq("doc_id", "p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("doc_id"))
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS algorithm): hash every char k-gram, then in
    * each window of w consecutive hashes select the minimum (ties →
    * rightmost), and the distinct selected (hash, pos) pairs are the
    * document's fingerprints. GUARANTEE (their Thm): any substring
    * match of length ≥ w + k − 1 between two documents shares at least
    * one selected fingerprint REGARDLESS of alignment — the
    * alignment-robustness that plain stride-sampled shingles lack —
    * at expected density 2/(w+1). The standard scalable front-end for
    * character-level exact-substring dedup.
    *
    * Determinism/portability: 40-bit md5 hashes packed with the
    * position tie-break into one BIGINT key: h·2²³ + max(0, 2²³−1−pos),
    * so MIN(key) = min-hash-then-rightmost-pos. 40+23 = 63 bits fills
    * signed-64 exactly; the clamp keeps the hash field intact for docs
    * past 2²³ chars (8.3M — positions beyond it share tie-rank 0, so
    * a tie among only-far positions resolves to any of them: still
    * deterministic, both engines evaluate the identical formula, and
    * the selected HASH — what dedup compares — is unaffected). Per-doc
    * output: fingerprints selected, how many are
    * SHARED with another document (df ≥ 2 over distinct (doc, hash)),
    * and the shared fraction in ppm — k=8, w=4 ⇒ matches of length
    * ≥ 11 chars are always caught.
    *
    * Scale plan: k-gram hashing and window-min are per-document
    * (partition by doc — state is one doc's hash stream); the only
    * corpus-wide operations are a distinct + count on (hash) and an
    * equi-join re-attach — hashes, never text, cross the shuffle.
    */
  def qTextWinnow(spark: SparkSession, dir: String): DataFrame = {
    // memoized: the df aggregate, per-doc counts and shared re-attach all
    // read the selected-fingerprint set — and so do the other four
    // family queries, once per run under the harness sharedScope
    val selected = winnowSelected(spark, dir)
    val shared = selected.groupBy(col("fp"))
      .agg(count(lit(1)).as("ndocs")).filter(col("ndocs") >= 2)
    val perDoc = selected.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"))
    val sh = selected.join(shared, "fp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sh0"))
    perDoc.join(sh, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("sh0"), lit(0L)))
      .select(col("doc_id"), col("n_fp"), col("n_shared"),
        expr("n_shared * 1000000 div n_fp").as("shared_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing candidate PAIRS — the MOSS report shape: document pairs
    * ranked by shared-fingerprint count above a report threshold.
    * Same scale contract as minhashPairs: candidates come from an
    * equi-join on the fingerprint, never an all-pairs comparison, and
    * a fingerprint's contribution to the join is bounded by its doc
    * frequency (hot boilerplate fingerprints can be df-capped the way
    * the LSH band join caps buckets — noted, not needed at fixture
    * scale).
    */
  def qTextWinnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairs(spark, dir)
      .orderBy(col("n_shared_fp").desc, col("id_a"), col("id_b"))

  /** The candidate-pair list shared by pairs/verify/lcs/cluster —
    * memoized per run (unordered; consumers impose their own order). */
  private def winnowPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.CacheScope.memoized(s"winnow:pairs:$dir") {
      val sel = winnowSelected(spark, dir)
      // df-cap (standard MOSS practice: ignore over-common fingerprints —
      // boilerplate): a fingerprint in > 50 docs contributes df² join
      // rows but no similarity signal; capping bounds the join to
      // Σ df²  ≤ cap · Σ df (measured 2.5× end-to-end at sf0.1 on this
      // fixture's dense vocabulary)
      val rare = sel.groupBy(col("fp"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 50))
        .select(col("fp"))
      val selRare = sel.join(rare, "fp")
      selRare.as("a").join(selRare.as("b"), col("a.fp") === col("b.fp"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_shared_fp"))
        // ≥40 on this fixture: its tiny synthetic vocabulary makes 8-char
        // grams collide pervasively (p90 of sharing pairs = 17 fps), so
        // the report keeps only deeply-overlapping pairs — also what
        // bounds the output at corpus scale
        .filter(col("n_shared_fp") >= 40)
    }

  /** The distinct (doc, fingerprint) set of [[qTextWinnow]] (k=8, w=4),
    * shared by the whole winnow family — memoized per run.
    */
  private def winnowSelected(spark: SparkSession, dir: String)
      : DataFrame = graft.ops.CacheScope.memoized(s"winnow:selected:$dir") {
    winnowFingerprints(Tables.documents(spark, dir))
  }

  /** Winnowing fingerprint selection over any (doc_id, text) frame —
    * the reusable core of the family, shared with the streaming ingest
    * front door (see [[graft.ops.TextAnalysis.winnowFingerprints]] for
    * the selection + scale discipline; also specced directly with
    * longer-than-2²³ documents).
    */
  private[queries] def winnowFingerprints(docs: DataFrame,
      k: Int = 8, w: Int = 4): DataFrame =
    graft.ops.TextAnalysis.winnowFingerprints(docs, k, w)

  /** Candidate-pair VERIFICATION: the winnowing pairs re-attached to
    * their texts and certified with exact Levenshtein edit distance +
    * a length-normalized similarity in ppm — the verify half of the
    * candidate→verify dedup discipline, at character level. Edit
    * distance is O(|a|·|b|) per pair, so it runs ONLY on the df-capped
    * candidate pairs (never all-pairs); the two text joins are
    * key-equi-joins that each ship one text column to the (small) pair
    * set.
    */
  def qTextWinnowVerify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    qTextWinnowPairs(spark, dir)
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")),
        "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared_fp"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
        expr("(greatest(length(ta), length(tb)) - " +
          "levenshtein(ta, tb)) * 1000000 div " +
          "greatest(length(ta), length(tb))").as("sim_ppm"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact LONGEST-COMMON-SUBSTRING refinement of the winnowing
    * candidate pairs — the exact-match step a MOSS-style pipeline runs
    * behind fingerprint candidates (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 §5 pair the sampled fingerprints with an exact matcher):
    * for the top candidate pairs, the precise longest shared character
    * span (length, 1-based start in the earlier doc, and the span
    * itself). The DP is the native codegen'd `lcs_pack` expression —
    * O(|a|·|b|) PER PAIR, which is why it runs strictly AFTER the
    * candidate filter: total cost is bounded by the (df-capped, top-20
    * deterministic) pair list, never the corpus, and the two text
    * attachments are id-equi-joins. One packed long per pair = one DP
    * evaluation; length/start/span unpack arithmetically.
    *
    * The DuckDB twin computes the same LCS relationally: char-equality
    * matches → diagonal (i−j) islands → longest run, minimum start —
    * feasible because pair texts are bounded; both engines resolve ties
    * to the minimal start in the earlier document.
    */
  def qTextWinnowLcs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val pairs = qTextWinnowPairs(spark, dir)
      .orderBy(col("n_shared_fp").desc, col("id_a"), col("id_b"))
      .limit(20)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    pairs
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")),
        "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")),
        "id_b")
      .withColumn("pk", expr("lcs_pack(ta, tb)"))
      .select(col("id_a"), col("id_b"), col("n_shared_fp"),
        expr("pk div 2097152").as("lcs_len"),
        expr("pk % 2097152").as("lcs_start"),
        expr("substring(ta, cast(pk % 2097152 as int)," +
          " cast(pk div 2097152 as int))").as("lcs"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** ALL maximal shared character spans (length ≥ L) for the top
    * winnow candidate pairs — the multi-span generalization of
    * [[qTextWinnowLcs]] and the exact artifact a Lee et al.-style
    * ExactSubstr dedup REMOVES (the LCS is just the longest one;
    * removal needs every duplicated region). Fully relational:
    * both docs' L-char gram hashes (computed linearly from the
    * once-split char array, same discipline as winnowFingerprints)
    * equi-join on the hash, matches fall on diagonals (i−j), and a
    * gaps-and-islands pass (row_number difference) merges consecutive
    * diagonal matches into maximal runs: an island of c consecutive
    * matching positions is a shared span of c+L−1 chars. Verification
    * against hash collisions is inherent — a false gram match cannot
    * extend a diagonal island, only add a spurious ≥L span at ~2⁻⁶⁰
    * probability per pair position.
    *
    * Scale: gram hashing is map-side per doc; the only joins are the
    * (bounded, top-20 deterministic) pair attach and the in-pair
    * gram equi-join, whose size is bounded by matching positions —
    * never |a|·|b|. The DuckDB twin replicates the identical
    * gram-join + islands pipeline.
    */
  def qTextWinnowSpans(spark: SparkSession, dir: String): DataFrame =
    maximalSharedSpans(
      qTextWinnowPairs(spark, dir)
        .orderBy(col("n_shared_fp").desc, col("id_a"), col("id_b"))
        .limit(20),
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      L = 20)

  /** The reusable core of [[qTextWinnowSpans]]: all maximal shared
    * character runs ≥ L for a given (id_a, id_b) pair list over a
    * (doc_id, text) frame.
    *
    * Gram hashing runs ONCE per distinct doc involved in any pair
    * (map-side transform over the once-split char array), then the
    * pair list equi-joins to each side's grams — a doc sharing spans
    * with many partners is hashed once, not once per partner, which
    * is what keeps the corpus-wide form (all pairs above threshold,
    * [[qTextScrubCorpus]]) linear in involved text rather than in
    * Σ pair texts.
    */
  private[queries] def maximalSharedSpans(pairs: DataFrame,
      docs: DataFrame, L: Int): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b"))
    val involved = p.select(col("id_a").as("doc_id"))
      .union(p.select(col("id_b").as("doc_id"))).distinct()
    val grams = charGrams(involved
      .join(docs.select(col("doc_id"), col("text")), "doc_id"), L)
    val matches = p
      .join(grams.select(col("doc_id").as("id_a"),
        col("pos").as("ia"), col("g")), "id_a")
      .join(grams.select(col("doc_id").as("id_b"),
        col("pos").as("jb"), col("g")), Seq("id_b", "g"))
      .select(col("id_a"), col("id_b"), col("ia"), col("jb"),
        (col("ia") - col("jb")).as("diag"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("ia"))
    matches
      .withColumn("isl", col("ia") -
        row_number().over(win).cast("long"))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("isl"))
      .agg(min(col("ia")).as("start_a"), min(col("jb")).as("start_b"),
        (count(lit(1)) + (L - 1)).as("span_len"))
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("span_len"))
      .orderBy(col("id_a"), col("id_b"), col("start_a"), col("start_b"))
  }

  /** Position-indexed L-char gram hashes for a (doc_id, text) frame —
    * one (doc_id, pos, g) row per character position. The hash is the
    * native rolling 62-bit family ([[graft.functions.RollingHash]]):
    * one fused O(len) loop per doc, zero per-position allocation
    * (previously: per-char split array + one md5 per position — the
    * allocation-amplified cohort of VERDICT r8 finding #3). Map-side
    * only; the DuckDB twins replay the identical integer recurrence.
    */
  private[queries] def charGrams(docs: DataFrame, L: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        posexplode(expr(s"rolling_gram_hash(text, $L)"))
          .as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("g"))
  }

  /** Char-level exact-duplicate SCRUB — the transform half of
    * [[qTextWinnowSpans]] (Lee et al.'s ExactSubstr removal step): for
    * every document that is the LATER side (id_b) of a candidate pair,
    * cut each maximal shared run ≥ 20 chars out of its text, keeping
    * the earlier document intact. Overlapping/adjacent cut intervals
    * from different partners merge first (classic running-max interval
    * merge — one window pass), then the cleaned text is rebuilt by
    * folding the kept gap segments (`aggregate` with a finish lambda —
    * per-cut substring cost, never per-char). Output certifies content
    * by md5 so the cross-engine compare stays row-sized.
    *
    * Scale: spans are bounded by the candidate pair list; the merge and
    * rebuild are per-doc map-side after one (doc, interval) shuffle.
    */
  def qTextSpanScrub(spark: SparkSession, dir: String): DataFrame =
    scrubSpans(qTextWinnowSpans(spark, dir),
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_cuts"), col("chars_removed"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))

  /** The reusable scrub core: cut every span from its id_b doc,
    * returning (doc_id, n_cuts, chars_removed, clean). */
  private[queries] def scrubSpans(spans: DataFrame, docs: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = spans.select(col("id_b").as("doc_id"), col("start_b").as("s"),
      (col("start_b") + col("span_len") - 1).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val merged = iv
      .withColumn("maxe", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ng", when(col("maxe").isNull ||
        col("s") > col("maxe") + 1, 1).otherwise(0))
      .withColumn("grp", sum(col("ng")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    merged
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
          .as("cuts"),
        count(lit(1)).as("n_cuts"),
        sum(col("e") - col("s") + 1).as("chars_removed"))
      .join(docs, "doc_id")
      .withColumn("clean", expr(
        """aggregate(cuts,
          |  struct(cast(1 as bigint) as p, '' as acc),
          |  (st, c) -> struct(c.e + 1 as p,
          |    concat(st.acc, substring(text, cast(st.p as int),
          |      cast(c.s - st.p as int)))),
          |  st -> concat(st.acc,
          |    substring(text, cast(st.p as int), length(text))))"""
          .stripMargin))
      .select(col("doc_id"), col("n_cuts"), col("chars_removed"),
        col("clean"))
  }

  /** CORPUS-WIDE ExactSubstr duplicated-span removal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better") — the
    * whole-corpus form of [[qTextSpanScrub]]: every winnow candidate
    * pair above the report threshold (NOT a top-k slice) contributes
    * its maximal shared runs ≥ 20 chars, and every document that is
    * the LATER side of any such pair has all its duplicated regions
    * cut, keeping the earliest occurrence corpus-wide. This is the
    * pass a real LLM-data pipeline runs over the full corpus.
    *
    * Scale ledger (the plan has NO pair limit anywhere):
    *   1. fingerprint selection — map-side per doc (winnowSelected);
    *   2. candidate pairs — fingerprint equi-join, df-capped (≤ 50)
    *      and thresholded (≥ 40 shared fps), so |pairs| is bounded by
    *      Σ df² over rare fingerprints, never |docs|²;
    *   3. gram hashing — ONCE per distinct involved doc, map-side;
    *   4. span match — (id, gram) equi-join bounded by true matching
    *      positions; islands merge on (pair, diagonal) partitions;
    *   5. scrub — per-doc interval merge + gap-fold rebuild after one
    *      (doc, interval) shuffle.
    * Every shuffle carries ids/hashes/intervals — full texts move
    * only in the final rebuild join, once per scrubbed doc.
    */
  def qTextScrubCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    scrubSpans(
      maximalSharedSpans(winnowPairs(spark, dir), docs, L = 20), docs)
      .select(col("doc_id"), col("n_cuts"), col("chars_removed"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** GLOBAL pair-free ExactSubstr duplicated-span removal — the exact
    * corpus semantics of Lee et al. 2022 §4.2 with NO candidate stage
    * at all: a character position is duplicated iff its L-char gram
    * occurs anywhere else in the corpus (any doc, any position,
    * including elsewhere in the SAME doc), and of all occurrences of a
    * gram only the globally first — min (doc_id, pos) — survives.
    * Consecutive duplicated positions merge into maximal islands (an
    * island of c positions covers c+L−1 chars — exactly the duplicated
    * region, since grams straddling a region boundary are unique), and
    * the islands are cut by the same interval-merge + gap-fold rebuild
    * as [[qTextScrubCorpus]].
    *
    * vs the winnow-pair-driven corpus pass: that one only inspects
    * pairs sharing ≥ 40 selected fingerprints (the documented
    * recall/cost knob); THIS pass has no threshold — any ≥ L-char
    * duplicated region is caught, however little else its docs share.
    *
    * Scale ledger: one map-side gram pass (charGrams — linear in
    * corpus chars); ONE corpus-linear shuffle of (g, doc_id, pos) rows
    * for the per-gram first-occurrence window (~24 B/char — the
    * published cost class of the MapReduce ExactSubstr formulation;
    * the suffix-rank alternative shuffles O(n log n)); everything
    * after the `rn > 1` filter is sized by true duplicate positions,
    * not the corpus. Full texts move once, in the final rebuild join.
    * At 100 TB the 60-bit gram hash is the one knob to widen (to 128
    * bits, or verify islands against the first occurrence) — at ~2⁻⁶⁰
    * per position pair collisions are negligible below petabyte gram
    * counts.
    */
  def qTextScrubGlobal(spark: SparkSession, dir: String): DataFrame =
    globalScrub(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")), L = 20)
      .select(col("doc_id"), col("n_cuts"), col("chars_removed"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))

  /** The reusable global-pass core: (doc_id, n_cuts, chars_removed,
    * clean) for every doc with at least one globally duplicated ≥ L
    * region. */
  private[graft] def globalScrub(docs: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dup = charGrams(docs, L)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("doc_id"), col("pos"))))
      .where(col("rn") > 1)
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dup
      .withColumn("isl", col("pos") - row_number().over(wd).cast("long"))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("start_b"),
        (count(lit(1)) + (L - 1)).as("span_len"))
      .select(col("doc_id").as("id_b"), col("start_b"), col("span_len"))
    scrubSpans(spans, docs)
  }

  /** Winnow near-dup CLUSTERS: candidate pairs through the same
    * pointer-doubling connected components as the MinHash and dHash
    * dedups (Dedup.dedupComponents), min-id representative per cluster
    * — the keep-one step of char-level exact-substring dedup.
    */
  def qTextWinnowCluster(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.dedupComponentsConverged(
        qTextWinnowPairs(spark, dir))._1
      .groupBy(col("component").as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("members"))
      .orderBy(col("cluster"))

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents"): candidate phrases are the
    * maximal stopword-free token runs (gaps-and-islands on the
    * exploded token table — phrase key = pos − row_number), capped at
    * 4 tokens (the standard practical cap; stopword-sparse corpora
    * otherwise yield document-length runs that are not keywords).
    * Word scores are deg(w)/freq(w) over the kept candidates — deg
    * counts each phrase's full length for every member occurrence —
    * kept exact as PPM integers (deg·10⁶ div freq); a phrase scores
    * the sum of its members' scores, identical for every occurrence,
    * so the report aggregates by phrase text. Top 50 by (score,
    * phrase).
    *
    * Scale shape: explode is corpus-linear; islands need one
    * per-doc window; word stats one aggregate over members; no
    * pairwise anything. The only global step is the final top-k
    * (TakeOrderedAndProject).
    */
  def qTextRake(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = TextAnalysis.stopwords
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val nonstop = words.filter(!col("w").isin(stops: _*))
      .withColumn("pk", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val phraseLen = nonstop.groupBy(col("doc_id"), col("pk"))
      .agg(count(lit(1)).as("plen"))
      .filter(col("plen") <= 4)
    val members = nonstop.join(phraseLen, Seq("doc_id", "pk"))
    val wordScore = members.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"),
        expr("deg * 1000000L div freq").as("score_ppm"))
    val phrases = members.join(wordScore, "w")
      .groupBy(col("doc_id"), col("pk"))
      .agg(
        concat_ws(" ", expr("transform(sort_array(" +
          "collect_list(struct(pos, w))), x -> x.w)")).as("phrase"),
        sum(col("score_ppm")).as("score_ppm"),
        first(col("plen")).as("plen"))
    phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("score_ppm")).as("score_ppm"),
        min(col("plen")).as("n_words"))
      .orderBy(desc("score_ppm"), asc("phrase"))
      .limit(50)
  }

  /** TOKEN BURSTINESS (Church & Gale 1995, Katz 1996): the
    * variance-to-mean ratio of a token's per-document counts over the
    * WHOLE corpus (zero docs included via the moment identity
    * var·N = Σc² − T²/N — zeros never materialize). A Poisson word
    * sits at VMR ≈ 1; content words burst (a doc that mentions them
    * mentions them again), function words don't — the feature quality
    * classifiers and keyword extractors both lean on. Exact BIGINT
    * moments (N·Σc² − T²), one IEEE division for the r6 report; df ≥
    * 10 floors the report, top 30 by (vmr, token). Shape: one explode
    * + two hash aggregates, corpus-linear; the 1-row N frame is a
    * broadcast cross join.
    */
  def qTextBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nAll = docs.agg(count(lit(1)).as("n_all"))
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tot"),
        sum(col("c") * col("c")).as("sq"))
      .filter(col("df") >= 10)
      .crossJoin(broadcast(nAll))
      .select(col("w"), col("df"), col("tot"),
        round((col("n_all") * col("sq") - col("tot") * col("tot"))
          .cast("double")
          / (col("n_all").cast("double") * col("tot")), 6)
          .as("vmr_r6"))
      .orderBy(desc("vmr_r6"), asc("w"))
      .limit(30)
  }

  /** SOURCE VOCABULARY OVERLAP MATRIX — the corpus-level redundancy
    * diagnostic run before mixing sources: pairwise Jaccard of the
    * per-source vocabularies (which feeds the "is source B just
    * source A re-crawled?" decision that doc-level near-dedup can't
    * answer cheaply at corpus granularity). The pair join runs on the
    * (word, source) DISTINCT table grouped per word — |sources|² is
    * dimension-bounded (20² here), never corpus-bounded; intersection
    * counts come from the per-word source lists, unions by
    * inclusion–exclusion on exact integers; jaccard as PPM.
    */
  def qTextSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ws = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val sizes = ws.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = ws.as("a").join(ws.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("v").as("v_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("v").as("v_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"),
        col("n_common"),
        expr("n_common * 1000000L div (v_a + v_b - n_common)")
          .as("jaccard_ppm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** HEAPS-LAW vocabulary growth curve (Heaps 1978): V(n) — distinct
    * vocabulary after the first n tokens in doc_id ingestion order —
    * the sub-linear V ≈ K·n^β growth every tokenizer-budget and
    * dedup-impact estimate leans on. Per doc: cumulative token count,
    * cumulative vocabulary (a token joins at its FIRST doc — min
    * doc_id per token), and the exact PPM type/token ratio. Same
    * first-occurrence + running-sum decomposition as
    * q_running_distinct, on a DIFFERENT axis class: that query's
    * month axis is calendar-bounded (a plain window suffices); the
    * doc axis here is corpus-sized, which is what forces the
    * distributed prefix scan.
    *
    * Scale shape: one corpus-linear explode feeding two aggregates
    * (per-doc counts, per-token first-doc); the doc-axis curve is
    * corpus-sized too, so BOTH running sums go through
    * [[graft.ops.Prefix.runningSumInclusive]] — the range-partitioned
    * two-pass prefix scan, no single-partition window even at 10⁹
    * docs. The twin replays with plain window sums.
    */
  def qTextHeaps(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(expr(
        "filter(split(text, ' '), t -> t <> '')")).as("tok"))
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"))
    val newVocab = toks.groupBy(col("tok"))
      .agg(min(col("doc_id")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("nv"))
    val joined = perDoc
      .join(newVocab, col("doc_id") === col("fd"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("nv"), lit(0L)).as("nv"))
    val c = graft.ops.Prefix.runningSumInclusive(
      graft.ops.Prefix.runningSumInclusive(
        joined, Seq(col("doc_id")), col("n_toks"), "cum_tokens"),
      Seq(col("doc_id")), col("nv"), "vocab")
    c.select(col("doc_id"), col("cum_tokens"), col("vocab"),
        expr("vocab * 1000000L div cum_tokens").as("vocab_ppm"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, Q] = Map(
    "q_text_heaps" -> (qTextHeaps(_, _)),
    "q_text_source_overlap" -> (qTextSourceOverlap(_, _)),
    "q_text_burstiness" -> (qTextBurstiness(_, _)),
    "q_text_rake" -> (qTextRake(_, _)),
    "q_text_novelty" -> (qTextNovelty(_, _)),
    "q_text_diversity" -> (qTextDiversity(_, _)),
    "q_text_scrub_global" -> (qTextScrubGlobal(_, _)),
    "q_text_scrub_corpus" -> (qTextScrubCorpus(_, _)),
    "q_text_span_scrub" -> (qTextSpanScrub(_, _)),
    "q_text_winnow_spans" -> (qTextWinnowSpans(_, _)),
    "q_text_winnow_lcs" -> (qTextWinnowLcs(_, _)),
    "q_text_winnow_cluster" -> (qTextWinnowCluster(_, _)),
    "q_text_winnow_verify" -> (qTextWinnowVerify(_, _)),
    "q_text_winnow_pairs" -> (qTextWinnowPairs(_, _)),
    "q_text_winnow" -> (qTextWinnow(_, _)),
    "q_text_phrase" -> (qTextPhrase(_, _)),
    "q_text_dup_trim" -> (qTextDupTrim(_, _)),
    "q_text_bpe_train_delta" -> (qTextBpeTrainDelta(_, _)),
    "q_text_dup_spans" -> (qTextDupSpans(_, _)),
    "q_text_bpe_train" -> (qTextBpeTrain(_, _)),
    "q_text_bpe_apply" -> (qTextBpeApply(_, _)),
    "q_text_heavy_hitters_grouped" -> (qTextHeavyHittersGrouped(_, _)),
    "q_text_heavy_hitters" -> (qTextHeavyHitters(_, _)),
    "q_text_quality_gate" -> (qTextQualityGate(_, _)),
    "q_text_chunk" -> (qTextChunk(_, _)),
    "q_text_chunk_dedup" -> (qTextChunkDedup(_, _)),
    "q_text_cdc_dedup" -> (qTextCdcDedup(_, _)),
    "q_text_wordpiece" -> (qTextWordpiece(_, _)),
    "q_text_tfidf" -> (qTextTfidf(_, _)),
    "q_text_bm25" -> (qTextBm25(_, _)),
    "q_hybrid_rrf" -> (qHybridRrf(_, _)),
    "q_text_unigram_lp" -> (qTextUnigramLp(_, _)),
    "q_text_bigram_lm" -> (qTextBigramLm(_, _)),
    "q_text_redact" -> (qTextRedact(_, _)),
    "q_text_redact_cc" -> (qTextRedactCc(_, _)),
    "q_text_unigram_tok" -> (qTextUnigramTok(_, _)),
    "q_text_pmi" -> (qTextPmi(_, _)),
    "q_text_multiscan" -> (qTextMultiscan(_, _)),
    "q_text_postings_size" -> (qTextPostingsSize(_, _)),
    "q_text_repetition" -> (qTextRepetition(_, _)),
    "q_text_stats" -> (qTextStats(_, _)),
    "q_text_token_count" -> (qTextTokenCount(_, _)),
    "q_text_langid" -> (qTextLangid(_, _)),
    "q_text_ngrams" -> (qTextNgrams(_, _)),
    "q_text_fingerprint" -> (qTextFingerprint(_, _)),
    "q_text_token_freq" -> (qTextTokenFreq(_, _)),
    "q_text_yule_k" -> (qTextYuleK(_, _)),
    "q_text_good_turing" -> (qTextGoodTuring(_, _)),
    "q_text_kneser_ney" -> (qTextKneserNey(_, _)),
    "q_text_postings" -> (qTextPostings(_, _)),
    "q_text_bpe_pairs" -> (qTextBpePairs(_, _)),
    "q_text_bpe_merge2" -> (qTextBpeMerge2(_, _))
  )

  /** BPE round TWO: adjacent segment-pair counts AFTER the first
    * learned merge — the trainer's inner-loop statistic at round 1,
    * read straight from the shared per-round memo (the same segment
    * lineage q_text_bpe_train/apply walk), so within one harness run
    * this query costs a memo hit plus the final top-20, never a
    * retrain. Round-1 training itself is the documented bounded 1-row
    * collect when no trainer ran first.
    */
  def qTextBpeMerge2(spark: SparkSession, dir: String): DataFrame =
    bpePairCounts(spark, dir, round = 1)
      .select(expr("replace(p, char(1), '+')").as("pair"), col("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** BPE training's inner-loop statistic (Sennrich et al., ACL'16): the
    * corpus-wide frequency of adjacent symbol pairs at round ZERO, where
    * symbols are characters — the top pair is the first merge a
    * byte-pair-encoding tokenizer would learn. Shares the trainers'
    * round-0 pair-count memo (one map-side explode + one hash aggregate,
    * computed once per run for the whole BPE family).
    */
  def qTextBpePairs(spark: SparkSession, dir: String): DataFrame =
    bpePairCounts(spark, dir, round = 0)
      .select(expr("replace(p, char(1), '')").as("pair"), col("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** Inverted-index construction: token → document frequency + sorted
    * posting list — the retrieval-side artifact a corpus pipeline
    * materializes next to BM25 stats. One distinct (token, doc)
    * aggregate then one hash aggregate; the posting list is sorted
    * INSIDE the row (`sort_array`, numeric order, then joined to a
    * canonical comma-separated string — scalar output keeps the
    * cross-engine compare hashable), so no global order is needed for
    * determinism. Top-100 by df keeps the published slice bounded; at
    * 100 TB the full index is the same plan written partitioned by
    * token-hash instead of limited.
    */
  def qTextPostings(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))), _.cast("string")),
          ",").as("postings"))
      .orderBy(col("df").desc, col("tok"))
      .limit(100)

  private val stopList =
    TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
  private val markerCases = {
    val best = TextAnalysis.langMarkers.map(_._1)
      .map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val whens = TextAnalysis.langMarkers.map { case (lang, _) =>
      s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
    }.mkString(" ")
    (best, whens)
  }

  /** Shared BM25 CTE chain ending in `bmscore(doc_id, bm25)` — used by
    * the plain ranking oracle and the hybrid-RRF fusion oracle.
    */
  private val bm25CteSql: String = {
    val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf_$i"
    }.mkString(",\n    ")
    val dfs = bm25Terms.indices.map { i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(",\n    ")
    val score = bm25Terms.indices.map { i =>
      s"""ln((CAST(n_docs - df_$i AS DOUBLE) + 0.5)
         |      / (CAST(df_$i AS DOUBLE) + 0.5) + 1.0)
         |    * CAST(tf_$i AS DOUBLE) * 2.25
         |    / (CAST(tf_$i AS DOUBLE)
         |       + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"""
        .stripMargin
    }.mkString("\n  + ")
    val anyTf = bm25Terms.indices.map(i => s"tf_$i > 0").mkString(" OR ")
    s"""tk AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
       |  FROM documents),
       |tkn AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS dl,
       |    $tfs
       |  FROM tkn GROUP BY doc_id),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
       |    $dfs
       |  FROM perdoc),
       |bmscore AS (
       |  SELECT doc_id, round(
       |    $score, 6) AS bm25
       |  FROM perdoc, stats
       |  WHERE $anyTf)""".stripMargin
  }

  private val bm25OracleSql: String =
    s"""WITH $bm25CteSql
       |SELECT doc_id, bm25 FROM bmscore
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** DuckDB twin of qTextBpeTrain: replays every merge round with
    * list_reduce over the same '|'-joined segment representation.
    * Generated programmatically so the round count stays in one place.
    */
  private def bpeTrainOracleSql(rounds: Int): String = {
    val base =
      """WITH t0 AS (
        |  SELECT array_to_string(string_split(tok, ''), '|') AS s
        |  FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' AND tok NOT LIKE '%|%')""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT pr[1] AS pa, pr[2] AS pb, count(*) AS n
         |  FROM (SELECT unnest(list_transform(
         |          generate_series(1, len(l) - 1),
         |          i -> [l[i], l[i+1]])) AS pr
         |        FROM (SELECT string_split(s, '|') AS l FROM t${r - 1})
         |        WHERE len(l) >= 2)
         |  GROUP BY pa, pb),
         |top$r AS (SELECT pa, pb, n FROM p$r
         |  ORDER BY n DESC, pa, pb LIMIT 1),
         |t$r AS (
         |  SELECT list_reduce(string_split(s, '|'),
         |    (acc, x) -> CASE
         |      WHEN x = pb AND (acc = pa OR ends_with(acc, '|' || pa))
         |      THEN acc || x ELSE acc || '|' || x END) AS s
         |  FROM t${r - 1} CROSS JOIN top$r)""".stripMargin
    }
    val selects = (1 to rounds).map { r =>
      s"SELECT $r AS round, pa || '+' || pb AS pair, n FROM top$r"
    }
    base + ",\n" + roundCtes.mkString(",\n") + "\n" +
      selects.mkString("\nUNION ALL ") + "\nORDER BY round"
  }

  /** Twin of qTextBpeApply: replay the merge rounds, then count the
    * final segments.
    */
  private def bpeApplyOracleSql(rounds: Int): String = {
    val train = bpeTrainOracleSql(rounds)
    val ctes = train.substring(0, train.indexOf("\nSELECT 1 AS round"))
    ctes + s"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(s, '|')) AS token FROM t$rounds)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT 30"""
  }

  /** DuckDB twin of the rolling k-gram hash at 1-based code-point
    * position `i` over a BIGINT code-point list column `cps` — the
    * EXACT integer recurrence of [[graft.functions.RollingHash]]
    * (B = 131; pair of 31-bit prime moduli packed h1·M2 + h2). Every
    * intermediate fits DuckDB BIGINT: h·131 + cp < 2³⁸ + 2²¹ and
    * h1·M2 + h2 < 2⁶³. */
  private[queries] def rollSql(cps: String, i: String, k: Int): String =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"$cps[$i:$i+${k - 1}]), (h,c) -> (h*131 + c) % 2147483647)" +
      s" * 2147483629 + list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"$cps[$i:$i+${k - 1}]), (h,c) -> (h*131 + c) % 2147483629))"

  /** Code-point list of a text column — the twin's once-per-doc split
    * (DuckDB's `string_split(text,'')` yields characters, `unicode`
    * their code points — the same position semantics as Spark's
    * `split(text,'')`/`substring`). */
  private[queries] def cpsSql(text: String): String =
    s"list_transform(string_split($text, ''), " +
      "c -> CAST(unicode(c) AS BIGINT))"

  /** Winnow fingerprint-selection CTE chain (d → … → sel) over
    * `documents`, optionally restricted — the SQL twin of
    * `TextAnalysis.winnowFingerprints` (k=8, w=4), shared by the batch
    * winnow twins and the streaming winnow-ingest replay twin. */
  private[queries] def winnowSelCtes(docWhere: String): String =
    s"""d AS (SELECT doc_id, text FROM documents
      |           WHERE length(text) >= 8$docWhere),
      |cpl AS (SELECT doc_id, ${cpsSql("text")} AS cps FROM d),
      |i AS (SELECT doc_id, cps,
      |        unnest(generate_series(1, len(cps) - 7)) AS i
      |      FROM cpl),
      |g AS (SELECT doc_id, i - 1 AS pos,
      |        ${rollSql("cps", "i", 8)} AS h
      |      FROM i),
      |keyed AS (SELECT doc_id, pos,
      |            (h % 1099511627776) * 8388608
      |              + greatest(0, 8388607 - pos) AS key FROM g),
      |win AS (SELECT doc_id, pos,
      |          min(key) OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
      |          count(*) OVER (PARTITION BY doc_id) AS cnt
      |        FROM keyed),
      |sel AS (SELECT DISTINCT doc_id, mk // 8388608 AS fp
      |        FROM win WHERE pos <= cnt - 4)""".stripMargin

  /** Shared CTE chain of the winnowing twins: fingerprint selection →
    * df-cap → candidate pairs (see qTextWinnowPairs).
    */
  private val winnowPairsCtes: String =
    "WITH " + winnowSelCtes("") + """,
      |rare AS (SELECT fp FROM sel GROUP BY fp
      |         HAVING count(*) BETWEEN 2 AND 50),
      |sr AS (SELECT sel.doc_id, sel.fp FROM sel
      |       JOIN rare ON sel.fp = rare.fp),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |            count(*) AS n_shared_fp
      |          FROM sr a JOIN sr b
      |            ON a.fp = b.fp AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id
      |          HAVING count(*) >= 40)""".stripMargin

  /** Full replay of the two-batch winnow-ingest (StreamOps.winnowIngest
    * driven by qStreamWinnowIngest's deterministic 250-split): batch 1
    * self-dedups with a df-cap over its own fingerprints; batch 2
    * dedups against batch-1 SURVIVORS' fingerprints (the sidecar
    * content) plus itself, df-capped over that union. Greedy smaller-id
    * survivor, exactly as the foreachBatch anti-join resolves.
    */
  private[queries] def winnowIngestOracleSql: String =
    "WITH " + winnowSelCtes(" AND doc_id < 1000") + """,
      |s1 AS (SELECT doc_id, fp FROM sel WHERE doc_id < 250),
      |r1 AS (SELECT fp FROM s1 GROUP BY fp
      |       HAVING count(*) BETWEEN 2 AND 50),
      |sr1 AS (SELECT s1.doc_id, s1.fp FROM s1 JOIN r1 USING (fp)),
      |p1 AS (SELECT b.doc_id AS id_b FROM sr1 a JOIN sr1 b
      |         ON a.fp = b.fp AND a.doc_id < b.doc_id
      |       GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 40),
      |acc1 AS (SELECT doc_id FROM documents WHERE doc_id < 250
      |         AND doc_id NOT IN (SELECT id_b FROM p1)),
      |s2 AS (SELECT doc_id, fp FROM sel
      |       WHERE doc_id >= 250
      |          OR doc_id IN (SELECT doc_id FROM acc1)),
      |r2 AS (SELECT fp FROM s2 GROUP BY fp
      |       HAVING count(*) BETWEEN 2 AND 50),
      |sr2 AS (SELECT s2.doc_id, s2.fp FROM s2 JOIN r2 USING (fp)),
      |p2 AS (SELECT b.doc_id AS id_b FROM sr2 a JOIN sr2 b
      |         ON a.fp = b.fp AND b.doc_id >= 250
      |           AND a.doc_id < b.doc_id
      |       GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 40),
      |acc AS (SELECT doc_id FROM acc1
      |        UNION ALL
      |        SELECT doc_id FROM documents
      |        WHERE doc_id >= 250 AND doc_id < 1000
      |          AND doc_id NOT IN (SELECT id_b FROM p2))
      |SELECT d.doc_id, d.lang, d.source
      |FROM documents d JOIN acc USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Shared CTE chain producing `sp` — the maximal shared spans of the
    * given slice of the winnow candidate pairs (used by the spans and
    * scrub twins; the corpus twin passes ALL pairs, no limit). */
  private def spanCtesFrom(topSql: String): String =
    winnowPairsCtes + s""",
      |top AS ($topSql),
      |ta AS (SELECT t.id_a, t.id_b, da.text AS txt FROM top t
      |       JOIN documents da ON t.id_a = da.doc_id),
      |tb AS (SELECT t.id_a, t.id_b, db.text AS txt FROM top t
      |       JOIN documents db ON t.id_b = db.doc_id),
      |gau AS (SELECT id_a, id_b, ${cpsSql("txt")} AS cps,
      |          unnest(generate_series(1,
      |            greatest(0, length(txt) - 19))) AS ia
      |        FROM ta),
      |gah AS (SELECT id_a, id_b, ia,
      |          ${rollSql("cps", "ia", 20)} AS g
      |        FROM gau),
      |gbu AS (SELECT id_a, id_b, ${cpsSql("txt")} AS cps,
      |          unnest(generate_series(1,
      |            greatest(0, length(txt) - 19))) AS jb
      |        FROM tb),
      |gbh AS (SELECT id_a, id_b, jb,
      |          ${rollSql("cps", "jb", 20)} AS g
      |        FROM gbu),
      |mm AS (SELECT a.id_a, a.id_b, a.ia, b.jb, a.ia - b.jb AS diag
      |       FROM gah a JOIN gbh b
      |         ON a.id_a = b.id_a AND a.id_b = b.id_b AND a.g = b.g),
      |isl AS (SELECT *, ia - row_number() OVER (
      |          PARTITION BY id_a, id_b, diag ORDER BY ia) AS k
      |        FROM mm),
      |sp AS (SELECT id_a, id_b, MIN(ia) AS start_a, MIN(jb) AS start_b,
      |         COUNT(*) + 19 AS span_len
      |       FROM isl GROUP BY id_a, id_b, diag, k)""".stripMargin

  private val winnowSpanCtes: String = spanCtesFrom(
    "SELECT id_a, id_b FROM pairs ORDER BY n_shared_fp DESC, id_a, id_b LIMIT 20")

  /** Corpus form: EVERY pair above the report threshold feeds the span
    * CTEs — no limit anywhere. */
  private val winnowSpanCorpusCtes: String =
    spanCtesFrom("SELECT id_a, id_b FROM pairs")

  /** Shared scrub tail over `sp`: interval merge → gap-segment rebuild
    * → md5-certified per-doc rows (twin of scrubSpans). */
  private val scrubTailSql: String =
    """,
      |iv AS (SELECT id_b AS doc_id, start_b AS s,
      |         start_b + span_len - 1 AS e FROM sp),
      |mrk AS (SELECT doc_id, s, e,
      |          CASE WHEN s > COALESCE(MAX(e) OVER (
      |              PARTITION BY doc_id ORDER BY s, e
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |            CAST(-1 AS BIGINT)) + 1
      |          THEN 1 ELSE 0 END AS ng
      |        FROM iv),
      |grp2 AS (SELECT *, SUM(ng) OVER (PARTITION BY doc_id
      |           ORDER BY s, e) AS grp FROM mrk),
      |mg AS (SELECT doc_id, grp, MIN(s) AS s, MAX(e) AS e
      |       FROM grp2 GROUP BY doc_id, grp),
      |seg AS (SELECT doc_id,
      |          COALESCE(LAG(e) OVER (PARTITION BY doc_id
      |            ORDER BY s), 0) + 1 AS ks,
      |          s - 1 AS ke
      |        FROM mg
      |        UNION ALL
      |        SELECT mg.doc_id, MAX(mg.e) + 1 AS ks,
      |          MAX(length(d2.text)) AS ke
      |        FROM mg JOIN documents d2 ON mg.doc_id = d2.doc_id
      |        GROUP BY mg.doc_id),
      |cleaned AS (SELECT s.doc_id,
      |              string_agg(substring(d3.text, CAST(s.ks AS INT),
      |                CAST(greatest(0, s.ke - s.ks + 1) AS INT)), ''
      |                ORDER BY s.ks) AS clean
      |            FROM seg s JOIN documents d3 ON s.doc_id = d3.doc_id
      |            GROUP BY s.doc_id),
      |stats AS (SELECT doc_id, COUNT(*) AS n_cuts,
      |            CAST(SUM(e - s + 1) AS BIGINT) AS chars_removed
      |          FROM mg GROUP BY doc_id)
      |SELECT st.doc_id, st.n_cuts, st.chars_removed,
      |  CAST(length(c.clean) AS BIGINT) AS clean_len,
      |  md5(c.clean) AS clean_md5
      |FROM stats st JOIN cleaned c ON st.doc_id = c.doc_id
      |ORDER BY st.doc_id""".stripMargin

  /** Greedy longest-match replay: candidate pieces per (word, pos) via
    * a vocab membership filter, argmax length, then a recursive CTE
    * stepping pos by the matched length; any failed position collapses
    * the word to [UNK]. Same vocab literal as the engine
    * ([[wordpieceVocab]]). */
  private val wordpieceSql: String = {
    val vocabList = wordpieceVocab.map(s => s"'$s'")
      .mkString("[", ",", "]")
    s"""WITH RECURSIVE u AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS w
       |  FROM documents),
       |tokc AS (SELECT w, count(*) AS c FROM u WHERE w <> ''
       |         GROUP BY w),
       |cand AS (SELECT w, p, l,
       |    CASE WHEN p = 1 THEN substring(w, CAST(p AS INT),
       |        CAST(l AS INT))
       |      ELSE '##' || substring(w, CAST(p AS INT), CAST(l AS INT))
       |      END AS piece
       |  FROM (SELECT w, unnest(generate_series(1, length(w))) AS p
       |        FROM tokc),
       |    (SELECT unnest(generate_series(1, 6)) AS l)
       |  WHERE p + l - 1 <= length(w)),
       |m AS (SELECT * FROM cand
       |      WHERE list_contains($vocabList, piece)),
       |best AS (SELECT w, p, MAX(l) AS l FROM m GROUP BY w, p),
       |bestp AS (SELECT b.w, b.p, b.l, m.piece FROM best b
       |  JOIN m ON m.w = b.w AND m.p = b.p AND m.l = b.l),
       |rec(w, pos, piece, unk) AS (
       |  SELECT w, CAST(1 AS BIGINT), CAST(NULL AS VARCHAR), false
       |  FROM tokc
       |  UNION ALL
       |  SELECT r.w,
       |    CASE WHEN b.l IS NULL THEN length(r.w) + 1
       |      ELSE r.pos + b.l END,
       |    CASE WHEN b.l IS NULL THEN '[UNK]' ELSE b.piece END,
       |    b.l IS NULL
       |  FROM rec r LEFT JOIN bestp b ON b.w = r.w AND b.p = r.pos
       |  WHERE r.pos <= length(r.w) AND NOT r.unk),
       |wp AS (SELECT w, piece, unk FROM rec WHERE piece IS NOT NULL),
       |unkw AS (SELECT w, bool_or(unk) AS u FROM wp GROUP BY w),
       |pieces AS (
       |  SELECT wp.w, wp.piece FROM wp
       |  JOIN unkw ON unkw.w = wp.w AND NOT unkw.u
       |  UNION ALL
       |  SELECT w, '[UNK]' FROM unkw WHERE u)
       |SELECT p.piece, CAST(SUM(t.c) AS BIGINT) AS n
       |FROM pieces p JOIN tokc t ON t.w = p.w
       |GROUP BY p.piece ORDER BY p.piece""".stripMargin
  }

  /** RAKE twin: same islands (1-based positions shift pk by a
    * per-doc constant — grouping unaffected), same PPM integer word
    * scores, same ≤4-token cap. Stopword literal injected from
    * [[TextAnalysis.stopwords]] so the lists cannot drift. */
  private val rakeSql: String = {
    val stopList = TextAnalysis.stopwords.map(s => s"'$s'")
      .mkString("(", ", ", ")")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
       |  FROM documents),
       |w0 AS (SELECT doc_id, i AS pos, ts[i] AS w
       |  FROM toks, (SELECT unnest(generate_series(1, 512)) AS i)
       |  WHERE i <= len(ts) AND ts[i] <> ''),
       |ns AS (SELECT doc_id, pos, w,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |      AS pk
       |  FROM w0 WHERE w NOT IN $stopList),
       |pl AS (SELECT doc_id, pk, count(*) AS plen FROM ns
       |  GROUP BY 1, 2 HAVING count(*) <= 4),
       |mem AS (SELECT ns.doc_id, ns.pk, ns.pos, ns.w, pl.plen
       |  FROM ns JOIN pl ON ns.doc_id = pl.doc_id AND ns.pk = pl.pk),
       |ws AS (SELECT w,
       |    CAST(SUM(plen) AS BIGINT) * 1000000 // count(*) AS score_ppm
       |  FROM mem GROUP BY w),
       |ph AS (SELECT mem.doc_id, mem.pk,
       |    string_agg(mem.w, ' ' ORDER BY mem.pos) AS phrase,
       |    CAST(SUM(ws.score_ppm) AS BIGINT) AS score_ppm,
       |    CAST(MIN(mem.plen) AS BIGINT) AS plen
       |  FROM mem JOIN ws ON mem.w = ws.w
       |  GROUP BY mem.doc_id, mem.pk)
       |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(MIN(score_ppm) AS BIGINT) AS score_ppm,
       |  CAST(MIN(plen) AS BIGINT) AS n_words
       |FROM ph GROUP BY phrase
       |ORDER BY score_ppm DESC, phrase
       |LIMIT 50""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // first-doc vocab joins + plain window prefix sums (the engine's
    // two-pass Prefix scans are semantically these windows)
    "q_text_heaps" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |pd AS (SELECT doc_id, count(*) AS n_toks FROM tk GROUP BY 1),
        |fv AS (SELECT tok, min(doc_id) AS fd FROM tk GROUP BY 1),
        |nv AS (SELECT fd, count(*) AS nv FROM fv GROUP BY 1),
        |j AS (SELECT pd.doc_id, pd.n_toks, COALESCE(nv.nv, 0) AS nv
        |      FROM pd LEFT JOIN nv ON nv.fd = pd.doc_id)
        |SELECT doc_id,
        |  CAST(SUM(n_toks) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(SUM(nv) OVER w AS BIGINT) AS vocab,
        |  CAST((SUM(nv) OVER w * 1000000) // (SUM(n_toks) OVER w)
        |    AS BIGINT) AS vocab_ppm
        |FROM j
        |WINDOW w AS (ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin,
    // identical distinct (word, source) pairs, inclusion–exclusion
    "q_text_source_overlap" ->
      """WITH ws AS (SELECT DISTINCT source, w
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> ''),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS v
        |  FROM ws GROUP BY source),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM ws a JOIN ws b
        |    ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b, sa.v AS v_a, sb.v AS v_b, i.n_common,
        |  i.n_common * 1000000 // (sa.v + sb.v - i.n_common)
        |    AS jaccard_ppm
        |FROM inter i
        |JOIN sz sa ON i.src_a = sa.source
        |JOIN sz sb ON i.src_b = sb.source
        |ORDER BY i.src_a, i.src_b""".stripMargin,
    // identical moment identity — zeros enter through N, never as rows
    "q_text_burstiness" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n_all
        |  FROM documents),
        |pd AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY doc_id, w),
        |ag AS (SELECT w, CAST(count(*) AS BIGINT) AS df,
        |    CAST(SUM(c) AS BIGINT) AS tot,
        |    CAST(SUM(c * c) AS BIGINT) AS sq
        |  FROM pd GROUP BY w HAVING count(*) >= 10)
        |SELECT w, df, tot,
        |  round(CAST(n_all * sq - tot * tot AS DOUBLE)
        |    / (CAST(n_all AS DOUBLE) * tot), 6) AS vmr_r6
        |FROM ag, nn
        |ORDER BY vmr_r6 DESC, w
        |LIMIT 30""".stripMargin,
    "q_text_rake" -> rakeSql,
    "q_text_novelty" ->
      """WITH dt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) >= 8),
        |dg AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 7)) AS i FROM dt)),
        |fd AS (SELECT g, min(doc_id) AS first_doc FROM dg GROUP BY g),
        |per AS (
        |  SELECT dg.doc_id, count(*) AS n_grams,
        |    CAST(SUM(CASE WHEN fd.first_doc = dg.doc_id
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM dg JOIN fd USING (g) GROUP BY dg.doc_id)
        |SELECT doc_id, n_grams, n_novel,
        |  (1000000 * n_novel) // n_grams AS novelty_ppm
        |FROM per WHERE doc_id % 23 = 0
        |ORDER BY doc_id""".stripMargin,
    "q_text_diversity" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
        |  FROM documents),
        |uni AS (
        |  SELECT source, tok, count(*) AS c FROM toks
        |  WHERE tok <> '' GROUP BY source, tok),
        |ua AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax
        |  FROM uni GROUP BY source),
        |bt AS (
        |  SELECT source, string_split_regex(text, '\s+') AS t
        |  FROM documents WHERE len(string_split_regex(text, '\s+')) >= 2),
        |bg AS (
        |  SELECT source, array_to_string(t[i:i+1], ' ') AS bg
        |  FROM (SELECT source, t,
        |          unnest(generate_series(1, len(t) - 1)) AS i FROM bt)),
        |bc AS (SELECT source, bg, count(*) AS c FROM bg
        |       GROUP BY source, bg),
        |ba AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    count(*) AS n_distinct_bigrams
        |  FROM bc GROUP BY source)
        |SELECT ua.source, n_tokens, n_distinct, n_hapax,
        |  (1000000 * n_distinct) // n_tokens AS ttr_ppm,
        |  (1000000 * n_hapax) // n_tokens AS hapax_ppm,
        |  n_bigrams, n_distinct_bigrams,
        |  (1000000 * n_distinct_bigrams) // n_bigrams AS bigram_ttr_ppm
        |FROM ua JOIN ba ON ua.source = ba.source
        |ORDER BY ua.source""".stripMargin,
    "q_text_wordpiece" -> wordpieceSql,
    "q_text_unigram_tok" -> unigramTokOracleSql,
    // same gap + ⌈bits/7⌉ varint arithmetic (bin() is minimal-width in
    // both engines)
    "q_text_postings_size" ->
      """WITH pl AS (SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text),
        |      '\s+')) AS tok FROM documents) WHERE tok <> ''),
        |g AS (SELECT tok, doc_id,
        |    doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
        |      ORDER BY doc_id), -1) AS gap
        |  FROM pl),
        |v AS (SELECT tok, (length(bin(gap)) + 6) // 7 AS vb FROM g),
        |a AS (SELECT tok, count(*) AS df,
        |    CAST(SUM(vb) AS BIGINT) AS varint_bytes
        |  FROM v GROUP BY tok)
        |SELECT tok, df, varint_bytes, df * 8 AS raw_bytes,
        |  (df * 8 - varint_bytes) * 1000000 // (df * 8) AS savings_ppm
        |FROM a ORDER BY df DESC, tok LIMIT 30""".stripMargin,
    // replace-trick occurrence counts — exact for patterns that cannot
    // self-overlap (all four here); see the query scaladoc
    "q_text_multiscan" ->
      """WITH p AS (SELECT * FROM (VALUES ('ha'), ('sh'), ('has'),
        |    ('ash')) AS t(pattern)),
        |c AS (SELECT d.doc_id, p.pattern,
        |    (length(d.text) - length(replace(d.text, p.pattern, '')))
        |      // length(p.pattern) AS n
        |  FROM documents d CROSS JOIN p)
        |SELECT doc_id, pattern, CAST(n AS BIGINT) AS n
        |FROM c WHERE n > 0
        |ORDER BY doc_id, pattern""".stripMargin,
    // identical pinned double expression over exact integer counts
    "q_text_pmi" ->
      """WITH t AS (SELECT list_filter(string_split_regex(text, '\s+'),
        |    x -> x <> '') AS ts FROM documents),
        |uc AS (SELECT x, count(*) AS cx
        |  FROM (SELECT unnest(ts) AS x FROM t) GROUP BY x),
        |bi AS (SELECT ts[CAST(i AS INT)] AS x,
        |    ts[CAST(i + 1 AS INT)] AS y
        |  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |        FROM t)),
        |bc AS (SELECT x, y, count(*) AS cxy FROM bi GROUP BY x, y
        |  HAVING count(*) >= 5),
        |nu AS (SELECT CAST(SUM(cx) AS BIGINT) AS n_u FROM uc),
        |nb AS (SELECT CAST(SUM(len(ts) - 1) AS BIGINT) AS n_b FROM t)
        |SELECT bc.x, bc.y, bc.cxy,
        |  round(ln((CAST(bc.cxy AS DOUBLE) * n_u * n_u)
        |    / (CAST(n_b AS DOUBLE) * a.cx * b.cy)), 6) AS pmi_r6
        |FROM bc JOIN uc a ON bc.x = a.x
        |JOIN (SELECT x AS y, cx AS cy FROM uc) b ON bc.y = b.y
        |CROSS JOIN nu CROSS JOIN nb
        |ORDER BY pmi_r6 DESC, bc.x, bc.y LIMIT 30""".stripMargin,
    // LBFS cut-point replay: the rolling window hash % 32 over the
    // window ENDING at i (1-based start i−7), identical cut array,
    // keep-first on chunk md5 by the same packed (doc, idx) key
    "q_text_cdc_dedup" ->
      s"""WITH cw AS (SELECT doc_id, text, ${cpsSql("text")} AS cps
        |  FROM documents),
        |b AS (SELECT doc_id, text,
        |    list_sort(list_distinct(list_concat(list_concat(
        |      [CAST(0 AS BIGINT)],
        |      list_filter(generate_series(8, len(cps)), i ->
        |        ${rollSql("cps", "(i-7)", 8)} % 32 = 0)),
        |      [CAST(length(text) AS BIGINT)]))) AS cuts
        |  FROM cw),
        |u AS (SELECT doc_id, text, cuts,
        |    unnest(generate_series(1, len(cuts) - 1)) AS j FROM b),
        |ch AS (SELECT doc_id, j - 1 AS idx,
        |    substring(text, CAST(cuts[CAST(j AS INT)] + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT) + 1] - cuts[CAST(j AS INT)]
        |        AS INT)) AS chunk
        |  FROM u),
        |h AS (SELECT doc_id, idx, chunk, md5(chunk) AS hh,
        |    doc_id * 1000000 + idx AS k FROM ch),
        |f AS (SELECT hh, MIN(k) AS fk FROM h GROUP BY hh)
        |SELECT h.doc_id, COUNT(*) AS n_chunks,
        |  COUNT(*) FILTER (WHERE h.k = f.fk) AS n_kept,
        |  CAST(SUM(CASE WHEN h.k <> f.fk THEN length(h.chunk)
        |    ELSE 0 END) AS BIGINT) AS dup_chars
        |FROM h JOIN f USING (hh)
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
    // chunk hashing, global-first winner (row_number over hash ordered
    // by (doc, idx), md5 of the space-rejoined kept chunks — the
    // identical one-pass pipeline
    "q_text_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
        |           FROM documents),
        |c AS (SELECT doc_id, i AS idx,
        |        array_to_string(t[i*25+1 : i*25+25], ' ') AS chunk
        |      FROM (SELECT doc_id, t, unnest(generate_series(0,
        |              CAST(ceil(len(t) / 25.0) AS INT) - 1)) AS i
        |            FROM t)),
        |h AS (SELECT doc_id, idx, chunk,
        |        CAST(list_sum(list_transform(generate_series(1, 15),
        |          d -> CAST(strpos('0123456789abcdef',
        |              substring(md5(chunk), d, 1)) - 1 AS BIGINT)
        |            * (CAST(1 AS BIGINT) << (4 * (15 - d)))))
        |          AS BIGINT) AS h
        |      FROM c),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY h
        |         ORDER BY doc_id, idx) AS rn FROM h),
        |kept AS (SELECT doc_id, idx, chunk FROM rn WHERE rn = 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM h
        |        GROUP BY doc_id),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |          md5(string_agg(chunk, ' ' ORDER BY idx)) AS kept_md5
        |        FROM kept GROUP BY doc_id)
        |SELECT tot.doc_id, tot.n_chunks,
        |  coalesce(agg.n_kept, 0) AS n_kept,
        |  coalesce(agg.kept_md5, md5('')) AS kept_md5
        |FROM tot LEFT JOIN agg USING (doc_id)
        |ORDER BY tot.doc_id""".stripMargin,
    "q_text_scrub_corpus" -> (winnowSpanCorpusCtes + scrubTailSql),
    // pair-free global pass: per-gram global-first window, islands,
    // same scrub tail (sp shaped as (id_b, start_b, span_len))
    "q_text_scrub_global" ->
      (s"""WITH gu AS (SELECT doc_id, ${cpsSql("text")} AS cps,
        |        unnest(generate_series(1,
        |          greatest(0, length(text) - 19))) AS pos
        |      FROM documents),
        |gh AS (SELECT doc_id, pos,
        |         ${rollSql("cps", "pos", 20)} AS g
        |       FROM gu),
        |rnk AS (SELECT doc_id, pos, row_number() OVER (
        |          PARTITION BY g ORDER BY doc_id, pos) AS rn FROM gh),
        |dup AS (SELECT doc_id, pos FROM rnk WHERE rn > 1),
        |di AS (SELECT doc_id, pos, pos - row_number() OVER (
        |         PARTITION BY doc_id ORDER BY pos) AS k FROM dup),
        |sp AS (SELECT doc_id AS id_b, MIN(pos) AS start_b,
        |         COUNT(*) + 19 AS span_len
        |       FROM di GROUP BY doc_id, k)""".stripMargin + scrubTailSql),
    "q_text_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) >= 5),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 4),
        |    i -> array_to_string(t[i:i+4], ' '))) AS gram
        |  FROM t),
        |h AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(
        |    generate_series(1, 15),
        |    d -> CAST(strpos('0123456789abcdef', substring(md5(gram), d, 1))
        |           - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - d)))))
        |    AS BIGINT) AS g
        |  FROM g),
        |pd AS (SELECT doc_id, count(*) AS n_grams FROM h GROUP BY doc_id),
        |df AS (SELECT g, count(*) AS ndocs
        |       FROM (SELECT DISTINCT doc_id, g FROM h) GROUP BY g),
        |dup AS (SELECT h.doc_id, count(*) AS n_dup
        |        FROM h JOIN df ON h.g = df.g
        |        WHERE df.ndocs >= 2 GROUP BY h.doc_id)
        |SELECT pd.doc_id, pd.n_grams,
        |  coalesce(dup.n_dup, 0) AS n_dup,
        |  CAST(coalesce(dup.n_dup, 0) * 1000000 // pd.n_grams AS BIGINT)
        |    AS dup_ppm
        |FROM pd LEFT JOIN dup ON pd.doc_id = dup.doc_id
        |ORDER BY pd.doc_id""".stripMargin,
    "q_text_winnow_cluster" ->
      (winnowPairsCtes.replace("WITH d AS", "WITH RECURSIVE d AS") + """,
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b),
        |comp AS (SELECT node, MIN(lab) AS component
        |         FROM reach GROUP BY node)
        |SELECT component AS cluster, count(*) AS n_members,
        |  string_agg(CAST(node AS VARCHAR), ',' ORDER BY node)
        |    AS members
        |FROM comp GROUP BY component ORDER BY cluster""".stripMargin),
    // Relational LCS: top-20 pairs → char-equality matches (equi-join
    // on the character, never a blind position cross join) → diagonal
    // (i−j) islands via the row_number offset trick → longest run,
    // minimum start. Ties resolve exactly as the engine's DP does.
    "q_text_winnow_lcs" ->
      (winnowPairsCtes + """,
        |top AS (SELECT id_a, id_b, n_shared_fp FROM pairs
        |        ORDER BY n_shared_fp DESC, id_a, id_b LIMIT 20),
        |tx AS (SELECT t.id_a, t.id_b, t.n_shared_fp,
        |         da.text AS ta, db.text AS tb
        |       FROM top t
        |       JOIN documents da ON t.id_a = da.doc_id
        |       JOIN documents db ON t.id_b = db.doc_id),
        |ca AS (SELECT id_a, id_b, i, substring(ta, i, 1) AS ch
        |       FROM (SELECT id_a, id_b, ta,
        |               unnest(generate_series(1, length(ta))) AS i
        |             FROM tx)),
        |cb AS (SELECT id_a, id_b, j, substring(tb, j, 1) AS ch
        |       FROM (SELECT id_a, id_b, tb,
        |               unnest(generate_series(1, length(tb))) AS j
        |             FROM tx)),
        |m AS (SELECT id_a, id_b, i, j
        |      FROM ca JOIN cb USING (id_a, id_b, ch)),
        |isl AS (SELECT id_a, id_b, i, i - j AS d,
        |          i - row_number() OVER (PARTITION BY id_a, id_b, i - j
        |            ORDER BY i) AS grp
        |        FROM m),
        |runs AS (SELECT id_a, id_b, count(*) AS len, min(i) AS start_a
        |         FROM isl GROUP BY id_a, id_b, d, grp),
        |best AS (SELECT id_a, id_b, len, start_a,
        |           row_number() OVER (PARTITION BY id_a, id_b
        |             ORDER BY len DESC, start_a) AS rn
        |         FROM runs)
        |SELECT x.id_a, x.id_b, x.n_shared_fp,
        |  CAST(b.len AS BIGINT) AS lcs_len,
        |  CAST(b.start_a AS BIGINT) AS lcs_start,
        |  substring(x.ta, CAST(b.start_a AS INT), CAST(b.len AS INT))
        |    AS lcs
        |FROM tx x JOIN best b ON x.id_a = b.id_a AND x.id_b = b.id_b
        |WHERE b.rn = 1
        |ORDER BY x.id_a, x.id_b""".stripMargin),
    // gram-join + diagonal-islands maximal shared spans (≥ 20 chars),
    // the identical relational pipeline as the Spark side
    "q_text_winnow_spans" ->
      (winnowSpanCtes + """
        |SELECT id_a, id_b, start_a, start_b, span_len FROM sp
        |ORDER BY id_a, id_b, start_a, start_b""".stripMargin),
    // interval-merge + gap-segment rebuild of the LATER doc's text,
    // certified by md5 — mirrors qTextSpanScrub step for step
    "q_text_span_scrub" -> (winnowSpanCtes + scrubTailSql),
    "q_text_winnow_verify" ->
      (winnowPairsCtes + """
        |SELECT p.id_a, p.id_b, p.n_shared_fp,
        |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
        |  CAST((greatest(length(da.text), length(db.text))
        |      - levenshtein(da.text, db.text)) * 1000000
        |    // greatest(length(da.text), length(db.text)) AS BIGINT)
        |    AS sim_ppm
        |FROM pairs p
        |JOIN documents da ON p.id_a = da.doc_id
        |JOIN documents db ON p.id_b = db.doc_id
        |ORDER BY p.id_a, p.id_b""".stripMargin),
    "q_text_winnow_pairs" ->
      (winnowPairsCtes + """
        |SELECT id_a, id_b, n_shared_fp FROM pairs
        |ORDER BY n_shared_fp DESC, id_a, id_b""".stripMargin),
    "q_text_winnow" ->
      ("WITH " + winnowSelCtes("") + """,
        |df AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) >= 2),
        |pd AS (SELECT doc_id, count(*) AS n_fp FROM sel GROUP BY doc_id),
        |sh AS (SELECT sel.doc_id, count(*) AS n_shared
        |       FROM sel JOIN df ON sel.fp = df.fp GROUP BY sel.doc_id)
        |SELECT pd.doc_id, pd.n_fp,
        |  coalesce(sh.n_shared, 0) AS n_shared,
        |  CAST(coalesce(sh.n_shared, 0) * 1000000 // pd.n_fp AS BIGINT)
        |    AS shared_ppm
        |FROM pd LEFT JOIN sh ON pd.doc_id = sh.doc_id
        |ORDER BY pd.doc_id""".stripMargin),
    "q_text_phrase" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
        |  FROM t),
        |tk AS (SELECT doc_id, pos, t[pos] AS tok FROM tok),
        |w0 AS (SELECT doc_id, pos AS p FROM tk WHERE tok = 'slow'),
        |w1 AS (SELECT doc_id, pos - 1 AS p FROM tk WHERE tok = 'hash'),
        |w2 AS (SELECT doc_id, pos - 2 AS p FROM tk WHERE tok = 'batch')
        |SELECT w0.doc_id, count(*) AS n_occurrences
        |FROM w0 JOIN w1 ON w0.doc_id = w1.doc_id AND w0.p = w1.p
        |        JOIN w2 ON w0.doc_id = w2.doc_id AND w0.p = w2.p
        |GROUP BY w0.doc_id ORDER BY w0.doc_id""".stripMargin,
    "q_text_dup_trim" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, t,
        |    unnest(generate_series(1, len(t))) AS pos
        |  FROM t),
        |tk AS (SELECT doc_id, pos, t[pos] AS tok FROM tok),
        |gi AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        |  FROM t WHERE len(t) >= 5),
        |g AS (
        |  SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS gram
        |  FROM gi),
        |h AS (
        |  SELECT doc_id, i, CAST(list_sum(list_transform(
        |    generate_series(1, 15),
        |    d -> CAST(strpos('0123456789abcdef', substring(md5(gram), d, 1))
        |           - 1 AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - d)))))
        |    AS BIGINT) AS g
        |  FROM g),
        |df AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM h)
        |       GROUP BY g HAVING count(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, i + d AS pos
        |  FROM (SELECT h.doc_id, h.i,
        |          unnest(generate_series(0, 4)) AS d
        |        FROM h JOIN df ON h.g = df.g)),
        |kept AS (
        |  SELECT tk.doc_id, tk.pos, tk.tok FROM tk
        |  WHERE NOT EXISTS (SELECT 1 FROM cov
        |    WHERE cov.doc_id = tk.doc_id AND cov.pos = tk.pos)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY pos) AS trimmed
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_tokens FROM tk
        |        GROUP BY doc_id)
        |SELECT tot.doc_id, tot.n_tokens,
        |  coalesce(agg.n_kept, 0) AS n_kept,
        |  coalesce(agg.trimmed, '') AS trimmed
        |FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id
        |ORDER BY tot.doc_id""".stripMargin,
    // the delta trainer must land on the SAME merges as a full replay
    "q_text_bpe_train_delta" -> bpeTrainOracleSql(8),
    "q_text_bpe_train" -> bpeTrainOracleSql(5),
    "q_text_bpe_apply" -> bpeApplyOracleSql(5),
    // The sketch pass is invisible to the oracle: the exact recount
    // makes the output equal a plain frequency filter.
    "q_text_heavy_hitters_grouped" ->
      """WITH t AS (SELECT source,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT source, tok FROM t WHERE tok <> ''),
        |n AS (SELECT source, count(*) AS n FROM t2 GROUP BY source),
        |c AS (SELECT source, tok, count(*) AS cnt
        |      FROM t2 GROUP BY source, tok)
        |SELECT c.source, tok, cnt, n.n AS n
        |FROM c JOIN n USING (source)
        |WHERE cnt * 51 > n.n
        |ORDER BY c.source, cnt DESC, tok""".stripMargin,
    "q_text_heavy_hitters" ->
      """WITH g AS (
        |  SELECT substring(lower(text),
        |    CAST(unnest(range(1, length(text) - 1)) AS INTEGER), 3) AS gram
        |  FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM g)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM g GROUP BY gram
        |HAVING COUNT(*) * 101 > (SELECT n FROM tot)
        |ORDER BY cnt DESC, gram""".stripMargin,
    "q_text_quality_gate" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
         |      AS n_tokens,
         |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
         |      AS n_nonspace,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |      t -> list_contains($stopList, t))) AS BIGINT) AS n_stopwords
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_nonspace, n_stopwords,
         |  n_tokens BETWEEN 20 AND 2000 AS ok_length,
         |  3 * n_tokens <= n_nonspace AND n_nonspace <= 5 * n_tokens
         |    AS ok_mean_len,
         |  n_stopwords >= 2 AS ok_stopwords,
         |  (n_tokens BETWEEN 20 AND 2000)
         |    AND 3 * n_tokens <= n_nonspace AND n_nonspace <= 5 * n_tokens
         |    AND n_stopwords >= 2 AS pass
         |FROM f ORDER BY doc_id""".stripMargin,
    "q_text_chunk" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0,
        |      150 * CAST(floor(greatest(length(text) - 51, 0) / 150.0)
        |        AS BIGINT), 150)) AS s
        |  FROM documents)
        |SELECT doc_id, s // 150 AS chunk_idx,
        |  CAST(length(substring(text, CAST(s + 1 AS INTEGER), 200))
        |    AS BIGINT) AS chunk_len,
        |  md5(substring(text, CAST(s + 1 AS INTEGER), 200)) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_tfidf" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents),
        |tkn AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS n
        |       FROM tkn GROUP BY doc_id, tok),
        |dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |scored AS (
        |  SELECT doc_id, tok,
        |    round(CAST(n AS DOUBLE) *
        |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6)
        |      AS tfidf
        |  FROM tf JOIN dft USING (tok), nd),
        |ranked AS (
        |  SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, tok, tfidf FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "q_text_bm25" -> bm25OracleSql,
    // both legs replayed (BM25 CTEs + brute cosine), then the exact
    // integer RRF fold — ranks fuse, scores never cross engines raw
    "q_hybrid_rrf" ->
      s"""WITH $bm25CteSql,
         |lex AS (SELECT id, r_lex FROM (
         |    SELECT doc_id AS id, CAST(row_number() OVER (
         |      ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_lex
         |    FROM bmscore)
         |  WHERE r_lex <= 20),
         |vv AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |dns AS (SELECT id, r_dense FROM (
         |    SELECT c.vec_id AS id, CAST(row_number() OVER (ORDER BY
         |      list_sum(list_transform(list_zip(q.embedding, c.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
         |        / (q.nrm * c.nrm) DESC, c.vec_id) AS BIGINT) AS r_dense
         |    FROM vv q JOIN vv c ON q.vec_id = 0 AND c.vec_id <> 0)
         |  WHERE r_dense <= 20),
         |fused AS (
         |  SELECT COALESCE(l.id, d.id) AS id, l.r_lex, d.r_dense,
         |    COALESCE(1000000000000 // (60 + l.r_lex), 0)
         |      + COALESCE(1000000000000 // (60 + d.r_dense), 0)
         |      AS rrf_e12
         |  FROM lex l FULL OUTER JOIN dns d ON l.id = d.id)
         |SELECT id, r_lex, r_dense, CAST(rrf_e12 AS BIGINT) AS rrf_e12,
         |  CAST(row_number() OVER (ORDER BY rrf_e12 DESC, id) AS BIGINT)
         |    AS fused_rank
         |FROM fused ORDER BY fused_rank""".stripMargin,
    "q_text_unigram_lp" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents),
        |tkn AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
        |vocab AS (SELECT tok, COUNT(*) AS c FROM tkn GROUP BY tok),
        |totals AS (SELECT CAST(SUM(c) AS BIGINT) AS t_total,
        |                  COUNT(*) AS v_size FROM vocab)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  round(AVG(ln(CAST(c + 1 AS DOUBLE)
        |    / CAST(t_total + v_size AS DOUBLE))), 6) AS mean_lp
        |FROM tkn JOIN vocab USING (tok), totals
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // identical count tables + backoff arithmetic, pairs via list ops
    "q_text_bigram_lm" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |dn AS (SELECT doc_id, t FROM d WHERE len(t) >= 1),
        |p AS (
        |  SELECT doc_id, i AS pos,
        |    CASE WHEN i = 1 THEN NULL ELSE t[i - 1] END AS prev,
        |    t[i] AS cur
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t))) AS i FROM dn)),
        |tr AS (SELECT * FROM p WHERE doc_id % 2 = 0),
        |uc AS (SELECT cur AS tok, count(*) AS uc FROM tr GROUP BY cur),
        |tot AS (SELECT CAST(sum(uc) AS BIGINT) AS n_total,
        |               count(*) AS v_size FROM uc),
        |bc AS (SELECT prev, cur, count(*) AS bc FROM tr
        |       WHERE prev IS NOT NULL GROUP BY prev, cur),
        |sc AS (
        |  SELECT p.doc_id,
        |    ln(CASE
        |      WHEN p.prev IS NULL THEN
        |        CAST(coalesce(u1.uc, 0) + 1 AS DOUBLE)
        |          / CAST(tot.n_total + tot.v_size AS DOUBLE)
        |      WHEN bc.bc IS NOT NULL THEN
        |        CAST(bc.bc AS DOUBLE) / CAST(up.uc AS DOUBLE)
        |      ELSE 0.4 * CAST(coalesce(u1.uc, 0) + 1 AS DOUBLE)
        |        / CAST(tot.n_total + tot.v_size AS DOUBLE)
        |      END) AS lp
        |  FROM p
        |  LEFT JOIN bc ON p.prev = bc.prev AND p.cur = bc.cur
        |  LEFT JOIN uc u1 ON p.cur = u1.tok
        |  LEFT JOIN uc up ON p.prev = up.tok, tot)
        |SELECT doc_id, count(*) AS n_scored,
        |  round(avg(lp), 6) AS mean_lp,
        |  round(exp(-avg(lp)), 3) AS ppl
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // identical injected card construction (computed Luhn check digit),
    // identical token gate + mod-10 fold; only the VALID number redacts
    "q_text_redact_cc" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    '4' || lpad(CAST(doc_id * 7919 % 100000000 AS VARCHAR),
        |      8, '0') || '990001' AS payload
        |  FROM documents),
        |chk AS (
        |  SELECT doc_id, text, payload,
        |    (10 - list_sum(list_transform(
        |      generate_series(1, length(payload)), i ->
        |      CASE WHEN i % 2 = 1 THEN
        |        CASE WHEN 2 * (ascii(substring(reverse(payload), CAST(i AS INT), 1)) - 48) > 9
        |          THEN 2 * (ascii(substring(reverse(payload), CAST(i AS INT), 1)) - 48) - 9
        |          ELSE 2 * (ascii(substring(reverse(payload), CAST(i AS INT), 1)) - 48) END
        |        ELSE ascii(substring(reverse(payload), CAST(i AS INT), 1)) - 48 END))
        |      % 10) % 10 AS chk
        |  FROM base),
        |aug AS (
        |  SELECT doc_id,
        |    text || ' pay ' || payload || CAST(chk AS VARCHAR) ||
        |      ' ref ' || payload || CAST((chk + 1) % 10 AS VARCHAR) ||
        |      ' now' AS aug
        |  FROM chk),
        |toks AS (
        |  SELECT doc_id,
        |    list_transform(string_split(aug, ' '), t ->
        |      CASE WHEN regexp_full_match(t, '[0-9]{13,19}') AND
        |        list_sum(list_transform(generate_series(1, length(t)),
        |          i ->
        |          CASE WHEN i % 2 = 0 THEN
        |            CASE WHEN 2 * (ascii(substring(reverse(t), CAST(i AS INT), 1)) - 48) > 9
        |              THEN 2 * (ascii(substring(reverse(t), CAST(i AS INT), 1)) - 48) - 9
        |              ELSE 2 * (ascii(substring(reverse(t), CAST(i AS INT), 1)) - 48) END
        |            ELSE ascii(substring(reverse(t), CAST(i AS INT), 1)) - 48 END))
        |          % 10 = 0
        |      THEN '<CC>' ELSE t END) AS toks
        |  FROM aug)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, t -> t = '<CC>')) AS BIGINT)
        |    AS n_cards,
        |  md5(array_to_string(toks, ' ')) AS redacted_md5
        |FROM toks ORDER BY doc_id""".stripMargin,
    "q_text_redact" -> {
      // DuckDB's regular string literals pass backslashes through
      // untouched, so the Java-regex strings embed verbatim
      val email = TextAnalysis.emailRe
      val phone = TextAnalysis.phoneRe
      s"""WITH aug AS (
         |  SELECT doc_id, text || ' Contact user' || CAST(doc_id AS VARCHAR)
         |    || '@example.com or +1-555-'
         |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.'
         |    AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$email')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '$phone')) AS BIGINT)
         |    AS n_phones,
         |  regexp_replace(regexp_replace(aug, '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g') AS redacted
         |FROM aug ORDER BY doc_id""".stripMargin
    },
    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents),
        |g2 AS (
        |  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, greatest(len(t) - 1, 1))) AS i
        |        FROM toks)),
        |g3 AS (
        |  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
        |        FROM toks)),
        |r2 AS (SELECT doc_id,
        |         1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*) AS dup2
        |       FROM g2 GROUP BY doc_id),
        |r3 AS (SELECT doc_id,
        |         1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*) AS dup3
        |       FROM g3 GROUP BY doc_id)
        |SELECT doc_id, dup2, dup3 FROM r2 JOIN r3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text,
        |    '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
        |    AS BIGINT) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |    t -> list_contains($stopList, t))) AS BIGINT) AS n_stopwords,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / len(regexp_extract_all(text, '\\S+')) AS mean_token_len,
         |  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |    t -> list_contains($stopList, t))) AS DOUBLE)
         |    / len(regexp_extract_all(text, '\\S+')) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_langid" -> {
      val scores = TextAnalysis.langMarkers.map { case (lang, words) =>
        val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> list_contains($lst, t))) AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH scored AS (
         |  SELECT lang, $scores
         |  FROM documents),
         |best AS (
         |  SELECT lang, ${markerCases._1} AS best, * FROM scored)
         |SELECT lang,
         |  CASE ${markerCases._2} ELSE 'und' END AS guess,
         |  COUNT(*) AS n
         |FROM best GROUP BY lang, guess ORDER BY lang, guess""".stripMargin
    },
    "q_text_ngrams" ->
      """WITH toks AS (
        |  SELECT string_split_regex(text, '\s+') AS t FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) >= 2),
        |idx AS (
        |  SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |bigrams AS (
        |  SELECT t[i] || ' ' || t[i+1] AS bigram FROM idx)
        |SELECT bigram, COUNT(*) AS n FROM bigrams
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_yule_k" ->
      """WITH f AS (SELECT tok, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY tok),
        |ag AS (SELECT CAST(SUM(f) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS v,
        |    CAST(SUM(f * f) AS BIGINT) AS s2
        |  FROM f),
        |w AS (SELECT n, v, 10000 * (s2 - n) AS num, n * n AS den
        |  FROM ag)
        |SELECT n, v, num, den,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS k_r6
        |FROM w""".stripMargin,
    "q_text_token_freq" ->
      """SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        |      FROM documents)
        |WHERE tok <> ''
        |GROUP BY tok ORDER BY tf DESC, tok LIMIT 30""".stripMargin,
    "q_text_kneser_ney" ->
      """WITH lists AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> t <> '')
        |      AS l
        |  FROM documents),
        |big AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT unnest(list_transform(
        |      generate_series(1, len(l) - 1),
        |      i -> struct_pack(w1 := l[i], w2 := l[i + 1]))) AS b
        |    FROM lists WHERE len(l) >= 2)),
        |c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |        FROM big GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |       FROM big GROUP BY w1),
        |n1f AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1f
        |        FROM c12 GROUP BY w1),
        |n1p AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p
        |        FROM c12 GROUP BY w2),
        |btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS btypes FROM c12)
        |SELECT c12.w1, c12.w2, c12.c12, c1.c1, n1f.n1f, n1p.n1p,
        |  (4 * c12.c12 - 3) * btypes + 3 * n1f.n1f * n1p.n1p AS p_num,
        |  4 * c1.c1 * btypes AS p_den,
        |  CAST((4 * c12.c12 - 3) * btypes + 3 * n1f.n1f * n1p.n1p
        |    AS DOUBLE) / (4 * c1.c1 * btypes) AS p_kn
        |FROM c12 JOIN c1 USING (w1) JOIN n1f USING (w1)
        |  JOIN n1p USING (w2) CROSS JOIN btot
        |ORDER BY c12.c12 DESC, w1, w2 LIMIT 30""".stripMargin,
    "q_text_good_turing" ->
      """WITH counts AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS r
        |  FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY tok),
        |coc AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
        |        FROM counts GROUP BY r),
        |tot AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_total,
        |    CAST(SUM(CASE WHEN r = 1 THEN n_r END) AS BIGINT) AS n1
        |  FROM coc)
        |SELECT c.r, c.n_r,
        |  (c.r + 1) * nx.n_r AS r_star_num,
        |  c.n_r AS r_star_den,
        |  CAST((c.r + 1) * nx.n_r AS DOUBLE) / c.n_r AS r_star,
        |  t.n1 AS p0_num, t.n_total AS p0_den,
        |  CAST(t.n1 AS DOUBLE) / t.n_total AS p0
        |FROM coc c LEFT JOIN coc nx ON nx.r = c.r + 1
        |CROSS JOIN tot t
        |ORDER BY c.r""".stripMargin,
    "q_text_bpe_pairs" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+'))
        |    AS tok FROM documents),
        |pairs AS (SELECT unnest(list_transform(
        |    generate_series(1, length(tok) - 1),
        |    i -> substring(tok, i, 2))) AS pair
        |  FROM toks WHERE length(tok) >= 2)
        |SELECT pair, count(*) AS n FROM pairs
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q_text_bpe_merge2" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+'))
        |    AS tok FROM documents),
        |t2 AS (SELECT tok FROM toks WHERE length(tok) >= 2),
        |p1 AS (SELECT unnest(list_transform(
        |    generate_series(1, length(tok) - 1),
        |    i -> substring(tok, i, 2))) AS pair FROM t2),
        |top AS (SELECT substring(pair, 1, 1) AS pa,
        |    substring(pair, 2, 1) AS pb
        |  FROM (SELECT pair, count(*) AS n FROM p1
        |        GROUP BY pair ORDER BY n DESC, pair LIMIT 1)),
        |seg AS (SELECT list_reduce(string_split(tok, ''),
        |    (acc, x) -> CASE
        |      WHEN x = pb AND (acc = pa OR ends_with(acc, '|' || pa))
        |      THEN acc || x ELSE acc || '|' || x END) AS s
        |  FROM t2 CROSS JOIN top),
        |segs AS (SELECT string_split(s, '|') AS l FROM seg),
        |p2 AS (SELECT unnest(list_transform(
        |    generate_series(1, len(l) - 1),
        |    i -> l[i] || '+' || l[i+1])) AS pair
        |  FROM segs WHERE len(l) >= 2)
        |SELECT pair, count(*) AS n FROM p2
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q_text_postings" ->
      """SELECT tok, COUNT(*) AS df,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        |FROM (SELECT DISTINCT doc_id,
        |        unnest(string_split_regex(text, '\s+')) AS tok
        |      FROM documents)
        |WHERE tok <> ''
        |GROUP BY tok ORDER BY df DESC, tok LIMIT 100""".stripMargin
  )
}
