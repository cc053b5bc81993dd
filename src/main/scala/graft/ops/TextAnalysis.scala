package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token stats,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions (codegen'd, per-row, no shuffle) — at 100 TB these run
  * map-side at scan speed.
  */
object TextAnalysis {

  /** Whitespace token count (regexp-based; robust to runs of spaces). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-style pre-tokenizer count: the GPT-2-family segmentation regex
    * (contractions | space?+letter-run | space?+digit-run |
    * space?+punct-run), without the trailing-whitespace lookahead variants
    * (RE2 engines have no lookahead, and whitespace-only segments don't
    * count as tokens anyway). Approximates LLM token counts far better
    * than whitespace splitting — "don't!" is 1 whitespace token but 3
    * BPE-ish segments.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(
      "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?'\"()\\[\\]{}-]"))

  def stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "on", "for", "with")

  /** Count of stopword tokens (lower-cased exact token match). */
  def stopwordCount(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    size(filter(toks, t => t.isin(stopwords: _*)))
  }

  /** Quality features per document — the classic cheap heuristics:
    * token count, mean token length, punctuation ratio, stopword ratio.
    * Ratios are exact integer divisions (cross-engine deterministic).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("n_stopwords", stopwordCount(t))
      .withColumn("mean_token_len",
        length(regexp_replace(t, "\\s+", "")).cast("double") / tokenCount(t))
      .withColumn("punct_ratio",
        col("n_punct").cast("double") / length(t))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens"))
  }

  /** Marker words per language for the n-gram/function-word language-ID
    * heuristic. Deliberately tiny — the point is the scalable shape
    * (pure expression, argmax over a small static table), not NLP quality.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("de", "le", "shi", "bu"))

  /** Heuristic language guess: argmax of marker-token hits, ties broken by
    * declaration order, "und" (undetermined) when nothing hits.
    */
  def langGuess(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val scores = langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Normalized-content fingerprint (md5 of squashed whitespace,
    * lower-cased) — byte-stable across engines; use for exact-dup detection
    * robust to formatting noise.
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling-style fingerprint via xxhash64 (engine-local; cheaper
    * than md5, not oracle-comparable).
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-grams from an ALREADY-MATERIALIZED token-array column.
    *
    * Catalyst does not CSE inside lambda bodies: if the tokens argument is
    * itself `split(text, ...)`, the split re-runs once per n-gram index —
    * O(tokens²) work per document (measured 4.3 s vs 0.6 s at sf0.1 for
    * the bigram query). Project the token array into a column first, then
    * call this on the attribute.
    */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Word n-grams per document: array<string> of space-joined n-grams.
    * Convenience form; for hot paths prefer projecting `split` once and
    * using `wordNgramsFromTokens` (see its scaladoc).
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromTokens(split(text, "\\s+"), n)

  /** Duplicate-n-gram ratio from an ALREADY-MATERIALIZED token array
    * (same lambda-CSE caveat as `wordNgramsFromTokens`): the fraction of
    * a document's word n-grams that are repeats of an earlier n-gram —
    * the Gopher/Rae-et-al-style repetition signal used to gate
    * boilerplate and degenerate text out of LLM training corpora.
    * 0.0 for documents with fewer than n+1 tokens (no possible repeat...
    * a single n-gram can't repeat; ratio is 0 by 1 - 1/1).
    */
  def duplicateNgramRatio(toks: Column, n: Int): Column = {
    val grams = wordNgramsFromTokens(toks, n)
    lit(1.0) - size(array_distinct(grams)).cast("double") /
      size(grams).cast("double")
  }
}
