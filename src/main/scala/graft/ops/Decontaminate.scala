package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: drop every training document sharing at
  * least one word n-gram with an evaluation/benchmark set — the standard
  * n-gram-overlap contamination rule used when curating LLM training
  * corpora against held-out benchmarks.
  *
  * Scale shape (100 TB corpus, MB-scale benchmark): the benchmark's
  * distinct n-grams BROADCAST; detecting contamination is a broadcast
  * left-semi join on the exploded corpus grams (map-side, no corpus
  * shuffle), followed by a distinct on contaminated doc ids (tiny) and a
  * broadcast anti-join back onto the corpus. The corpus is never
  * shuffled and its text never leaves the scan stage.
  */
object Decontaminate {

  /** Documents with ≥ n tokens contribute their word n-grams; shorter
    * documents contribute none (they cannot contain a full n-gram).
    */
  private def grams(df: DataFrame, textCol: String, n: Int) = {
    val toks = split(col(textCol), "\\s+")
    df.withColumn("_toks", toks)
      .filter(size(col("_toks")) >= n)
      .select(col("*"),
        explode(TextAnalysis.wordNgramsFromTokens(col("_toks"), n)).as("_g"))
  }

  /** Ids of corpus documents sharing any word n-gram with `bench`. */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      bench: DataFrame, benchTextCol: String,
                      n: Int): DataFrame = {
    val benchGrams = grams(bench, benchTextCol, n)
      .select(col("_g")).distinct()
    grams(docs, textCol, n)
      .join(broadcast(benchGrams), "_g", "left_semi")
      .select(col(idCol)).distinct()
  }

  /** The corpus minus contaminated documents. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int): DataFrame =
    docs.join(
      broadcast(contaminatedIds(docs, idCol, textCol, bench, benchTextCol, n)),
      Seq(idCol), "left_anti")

  // ---------------------------------------------------------------------
  // Bloom-prefiltered variant
  // ---------------------------------------------------------------------

  /** 60-bit md5-prefix pair (h1, h2|1) for the double-hashing Bloom
    * probe (Kirsch & Mitzenmacher 2006: position_i = (h1 + i·h2) mod m
    * is as good as k independent hashes; h2 forced odd so the stride
    * never degenerates). Both halves come from ONE md5 of the gram —
    * the same portable hex-nibble arithmetic every DuckDB twin replays.
    */
  private def withHashPair(df: DataFrame): DataFrame = df
    .withColumn("_md5", md5(col("_g")))
    .withColumn("_h1",
      expr("cast(conv(substring(_md5, 1, 15), 16, 10) as bigint)"))
    .withColumn("_h2",
      expr("cast(conv(substring(_md5, 17, 15), 16, 10) as bigint) | 1"))

  /** A deterministic, engine-portable Bloom filter over the benchmark's
    * distinct n-grams, built LAZILY as a one-row relational aggregate
    * (no driver-side build, no job at plan construction): probe
    * positions explode map-side, `bit_or` packs them into ≤ m/64 words,
    * and a map-backed transform densifies the sparse word list into a
    * fixed array<bigint>. The result row is ~m/8 bytes — the broadcast
    * for a GB-scale benchmark gram set is KBs-to-MBs of bitset instead
    * of the grams themselves.
    */
  private[ops] def bloomOf(benchGrams: DataFrame, m: Int, k: Int)
      : DataFrame = {
    val words = m / 64
    withHashPair(benchGrams)
      .select(explode(expr(
        s"transform(sequence(0, ${k - 1})," +
          s" i -> (_h1 + i * _h2) % $m)")).as("p"))
      .groupBy(expr("p div 64").as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint)," +
        " cast(p % 64 as int)))").as("bits"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("mp"))
      .select(expr(
        s"transform(sequence(cast(0 as bigint), cast(${words - 1} as" +
          s" bigint)), w -> coalesce(element_at(mp, w)," +
          s" cast(0 as bigint)))").as("_bf"))
  }

  /** All-k-bits-set membership probe against the broadcast bitset —
    * pure built-in bit arithmetic (codegen'd), no UDF. */
  private def probePredicate(m: Int, k: Int): Column =
    (0 until k).map { i =>
      expr(s"((shiftright(element_at(_bf, cast(((_h1 + $i * _h2)" +
        s" % $m) div 64 as int) + 1), cast(((_h1 + $i * _h2) % $m)" +
        s" % 64 as int)) & 1) = 1)")
    }.reduce(_ && _)

  /** Bloom-prefiltered decontamination funnel — IDENTICAL final
    * semantics to [[decontaminate]], different 100 TB cost shape: the
    * benchmark is summarized into an m-bit Bloom bitset (broadcast,
    * KBs), every corpus gram is probed MAP-SIDE (no corpus shuffle, no
    * broadcast of raw benchmark grams to the scan stage), and only the
    * Bloom-POSITIVE grams — true matches plus the ~(bits-set/m)^k
    * false-positive trickle — reach the exact verification semi-join.
    * False positives cost a little verification work; false negatives
    * are impossible, so the verified output is exactly the n-gram
    * contamination rule.
    *
    * Returns the one-row funnel (bench grams, corpus grams, set bits,
    * Bloom-candidate grams/docs, verified contaminated docs, kept
    * docs): every number — including the false-positive-inflated
    * candidate counts — is deterministic and replayed bit-for-bit by
    * the DuckDB oracle, which certifies the filter construction itself,
    * not just the final kept set.
    */
  def bloomFunnel(docs: DataFrame, idCol: String, textCol: String,
                  bench: DataFrame, benchTextCol: String,
                  n: Int, m: Int, k: Int): DataFrame = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val benchGrams = grams(bench, benchTextCol, n)
      .select(col("_g")).distinct()
    val bloom = bloomOf(benchGrams, m, k)
    // Bloom-positive grams: the ONE pass over the corpus gram stream —
    // cached (candidates only, ε-small) so the three funnel branches
    // below don't re-run the gram+probe pipeline
    val cand = CacheScope.cached(
      withHashPair(grams(docs, textCol, n).select(col(idCol), col("_g")))
        .crossJoin(broadcast(bloom))
        .where(probePredicate(m, k))
        .select(col(idCol), col("_g")))
    val contamIds = cand
      .join(broadcast(benchGrams), "_g", "left_semi")
      .select(col(idCol)).distinct()
    val one = (df: DataFrame, c: Column, name: String) =>
      broadcast(df.groupBy().agg(c.as(name)))
    // gram COUNT is closed-form per doc (Σ max(0, n_tok − n + 1)) — no
    // second explode/md5 pass just to count
    val nCorpusGrams = docs
      .select(size(split(col(textCol), "\\s+")).as("_s"))
      .where(col("_s") >= n)
      .groupBy().agg(sum(col("_s") - (n - 1)).as("n_corpus_grams"))
    one(benchGrams, count(lit(1)), "n_bench_grams")
      .crossJoin(broadcast(nCorpusGrams))
      .crossJoin(broadcast(bloom.select(
        expr("aggregate(_bf, cast(0 as bigint), (a, x) -> a + bit_count(x))")
          .as("n_set_bits"))))
      .crossJoin(one(cand, count(lit(1)), "n_candidate_grams"))
      .crossJoin(one(cand.select(col(idCol)).distinct(), count(lit(1)),
        "n_candidate_docs"))
      .crossJoin(one(contamIds, count(lit(1)), "n_contaminated_docs"))
      .crossJoin(one(docs.join(broadcast(contamIds), Seq(idCol),
        "left_anti"), count(lit(1)), "n_kept_docs"))
  }
}
