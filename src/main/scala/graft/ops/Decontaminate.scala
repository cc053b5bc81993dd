package graft.ops

import org.apache.spark.sql.DataFrame
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
}
