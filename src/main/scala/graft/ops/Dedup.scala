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
  */
object Dedup {

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
    * hashes. Hash family j is xxhash64 salted with j — deterministic,
    * stateless, identical on every executor.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingleArr, s => xxhash64(j, s))))

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
                   threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = docs.select(
      col(idCol).as("id"),
      minhashSignature(shingles(col(textCol), k), numHashes).as("sig"))
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

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle — computed via an inverted-index self-join (shuffle keyed on
    * shingle), never a cartesian product.
    *
    * @return DataFrame[id_a, id_b, inter, union_n, jaccard], id_a < id_b.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv = sh.select(col("id"), explode(col("sh")).as("s"))
    val inter = inv.as("x").join(inv.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("union_n"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_n"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 64-bit SimHash over whitespace tokens, as a pure DataFrame plan:
    * posexplode bits → per-(doc,bit) ±1 sums → pack. (A typed Aggregator
    * variant lives in graft.functions.SimHashAggregator.)
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .groupBy("id", "b")
      .agg(sum(when(expr("(shiftright(h, b) & 1) = 1"), 1).otherwise(-1))
        .as("s"))
      .groupBy("id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), b)"))
        .otherwise(0L)).as("simhash"))

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
