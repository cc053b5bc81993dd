package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SimHashAgg, Udfs}
import graft.io.Tables
import graft.ops.Multimodal

/** Custom-surface exemplars registered as queries: native Catalyst
  * expression, typed Aggregator (udaf), scalar UDF, multimodal plumbing.
  */
object CustomQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Cosine near-dup pairs via the codegen'd native expression, on the
    * blocked exact all-pairs join (same oracle as q_dedup_embedding, same
    * no-BNL plan shape) — the exemplar that a custom Catalyst Expression
    * composes with any join strategy.
    */
  def qCustomCosineExpr(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    graft.ops.Dedup.embeddingExactPairs(Tables.embeddings(spark, dir),
        "vec_id", "embedding", minCosine = 0.45, blocks = 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash per document via the typed Aggregator (partial-agg form);
    * same portable md5-derived hash family as Dedup.simhash, so it shares
    * the same DuckDB oracle (modulo column names).
    */
  def qCustomSimhashAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(SimHashAgg.asUdaf(col("tok")).as("simhash"))
      .orderBy(col("doc_id"))

  /** Character-entropy quality signal via scalar UDF, oracle-checked
    * against a pure-SQL entropy (char frequencies → −Σ p·log₂p). Both
    * engines round to 6 decimals: the sum's accumulation order differs
    * across engines but the drift is ~1e-13, far below the rounding
    * threshold. (The fnv1a64 UDF twin is spec-only — FNV needs wrapping
    * 64-bit multiply, which DuckDB SQL can't express.)
    */
  def qCustomUdfEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        round(Udfs.charEntropy(col("text")), 6).as("entropy"))
      .orderBy(col("doc_id"))

  /** Multimodal: binary ingest of the sf dir's files + stubbed decode.
    * Plumbing (schema, mapPartitions batching) is real; decode is a
    * deterministic fake (no codecs in this environment).
    */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.readBinary(spark, s"$dir/*.parquet")
    Multimodal.resizePlan(
        Multimodal.sampleFrames(
          Multimodal.extractFeatures(media).toDF(), stride = 30),
        maxDim = 512)
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("fingerprint"), col("width"), col("height"),
        col("out_width"), col("out_height"),
        col("n_frames"), size(col("sampled_frames")).as("n_sampled"))
      .orderBy(col("file"))
  }

  /** Multimodal audio: binary ingest + the audio feature path. The sf
    * dir's parquet blobs are not WAV, so every row exercises the
    * documented stub fallback (the REAL PCM path is proven on
    * constructed WAV bytes in CustomFunctionsSpec); the point here is
    * the end-to-end plumbing under the driver's harness. Rows-only: FNV
    * fingerprints aren't DuckDB-expressible.
    */
  def qMultimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.readBinary(spark, s"$dir/*.parquet")
    Multimodal.extractAudioFeatures(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("fingerprint"), col("sample_rate"),
        col("channels"), col("n_frames"),
        round(col("duration_s"), 6).as("duration_s"))
      .orderBy(col("file"))
  }

  /** Weighted geometric mean of price (weight = quantity) per flag —
    * the typed-Aggregator exemplar from SURVEY §2-B. Output rounded to 4
    * decimals: ln/exp differ across libms at ulp level (like q_func_math's
    * price_ln), far below the rounding threshold.
    */
  def qCustomGeomean(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(round(
        graft.functions.WeightedGeoMeanAgg.asUdaf(
          col("l_extendedprice"), col("l_quantity")), 4).as("geo_price"))
      .orderBy(col("l_returnflag"))
  }

  val defs: Map[String, Q] = Map(
    "q_custom_geomean" -> (qCustomGeomean(_, _)),
    "q_custom_cosine_expr" -> (qCustomCosineExpr(_, _)),
    "q_custom_simhash_agg" -> (qCustomSimhashAgg(_, _)),
    "q_custom_udf_entropy" -> (qCustomUdfEntropy(_, _)),
    "q_multimodal_features" -> (qMultimodalFeatures(_, _)),
    "q_multimodal_audio" -> (qMultimodalAudio(_, _))
  )

  val oracles: Map[String, String] = Map(
    // Same oracle as q_dedup_embedding: the native expression must be
    // bit-identical to the HOF formulation (same op order).
    "q_custom_cosine_expr" -> DedupQueries.oracles("q_dedup_embedding"),
    // The Aggregator's hash family is identical to Dedup.simhash's; only
    // the id column name differs between the two registered queries.
    "q_custom_simhash_agg" -> DedupQueries.oracles("q_dedup_simhash")
      .replace("AS id,", "AS doc_id,").replace("ORDER BY id", "ORDER BY doc_id"),
    "q_custom_udf_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, length(text) AS n,
        |    unnest(string_split(text, '')) AS c
        |  FROM documents),
        |freq AS (
        |  SELECT doc_id, n, c, COUNT(*) AS cnt
        |  FROM ch GROUP BY doc_id, n, c)
        |SELECT doc_id,
        |  round(-SUM((cnt / CAST(n AS DOUBLE))
        |    * ln(cnt / CAST(n AS DOUBLE)) / ln(2)), 6) AS entropy
        |FROM freq GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_custom_geomean" ->
      """SELECT l_returnflag,
        |  round(exp(SUM(l_quantity * ln(l_extendedprice))
        |    / SUM(l_quantity)), 4) AS geo_price
        |FROM lineitem
        |WHERE l_extendedprice > 0 AND l_quantity > 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
