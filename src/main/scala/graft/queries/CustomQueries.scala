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

  /** Deterministic media fixture bytes for q_multimodal_decode — the
    * formats the REAL decoders parse (PPM/PGM/BMP/PNG) plus one
    * codec-format blob that exercises the documented stub fallback.
    * Byte-identical on every run, so the decoded features are
    * pinned-expectation oracle-checkable (the expected widths/lumas are
    * analytic properties of these bytes; the PNG is a 3×5 RGB image
    * exercising all 5 scanline filter types, generated once from the
    * same filter arithmetic CustomFunctionsSpec's encoder validates
    * against the JDK's ImageIO).
    */
  private lazy val mediaFixtures: Map[String, Array[Byte]] = {
    // P6 2x2: red, green, blue, white → Rec.601 mean luma exactly 0.5
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
        0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    // P5 1x2: black, white → mean luma 0.5
    val pgm = "P5\n1 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 255.toByte)
    // 24-bit BI_RGB BMP 2x2 (rows padded to 4): blue, white / red, green
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val raster = Array[Byte](
      255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0,
      0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    val bmp = "BM".getBytes("US-ASCII") ++
      le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ raster
    // 3x5 8-bit RGB PNG, pixel i = (i*37+11) mod 256, one scanline per
    // filter type 0..4; mean luma 0.48916209... → r6 0.489162
    val png = ("89504e470d0a1a0a0000000d4948445200000003000000050802000000" +
      "0f13c1f50000002b49444154789c63e03608ad9a7fe4259f316344eda27c3060" +
      "f28501e6059b8ede8b030116202f1f24b40700cd171279a72d70e40000000049" +
      "454e44ae426082").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    // not a parseable format → deterministic stub features from fnv
    val mp4 = Array[Byte](1, 2, 3)
    Map("img.ppm" -> ppm, "img.pgm" -> pgm, "img.bmp" -> bmp,
      "img.png" -> png, "clip.mp4" -> mp4)
  }

  /** REAL multimodal decode as a driver-checked query: materialize the
    * deterministic fixture set into a scratch dir, run the actual
    * binaryFile → mapPartitions decode path, emit per-file geometry +
    * 6-decimal mean luma. The oracle is a literal VALUES table — every
    * expected number is an analytic property of the fixture bytes
    * (dims/luma of known rasters; the stub's fingerprint-derived
    * features for the codec blob), so this pins the decoders
    * end-to-end under the driver's hash compare.
    */
  def qMultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("mm-decode")
    mediaFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.extractFeatures(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        round(col("mean_luma"), 6).as("luma_r6"))
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
    "q_multimodal_audio" -> (qMultimodalAudio(_, _)),
    "q_multimodal_decode" -> (qMultimodalDecode(_, _))
  )

  val oracles: Map[String, String] = Map(
    // Pinned-expectation oracle: every number is an analytic property
    // of the deterministic fixture bytes (see mediaFixtures scaladoc).
    // PPM {red,green,blue,white}, PGM {black,white} and BMP
    // {blue,white,red,green} all have Rec.601 mean luma exactly 0.5;
    // the PNG's pattern sums to 0.489162 (r6); the mp4 blob's stub
    // features derive from fnv1a64([1,2,3]) = 0x21d5... (width
    // 320+(h%1600), height 240+((h>>>11)%900), frames 1+((h>>>23)%240),
    // luma ((h>>>33)%256)/255 → 0.047059).
    "q_multimodal_decode" ->
      """SELECT * FROM (VALUES
        |  ('clip.mp4', CAST(1387 AS BIGINT), CAST(574 AS BIGINT),
        |   CAST(127 AS BIGINT), CAST(0.047059 AS DOUBLE)),
        |  ('img.bmp', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |  ('img.pgm', CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |  ('img.png', CAST(3 AS BIGINT), CAST(5 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.489162 AS DOUBLE)),
        |  ('img.ppm', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)))
        |  AS t(file, width, height, n_frames, luma_r6)
        |ORDER BY file""".stripMargin,
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
