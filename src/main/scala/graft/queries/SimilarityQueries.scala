package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Similarity

/** Similarity-search battery over `embeddings` (north-star operators). */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Brute-force cosine top-5 for a 10-query probe set — the exact
    * baseline. Queries broadcast; corpus never shuffles.
    */
  def qSimTopkBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed ANN, same shape (rows-only; recall pinned vs brute
    * force in SimilaritySpec). Asymmetric multiprobe: Hamming-1 probes on
    * the broadcast query side buy back recall for fewer tables — the
    * corpus side still emits one row per (vector, table).
    */
  def qSimTopkLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 5, nBits = 8, nTables = 4, multiprobe = true)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-path ANN, same output shape as the brute/LSH variants. Fully
    * deterministic (md5-sampled centroids, id tiebreaks) → oracle-checked:
    * DuckDB rebuilds the same inverted lists and probes the same way.
    */
  def qSimTopkIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 5, nLists = 16, nProbe = 4)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-label centroid similarity: mean vector per label (exact elementwise
    * mean via posexplode + avg), then each label's centroid norm. Exercises
    * the vector-aggregation path (elementwise agg over array columns).
    */
  def qSimCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(round(sum(col("x").cast("double")), 6).as("s"),
        count(lit(1)).as("n"))
      .withColumn("s_e6", round(col("s") * 1e6, 0).cast("long"))
      .groupBy(col("label"))
      .agg(sum(col("s_e6") * col("s_e6")).as("centroid_energy_e12"),
        max(col("n")).as("n_vecs"))
      .orderBy(col("label"))
  }

  val defs: Map[String, Q] = Map(
    "q_sim_topk_brute" -> (qSimTopkBrute(_, _)),
    "q_sim_topk_lsh" -> (qSimTopkLsh(_, _)),
    "q_sim_topk_ivf" -> (qSimTopkIvf(_, _)),
    "q_sim_centroids" -> (qSimCentroids(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_sim_topk_brute" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |      s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |      / (q.nrm * c.nrm) AS cosine
        |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // Rebuilds the deterministic IVF index in SQL: same centroid sample
    // (md5 order), same argmax assignment, same probes, same ranking —
    // cosines are sequential folds, bit-identical across engines.
    "q_sim_topk_ivf" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |r AS (
        |  SELECT vec_id, embedding, nrm,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
        |      AS rk
        |  FROM v),
        |cents AS (
        |  SELECT rk AS cent_id, embedding AS centv, nrm AS cnrm
        |  FROM r WHERE rk <= 16),
        |asgn AS (
        |  SELECT cent_id, vec_id AS neighbor_id, embedding AS cv,
        |    nrm AS nnrm
        |  FROM (
        |    SELECT c.cent_id, v.vec_id, v.embedding, v.nrm,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(v.embedding, c.centv),
        |          s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |          / (v.nrm * c.cnrm) DESC,
        |        c.cent_id) AS rn
        |    FROM v CROSS JOIN cents c)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, qv, qnrm, cent_id
        |  FROM (
        |    SELECT v.vec_id AS query_id, v.embedding AS qv, v.nrm AS qnrm,
        |      c.cent_id,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(v.embedding, c.centv),
        |          s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |          / (v.nrm * c.cnrm) DESC,
        |        c.cent_id) AS rn
        |    FROM v CROSS JOIN cents c
        |    WHERE v.vec_id < 10)
        |  WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.neighbor_id,
        |    list_sum(list_transform(list_zip(p.qv, a.cv),
        |      s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |      / (p.qnrm * a.nnrm) AS cosine
        |  FROM probes p JOIN asgn a USING (cent_id)
        |  WHERE p.query_id <> a.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_sim_centroids" ->
      """WITH per_elem AS (
        |  SELECT label, unnest(embedding) AS x,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |per_dim AS (
        |  SELECT label, i,
        |    CAST(round(round(SUM(CAST(x AS DOUBLE)), 6) * 1e6, 0)
        |      AS BIGINT) AS s_e6,
        |    COUNT(*) AS n
        |  FROM per_elem
        |  GROUP BY label, i)
        |SELECT label,
        |  CAST(SUM(s_e6 * s_e6) AS BIGINT) AS centroid_energy_e12,
        |  MAX(n) AS n_vecs
        |FROM per_dim GROUP BY label ORDER BY label""".stripMargin
  )
}
