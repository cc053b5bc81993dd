package graft.queries

import graft.SparkTestBase

/** Embedding drift (qSimEmbeddingDrift): identical halves report zero
  * drift; a constant one-axis shift reports exactly that shift.
  */
class EmbeddingDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, Seq[Float])]): Unit =
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

  test("identical halves: cosine 1, L2 0") {
    val dir = java.nio.file.Files.createTempDirectory("edrift").toString
    val v1 = Seq(1f, 2f, 3f, 4f)
    val v2 = Seq(4f, 3f, 2f, 1f)
    // even ids {0, 2} and odd ids {1, 3} hold the same two vectors
    write(dir, Seq((0L, v1), (2L, v2), (1L, v1), (3L, v2)))
    val r = SimilarityQueries.qSimEmbeddingDrift(spark, dir)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((2L, 2L, 4L, 1.0, 0.0)))
  }

  test("constant one-axis shift: L2 equals the shift") {
    val dir = java.nio.file.Files.createTempDirectory("edrift2").toString
    val base = Seq(3f, 4f, 0f)
    val shifted = Seq(3f, 4f, 2f) // +2 on axis 2 for the odd half
    write(dir, Seq((0L, base), (2L, base), (1L, shifted), (3L, shifted)))
    val r = SimilarityQueries.qSimEmbeddingDrift(spark, dir)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._5 == 2.0, s"centroid L2: ${r._5}")
    // cos = (9+16)/ (5 * sqrt(9+16+4)) = 25 / (5*sqrt(29))
    val cos = BigDecimal(25.0 / (5.0 * math.sqrt(29.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._4 == cos, s"centroid cos: ${r._4}")
  }
}
