package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN parameter-tuning sweep (VERDICT r2 item 7): grid
  * nBits × nTables × multiprobe for `Similarity.lshTopK` against the
  * brute-force ground truth and report, per point, recall@k and the
  * candidate fraction (candidates scored ÷ pairs brute force scores).
  * The frontier tells a user which knobs buy recall and what each point
  * costs — the turnkey step the fixed SimilaritySpec bound doesn't give.
  *
  * This is a TUNING TOOL, not a pipeline operator: it deliberately runs
  * driver-side counts per grid point (each one a small Spark job). Run it
  * on a sample of the corpus — recall/cost ratios transfer to the full
  * data because both scale with bucket occupancy, not corpus size.
  *
  * Usage: `runMain graft.ops.RecallSweep [sfDir]` — prints one JSON line
  * per grid point plus a chosen-default summary.
  */
object RecallSweep {

  case class Point(nBits: Int, nTables: Int, multiprobe: Boolean,
                   recall: Double, candFrac: Double)

  /** Recall@k + candidate fraction for each grid point, against
    * `bruteForceTopK` ground truth on the same (queries, corpus).
    */
  def sweep(queries: DataFrame, corpus: DataFrame, idCol: String,
            vecCol: String, k: Int,
            grid: Seq[(Int, Int, Boolean)]): Seq[Point] = {
    val truth = CacheScope.cached(
      Similarity.bruteForceTopK(queries, corpus, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id")))
    val nTruth = truth.count().toDouble
    val nQ = queries.count().toDouble
    val nC = corpus.count().toDouble
    grid.map { case (nBits, nTables, multiprobe) =>
      val cand = CacheScope.cached(Similarity.lshCandidates(
        queries, corpus, idCol, vecCol, nBits, nTables, multiprobe))
      val nCand = cand.count().toDouble
      val hit = Similarity.lshTopK(queries, corpus, idCol, vecCol, k,
          nBits, nTables, multiprobe)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      Point(nBits, nTables, multiprobe, hit / nTruth,
        nCand / (nQ * (nC - 1)))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
    val grid = for {
      nBits <- Seq(6, 8, 10, 12)
      nTables <- Seq(2, 4, 8)
      multiprobe <- Seq(false, true)
    } yield (nBits, nTables, multiprobe)
    val pts = CacheScope.scoped {
      sweep(queries, emb, "vec_id", "embedding", k = 5, grid)
    }
    pts.foreach { p =>
      println(f"""{"nBits":${p.nBits},"nTables":${p.nTables},"multiprobe":${p.multiprobe},"recall":${p.recall}%.3f,"cand_frac":${p.candFrac}%.4f}""")
    }
    // frontier: points no other point dominates (≥ recall AND ≤ cost)
    val frontier = pts.filter(p => !pts.exists(q =>
      (q.recall > p.recall && q.candFrac <= p.candFrac) ||
        (q.recall >= p.recall && q.candFrac < p.candFrac)))
      .sortBy(_.candFrac)
    println("frontier: " + frontier.map(p =>
      f"(${p.nBits},${p.nTables},mp=${p.multiprobe}: r=${p.recall}%.2f c=${p.candFrac}%.3f)")
      .mkString(" "))
    spark.stop()
  }
}
