package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Chunk-level exact dedup (qTextChunkDedup) on planted duplicates:
  * the global-first rule, cross-doc drops, whole-doc elimination and
  * the partial last chunk, pinned independently of the DuckDB twin.
  */
class ChunkDedupSpec extends SparkTestBase {

  private def words(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("global-first occurrence survives; later copies drop; a fully " +
      "duplicated doc scrubs to empty; partial last chunks count") {
    import spark.implicits._
    val chunkA = words("a", 25)
    val chunkB = words("b", 25)
    val chunkC = words("c", 25)
    val tail = words("t", 7) // partial last chunk (unique to doc 4)
    val dir = java.nio.file.Files.createTempDirectory("chunkdedup")
    Seq(
      (1L, s"$chunkA $chunkB"),  // first owner of A and B
      (2L, s"$chunkA $chunkC"),  // A drops (doc 1 owns it), C kept
      (3L, s"$chunkA $chunkB"),  // duplicate of doc 1 → nothing kept
      (4L, s"$chunkC $tail")     // C drops (doc 2 owns it), tail kept
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.qTextChunkDedup(spark, dir.toString)
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        col("kept_md5"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 2L, 1L)))
    val md5 = out.map(r => r._1 -> r._4).toMap
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(md5(1L) == m(s"$chunkA $chunkB"), "doc 1 keeps everything")
    assert(md5(2L) == m(chunkC))
    assert(md5(3L) == m(""), "fully duplicated doc scrubs to empty")
    assert(md5(4L) == m(tail), "the 7-word partial chunk is kept")
  }
}
