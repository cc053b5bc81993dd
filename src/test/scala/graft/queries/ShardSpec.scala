package graft.queries

import graft.SparkTestBase

/** Shard assignment (qCurateShard): the two-level distributed prefix
  * sum must equal a scalar global cumsum, across bucket boundaries,
  * with no document split across shards.
  */
class ShardSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed prefix sum equals the scalar cumsum across buckets") {
    val dir = java.nio.file.Files.createTempDirectory("shard").toString
    // 250 docs of 700 tokens each → ids span buckets 0, 1, 2;
    // doc i starts at 700·i tokens → shard = (700·i) div 2000
    val word = "tok"
    val docs = (0L until 250L).map { id =>
      (id, Seq.fill(700)(word).mkString(" "))
    }
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = CurationQueries.qCurateShard(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val want = (0L until 250L).map(i => (i, (700L * i) / 2000L))
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (shard, ds) =>
        val ids = ds.map(_._1)
        (shard, ids.size.toLong, 700L * ids.size, ids.min, ids.max)
      }
    assert(got == want)
    // every doc in exactly one shard
    assert(got.map(_._2).sum == 250L)
  }
}
