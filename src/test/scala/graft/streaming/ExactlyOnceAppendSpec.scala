package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Crash-replay contract of [[StreamOps.appendExactlyOnce]]: a
  * foreachBatch data append must land each batch's rows exactly once
  * even when the batch re-executes (checkpoint recorded nothing, or a
  * prior attempt died mid-rename). Plain `mode("append")` is only
  * at-least-once — these tests pin the stage-and-tag-rename protocol
  * that closes the window.
  */
class ExactlyOnceAppendSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(ids: Long*) =
    ids.map(i => (i, s"v$i")).toDF("id", "payload")

  test("replaying a batch lands its rows once, not twice") {
    val dir = Files.createTempDirectory("eoa").toString + "/data"
    StreamOps.appendExactlyOnce(rows(1, 2, 3), dir, batchId = 0)
    StreamOps.appendExactlyOnce(rows(4, 5), dir, batchId = 1)
    // crash-replay: the checkpoint never recorded batch 1, so the
    // restarted query re-executes it with identical content
    StreamOps.appendExactlyOnce(rows(4, 5), dir, batchId = 1)
    val got = spark.read.parquet(dir).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a partial prior attempt's tagged files are cleared before " +
    "the redo lands") {
    val root = Files.createTempDirectory("eoa2").toString
    val dir = s"$root/data"
    StreamOps.appendExactlyOnce(rows(1, 2, 3), dir, batchId = 0)
    // simulate an attempt of batch 1 that died after renaming SOME
    // files: plant a tagged file holding a stale/partial payload
    rows(99).coalesce(1).write.parquet(s"$root/partial")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val part = fs.listStatus(new Path(s"$root/partial"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    assert(fs.rename(part, new Path(dir, "b1-" + part.getName)))
    assert(spark.read.parquet(dir).count() == 4) // partial visible
    // the replayed batch redoes the append; the partial must vanish
    StreamOps.appendExactlyOnce(rows(4, 5), dir, batchId = 1)
    val got = spark.read.parquet(dir).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("partitioned layout: replay is per-batch idempotent and other " +
    "batches' files in the same partition dir survive") {
    val dir = Files.createTempDirectory("eoa3").toString + "/data"
    def b(ids: Long*) = ids.map(i => (i, i % 2))
      .toDF("id", "_bucket")
    StreamOps.appendExactlyOnce(b(1, 2, 3), dir, 0, Some("_bucket"))
    StreamOps.appendExactlyOnce(b(4, 5), dir, 1, Some("_bucket"))
    StreamOps.appendExactlyOnce(b(4, 5), dir, 1, Some("_bucket"))
    val df = spark.read.parquet(dir)
    assert(df.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // partition pruning still works on the tagged layout
    val even = df.filter(col("_bucket") === 0).select("id")
      .as[Long].collect().sorted.toSeq
    assert(even == Seq(2L, 4L))
  }

  test("orphan tagged files in a partition the replay does NOT " +
    "produce are swept (ADVICE r10)") {
    val root = Files.createTempDirectory("eoa5").toString
    val dir = s"$root/data"
    def b(ids: Long*) = ids.map(i => (i, i % 2)).toDF("id", "_bucket")
    // batch 0 creates both partition dirs
    StreamOps.appendExactlyOnce(b(1, 2), dir, 0, Some("_bucket"))
    // simulate a crashed attempt of batch 1 that landed a tagged file
    // in _bucket=0 — then the replayed batch 1 stages ONLY _bucket=1
    // rows. A staged-set-scoped sweep would leave the orphan behind as
    // duplicate data.
    rows(99).coalesce(1).write.parquet(s"$root/partial")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val part = fs.listStatus(new Path(s"$root/partial"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    assert(fs.rename(part,
      new Path(s"$dir/_bucket=0", "b1-" + part.getName)))
    StreamOps.appendExactlyOnce(b(5), dir, 1, Some("_bucket"))
    val got = spark.read.parquet(dir).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 5L), "crashed attempt's orphan in the " +
      "unstaged partition must be swept by the replay")
  }

  test("no staging residue is left next to the live layout") {
    val root = Files.createTempDirectory("eoa4").toString
    val dir = s"$root/data"
    StreamOps.appendExactlyOnce(rows(1), dir, batchId = 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    assert(!fs.exists(new Path(dir + "._staging")))
  }
}
