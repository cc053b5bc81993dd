package graft.io

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Compaction planner: next-fit invariants on a hand-sized manifest,
  * and the real-directory listing path over actual written part-files.
  */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("plan: known manifest packs size-desc with bounded overflow") {
    // target 100: sizes desc = 90, 80, 40, 30, 10 → RT-own = 0, 90,
    // 170, 210, 240 → bins 0, 0, 1, 2, 2
    val files = Seq(("a", 40L), ("b", 90L), ("c", 10L), ("d", 80L),
      ("e", 30L)).toDF("file", "len")
    val got = Compaction.plan(files, Seq("file"), "len", 100L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) ==
      Seq(("b", 0L), ("d", 0L), ("a", 1L), ("e", 2L), ("c", 2L)))
    // per-bin windows agree with the assignment
    assert(got.filter(_._3 == 0L).map(_._5).distinct == Seq(170L))
    assert(got.filter(_._3 == 2L).map(_._4).distinct == Seq(2L))
  }

  test("plan invariants: files assigned once; bins are contiguous " +
    "stripes — starts land in their stripe, non-last bins close only " +
    "when coverage crosses the stripe boundary") {
    val target = 128L
    val files = (1 to 57).map(i => (s"f$i", (i * 37 % 91 + 5).toLong))
      .toDF("file", "len")
    val got = Compaction.plan(files, Seq("file"), "len", target)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).distinct.size == 57)
    // reconstruct each file's start offset in packing order
    val packed = got.sortBy(r => (-r._2, r._1))
    val starts = packed.scanLeft(0L)(_ + _._2)
    val withStart = packed.zip(starts)
    val byBin = withStart.groupBy(_._1._3).toSeq.sortBy(_._1)
    assert(byBin.map(_._1) == (0L until byBin.size.toLong))
    for ((bin, rows) <- byBin) {
      // every start inside its own stripe
      assert(rows.forall { case (_, s) =>
        s >= bin * target && s < (bin + 1) * target
      })
      // contiguity: bin total == coverage span
      val first = rows.map(_._2).min
      val end = rows.map { case (r, s) => s + r._2 }.max
      assert(rows.map(_._1._2).sum == end - first)
      // a non-last bin closed because it crossed its stripe end
      if (bin != byBin.last._1) assert(end >= (bin + 1) * target)
    }
  }

  test("planDirectory: lists real part-files, ignores _SUCCESS, " +
    "and the plan covers exactly the data files") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString
    spark.range(10000).select($"id", rand(7).as("x"))
      .repartition(8)
      .write.parquet(s"$dir/t")
    val got = Compaction.planDirectory(spark, s"$dir/t", 64 * 1024L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 8)
    assert(got.forall(r => r._1.endsWith(".parquet") && r._2 > 0))
    assert(!got.exists(_._1.startsWith("_")))
    // bin bytes re-derived from members
    got.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._5).distinct == List(rows.map(_._2).sum))
    }
  }
}
