package graft.queries

import graft.SparkTestBase

/** Interval-overlap depth sweep (depthSweep) against hand-drawn
  * zone maps, including the closed-interval boundary case and the
  * nested-interval case the max must see through.
  */
class ClusterDepthSpec extends SparkTestBase {
  import spark.implicits._

  private def sweep(files: Seq[(Long, Long, Long)]) = {
    val r = MiscQueries.depthSweep(
      files.toDF("fid", "lo", "hi")).collect().head
    (r.getLong(r.fieldIndex("n_files")),
      r.getLong(r.fieldIndex("max_depth")),
      r.getLong(r.fieldIndex("sum_depth")))
  }

  test("disjoint files have depth 1 everywhere") {
    assert(sweep(Seq((0L, 0L, 9L), (1L, 10L, 19L), (2L, 20L, 29L)))
      == ((3L, 1L, 3L)))
  }

  test("shared boundary counts as overlap (closed intervals): " +
    "[0,10] and [10,20] give depth 2 at 10") {
    assert(sweep(Seq((0L, 0L, 10L), (1L, 10L, 20L))) == ((2L, 2L, 3L)))
  }

  test("nested and chained intervals: [0,100] ⊃ [10,20] ⊃ [12,18], " +
    "plus disjoint [200,300]") {
    // depths at starts: 0→1, 10→2, 12→3, 200→1 — max 3, sum 7
    assert(sweep(Seq((0L, 0L, 100L), (1L, 10L, 20L), (2L, 12L, 18L),
      (3L, 200L, 300L))) == ((4L, 3L, 7L)))
  }
}
