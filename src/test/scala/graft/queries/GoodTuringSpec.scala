package graft.queries

import graft.SparkTestBase

/** Good–Turing smoothing (qTextGoodTuring) against a hand-computed
  * count-of-counts table.
  */
class GoodTuringSpec extends SparkTestBase {
  import spark.implicits._

  test("hand corpus: r* = (r+1)N_{r+1}/N_r, NULL where N_{r+1} " +
    "absent, p0 = N1/N") {
    val dir = java.nio.file.Files.createTempDirectory("gt").toString
    // counts: a=4, b=2, c=2, d=1, e=1, f=1 → N1=3, N2=2, N4=1, N=11
    Seq((1L, "a a a a b b c c d e f", "s"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.qTextGoodTuring(spark, dir)
      .select("r", "n_r", "r_star", "p0")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 3L, 2.0 * 2 / 3, 3.0 / 11), // r*=(1+1)·N2/N1 = 4/3
      (2L, 2L, -1.0, 3.0 / 11),        // N3 absent → NULL
      (4L, 1L, -1.0, 3.0 / 11)))       // N5 absent → NULL
  }
}
