package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.Quantiles

/** KLL sketch + sketch-narrowed exact quantile selection. */
class KllQuantileSpec extends SparkTestBase {
  import spark.implicits._

  test("summary weight is conserved and estimates are rank-bounded") {
    val n = 50000
    // adversarial-ish: sorted input (worst case for naive sampling)
    val agg = new KllQuantileAgg(256)
    var buf = agg.zero
    (1 to n).foreach(i => buf = agg.reduce(buf, i.toDouble))
    val summary = agg.finish(buf)
    assert(summary.map(_._2).sum == n.toLong,
      "compaction must conserve total weight")
    // rank error within the documented bound (ε ≈ log2(n/k)/(2k),
    // with generous slack x4 for the deterministic variant)
    val eps = 4.0 * math.log(n.toDouble / 256) / math.log(2.0) / (2 * 256)
    Seq(0.1, 0.25, 0.5, 0.75, 0.9).foreach { p =>
      val est = KllQuantileAgg.estimate(summary, p)
      assert(math.abs(est / n - p) <= eps,
        s"p=$p est=$est rank-err=${math.abs(est / n - p)} > $eps")
    }
  }

  test("merge trees: sketch merge conserves weight across splits") {
    val xs = (1 to 20000).map(_.toDouble)
    val agg = new KllQuantileAgg(128)
    def sketch(part: Seq[Double]) =
      part.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val merged = agg.merge(
      agg.merge(sketch(xs.slice(0, 7000)), sketch(xs.slice(7000, 9000))),
      sketch(xs.slice(9000, 20000)))
    assert(agg.finish(merged).map(_._2).sum == 20000L)
    val est = KllQuantileAgg.estimate(agg.finish(merged), 0.5)
    assert(math.abs(est / 20000.0 - 0.5) < 0.05)
  }

  test("sketchDeciles: exact values, certified, partition-independent") {
    // skewed data with heavy duplicates (rank ties must not wobble)
    val xs = (1 to 9000).map(i => (i % 100).toDouble) ++
      (1 to 1000).map(i => 1000.0 + i)
    def run(parts: Int) =
      Quantiles.sketchDeciles(
        spark.createDataset(xs).repartition(parts).toDF("v"), "v")
        .collect().map(r => (r.getDouble(0), r.getDouble(1),
          r.getLong(2), r.getBoolean(3))).toSeq
    val a = run(4)
    val b = run(7)
    assert(a == b, "exact deciles must not depend on partitioning")
    assert(a.size == 9 && a.forall(_._4), s"all ranks certified: $a")
    // cross-check two deciles against a plain sort
    val sorted = xs.sorted
    def exact(i: Int) = sorted((i * xs.size + 9) / 10 - 1)
    assert(a(4)._2 == exact(5)) // median
    assert(a(8)._2 == exact(9)) // p90
  }

  test("sketchDecilesByKey: grouped == per-group global, certified, " +
    "partition-independent") {
    val a = (1 to 5000).map(i => ("a", (i % 97).toDouble))
    val b = (1 to 3000).map(i => ("b", math.pow(1.001, i % 500)))
    def run(parts: Int) =
      Quantiles.sketchDecilesByKey(
        spark.createDataset(a ++ b).repartition(parts).toDF("g", "v"),
        "g", "v")
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getDouble(2), r.getLong(3), r.getBoolean(4))).toSeq
    val r4 = run(4)
    assert(r4 == run(7), "grouped deciles must not depend on partitioning")
    assert(r4.size == 18 && r4.forall(_._5), s"all certified: $r4")
    // each group's rows equal the single-group global path
    val globalA = Quantiles.sketchDeciles(
        spark.createDataset(a.map(_._2)).toDF("v"), "v")
      .collect().map(r => ("a", r.getDouble(0), r.getDouble(1),
        r.getLong(2), r.getBoolean(3))).toSeq
    assert(r4.filter(_._1 == "a") == globalA)
  }

  test("sketchDeciles: loud failure on empty input, not a wrong row") {
    val e = intercept[IllegalArgumentException] {
      Quantiles.sketchDeciles(
        spark.createDataset(Seq.empty[Double]).toDF("v"), "v")
    }
    assert(e.getMessage.contains("no non-null values"))
  }
}
