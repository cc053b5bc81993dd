package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV distinct sketch (functions.KmvAgg): the sketch is a
  * deterministic function of the input SET — invariant to
  * partitioning, duplication, and merge order — the property the
  * cross-engine oracle of q_agg_kmv_intersect depends on. Plus the
  * estimator's exact-below-k and ~1/√k-above-k regimes.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 32
  private def kmv = new KmvAgg(k).asUdaf

  private def sketchOf(xs: Seq[Long], parts: Int): Seq[Long] =
    xs.toDF("h").repartition(parts)
      .agg(kmv(col("h")).as("sk"))
      .as[Seq[Long]].collect()(0)

  test("sketch is the k smallest distinct values, sorted") {
    val xs = (1L to 1000L).map(x => x * 7919L % 10007L)
    val expected = xs.distinct.sorted.take(k)
    assert(sketchOf(xs, 1) == expected)
  }

  test("partitioning and duplication do not change the sketch") {
    val xs = (1L to 500L).map(x => x * 104729L % 99991L)
    val base = sketchOf(xs, 1)
    assert(sketchOf(xs, 7) == base)
    assert(sketchOf(xs ++ xs ++ xs.take(100), 13) == base)
  }

  test("below k the sketch is the whole distinct set (exact regime)") {
    val xs = Seq(5L, 3L, 9L, 3L, 5L, 1L)
    assert(sketchOf(xs, 3) == Seq(1L, 3L, 5L, 9L))
  }

  test("merge of group sketches equals the direct union sketch " +
      "(closure under union)") {
    val a = (1L to 400L).map(x => x * 31L % 4999L)
    val b = (1L to 400L).map(x => x * 37L % 5003L)
    val grouped = (a.map(("a", _)) ++ b.map(("b", _)))
      .toDF("g", "h").repartition(5)
    val merged = grouped.agg(kmv(col("h"))).as[Seq[Long]].collect()(0)
    assert(merged == sketchOf(a ++ b, 1))
  }

  test("saturated estimator lands within 4/sqrt(k) of the true count") {
    // uniform 60-bit hashes via the same md5 family the queries use
    val n = 5000
    val hashed = (1 to n).map(_.toString).toDF("s")
      .select(expr(
        "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)").as("h"))
      .agg(kmv(col("h"))).as[Seq[Long]].collect()(0)
    assert(hashed.size == k)
    val est = (k - 1).toDouble * 1152921504606846976.0 / hashed.last
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(k),
      s"est=$est for n=$n")
  }
}
