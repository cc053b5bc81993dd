package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  // adversarial stream: one genuinely heavy item buried in distinct
  // filler — 60 copies of "hot" + 140 unique fillers, n = 200
  private def stream: Seq[String] =
    Seq.fill(60)("hot") ++ (0 until 140).map(i => s"filler$i")

  test("guarantee: freq > n/(k+1) item survives every partitioning") {
    val mg = new MisraGriesAgg(3).asUdaf // threshold n/4 = 50 < 60
    for (parts <- Seq(1, 2, 4, 7)) {
      val cands = stream.toDF("tok").repartition(parts)
        .agg(mg($"tok")).as[Seq[String]].head()
      assert(cands.contains("hot"),
        s"lost the heavy hitter at $parts partitions: $cands")
      assert(cands.size <= 3, s"summary exceeded k: $cands")
    }
  }

  test("two-pass recount equals the exact frequency filter, " +
    "independent of partitioning") {
    val k = 3
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.keys.toSet
    assert(exact == Set("hot")) // non-vacuous: the gate actually bites
    val mg = new MisraGriesAgg(k).asUdaf
    for (parts <- Seq(2, 5)) {
      val df = stream.toDF("tok").repartition(parts)
      val cands = df.agg(mg($"tok")).as[Seq[String]].head()
      val out = df.filter($"tok".isin(cands: _*))
        .groupBy($"tok").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * (k + 1) > n)
        .as[(String, Long)].collect().toMap
      assert(out.keySet == exact, s"parts=$parts: $out")
      assert(out("hot") == 60L)
    }
  }

  test("merge compresses to k entries and preserves the cut invariant") {
    val agg = new MisraGriesAgg(2)
    val merged = agg.merge(
      Map("a" -> 10L, "b" -> 4L),
      Map("c" -> 3L, "d" -> 1L))
    // 4 entries > k=2 → subtract 3rd-largest (3): a→7, b→1, c/d dropped
    assert(merged == Map("a" -> 7L, "b" -> 1L))
  }

  test("reduce: decrement step cancels counters at capacity") {
    val agg = new MisraGriesAgg(2)
    val b1 = agg.reduce(agg.reduce(agg.zero, "x"), "y") // x:1 y:1, full
    assert(agg.reduce(b1, "z") == Map.empty[String, Long]) // all cancel
    val b2 = agg.reduce(agg.reduce(b1, "x"), "z") // x:2 y:1, z decrements
    assert(b2 == Map("x" -> 1L))
  }
}
