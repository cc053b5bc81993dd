package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("stratifiedSample: deterministic, map-side, stratum rates honored") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val sampled = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 0.5), default = 0.1)
    val byStratum = sampled.groupBy("s").count().as[(String, Long)]
      .collect().toMap
    // md5-uniform over 2000 ids per stratum: expect ~1000 and ~200
    assert(math.abs(byStratum("a") - 1000L) < 120, byStratum)
    assert(math.abs(byStratum("b") - 200L) < 80, byStratum)
    // deterministic: same ids selected regardless of partitioning
    val again = Sampling.stratifiedSample(df.repartition(7), "id", "s",
      Map("a" -> 0.5), default = 0.1)
    assert(sampled.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // no exchange in the plan: pure filter over the scan
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("quotaSample: exactly min(quota, |stratum|) rows, deterministic") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 105L).map(i => (i, "small"))).toDF("id", "s")
    val q = Sampling.quotaSample(df, "id", "s", quota = 10)
    val counts = q.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 10L, "small" -> 5L))
    val again = Sampling.quotaSample(df.repartition(5), "id", "s", 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(q.select("id").as[Long].collect().sorted.toSeq == again)
  }

  test("decontaminate drops exactly the docs sharing an n-gram with bench") {
    val mk = (i: Long, t: String) => (i, t)
    val docs = Seq(
      mk(1, "alpha beta gamma delta"),     // shares trigram with bench
      mk(2, "beta gamma delta epsilon"),   // shares trigram with bench
      mk(3, "one two three four five"),    // clean
      mk(4, "alpha beta"),                 // < n tokens → cannot match
      mk(5, "gamma delta alpha beta zeta") // no shared TRIgram
    ).toDF("doc_id", "text")
    val bench = Seq(mk(100, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val clean = Decontaminate.decontaminate(
      docs, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(3L, 4L, 5L))
    // plan: benchmark grams broadcast; corpus side never hash-shuffles
    val plan = Decontaminate.decontaminate(
      docs, "doc_id", "text", bench, "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("hashUniformSql stays in lockstep with hashUniform (spot values)") {
    // the Spark side of the pair; the SQL side is exercised by the
    // driver's DuckDB gate on q_curate_sample_stratified — here we pin
    // the Spark value so either side drifting breaks a test
    val u = Seq(1L, 42L, 999L).toDF("id")
      .select(Sampling.hashUniform(col("id")).as("u"))
      .as[Double].collect()
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    // md5("1") = c4ca4238a0b923820dcc509a6f75849b → 0xc4ca4238 / 2^32
    assert(math.abs(u(0) - 0xc4ca4238L.toDouble / 4294967296.0) < 1e-12)
  }
}
