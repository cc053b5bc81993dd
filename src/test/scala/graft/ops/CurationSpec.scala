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

  test("packSequences: contiguous bins per bucket, deterministic") {
    val df = (1L to 300L).map(i => (i, 10L + (i % 7) * 30L))
      .toDF("id", "toks")
    val packed = Packing.packSequences(df, "id", "toks",
      capacity = 200L, buckets = 4)
    // every doc assigned; bins within a bucket are contiguous from 0
    assert(packed.count() == 300)
    val perBucket = packed.groupBy("bucket")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("n"))
      .as[(Long, Long, Long, Long)].collect()
    perBucket.foreach { case (_, lo, hi, n) =>
      assert(lo == 0L); assert(n == hi + 1, "bins must be contiguous")
    }
    // internal columns dropped; bin b of a bucket only starts once at
    // least b*capacity tokens precede it in that bucket
    assert(packed.columns.toSeq == Seq("id", "bucket", "bin", "toks"))
    val under = packed.groupBy("bucket", "bin")
      .agg(sum("toks").as("s")).as[(Long, Long, Long)].collect()
      .groupBy(_._1).values
      .flatMap { bins =>
        val byBin = bins.map(b => b._2 -> b._3).toMap
        byBin.keys.map { b =>
          val before = (0L until b).map(byBin.getOrElse(_, 0L)).sum
          before >= b * 200L - 200L // start of bin b within its window
        }
      }
    assert(under.forall(identity))
    // deterministic across partitionings
    val again = Packing.packSequences(df.repartition(7), "id", "toks",
      200L, 4).select("id", "bucket", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val first = packed.select("id", "bucket", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(first == again)
  }

  test("resampleFfill: every step in span emitted, gaps carry last sum") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (7L, ts("2024-01-01 00:10:00"), 1.5),
      (7L, ts("2024-01-01 00:40:00"), 2.0), // hour 0: n=2, sv=3.5
      (7L, ts("2024-01-01 03:05:00"), 4.0), // hours 1-2 empty
      (9L, ts("2024-01-01 05:00:00"), 9.0)  // separate key, 1-hour span
    ).toDF("user_id", "ts", "value")
    val out = graft.ops.Resample
      .resampleFfill(ev, "user_id", "ts", "value", "1 hour")
      .select($"user_id", $"bucket".cast("string"), $"n", $"sum_ffill")
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01 00:00:00", 2L, 3.5),
      (7L, "2024-01-01 01:00:00", 0L, 3.5), // gap: forward-filled
      (7L, "2024-01-01 02:00:00", 0L, 3.5),
      (7L, "2024-01-01 03:00:00", 1L, 4.0),
      (9L, "2024-01-01 05:00:00", 1L, 9.0)))
  }

  test("resampleInterpolate: interior gaps get the straight line, " +
    "observed buckets keep their value") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (7L, ts("2024-01-01 00:30:00"), 1.0), // hour 0: sv=1.0
      (7L, ts("2024-01-01 03:15:00"), 4.0), // hours 1-2 empty
      (7L, ts("2024-01-01 03:45:00"), 3.0)  // hour 3: sv=7.0
    ).toDF("user_id", "ts", "value")
    val out = graft.ops.Resample
      .resampleInterpolate(ev, "user_id", "ts", "value", "1 hour")
      .select($"user_id", $"bucket".cast("string"), $"sv_interp")
      .as[(Long, String, Double)].collect().sortBy(_._2)
    // line from (t=0h, 1.0) to (t=3h, 7.0): +2.0 per hour
    assert(out.toSeq == Seq(
      (7L, "2024-01-01 00:00:00", 1.0),
      (7L, "2024-01-01 01:00:00", 3.0),
      (7L, "2024-01-01 02:00:00", 5.0),
      (7L, "2024-01-01 03:00:00", 7.0)))
  }

  test("weightedTopK: priority is the max md5 hash over w salts " +
    "(independent JDK MessageDigest replay)") {
    def jdkHash(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val df = Seq((1L, 3), (2L, 1)).toDF("id", "w")
    val out = Sampling.weightedTopK(df, "id", col("w"), 10)
      .select("id", "priority").as[(Long, Long)].collect().toMap
    assert(out(1L) == (1 to 3).map(i => jdkHash(s"1:$i")).max)
    assert(out(2L) == jdkHash("2:1"))
  }

  test("weightedTopK favors heavy weights and plans a global top-k") {
    val df = spark.range(10000).select($"id",
      when($"id" < 5000, 10).otherwise(1).as("w"))
    val picked = Sampling.weightedTopK(df, "id", col("w"), 1000)
    val heavy = picked.filter($"id" < 5000).count()
    // heavy rows have 10× selection pressure: expect ≫ 500 of 1000
    assert(heavy > 800, s"heavy=$heavy of 1000")
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
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

  test("remixToTarget: rate-1 domain kept whole, others thinned, rest dropped") {
    // a:100, b:100, c:50 rows; targets a=0.5, b=0.25 → T=min(100/.5,
    // 100/.25)=200 → a keeps all (rate 1), b at rate 0.5, c dropped
    val rows = (0 until 100).map(i => (i.toLong, "a")) ++
      (100 until 200).map(i => (i.toLong, "b")) ++
      (200 until 250).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "dom")
    val out = Sampling.remixToTarget(df, "id", "dom",
        Seq("a" -> 0.5, "b" -> 0.25))
      .groupBy($"dom").count().as[(String, Long)].collect().toMap
    assert(out("a") == 100L)               // rate exactly 1.0
    assert(!out.contains("c"))             // untargeted domain dropped
    assert(out("b") > 25 && out("b") < 75) // ~50 under the id-hash
    // deterministic across partitionings
    val again = Sampling.remixToTarget(df.repartition(7), "id", "dom",
        Seq("a" -> 0.5, "b" -> 0.25))
      .groupBy($"dom").count().as[(String, Long)].collect().toMap
    assert(again == out)
  }
}
