package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin preserves exact join multiplicity under skew") {
    // left: 1000 rows of hot key 1, a few of key 2; right: dim with both
    val left = (Seq.fill(1000)(1L) ++ Seq(2L, 2L)).toDF("k")
    val right = Seq((1L, "hot"), (2L, "cold")).toDF("k", "v")
    val plain = left.join(right, "k")
    val salted = Joins.saltedJoin(left, right, "k", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().as[(Long, Long)].collect().toMap ==
      plain.groupBy("k").count().as[(Long, Long)].collect().toMap)
  }

  test("colocatedJoin adds no exchange beyond the two repartitions") {
    val a = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("x"))
    val b = spark.range(1000).select($"id".as("k"), ($"id" * 3).as("y"))
    val plan = Joins.colocatedJoin(a, b, "k", 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    assert(Joins.colocatedJoin(a, b, "k", 4).count() == 1000)
  }

  test("bucketed tables join with ZERO exchanges (persistent co-location)") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse conf is static and can't change on a live session
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    spark.range(1000).select($"id".as("k"), ($"id" * 2).as("x"))
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
    spark.range(1000).select($"id".as("k"), ($"id" * 3).as("y"))
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE bkt_a")
    spark.sql("DROP TABLE bkt_b")
  }

  test("widthBucketJoin buckets match explicit range predicates") {
    val df = Seq(0.0, 10.0, 99.9, 100.0, 250.0, 399.9).toDF("v")
    val out = Joins.widthBucketJoin(df, col("v"), 0.0, 400.0, 4)
      .select("v", "bucket").as[(Double, Long)].collect().toMap
    assert(out(0.0) == 1 && out(99.9) == 1)
    assert(out(100.0) == 2 && out(250.0) == 3 && out(399.9) == 4)
  }
}
