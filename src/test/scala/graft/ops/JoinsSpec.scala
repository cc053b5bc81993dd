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

  test("AQE splits the skewed partition: skew=true in the final plan") {
    // deliberately skewed fact: one hot key holds ~250k of 300k rows
    // with an incompressible payload; dim side small but SMJ-forced.
    // Thresholds are lowered so local fixture sizes cross the same
    // bars a 100 TB hot key crosses in production (defaults: 256 MB
    // partition threshold, factor 5) — the point is the MECHANISM:
    // Spark's OptimizeSkewedJoin splits the oversized partition into
    // advisory-sized chunks and replicates the matching side, which is
    // the runtime answer to skew (saltedJoin is the static fallback
    // when AQE is off or the skew is in an aggregation).
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "65536")
      val left = spark.range(300000).select(
        when($"id" < 250000, 0L).otherwise($"id" % 50 + 1).as("k"),
        concat(lit("payload-"), $"id", lit("-"),
          md5($"id".cast("string"))).as("p"))
      val right = spark.range(51).select($"id".as("k"),
        ($"id" * 7).as("v"))
      val joined = left.join(right, "k")
      // collect() (not count()) — count builds a NEW QueryExecution for
      // the aggregate; only the df's own execution finalizes ITS
      // adaptive plan so the skew marker is inspectable
      assert(joined.collect().length == 300000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join marker in:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Spark's InjectRuntimeFilter: when a shuffle join's small side
    // carries a selective predicate, a bloom filter built from that
    // side is pushed into the fact side's scan — at 100 TB this is the
    // difference between shuffling the whole fact table and shuffling
    // only rows that can match. Thresholds are lowered so the local
    // parquet fixtures cross the same bars a production fact table
    // crosses (defaults: 10 GB application-side scan, 10 MB creation
    // side); the assertion is on the MECHANISM: bloom_filter_agg on the
    // dim side + might_contain wrapped around the fact scan.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val dir = "/root/testdata/sf0.001"
      val li = graft.io.Tables.lineitem(spark, dir)
      val ord = graft.io.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg")
          && optimized.contains("might_contain"),
        s"expected runtime bloom filter in:\n$optimized")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("widthBucketJoin buckets match explicit range predicates") {
    val df = Seq(0.0, 10.0, 99.9, 100.0, 250.0, 399.9).toDF("v")
    val out = Joins.widthBucketJoin(df, col("v"), 0.0, 400.0, 4)
      .select("v", "bucket").as[(Double, Long)].collect().toMap
    assert(out(0.0) == 1 && out(99.9) == 1)
    assert(out(100.0) == 2 && out(250.0) == 3 && out(399.9) == 4)
  }
}
