package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.AsOf

/** The custom physical as-of join: semantics parity with the
  * compositional operator, edge cases, and physical plan shape.
  */
class AsOfNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of == compositional as-of on a multi-key timeline " +
    "with ties, gaps and one-sided keys") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:10"), "l1"),
      (2L, 10L, ts("2024-01-01 00:00:20"), "l2"),
      (3L, 10L, ts("2024-01-01 00:00:05"), "l3"), // before any right
      (4L, 20L, ts("2024-01-01 00:00:30"), "l4"),
      (5L, 20L, ts("2024-01-01 00:00:15"), "l5"), // exact tie with right
      (6L, 30L, ts("2024-01-01 00:00:30"), "l6"), // key absent on right
      (7L, 40L, ts("2024-01-01 00:00:01"), "l7"))
      .toDF("event_id", "k", "t", "payload")
      .repartition(5) // arbitrary pre-partitioning: exec must re-shuffle
    val right = Seq(
      (10L, ts("2024-01-01 00:00:08"), 100L),
      (10L, ts("2024-01-01 00:00:15"), 101L),
      (10L, ts("2024-01-01 00:00:25"), 102L), // later than every left
      (20L, ts("2024-01-01 00:00:15"), 200L),
      (40L, ts("2024-01-01 00:00:02"), 400L)) // later than l7
      .toDF("rk", "rt", "val")
      .repartition(3)

    val native = AsOf.asOfJoinNative(left, right, "k", "rk", "t", "rt")
      .select($"event_id", $"val")
      .as[(Long, Option[Long])].collect().toMap
    assert(native == Map(
      1L -> Some(100L), // 00:10 → latest ≤ is 00:08
      2L -> Some(101L), // 00:20 → 00:15
      3L -> None,       // before first right row
      4L -> Some(200L),
      5L -> Some(200L), // inclusive tie at 00:15
      6L -> None,       // key never on right
      7L -> None))      // right row is later

    val composed = AsOf.asOfJoin(left, right, "k", "rk", "t", "rt",
        rightCols = Seq("val"))
      .select($"event_id", $"val")
      .as[(Long, Option[Long])].collect().toMap
    assert(native == composed)
  }

  test("null keys/times: never match, never crash") {
    val left = Seq(
      (1L, Option(10L), Option(ts("2024-01-01 00:00:10"))),
      (2L, Option.empty[Long], Option(ts("2024-01-01 00:00:10"))),
      (3L, Option(10L), Option.empty[java.sql.Timestamp]))
      .toDF("event_id", "k", "t")
    val right = Seq(
      (Option(10L), Option(ts("2024-01-01 00:00:01")), 1L),
      (Option.empty[Long], Option(ts("2024-01-01 00:00:01")), 2L),
      (Option(10L), Option.empty[java.sql.Timestamp], 3L))
      .toDF("rk", "rt", "val")
    val out = AsOf.asOfJoinNative(left, right, "k", "rk", "t", "rt")
      .select($"event_id", $"val")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(1L), 2L -> None, 3L -> None))
  }

  test("plan shape: SortMergeAsOfJoinExec with one exchange + sort " +
    "per side — the SortMergeJoin cost contract") {
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong, i.toLong))
      .toDF("event_id", "k", "t")
    val right = (1 to 50).map(i => ((i % 5).toLong, i.toLong, i * 10L))
      .toDF("rk", "rt", "val")
    val df = AsOf.asOfJoinNative(left, right, "k", "rk", "t", "rt")
    df.collect() // force planning + execution
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("SortMergeAsOfJoin"))
    // AQE prints final + initial plans; count shuffles in the final one
    val p = full.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 shuffles, plan:\n$p")
  }

  test("parity with the oracle-checked query shape at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.io.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = graft.io.Tables.orders(spark, dir)
      // parquet NTZ timestamp → session-UTC instant, matching events.ts
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
    val native = AsOf.asOfJoinNative(ev, right,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .filter(col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"), col("asof_orderkey"))
      .orderBy(col("event_id"))
      .as[(Long, Long, Long)].collect().toSeq
    val composed = AsOf.asOfJoin(ev, right,
        "user_id", "o_custkey", "ts", "o_orderdate",
        rightCols = Seq("asof_orderkey"))
      .filter(col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"), col("asof_orderkey"))
      .orderBy(col("event_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(native.size == composed.size && native == composed)
  }
}
