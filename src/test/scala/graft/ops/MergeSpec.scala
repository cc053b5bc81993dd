package graft.ops

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert: replace on collision, pass-through, insert") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val out = Merge.upsert(base, upd, "k")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("upsert takes the WHOLE update row — nulls included") {
    val base = Seq((1L, Some("a")), (2L, Some("b"))).toDF("k", "v")
    val upd = Seq((2L, None: Option[String])).toDF("k", "v")
    val out = Merge.upsert(base, upd, "k")
      .as[(Long, Option[String])].collect().toMap
    // per-column coalesce would resurrect "b" here
    assert(out == Map(1L -> Some("a"), 2L -> None))
  }

  test("upsert plans a single shuffle join, no extra exchanges") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val upd = Seq((2L, "c")).toDF("k", "v")
    val plan = Merge.upsert(base, upd, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter") || plan.contains("full_outer"))
  }
}
