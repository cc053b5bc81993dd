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

  import org.apache.spark.sql.functions._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private val history = Seq(
    // k=1: one closed version + a current one; k=2, k=3: current only
    (1L, "old", Some(ts("2023-01-01")), Some(ts("2024-01-01"))),
    (1L, "a", Some(ts("2024-01-01")), None),
    (2L, "b", Some(ts("2024-01-01")), None),
    (3L, "c", Some(ts("2024-01-01")), None))
    .toDF("k", "v", "valid_from", "valid_to")
    .select(col("k"), col("v"), col("valid_from"), col("valid_to"))

  private val batch = Seq(
    (1L, "A", ts("2024-06-01")), // changed → close + new version
    (2L, "b", ts("2024-06-01")), // identical → no-op
    (9L, "z", ts("2024-06-01"))) // unknown key → insert
    .toDF("k", "v", "eff")

  test("scd2: change closes the current version and appends the new one") {
    val out = Merge.scd2(history, batch, "k", "eff")
      .as[(Long, String, Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])].collect().toSet
    assert(out == Set(
      (1L, "old", Some(ts("2023-01-01")), Some(ts("2024-01-01"))),
      (1L, "a", Some(ts("2024-01-01")), Some(ts("2024-06-01"))),
      (1L, "A", Some(ts("2024-06-01")), None),
      (2L, "b", Some(ts("2024-01-01")), None), // no empty version
      (3L, "c", Some(ts("2024-01-01")), None),
      (9L, "z", Some(ts("2024-06-01")), None)))
  }

  test("scd2 keeps the at-most-one-current-row-per-key invariant") {
    val out = Merge.scd2(history, batch, "k", "eff")
    val multi = out.filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(multi == 0)
    // and applying an identical batch twice changes nothing
    val again = Merge.scd2(out, batch, "k", "eff")
    assert(again.count() == out.count())
  }

  test("scd2 composite keys: same tuple = same key, differing tuple is a new key") {
    val hist = Seq(
      (1L, "eu", "a", Some(ts("2024-01-01")), None: Option[java.sql.Timestamp]),
      (1L, "us", "b", Some(ts("2024-01-01")), None: Option[java.sql.Timestamp]))
      .toDF("k", "region", "v", "valid_from", "valid_to")
    val b = Seq(
      (1L, "eu", "A", ts("2024-06-01")),  // change for (1, eu) only
      (2L, "eu", "c", ts("2024-06-01")))  // new composite key
      .toDF("k", "region", "v", "eff")
    val out = Merge.scd2(hist, b, Seq("k", "region"), "eff")
      .as[(Long, String, String, Option[java.sql.Timestamp],
        Option[java.sql.Timestamp])].collect().toSet
    assert(out == Set(
      (1L, "eu", "a", Some(ts("2024-01-01")), Some(ts("2024-06-01"))),
      (1L, "eu", "A", Some(ts("2024-06-01")), None),
      (1L, "us", "b", Some(ts("2024-01-01")), None), // untouched sibling
      (2L, "eu", "c", Some(ts("2024-06-01")), None)))
  }

  test("cdcApply: latest seq wins regardless of arrival order; deletes erase") {
    // scrambled arrival: the seq-3 delete of k=1 arrives FIRST, the
    // seq-2 update of k=2 arrives after its seq-1 insert's shadow, and
    // k=3 is resurrected by an insert AFTER its delete
    val log = Seq(
      (1L, 3L, "D", null.asInstanceOf[String]),
      (1L, 1L, "I", "a1"), (1L, 2L, "U", "a2"),
      (2L, 2L, "U", "b2"), (2L, 1L, "I", "b1"),
      (3L, 2L, "D", null.asInstanceOf[String]),
      (3L, 1L, "I", "c1"), (3L, 3L, "I", "c3"))
      .toDF("k", "seq", "op", "v")
    val out = Merge.cdcApply(log, "k", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "b2", 3L -> "c3")) // k=1 deleted at seq 3
  }

  test("snapshotDiff classifies insert/delete/update, drops unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val next = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val out = Merge.snapshotDiff(prev, next, "k")
      .as[(String, Long, String)].collect().toSet
    assert(out == Set(
      ("delete", 1L, "a"), ("update", 3L, "C"), ("insert", 4L, "d")))
  }

  test("snapshotDiff treats null→value and value→null as updates") {
    val prev = Seq((1L, Some("a")), (2L, None: Option[String]))
      .toDF("k", "v")
    val next = Seq((1L, None: Option[String]), (2L, Some("b")))
      .toDF("k", "v")
    val out = Merge.snapshotDiff(prev, next, "k")
      .as[(String, Long, Option[String])].collect().toSet
    assert(out == Set(("update", 1L, None), ("update", 2L, Some("b"))))
  }

  test("refreshAgg: insert/update/delete deltas == full recompute; " +
    "zero-count groups vanish, new groups appear") {
    // base: k=1 {10,20}, k=2 {5}, k=3 {7}
    val base = Seq((1L, 2L, 30L), (2L, 1L, 5L), (3L, 1L, 7L))
      .toDF("k", "n", "s")
    val delta = Seq(
      (1L, 0L, 3L),   // update: one k=1 row 10→13
      (2L, -1L, -5L), // delete k=2's only row → group vanishes
      (4L, 1L, 9L),   // insert into brand-new group
      (4L, 1L, 1L))   // and another
      .toDF("k", "dn", "ds")
    val out = Merge.refreshAgg(base, delta, "k", "n", "dn",
        Seq(("s", "ds")))
      .as[(Long, Long, Long)].collect().toSet
    // recompute: k=1 {13,20}, k=3 {7}, k=4 {9,1}
    assert(out == Set((1L, 2L, 33L), (3L, 1L, 7L), (4L, 2L, 10L)))
  }

  test("refreshAgg: untouched groups pass through bit-identically") {
    val base = Seq((1L, 3L, 100L), (2L, 2L, 50L)).toDF("k", "n", "s")
    val delta = Seq((2L, 1L, 25L)).toDF("k", "dn", "ds")
    val out = Merge.refreshAgg(base, delta, "k", "n", "dn",
        Seq(("s", "ds")))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 100L), (2L, 3L, 75L)))
  }
}
