package graft.ops

import graft.SparkTestBase

class CacheScopeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and agaix"),
    (2L, "completely different content about spark engines at scale")
  ).toDF("doc_id", "text")

  test("scoped run leaves no cached RDDs behind") {
    // preexisting session caches (from other suites sharing the session)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CacheScope.scoped {
      val n = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5).count()
      assert(n >= 1)
      // inside the scope the intermediates ARE cached (that's the point)
      assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("scope releases caches even when the body throws") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[RuntimeException] {
      CacheScope.scoped {
        Dedup.minhashPairs(docs, "doc_id", "text").count()
        throw new RuntimeException("boom")
      }
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
  }

  test("memoizedDisk builds once, parks the result in a parquet " +
    "sidecar, and hands consumers a flat scan of it") {
    val scratch = java.nio.file.Files
      .createTempDirectory("memo-scratch").toString
    var builds = 0
    CacheScope.sharedScopeWithScratch(scratch) {
      def get() = CacheScope.memoizedDisk("spec:docs") {
        builds += 1; docs
      }
      val a = get(); val b = get()
      assert(builds == 1, "second call must hit the memo")
      assert(a.collect().toSet == docs.collect().toSet)
      assert(b.collect().toSet == docs.collect().toSet)
      // the consumer plan is a scan of the sidecar, not live lineage:
      // evicting every cached block cannot force a recompute
      val rel = a.queryExecution.optimizedPlan.collectLeaves()
      assert(rel.exists(_.toString.contains("parquet")),
        s"expected a parquet sidecar scan, got: ${rel.mkString(";")}")
      assert(new java.io.File(scratch).listFiles().nonEmpty)
    }
    assert(!new java.io.File(scratch).exists(),
      "scratch root must be deleted when the scope exits")
  }

  test("memoizedDisk without a scratch root degrades to the in-memory " +
    "memo semantics") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = CacheScope.memoizedDisk("spec:fallback")(docs)
    assert(df.collect().length == 3)
    // fell back to cached(): a persisted plan, no sidecar anywhere
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty)
    df.unpersist(blocking = true)
  }

  test("without a scope, cached() degrades to a session-lifetime persist") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ds = CacheScope.cached(spark.range(10).toDF())
    ds.count()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty)
    ds.unpersist(blocking = true)
  }
}
