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

  test("without a scope, cached() degrades to a session-lifetime persist") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ds = CacheScope.cached(spark.range(10).toDF())
    ds.count()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty)
    ds.unpersist(blocking = true)
  }
}
