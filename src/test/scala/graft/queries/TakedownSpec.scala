package graft.queries

import graft.SparkTestBase

/** Takedown propagation (qCurateTakedown) on planted clusters covering
  * every status: survivor removed → duplicate promoted; whole cluster
  * removed → retired with no survivor; untouched cluster keeps its
  * original survivor; removed and kept singletons.
  * (Removal predicate under test: doc_id % 9 == 8.)
  */
class TakedownSpec extends SparkTestBase {
  import spark.implicits._

  test("promotion, retirement and untouched clusters") {
    val dir = java.nio.file.Files.createTempDirectory("takedown").toString
    val tA = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val tB = "juliet kilo lima mike november oscar papa quebec romeo"
    val tC = "sierra tango uniform victor whiskey xray yankee zulu one"
    val tD = "red orange yellow green blue indigo violet umber ochre"
    val tE = "north south east west up down left right center middle"
    // (doc_id, text): ids 8, 17, 26, 44 are hit by % 9 == 8
    Seq(
      (8L, tA), (20L, tA),   // cluster A: survivor 8 removed → 20 promoted
      (17L, tB), (26L, tB),  // cluster B: both removed → retired
      (30L, tC), (40L, tC),  // cluster C: untouched → 30 kept, 40 dup
      (44L, tD),             // removed singleton
      (50L, tE))             // kept singleton
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.CacheScope.scoped {
      DedupQueries.qCurateTakedown(spark, dir)
        .as[(Long, Long, String, Boolean)].collect().toSeq
    }
    assert(got == Seq(
      (8L, 8L, "removed", false),
      (17L, 17L, "removed", false),
      (20L, 8L, "kept", true),
      (26L, 17L, "removed", false),
      (30L, 30L, "kept", false),
      (40L, 30L, "dup", false),
      (44L, 44L, "removed", false),
      (50L, 50L, "kept", false)))
  }
}
