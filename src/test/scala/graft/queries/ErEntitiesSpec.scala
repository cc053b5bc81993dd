package graft.queries

import graft.SparkTestBase

/** [[MiningQueries.entitiesFromMatches]] (ER entity formation) on
  * hand-traced match graphs: transitive closure merges chains,
  * canonical entity id = min member id, members sorted; records with
  * no match pair never appear (singletons stay un-entitied).
  */
class ErEntitiesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Seq[(Long, Long, String)] =
    graft.ops.CacheScope.scoped {
      MiningQueries.entitiesFromMatches(pairs.toDF("id_a", "id_b"))
        .as[(Long, Long, String)].collect().toSeq
    }

  test("3-chain A–B–C closes into ONE entity; disjoint pair stays " +
    "separate; untouched ids absent") {
    // A≈B, B≈C but never A≈C directly — closure must still merge;
    // (10, 11) is an independent pair; id 99 appears nowhere.
    val got = run(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Seq(
      (1L, 3L, "1,2,3"),   // canonical id = min member, members sorted
      (10L, 2L, "10,11")))
  }

  test("two chains sharing a bridge record collapse to one entity; " +
    "reversed/duplicate pair orientation is harmless") {
    // 4–5, 6–5 (reversed), 6–7: all connected through 5 and 6; the
    // duplicate (5, 4) must not double-count members.
    val got = run(Seq((4L, 5L), (6L, 5L), (6L, 7L), (5L, 4L)))
    assert(got == Seq((4L, 4L, "4,5,6,7")))
  }

  test("star merge: hub with three spokes forms one 4-member entity") {
    val got = run(Seq((20L, 21L), (20L, 22L), (20L, 23L)))
    assert(got == Seq((20L, 4L, "20,21,22,23")))
  }

  test("driver union-find tier and forced-distributed CC agree") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (6L, 5L))
    val local = run(pairs)
    val dist = graft.ops.CacheScope.scoped {
      val df = pairs.toDF("id_a", "id_b")
      graft.ops.Dedup.dedupComponentsAuto(df, smallLimit = 0L)
        .groupBy($"component".as("entity"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_members"))
        .as[(Long, Long)].collect().toMap
    }
    assert(local.map(t => (t._1, t._2)).toMap == dist)
  }
}
