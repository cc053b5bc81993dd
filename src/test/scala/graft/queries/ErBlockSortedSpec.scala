package graft.queries

import graft.SparkTestBase

/** [[MiningQueries.sortedNeighborCandidates]] (Hernández–Stolfo
  * merge/purge, window 3) against hand-traced sort windows: pairs are
  * exactly the records within 2 sort positions inside a nation; close
  * names meet, far names don't; nations never mix.
  */
class ErBlockSortedSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]) =
    graft.ops.CacheScope.scoped {
      MiningQueries.sortedNeighborCandidates(
          rows.toDF("id", "name", "nat"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }

  test("hand-traced windows: only sort-adjacent (±2) pairs within a " +
    "nation; cross-nation neighbors never pair") {
    // nation 1 sort order by (name, id): (1 aaa), (4 aab), (2 bbb),
    // (3 zzz) → pairs at distance 1 and 2 only
    // nation 2: single record 9 → no pairs
    val got = run(Seq(
      (1L, "aaa", 1L), (2L, "bbb", 1L), (3L, "zzz", 1L),
      (4L, "aab", 1L), (9L, "aaa", 2L)))
    assert(got == Set(
      (1L, 4L), (2L, 4L), (1L, 2L), // distance-1 then distance-2
      (2L, 3L), (3L, 4L)))
    // zzz (rank 4) meets only ranks 3 and 2 — never rank 1
    assert(!got.contains((1L, 3L)))
  }

  test("duplicate with identical name sorts adjacent and is caught; " +
    "a leading-character corruption escapes the window") {
    val recs = Seq(
      (1L, "Customer#1", 1L), (1000001L, "Customer#1", 1L), // exact dup
      (2L, "Customer#2", 1L), (1000002L, "Xustomer#2", 1L), // corrupted
      (3L, "Customer#3", 1L), (4L, "Customer#4", 1L),
      (5L, "Customer#5", 1L))
    val got = run(recs)
    assert(got.contains((1L, 1000001L))) // identical names: adjacent
    // "Xustomer#2" sorts after every Customer#* — 5 positions from
    // its twin, outside the window
    assert(!got.contains((2L, 1000002L)))
  }

  test("tie names break by id: equal-name block stays adjacent") {
    val got = run(Seq(
      (7L, "same", 1L), (5L, "same", 1L), (6L, "same", 1L)))
    assert(got == Set((5L, 6L), (6L, 7L), (5L, 7L)))
  }
}
