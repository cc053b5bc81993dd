package graft.queries

import graft.SparkTestBase

/** Farthest-point k-center (kcenterSelect) against a hand-traced
  * greedy run on collinear points (distances are exact squares of
  * small integers).
  *
  * Points (first coordinate, rest 0): id0→0, id1→1, id2→10, id3→11,
  * id4→30. Seed = id0. Trace:
  *  - round 2: mind = [0,1,100,121,900] → id4 (x=30);
  *  - round 3: mind = [0,1,100,121,0] → id3 (x=11);
  *  - round 4: mind = [0,1,1,0,0] → tie at 1 between id1 and id2 →
  *    smallest id wins: id1.
  * Assignment: id2 (x=10) → center id3 (x=11, d²=1).
  */
class KcenterSpec extends SparkTestBase {
  import spark.implicits._

  test("greedy selection order, tie-break, and nearest-center " +
    "assignment match the hand trace") {
    val emb = Seq(0L -> 0f, 1L -> 1f, 2L -> 10f, 3L -> 11f, 4L -> 30f)
      .map { case (id, x) => (id, Seq(x, 0f)) }
      .toDF("vec_id", "embedding")
    val got = graft.ops.CacheScope.scoped {
      SimilarityQueries.kcenterSelect(emb, 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSeq
    }
    assert(got == Seq(
      (0L, 0L, 1, 0.0),   // seed
      (1L, 1L, 4, 0.0),   // 4th center (tie-break winner)
      (2L, 3L, 3, 1.0),   // assigned to x=11, d² = 1
      (3L, 3L, 3, 0.0),
      (4L, 4L, 2, 0.0)))
  }
}
