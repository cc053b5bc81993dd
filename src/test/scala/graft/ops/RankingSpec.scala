package graft.ops

import graft.SparkTestBase

/** Exact AUC ([[Ranking.aucExact]]) against hand-computed rank sums,
  * tie handling included.
  */
class RankingSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Double) =
    CacheScope.scoped {
      val r = Ranking.aucExact(rows.toDF("score", "label"),
        "score", "label").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }

  test("perfect separation gives AUC 1, reversed gives 0, random " +
    "interleave hand-checks") {
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true)))
      == (2L, 2L, 8L, 1.0))
    assert(auc(Seq((4L, false), (3L, false), (1L, true), (2L, true)))
      == (2L, 2L, 0L, 0.0))
    // scores 1..4, positives at 2 and 4: ranks 2+4=6, U = 6-3 = 3,
    // AUC = 3/4
    assert(auc(Seq((1L, false), (2L, true), (3L, false), (4L, true)))
      == (2L, 2L, 6L, 0.75))
  }

  test("ties take average ranks: all-equal scores give AUC 1/2 " +
    "exactly; a partial tie group hand-checks") {
    assert(auc(Seq((7L, true), (7L, false), (7L, true), (7L, false)))
      ._4 == 0.5)
    // scores (1,neg) (2,pos) (2,neg) (3,pos): tie group at 2 has
    // avg rank 2.5 → 2·Σ_pos r̄ = 5 + 8 = 13, u2 = 13 − 6 = 7,
    // AUC = 7/8
    assert(auc(Seq((1L, false), (2L, true), (2L, false), (3L, true)))
      == (2L, 2L, 7L, 0.875))
  }
}
