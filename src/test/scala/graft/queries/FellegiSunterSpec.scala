package graft.queries

import graft.SparkTestBase

/** Fellegi–Sunter weights/score (qErWeights, qErScore) against the
  * class structure the fixture rates imply, derived from first
  * principles (perturbation moduli), not from the query.
  */
class FellegiSunterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every injected duplicate with at least one surviving " +
    "discriminative field classifies 'match'; doubly-perturbed pairs " +
    "are the (only) false negatives") {
    // injected: id % 7 == 0; name noised at id % 21 == 0, balance at
    // id % 35 == 0 → a pair keeps a conclusive field unless BOTH hit,
    // i.e. id % 105 == 0
    val nCust = graft.io.Tables.customer(spark, dir).count()
    val expectMatch = (1L to nCust)
      .filter(id => id % 7 == 0 && id % 105 != 0)
      .map(id => (id, id + 1000000L)).toSet
    val expectMiss = (1L to nCust).filter(_ % 105 == 0)
      .map(id => (id, id + 1000000L)).toSet
    val got = MiningQueries.qErScore(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(2),
        r.getBoolean(4), r.getBoolean(5), r.getString(6)))
    val gotTrue = got.collect { case (p, _, _, true, d) => (p, d) }.toMap
    assert(expectMatch.forall(p => gotTrue.get(p).contains("match")),
      "all singly-noised duplicates must classify match")
    assert(expectMiss.forall(p => !gotTrue.contains(p)),
      "doubly-perturbed duplicates have no agreeing discriminative " +
        "field left and must be suppressed (the honest FN class)")
    // non-labeled emissions are the deterministic FP class: only an
    // agreeing high-information field (chance name or balance
    // collision) can push a non-match over a threshold
    assert(got.collect { case (_, agName, agBal, false, _) =>
      agName || agBal }.forall(identity),
      "a false positive without any conclusive agreement is impossible")
  }

  test("weight ordering matches field information content: name and " +
    "balance near-conclusive on agreement, segment weak") {
    val w = MiningQueries.qErWeights(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(7)).toMap // w_agree_r6
    assert(w("name") > 100 && w("bal") > 100,
      "high-information fields must carry decisive agreement weight")
    assert(w("seg") < 100,
      "a 5-value field cannot be conclusive alone")
  }
}
