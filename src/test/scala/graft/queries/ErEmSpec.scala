package graft.queries

import graft.SparkTestBase

/** Unsupervised Fellegi–Sunter EM ([[MiningQueries.qErEm]]): the
  * 3-round scaled-integer recursion is hand-iterated here in BigInt
  * over an INDEPENDENTLY brute-forced candidate histogram (plain Scala
  * over the collected fixture — no Spark plan shared with the query),
  * and the query must reproduce it parameter-for-parameter. A second
  * test checks the estimates recover the fixture's known class
  * structure without ever seeing a label.
  */
class ErEmSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val S = BigInt(1000000)

  /** Brute-force dirty table + deletion-neighborhood candidates +
    * 2³ agreement-pattern histogram, all in driver-side Scala. */
  private def bruteHistogram(): Map[(Boolean, Boolean, Boolean), Long] = {
    val cust = graft.io.Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getDouble(4)))
    val dirty = cust.filter(_._1 % 7 == 0).map { case (id, nm, nat, seg, bal) =>
      val pos = (id % 18).toInt
      val noised =
        if (id % 21 == 0) nm.substring(0, pos) + "x" + nm.substring(pos + 1)
        else nm
      (id + 1000000L, noised, nat,
        seg, if (id % 35 == 0) bal + 1.0 else bal)
    }
    val all = cust ++ dirty
    def keys(name: String): Seq[(Int, String)] =
      (0, name) +: (1 to 18).map(i =>
        (i, name.substring(0, i - 1) + "_" + name.substring(i)))
    val byKey = all.flatMap { rec =>
      keys(rec._2).map { case (i, k) => ((rec._3, i, k), rec) }
    }.groupBy(_._1)
    val pairs = byKey.values.flatMap { rs =>
      val recs = rs.map(_._2).toSeq
      for {
        a <- recs; b <- recs
        if a._1 < b._1
      } yield ((a._1, b._1), (a._2 == b._2, a._4 == b._4, a._5 == b._5))
    }.toMap // one entry per distinct pair (flags are pair functions)
    pairs.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  /** The qErEm recursion in BigInt: floor divisions, [1, S−1] clamps. */
  private def handEm(hist: Map[(Boolean, Boolean, Boolean), Long],
      rounds: Int): (Map[String, BigInt], Map[String, BigInt], BigInt) = {
    var m = Map("name" -> BigInt(900000), "seg" -> BigInt(900000),
      "bal" -> BigInt(900000))
    var u = Map("name" -> BigInt(100000), "seg" -> BigInt(100000),
      "bal" -> BigInt(100000))
    var p = BigInt(500000)
    def clamp(x: BigInt): BigInt = x.max(BigInt(1)).min(S - 1)
    for (_ <- 1 to rounds) {
      val aw = collection.mutable.Map("name" -> BigInt(0),
        "seg" -> BigInt(0), "bal" -> BigInt(0))
      val au = aw.clone()
      var bw, bu, tot = BigInt(0)
      hist.foreach { case ((an, as_, ab), cnt) =>
        val g = Map("name" -> an, "seg" -> as_, "bal" -> ab)
        var num = p
        var up = S - p
        Seq("name", "seg", "bal").foreach { f =>
          num *= (if (g(f)) m(f) else S - m(f))
          up *= (if (g(f)) u(f) else S - u(f))
        }
        val w = (S * num) / (num + up)
        bw += cnt * w; bu += cnt * (S - w); tot += cnt
        Seq("name", "seg", "bal").foreach { f =>
          if (g(f)) { aw(f) += cnt * w; au(f) += cnt * (S - w) }
        }
      }
      m = m.keys.map(f => f -> clamp((S * aw(f)) / bw)).toMap
      u = u.keys.map(f => f -> clamp((S * au(f)) / bu)).toMap
      p = clamp(bw / tot)
    }
    (m, u, p)
  }

  test("qErEm replays the BigInt hand iteration exactly") {
    val (m, u, p) = handEm(bruteHistogram(), 3)
    val got = MiningQueries.qErEm(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    Seq("name", "seg", "bal").foreach { f =>
      assert(got(f)._1 == m(f).toLong, s"m_$f")
      assert(got(f)._2 == u(f).toLong, s"u_$f")
      assert(got(f)._3 == p.toLong, s"p via $f row")
    }
  }

  test("the unsupervised estimates recover the fixture's class " +
    "structure: m ordering, u_seg near chance, p near the true rate") {
    val got = MiningQueries.qErEm(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5)))
      .toMap
    // seg survives every injection → m_seg is the largest m; name is
    // noised for 1/3 of dupes and bal for 1/5, so m_name < m_bal
    assert(got("seg")._1 > got("bal")._1 && got("bal")._1 > got("name")._1)
    // u: a 5-value field agrees near 1/5 for random pairs; name/bal
    // near-never among non-matches
    assert(got("seg")._2 > 0.1 && got("seg")._2 < 0.35)
    assert(got("name")._2 < 0.05 && got("bal")._2 < 0.05)
  }
}
