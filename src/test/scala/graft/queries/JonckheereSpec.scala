package graft.queries

import graft.SparkTestBase

/** [[StatsQueries.jonckheereFromValues]] vs explicit between-group
  * pair enumeration (doubled counts: 2·#{x<y} + #{x=y} over ordered
  * group pairs) — J2 and every moment must match exactly, ties
  * included; verdict sanity on planted monotone shift.
  */
class JonckheereSpec extends SparkTestBase {
  import spark.implicits._

  private val slugs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  private def bruteJ2(vals: Seq[(Int, Long)]): Long =
    (for {
      (ga, xa) <- vals; (gb, xb) <- vals
      if ga < gb
    } yield (if (xa < xb) 2L else if (xa == xb) 1L else 0L)).sum

  private def engine(vals: Seq[(Int, Long)]) = {
    val df = vals.map { case (g, x) => (slugs(g), x) }.toDF("g", "x")
    StatsQueries.jonckheereFromValues(df)
      .select("n", "j2", "e4").as[(Long, Long, Long)].head()
  }

  test("brute parity with heavy ties across random small-domain draws") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 4) {
      val vals = Seq.fill(40 + rnd.nextInt(40))(
        (rnd.nextInt(5), rnd.nextInt(8).toLong))
      val (n, j2, e4) = engine(vals)
      assert(n == vals.length.toLong, s"trial $trial")
      assert(j2 == bruteJ2(vals), s"trial $trial")
      val sn2 = (0 until 5).map(g =>
        { val c = vals.count(_._1 == g).toLong; c * c }).sum
      assert(e4 == n * n - sn2, s"trial $trial")
    }
  }

  test("planted monotone shift rejects; shuffled labels do not") {
    val rnd = new scala.util.Random(5)
    val shifted = (0 until 5).flatMap(g =>
      Seq.fill(30)((g, 100L * g + rnd.nextInt(60))))
    val df1 = shifted.map { case (g, x) => (slugs(g), x) }.toDF("g", "x")
    val r1 = StatsQueries.jonckheereFromValues(df1)
      .select("z_r6", "reject").as[(Double, Boolean)].head()
    assert(r1._2 && r1._1 > 3.0, r1)
    val labels = rnd.shuffle(shifted.map(_._1))
    val df2 = labels.zip(shifted.map(_._2))
      .map { case (g, x) => (slugs(g), x) }.toDF("g", "x")
    val r2 = StatsQueries.jonckheereFromValues(df2)
      .select("z_r6").as[Double].head()
    assert(math.abs(r2) < math.abs(r1._1), (r1, r2))
  }
}
