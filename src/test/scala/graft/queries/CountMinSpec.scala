package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Count-Min estimates (AggQueries.countMinEstimates): the one-sided
  * error guarantee — est ≥ exact ALWAYS, equality when no collision —
  * under adversarially small widths, plus partition invariance of the
  * additive counter grid.
  */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  // zipf-ish stream over 20 distinct tokens
  private val stream = (1 to 20).flatMap(i =>
    Seq.fill(420 / i)(s"tok$i"))

  private def run(w: Int, parts: Int) =
    AggQueries.countMinEstimates(
        stream.toDF("tok").repartition(parts), d = 4, w = w)
      .select(col("tok"), col("c_exact"), col("c_est"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)

  test("never underestimates, even at width 4 (heavy collisions)") {
    val got = run(w = 4, parts = 5)
    assert(got.size == 20)
    assert(got.forall { case (_, ex, est) => est >= ex },
      s"undercount in $got")
    assert(got.exists { case (_, ex, est) => est > ex },
      "width 4 with 20 tokens must collide somewhere")
  }

  test("wide grid recovers exact counts (no collisions)") {
    val got = run(w = 1 << 16, parts = 3)
    assert(got.forall { case (_, ex, est) => est == ex }, s"got $got")
  }

  test("grid is additive: partitioning does not change estimates") {
    assert(run(w = 8, parts = 1) == run(w = 8, parts = 13))
  }

  test("CM inner product never underestimates the join cardinality " +
    "and recovers it exactly without collisions") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(300)(s"k${rnd.nextInt(25)}")
    val b = Seq.fill(200)(s"k${rnd.nextInt(25)}")
    val exact = (0 until 25).map(i =>
      a.count(_ == s"k$i").toLong * b.count(_ == s"k$i")).sum
    def inner(w: Int): Long = {
      val ga = AggQueries.cmGrid(a.toDF("tok"), d = 4, w = w)
      val gb = AggQueries.cmGrid(b.toDF("tok"), d = 4, w = w)
        .withColumnRenamed("cnt", "cntb")
      ga.join(gb, Seq("r", "c"))
        .groupBy(col("r")).agg(sum(col("cnt") * col("cntb")).as("e"))
        .agg(min(col("e"))).as[Long].head()
    }
    val tight = inner(w = 8)
    assert(tight >= exact, s"tight=$tight exact=$exact")
    assert(inner(w = 1 << 16) == exact)
  }
}
