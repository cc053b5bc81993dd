package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Poisson bootstrap (qStatBootstrap) against an independent scalar
  * replay of the md5-uniform → Poisson(1) weight assignment and the
  * rank-selected CI bounds, plus a weight-distribution sanity check.
  */
class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val cdf = Seq(0.36787944117144233, 0.73575888234288467,
    0.91969860292860583, 0.98101184312384622, 0.99634015317265632,
    0.99940581518241834, 0.99991675885071201)

  private def weight(eventId: Long, rep: Int): Int = {
    val u = java.lang.Long.parseLong(
      md5hex(s"$eventId:$rep").substring(0, 8), 16) / 4294967296.0
    val k = cdf.indexWhere(u < _)
    if (k < 0) 7 else k
  }

  test("CI bounds equal the scalar replay on a planted series") {
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    val cents = (1 to 200).map(i => (i.toLong, (i * 7 % 100) * 10 + 5))
    cents.map { case (id, c) =>
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), id % 9, "click",
        c / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = StatsQueries.qStatBootstrap(spark, dir)
      .as[(String, Long, Double, Double)].collect().toSeq
    val means = (0 until 32).map { rep =>
      val ws = cents.map { case (id, c) => (weight(id, rep), c) }
      ws.map { case (w, c) => w.toLong * c }.sum.toDouble /
        ws.map(_._1.toLong).sum
    }.sorted
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(got == Seq(("click", 32L, r6(means(1)), r6(means(30)))))
    // weight-0 fraction ≈ e^-1 (deterministic for this fixture)
    val zeros = (for (rep <- 0 until 32; (id, _) <- cents)
      yield weight(id, rep)).count(_ == 0)
    val frac = zeros.toDouble / (32 * 200)
    assert(math.abs(frac - 0.3679) < 0.02, s"zero fraction $frac")
  }
}
