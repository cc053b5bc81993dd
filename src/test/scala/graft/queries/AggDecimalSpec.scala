package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

/** Wide-DECIMAL exact path: proves the decimal route is NECESSARY (the
  * Int64 fixed-point route genuinely overflows on money power sums) and
  * exact (decimal sums carry the true value past Long.MaxValue).
  */
class AggDecimalSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("Σ(cents²) of o_totalprice overflows Int64; decimal(38,4) carries it") {
    // the Exact.e2 integer route: overflows Long (ANSI mode → throws)
    val ex = intercept[Exception] {
      Tables.orders(spark, dir)
        .agg(sum(Exact.e2($"o_totalprice") * Exact.e2($"o_totalprice")))
        .head()
    }
    assert(ex.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      Option(ex.getCause).exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")))
    // the decimal route: exact at full width, past Long.MaxValue
    val p = $"o_totalprice".cast("decimal(18,2)")
    val decRoute = Tables.orders(spark, dir)
      .agg(sum(p * p).cast("decimal(38,4)").as("dec_route"))
      .head().getAs[java.math.BigDecimal]("dec_route")
    // dec_route has scale 4, so ×1e4 gives the cents² integer the long
    // route could not hold
    val decAsCents2 = decRoute.scaleByPowerOfTen(4).toBigInteger
    assert(decAsCents2.compareTo(
      java.math.BigInteger.valueOf(Long.MaxValue)) > 0,
      s"fixture too small to overflow: $decAsCents2")
  }

  test("q_agg_decimal_wide group sums reproduce a driver-side BigDecimal fold") {
    val got = AggQueries.qAggDecimalWide(spark, dir)
      .select($"o_orderstatus", $"sum_price_sq")
      .as[(String, String)].collect().toMap
    val want = Tables.orders(spark, dir)
      .select($"o_orderstatus", $"o_totalprice")
      .as[(String, Double)].collect()
      .groupBy(_._1)
      .map { case (k, rows) =>
        val sum = rows.foldLeft(java.math.BigDecimal.ZERO) { case (acc, (_, v)) =>
          val d = new java.math.BigDecimal(v)
            .setScale(2, java.math.RoundingMode.HALF_UP)
          acc.add(d.multiply(d))
        }
        k -> sum.setScale(4).toPlainString
      }
    assert(got == want)
  }
}
