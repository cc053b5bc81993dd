package graft.queries

import graft.SparkTestBase
import graft.ops.CacheScope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [[StreamQueries.qTimeForecastEval]] vs a scalar replay of all four
  * models, via a temp parquet events fixture (the query reads the
  * events table shape). */
class ForecastEvalSpec extends SparkTestBase {
  import spark.implicits._

  /** Build an events dir whose single type has daily counts `ns`. */
  private def eventsDir(ns: Seq[Int]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("fceval").toString
    val rows = ns.zipWithIndex.flatMap { case (n, i) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (0 until n).map(k => (
        java.sql.Timestamp.valueOf(day.atTime(1, 0).plusSeconds(k)),
        s"e$i-$k", "click", 1.0, i.toLong * 1000 + k))
    }
    rows.toDF("ts", "name", "event_type", "value", "event_id")
      .select($"event_id", $"ts", $"event_type", $"value",
        lit(1L).as("user_id"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private def replay(ns: Seq[Int]): Map[String, (Double, Double, Double)] = {
    val xs = ns.map(_.toDouble)
    val n = xs.length
    var ew = xs(0) * 0.5 + xs(1) * 0.5
    var l = xs(1); var b = xs(1) - xs(0)
    var (saeE, sseE, saeH, sseH) = (0.0, 0.0, 0.0, 0.0)
    for (t <- 2 until n) {
      val x = xs(t)
      if (t + 1 >= 8) { // rn is 1-based
        saeE += math.abs(x - ew); sseE += (x - ew) * (x - ew)
        saeH += math.abs(x - (l + b)); sseH += (x - (l + b)) * (x - (l + b))
      }
      ew = ew * 0.5 + x * 0.5
      val l2 = (x + (l + b)) * 0.5
      b = ((l2 - l) + b) * 0.5; l = l2
    }
    val idx = (7 until n) // rn >= 8, 0-based t >= 7
    val saeN = idx.map(t => math.abs(xs(t) - xs(t - 1))).sum
    val sseN = idx.map(t => math.pow(xs(t) - xs(t - 1), 2)).sum
    val saeS = idx.map(t => math.abs(xs(t) - xs(t - 7))).sum
    val sseS = idx.map(t => math.pow(xs(t) - xs(t - 7), 2)).sum
    val cnt = idx.size.toDouble
    def m(sae: Double, sse: Double) =
      (sae / cnt, math.sqrt(sse / cnt), sae / saeN)
    Map("naive" -> m(saeN, sseN), "snaive" -> m(saeS, sseS),
      "ewma" -> m(saeE, sseE), "holt" -> m(saeH, sseH))
  }

  test("scoreboard matches the scalar replay; naive MASE is exactly " +
    "1; strong weekly seasonality makes snaive win") {
    // period-7 sawtooth + drift: snaive should dominate
    val ns = (0 until 28).map(i => 50 + 20 * (i % 7) + i / 7)
    val dir = eventsDir(ns)
    val rows = CacheScope.scoped {
      StreamQueries.qTimeForecastEval(spark, dir)
        .select("model", "n_eval", "mae_r6", "rmse_r6", "mase_r6")
        .as[(String, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    val exp = replay(ns)
    assert(rows.keySet == exp.keySet)
    for ((model, (cnt, mae, rmse, mase)) <- rows) {
      val (em, er, es) = exp(model)
      assert(cnt == 21L, s"$model n_eval")
      assert(math.abs(mae - em) < 1e-6, s"$model mae $mae vs $em")
      assert(math.abs(rmse - er) < 1e-6, s"$model rmse $rmse vs $er")
      assert(math.abs(mase - es) < 1e-6, s"$model mase $mase vs $es")
    }
    assert(rows("naive")._4 == 1.0, "naive MASE is 1 by construction")
    assert(rows("snaive")._4 < rows("naive")._4,
      "seasonal naive must beat naive on a period-7 series")
    assert(rows("snaive")._4 < rows("ewma")._4)
  }
}
