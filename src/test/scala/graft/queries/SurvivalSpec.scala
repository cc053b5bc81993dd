package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** Kaplan–Meier: hand-computed survival on planted lifetimes with
  * censoring at the observation edge, plus the burstiness moment
  * identity on a planted corpus.
  */
class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  test("KM: churns step the curve down, censored exits only shrink " +
    "the risk set") {
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    var id = 0L
    def user(u: Long, first: Int, last: Int) = Seq(first, last).map { d =>
      id += 1
      (id, Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), u,
        "click", 1.0, "{}")
    }
    // max day = 10; users: (1,3)×2 churn t=2, (2,10) censored t=8,
    // (1,1) churn t=0, (5,10) censored t=5
    (user(1L, 1, 3) ++ user(2L, 1, 3) ++ user(3L, 2, 10) ++
      user(4L, 1, 1) ++ user(5L, 5, 10))
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventSurvival(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 5L, 1L, 0L, 0.8), // 1 − 1/5
      (2L, 4L, 2L, 0L, 0.4), // 0.8 · (1 − 2/4)
      (5L, 2L, 0L, 1L, 0.4), // censored only — curve flat
      (8L, 1L, 0L, 1L, 0.4)))
  }

  test("ltv: two cohorts accumulate independently; non-purchasers " +
    "dilute per-user LTV via floor division") {
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    var id = 0L
    def ev(u: Long, day: String, et: String, v: Double) = {
      id += 1
      (id, Timestamp.valueOf(s"$day 12:00:00"), u, et, v, "{}")
    }
    // 2024-01-01 and 01-08 are ISO week starts (Mondays)
    Seq(
      ev(1L, "2024-01-01", "purchase", 100.0), // cohort w1 age 0
      ev(1L, "2024-01-08", "purchase", 50.0), // cohort w1 age 1
      ev(3L, "2024-01-02", "view", 0.0), // cohort w1, never buys
      ev(2L, "2024-01-08", "purchase", 20.0)) // cohort w2 age 0
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
    val got = EventQueries.qEventLtv(spark, dir)
      .as[(Timestamp, Long, Long, Long, Long, Long)].collect().toSeq
      .map(r => (r._1.toString.take(10), r._2, r._3, r._4, r._5, r._6))
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 10000L, 10000L, 5000L),
      ("2024-01-01", 1L, 2L, 5000L, 15000L, 7500L),
      ("2024-01-08", 0L, 1L, 2000L, 2000L, 2000L)))
  }

  test("burstiness: a one-doc burst scores high VMR, an evenly " +
    "spread token scores below 1") {
    val dir = java.nio.file.Files.createTempDirectory("bu").toString
    // 11 docs: 10 carry one 'y' each; the same 10 carry 'z' —
    // 9 singles plus one 10-burst; doc 11 is filler ('q', df 1 —
    // under the df≥10 floor)
    val docs = (1 to 9).map(i =>
      (i.toLong, "y z")) ++ Seq(
      (10L, ("y " + Seq.fill(10)("z").mkString(" ")).trim),
      (11L, "q"))
    docs.map { case (i, t) => (i, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.qTextBurstiness(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("y", "z"))
    // y: N=11, df=10, tot=10, sq=10 → (110−100)/110
    assert(got("y") == (("y", 10L, 10L,
      BigDecimal(10.0 / 110.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // z: tot=19, sq=9+100 → (11·109−361)/(11·19) = 838/209
    assert(got("z") == (("z", 10L, 19L,
      BigDecimal(838.0 / 209.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("z")._4 > 1.0 && got("y")._4 < 1.0)
  }
}
