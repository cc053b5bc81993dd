package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[Prefix]] must equal the single-partition window it replaces, on
  * any input — including inputs far wider than one range partition,
  * descending composite orders, and duplicate order keys.
  */
class PrefixSpec extends SparkTestBase {
  import spark.implicits._

  test("runningSumInclusive == global-window cumsum (desc composite " +
    "order, duplicate sizes, many partitions)") {
    // 500 rows with heavy ties in the primary order column
    val df = spark.range(500)
      .select(col("id"),
        (pmod(col("id") * 37, lit(20)) * 100).as("sz"))
    val w = Window.orderBy(col("sz").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("rt", sum(col("sz")).over(w))
      .select("id", "rt").as[(Long, Long)].collect().toMap
    val got = CacheScope.scoped {
      Prefix.runningSumInclusive(df,
        Seq(col("sz").desc, col("id")), col("sz"), "rt")
        .select("id", "rt").as[(Long, Long)].collect().toMap
    }
    assert(got == expect)
  }

  test("runningMaxExclusive == global-window prefix max; first row " +
    "gets null") {
    val df = spark.range(300)
      .select(col("id").as("x"),
        pmod(col("id") * 7919, lit(1000)).as("y"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("m", max(col("y")).over(w))
      .select("x", "m").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val got = CacheScope.scoped {
      Prefix.runningMaxExclusive(df, Seq(col("x")), col("y"), "m")
        .select("x", "m").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    }
    assert(got == expect)
    assert(got(0L) == -1L, "row with no predecessor must carry null")
  }

  test("denseRank == global-window dense_rank, including a NULL key " +
    "group (the carry must count the NULL group the local window ranks)") {
    // nulls land in the FIRST range partition (asc nulls-first), so a
    // carry that drops them shifts every rank in later partitions — the
    // exact silent-wrong-answer mode flagged in ADVICE r10
    val df = spark.range(400)
      .select(col("id"),
        when(pmod(col("id"), lit(17)) === 0, lit(null))
          .otherwise(pmod(col("id") * 31, lit(60))).as("k"))
    val expect = df.withColumn("r",
        dense_rank().over(Window.orderBy(col("k"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = CacheScope.scoped {
      Prefix.denseRank(df, Seq(col("k")), "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
    }
    assert(got == expect)
  }

  test("denseRank composite order with nulls in the secondary key") {
    val df = spark.range(300)
      .select(col("id"),
        pmod(col("id"), lit(7)).as("a"),
        when(pmod(col("id"), lit(11)) === 0, lit(null))
          .otherwise(pmod(col("id"), lit(13))).as("b"))
    val expect = df.withColumn("r",
        dense_rank().over(Window.orderBy(col("a"), col("b"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = CacheScope.scoped {
      Prefix.denseRank(df, Seq(col("a"), col("b")), "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
    }
    assert(got == expect)
  }

  test("empty and single-row inputs") {
    CacheScope.scoped {
      val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
      assert(Prefix.runningMaxExclusive(empty, Seq(col("x")), col("y"), "m")
        .count() == 0)
      val one = spark.range(1).select(col("id").as("x"), lit(5L).as("y"))
      val r = Prefix.runningSumInclusive(one, Seq(col("x")), col("y"), "rt")
        .select("rt").as[Long].collect().toSeq
      assert(r == Seq(5L))
    }
  }
}
