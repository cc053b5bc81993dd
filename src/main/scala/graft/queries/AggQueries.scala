package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Exact._

/** Aggregation battery (SURVEY.md §2-B "Aggregations").
  *
  * Each query is a scan → (filter) → hash-aggregate plan: Catalyst emits
  * partial (map-side) + final aggregation automatically, so at 100 TB the
  * shuffle carries one row per (partition × group), not per input row.
  */
object AggQueries {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: the flagship scan→filter→agg→sort slice. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumFixed($"l_quantity", 2).as("sum_qty"),
        sumFixed($"l_extendedprice", 2).as("sum_base_price"),
        (sum(e2($"l_extendedprice") * (lit(100L) - e2($"l_discount"))) / 10000.0)
          .as("sum_disc_price"),
        (sum(e2($"l_extendedprice") * (lit(100L) - e2($"l_discount"))
          * (lit(100L) + e2($"l_tax"))) / 1000000.0).as("sum_charge"),
        (sumFixed($"l_quantity", 2) / count(lit(1))).as("avg_qty"),
        (sumFixed($"l_extendedprice", 2) / count(lit(1))).as("avg_price"),
        (sumFixed($"l_discount", 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val defs: Map[String, Q] = Map(
    "q1_pricing_summary" -> (q1PricingSummary(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(SUM(l_quantity), 2) AS sum_qty,
        |  round(SUM(l_extendedprice), 2) AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT)) * (100 + CAST(round(l_tax*100,0) AS BIGINT))) AS BIGINT) / 1000000.0 AS sum_charge,
        |  round(SUM(l_quantity), 2) / COUNT(*) AS avg_qty,
        |  round(SUM(l_extendedprice), 2) / COUNT(*) AS avg_price,
        |  round(SUM(l_discount), 2) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
