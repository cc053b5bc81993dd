package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Predicate battery (SURVEY.md §2-B "Projection / filter / predicates"):
  * IN / BETWEEN / LIKE / null-test / boolean composition, plus rename and
  * derived columns. All pushdown-eligible shapes.
  */
object FilterQueries {
  type Q = (SparkSession, String) => DataFrame

  def qFilterPredicates(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_totalprice").between(50000, 150000) &&
        col("o_orderstatus") =!= "P" &&
        (col("o_orderdate") >= lit("1994-01-01").cast("timestamp") ||
          col("o_orderkey") % 100 === 0))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  def qFilterNullTest(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"))
      .filter(col("seg_or_null").isNull ||
        col("seg_or_null").like("%MACH%"))
      .withColumnRenamed("seg_or_null", "segment")
      .withColumn("is_building", col("segment").isNull)
      .orderBy(col("c_custkey"))
  }

  /** Map-typed columns: build, project keys/values, explode to rows. */
  def qFuncMap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        map_from_arrays(
          array(lit("n_chars"), lit("n_tokens")),
          array(col("n_chars"),
            graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")))
          .as("m"))
      .select(col("doc_id"), explode(col("m")).as(Seq("metric", "value")))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
        max(col("value")).as("max_value"))
      .orderBy(col("metric"))
  }

  val defs: Map[String, Q] = Map(
    "q_filter_predicates" -> (qFilterPredicates(_, _)),
    "q_filter_null_test" -> (qFilterNullTest(_, _)),
    "q_func_map" -> (qFuncMap(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_filter_predicates" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice BETWEEN 50000 AND 150000
        |  AND o_orderstatus <> 'P'
        |  AND (o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |       OR o_orderkey % 100 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_null_test" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS segment,
        |  NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building
        |FROM customer
        |WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
        |   OR NULLIF(c_mktsegment, 'BUILDING') LIKE '%MACH%'
        |ORDER BY c_custkey""".stripMargin,
    "q_func_map" ->
      """WITH kv AS (
        |  SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'n_tokens',
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
        |  FROM documents)
        |SELECT metric, COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS total,
        |  MAX(value) AS max_value
        |FROM kv GROUP BY metric ORDER BY metric""".stripMargin
  )
}
