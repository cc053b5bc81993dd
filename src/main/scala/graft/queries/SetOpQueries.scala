package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Set-operation battery (SURVEY.md §2-B "Sort / limit / top-k / set ops").
  * Sides are the customer- and supplier-nation projections (same schema,
  * different multiplicities — exercises the ALL variants meaningfully).
  */
object SetOpQueries {
  type Q = (SparkSession, String) => DataFrame

  private def custNations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
  private def suppNations(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))

  def qSetUnionAll(spark: SparkSession, dir: String): DataFrame =
    custNations(spark, dir).unionAll(suppNations(spark, dir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  def qSetUnionDistinct(spark: SparkSession, dir: String): DataFrame =
    custNations(spark, dir).union(suppNations(spark, dir)).distinct()
      .orderBy(col("nationkey"))

  def qSetIntersect(spark: SparkSession, dir: String): DataFrame =
    custNations(spark, dir).intersect(suppNations(spark, dir))
      .orderBy(col("nationkey"))

  /** EXCEPT with a provably non-empty result: orders that have no
    * lineitems (257 keys at sf0.01 — the fixture generates some empty
    * orders). The previous nation-level difference was empty at every
    * SF, which made the oracle row vacuous.
    */
  def qSetExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_orderkey").as("orderkey"))
      .except(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("orderkey")))
      .orderBy(col("orderkey"))

  /** INTERSECT ALL keeps min(multiplicity) copies — surfaced as a count
    * per key so the multiset semantics are visible in the output.
    */
  def qSetIntersectAll(spark: SparkSession, dir: String): DataFrame =
    custNations(spark, dir).intersectAll(suppNations(spark, dir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  /** EXCEPT ALL keeps left-multiplicity − right-multiplicity copies. */
  def qSetExceptAll(spark: SparkSession, dir: String): DataFrame =
    custNations(spark, dir).exceptAll(suppNations(spark, dir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  /** unionByName with missing columns — schema-evolution-tolerant union. */
  def qSetUnionByName(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
    val b = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))
    a.unionByName(b, allowMissingColumns = true)
      .groupBy(col("acctbal").isNotNull.as("has_bal"))
      .agg(count(lit(1)).as("n"), count(col("name")).as("n_with_name"))
      .orderBy(col("has_bal"))
  }

  val defs: Map[String, Q] = Map(
    "q_set_union_all" -> (qSetUnionAll(_, _)),
    "q_set_union_distinct" -> (qSetUnionDistinct(_, _)),
    "q_set_intersect" -> (qSetIntersect(_, _)),
    "q_set_except" -> (qSetExcept(_, _)),
    "q_set_intersect_all" -> (qSetIntersectAll(_, _)),
    "q_set_except_all" -> (qSetExceptAll(_, _)),
    "q_set_union_by_name" -> (qSetUnionByName(_, _))
  )

  private val cn = "SELECT c_nationkey AS nationkey FROM customer"
  private val sn = "SELECT s_nationkey AS nationkey FROM supplier"

  val oracles: Map[String, String] = Map(
    "q_set_union_all" ->
      s"""SELECT nationkey, COUNT(*) AS n FROM ($cn UNION ALL $sn)
         |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_set_union_distinct" ->
      s"($cn UNION $sn) ORDER BY nationkey",
    "q_set_intersect" ->
      s"($cn INTERSECT $sn) ORDER BY nationkey",
    "q_set_except" ->
      """(SELECT o_orderkey AS orderkey FROM orders
        | EXCEPT SELECT l_orderkey AS orderkey FROM lineitem)
        |ORDER BY orderkey""".stripMargin,
    "q_set_intersect_all" ->
      s"""SELECT nationkey, COUNT(*) AS n FROM ($cn INTERSECT ALL $sn)
         |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_set_except_all" ->
      s"""SELECT nationkey, COUNT(*) AS n FROM ($cn EXCEPT ALL $sn)
         |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_set_union_by_name" ->
      """SELECT acctbal IS NOT NULL AS has_bal, COUNT(*) AS n,
        |  COUNT(name) AS n_with_name
        |FROM (SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal
        |        FROM customer
        |      UNION ALL BY NAME
        |      SELECT s_suppkey AS id, s_name AS name FROM supplier)
        |GROUP BY has_bal ORDER BY has_bal""".stripMargin
  )
}
