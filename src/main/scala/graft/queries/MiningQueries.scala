package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Mining

/** Data-mining queries: the part-catalog Pareto frontier and
  * market-basket association pairs over order lineitems.
  */
object MiningQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Parts on the (cheapest price, largest size) Pareto frontier. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    Mining.skyline2D(Tables.part(spark, dir), "p_retailprice", "p_size")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))

  /** Top-100 part pairs by lift among parts co-ordered ≥ minSupport. */
  def qAssocRules(spark: SparkSession, dir: String): DataFrame =
    Mining.assocPairs(Tables.lineitem(spark, dir),
        "l_orderkey", "l_partkey", minItemSupport = 5L)
      .orderBy(desc("lift_ppm"), col("item_a"), col("item_b"))
      .limit(100)

  /** 3-D frontier: (cheapest, largest, shortest-name) parts. */
  def qSkyline3d(spark: SparkSession, dir: String): DataFrame =
    Mining.skyline3D(
        Tables.part(spark, dir)
          .withColumn("name_len", length(col("p_name")).cast("int")),
        "p_partkey",
        Seq(("p_retailprice", true), ("p_size", false), ("name_len", true)))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        col("name_len").cast("long").as("name_len"))
      .orderBy(col("p_partkey"))

  /** 4-D frontier via the halving-merge D&C operator: (cheapest,
    * largest, shortest-name, shortest-type) parts. Higher dims →
    * larger frontiers, which is exactly the regime the log-round merge
    * exists for.
    */
  def qSkyline4d(spark: SparkSession, dir: String): DataFrame =
    Mining.skylineND(
        Tables.part(spark, dir)
          .withColumn("name_len", length(col("p_name")).cast("int"))
          .withColumn("type_len", length(col("p_type")).cast("int")),
        "p_partkey",
        Seq(("p_retailprice", true), ("p_size", false),
          ("name_len", true), ("type_len", true)))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        col("name_len").cast("long").as("name_len"),
        col("type_len").cast("long").as("type_len"))
      .orderBy(col("p_partkey"))

  val defs: Map[String, Q] = Map(
    "q_skyline_4d" -> (qSkyline4d(_, _)),
    "q_skyline" -> (qSkyline(_, _)),
    "q_skyline_3d" -> (qSkyline3d(_, _)),
    "q_assoc_rules" -> (qAssocRules(_, _))
  )

  val oracles: Map[String, String] = Map(
    // the naive quadratic dominance formulation — deliberately different
    // from the engine's sort-based plan, so agreement is evidence
    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part q
        |    WHERE q.p_retailprice <= p.p_retailprice
        |      AND q.p_size >= p.p_size
        |      AND (q.p_retailprice < p.p_retailprice
        |           OR q.p_size > p.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    "q_skyline_3d" ->
      """SELECT p_partkey, p_retailprice, p_size,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part p
        |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part q
        |    WHERE q.p_retailprice <= p.p_retailprice
        |      AND q.p_size >= p.p_size
        |      AND length(q.p_name) <= length(p.p_name)
        |      AND (q.p_retailprice < p.p_retailprice
        |           OR q.p_size > p.p_size
        |           OR length(q.p_name) < length(p.p_name)))
        |ORDER BY p_partkey""".stripMargin,
    "q_skyline_4d" ->
      """SELECT p_partkey, p_retailprice, p_size,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(length(p_type) AS BIGINT) AS type_len
        |FROM part p
        |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part q
        |    WHERE q.p_retailprice <= p.p_retailprice
        |      AND q.p_size >= p.p_size
        |      AND length(q.p_name) <= length(p.p_name)
        |      AND length(q.p_type) <= length(p.p_type)
        |      AND (q.p_retailprice < p.p_retailprice
        |           OR q.p_size > p.p_size
        |           OR length(q.p_name) < length(p.p_name)
        |           OR length(q.p_type) < length(p.p_type)))
        |ORDER BY p_partkey""".stripMargin,
    "q_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |               FROM lineitem),
        |ic AS (SELECT i, count(*) AS c FROM items GROUP BY i
        |       HAVING count(*) >= 5),
        |freq AS (SELECT b, items.i FROM items JOIN ic ON items.i = ic.i),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM items),
        |pairs AS (SELECT x.i AS item_a, y.i AS item_b, count(*) AS cnt_ab
        |          FROM freq x JOIN freq y
        |            ON x.b = y.b AND x.i < y.i
        |          GROUP BY x.i, y.i)
        |SELECT item_a, item_b, cnt_ab, ca.c AS cnt_a, cb.c AS cnt_b,
        |  nb.n_baskets,
        |  (cnt_ab * nb.n_baskets * 1000000) // (ca.c * cb.c) AS lift_ppm
        |FROM pairs
        |  JOIN ic ca ON pairs.item_a = ca.i
        |  JOIN ic cb ON pairs.item_b = cb.i
        |  CROSS JOIN nb
        |ORDER BY lift_ppm DESC, item_a, item_b
        |LIMIT 100""".stripMargin
  )
}
