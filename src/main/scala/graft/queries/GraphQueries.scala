package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Graph

/** Graph analytics over the supplier→customer shipment graph: an edge
  * (s → c) exists when supplier s shipped a line of one of customer c's
  * orders. Customer ids are offset by 10⁶ to keep the two id spaces
  * disjoint in one vertex universe.
  *
  * The oracle twins replay [[graft.ops.Graph.pagerank]]'s integer
  * arithmetic round by round in SQL — possible precisely because the
  * operator is defined over order-independent BIGINT floor divisions
  * (see the Graph scaladoc).
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private def shipmentEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("src"), ($"o_custkey" + 1000000L).as("dst"))
  }

  /** 3-round integer PageRank over the shipment graph, full ranking. */
  def qGraphPagerank(spark: SparkSession, dir: String): DataFrame =
    Graph.pagerank(shipmentEdges(spark, dir), iters = 3)
      .orderBy(desc("rank_scaled"), asc("vertex"))

  /** Out-degree distribution of the shipment graph. */
  def qGraphDegree(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeHistogram(shipmentEdges(spark, dir))
      .orderBy(col("out_degree"))

  val defs: Map[String, Q] = Map(
    "q_graph_pagerank" -> (qGraphPagerank(_, _)),
    "q_graph_degree" -> (qGraphDegree(_, _))
  )

  private val edgeCte =
    """e AS (SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_graph_pagerank" ->
      s"""WITH $edgeCte,
        |verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |p AS (SELECT 1000000000 // COUNT(*) AS p0,
        |        ((1000000000 // COUNT(*)) * 15) // 100 AS base
        |      FROM verts),
        |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT v, (SELECT p0 FROM p) AS pr FROM verts),
        |c1 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r0 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c1 ON verts.v = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r1 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c2 ON verts.v = c2.dst),
        |c3 AS (SELECT e.dst, SUM(r.pr // d.od) AS s
        |       FROM e JOIN r2 r ON e.src = r.v JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT verts.v, CAST((SELECT base FROM p)
        |         + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS pr
        |       FROM verts LEFT JOIN c3 ON verts.v = c3.dst)
        |SELECT v AS vertex, pr AS rank_scaled FROM r3
        |ORDER BY rank_scaled DESC, vertex""".stripMargin,
    "q_graph_degree" ->
      s"""WITH $edgeCte,
        |d AS (SELECT src, COUNT(*) AS out_degree FROM e GROUP BY src)
        |SELECT out_degree, COUNT(*) AS n_vertices
        |FROM d GROUP BY out_degree ORDER BY out_degree""".stripMargin
  )
}
