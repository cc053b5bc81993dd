package graft.io

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** JDBC source/sink integration against EMBEDDED Derby (shipped in the
  * Spark distribution) — the closest this zero-egress environment gets to
  * the reference's external RDBMS, and enough to exercise the real JDBC
  * write path, read path, partitioned parallel read, and filter pushdown.
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC sink → source roundtrip on embedded Derby") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "v")
    LakeIO.writeJdbc(df, url, "t_round", mode = SaveMode.Overwrite)
    val back = LakeIO.readJdbc(spark, url, "t_round")
    assert(back.select("id", "name", "v").as[(Long, String, Double)]
      .collect().toSet ==
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
  }

  test("partitioned JDBC read splits the range and preserves rows") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "name")
    LakeIO.writeJdbc(df, url, "t_part", mode = SaveMode.Overwrite)
    val part = LakeIO.readJdbcPartitioned(spark, url, "t_part",
      column = "id", lower = 1L, upper = 100L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    assert(part.agg(sum($"id")).as[Long].head() == 5050L)
  }

  test("filters push down into the JDBC source") {
    val df = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
    LakeIO.writeJdbc(df, url, "t_push", mode = SaveMode.Overwrite)
    val q = LakeIO.readJdbc(spark, url, "t_push").filter($"id" > 40)
    assert(q.count() == 10)
    // the relation's generated SQL must carry the predicate (JDBCRelation
    // renders pushed filters in its plan string)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"no pushdown evidence in plan:\n$plan")
  }
}
