package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

/** Function-battery guarantees moved out of query hot paths. */
class FuncEdgeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("from_json and get_json_object agree on every events.props row") {
    // q_func_json parses ONCE (from_json); the two-extraction-path
    // agreement the query used to assert inline lives here instead.
    val ev = Tables.events(spark, dir)
    val n = ev.count()
    val agree = ev.select(
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        get_json_object(col("props"), "$.k").cast("int").as("k2"))
      .filter(col("k") === col("k2"))
      .count()
    assert(agree == n, s"$agree of $n rows agree")
  }
}
