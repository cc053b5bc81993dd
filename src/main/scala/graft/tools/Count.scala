package graft.tools
object Count {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} missingOracle=${(q--o).toList.sorted.mkString(",")} extraOracle=${(o--q).toList.sorted.mkString(",")}")
  }
}
