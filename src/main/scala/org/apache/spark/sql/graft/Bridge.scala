package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge the custom-operator path needs:
  * wrap a hand-built LogicalPlan (graft.plans.AsOfJoinPlan) back into
  * the public DataFrame API. Standard extension-library practice —
  * everything else in the engine stays on public Spark APIs.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
