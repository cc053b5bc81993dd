package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-pipeline registry + runner — the engine's analog of the
  * reference's submit path: dag_id extraction → ship → trigger
  * (/root/reference/app/routes.py:81-107). The registry key plays the
  * role of `dag_id`; an unknown name is an error, matching the
  * `extract_dag_id → None → flash + abort` path
  * (/root/reference/app/routes.py:88-90).
  */
object PipelineRegistry {

  case class UnknownPipeline(name: String) extends IllegalArgumentException(
    s"no pipeline named '$name' in registry (reference analog: could not " +
      "extract dag_id)")

  def resolve(name: String): (SparkSession, String) => DataFrame =
    graft.SparkEntry.queries.getOrElse(name, throw UnknownPipeline(name))

  /** Submit = resolve + run under a job group so StatusListener tracks it;
    * write the result to the lake (the step the reference's UI never
    * finished — SURVEY.md §2-A, results.html vestige).
    */
  def submit(spark: SparkSession, name: String, sfDir: String,
             outDir: String): Unit = {
    val fn = resolve(name)
    spark.sparkContext.setJobGroup(name, s"pipeline $name", true)
    try fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
    finally spark.sparkContext.clearJobGroup()
  }
}
