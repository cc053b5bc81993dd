package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's pipeline registry: the Spark-native analog of
  * the reference's DAG registry (dag_id → Airflow DAG,
  * /root/reference/app/utils/airflow_client.py:78-90). Each entry is a named,
  * lazily-planned DataFrame pipeline; `oracleSql` carries the DuckDB twin for
  * the driver's hash-compare gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.defs ++ JoinQueries.defs ++ SetOpQueries.defs ++
      WindowQueries.defs ++ FuncQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs ++ MiscQueries.defs ++
      StreamQueries.defs ++ CustomQueries.defs ++ SqlQueries.defs ++
      FilterQueries.defs ++ TpchQueries.defs ++ CurationQueries.defs ++
      StatsQueries.defs ++ GraphQueries.defs ++ QualityQueries.defs ++
      MiningQueries.defs ++ EventQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AggQueries.oracles ++ JoinQueries.oracles ++ SetOpQueries.oracles ++
      WindowQueries.oracles ++ FuncQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextQueries.oracles ++
      MiscQueries.oracles ++ StreamQueries.oracles ++
      CustomQueries.oracles ++ SqlQueries.oracles ++ FilterQueries.oracles ++
      TpchQueries.oracles ++ CurationQueries.oracles ++ StatsQueries.oracles ++
      GraphQueries.oracles ++ QualityQueries.oracles ++
      MiningQueries.oracles ++ EventQueries.oracles
}
