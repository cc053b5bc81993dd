package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — Spark has no builtin.
  *
  * Implementation is the union-timeline trick, not a range join: tag both
  * sides, sort each key's timeline once, and carry the last right-side row
  * forward with `last(_, ignoreNulls = true)` over an unbounded-preceding
  * frame. Cost at scale: ONE shuffle on the key + a per-partition sort —
  * versus the broadcast-nested-loop or fat equi-join+filter alternatives
  * which blow up as |left|·|right per key|.
  *
  * Tie rule: a right row at exactly t matches a left row at t (inclusive,
  * like DuckDB `ASOF JOIN ... ON l.t >= r.t`), enforced by sorting right
  * rows before left rows at equal timestamps.
  */
object AsOf {

  /** @param left      probe side (each row gets the latest-earlier match)
    * @param right     reference side
    * @param leftKey/rightKey    equi-key column names
    * @param leftTime/rightTime  event-time column names
    * @param rightCols right-side payload columns to carry (renamed as-is)
    * @return left rows + matched right payload (null when no earlier row);
    *         use an outer filter on a payload col for inner-asof semantics.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col("_side")) ++ leftCols.map(col) ++
        rightCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w)
          .as(c)): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Register the as-of planner strategy on an existing session (the
    * `spark.sql.extensions=graft.functions.GraftExtensions` deploy
    * path does this at session build). Idempotent.
    */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy

  /** NATIVE as-of join — the custom-physical-operator form
    * (graft.plans.SortMergeAsOfJoinExec): one co-partitioned shuffle +
    * sort per side and a single-pass merge with O(1) state, versus the
    * compositional form's null-padded union carrying both sides
    * through a window. Output: ALL left columns + ALL right columns
    * (null right side when no earlier row — filter a right column for
    * inner-asof). Same inclusive-tie semantics as [[asOfJoin]];
    * parity is spec-pinned and both share the DuckDB ASOF JOIN oracle.
    *
    * Key and time columns must have identical types on both sides
    * (the merge compares them with one ordering).
    */
  def asOfJoinNative(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    require(left.schema(leftKey).dataType == right.schema(rightKey).dataType,
      "as-of key types must match")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      "as-of time types must match")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(a => spark.sessionState.analyzer.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
