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
}
