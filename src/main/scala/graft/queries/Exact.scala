package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers for oracle-compared outputs.
  *
  * The driver hash-compares our Parquet output against DuckDB running the
  * same SQL (SURVEY.md §5). Floating-point aggregation order differs across
  * engines, so every declared numeric output must be bit-identical by
  * construction:
  *
  *  - Sums of d-decimal fixed-point columns (prices, discounts): the true
  *    sum is itself d-decimal, and double accumulation error at sf ≤ 0.1 is
  *    far below 0.5·10^-d, so `round(sum(x), d)` recovers the exact value
  *    in both engines.
  *  - Products of fixed-point columns (revenue = price·(1-disc)): route
  *    through integer fixed-point (`e2`) so the sum is exact BIGINT
  *    arithmetic in both engines; divide back at the end (identical IEEE
  *    division of identical integers).
  *  - Ratios/averages: divide two already-exact values rather than using
  *    the engine's `avg`.
  */
object Exact {
  /** 2-decimal fixed-point column → exact integer hundredths (Long). */
  def e2(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact sum of a d-decimal column, as double (see scaladoc). */
  def sumFixed(c: Column, d: Int): Column = round(sum(c), d)

  /** Exact WIDE sum for fixed-point values whose scaled sums could
    * overflow Int64 (the `e2` route): aggregate in DecimalType — decimal
    * sums are exact, order-independent integer arithmetic in both engines —
    * and pin the output to an explicit DECIMAL(38,s) rendered as a string,
    * which is bit-identical across engines (a raw decimal column decodes
    * as decimal.Decimal from Spark parquet but float64 from DuckDB in the
    * driver's compare, so the value itself must carry the canonical form).
    */
  def sumDecimalStr(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)"))
      .cast(s"decimal(38,$scale)").cast("string")
}
