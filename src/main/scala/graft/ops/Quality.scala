package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/Great-Expectations pattern):
  * a constraint battery evaluated over a table in ONE aggregate pass, each
  * check reporting its violation count against the row total. The
  * reference's quality surface is per-upload extension dispatch
  * (`/root/reference/app/routes.py:115-125`); a production ingest gate
  * needs row-level contracts — this operator is that gate.
  *
  * Scale shape: all row-level checks (completeness / range / accepted
  * values / predicate) compile to conditional `count(CASE…)` expressions
  * inside a SINGLE hash aggregate over one scan — adding a check adds zero
  * passes. Uniqueness checks add `count(distinct struct(keys))`, which
  * Spark plans as one Expand + two-phase aggregate (still one scan, still
  * map-side partial). Referential checks are a separate broadcast-able
  * anti-join per parent table — O(child + parent), never quadratic.
  * Output is O(#checks) rows — trivially collectable at any scale.
  */
object Quality {

  sealed trait Check { def name: String }
  /** Column must be non-null. */
  final case class Complete(name: String, col: String) extends Check
  /** Key columns must identify rows uniquely; violations = rows minus
    * distinct keys (0 iff unique). */
  final case class Unique(name: String, cols: Seq[String]) extends Check
  /** Value must lie in [lo, hi] (nulls violate: a range contract implies
    * presence). */
  final case class InRange(name: String, col: String, lo: Double, hi: Double)
      extends Check
  /** Value must be one of the given literals (nulls violate). */
  final case class OneOf(name: String, col: String, values: Seq[String])
      extends Check
  /** Arbitrary row predicate that must hold (null/false violate). */
  final case class Satisfies(name: String, cond: Column) extends Check

  /** Evaluate `checks` over `df`: one row per check —
    * (check_name, violations, total, pass).
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "audit check names must be unique (they key the internal " +
        s"aggregate aliases): ${checks.map(_.name).mkString(", ")}")
    val total = count(lit(1))
    def violations(c: Check): Column = c match {
      case Complete(_, col0) => total - count(col(col0))
      case Unique(_, cols)   =>
        total - count_distinct(struct(cols.map(col): _*))
      case InRange(_, col0, lo, hi) =>
        count(when(col(col0).isNull
          || col(col0) < lo || col(col0) > hi, lit(1)))
      case OneOf(_, col0, vs) =>
        count(when(col(col0).isNull
          || !col(col0).isin(vs.map(lit): _*), lit(1)))
      case Satisfies(_, cond) =>
        count(when(cond.isNull || !cond, lit(1)))
    }
    val aggs = checks.flatMap(c => Seq(
      violations(c).as(s"__v_${c.name}"), total.as(s"__t_${c.name}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one aggregated row → explode to a (check, violations, total) row per
    // check; map-side on a single row
    val rows = checks.map(c => struct(
      lit(c.name).as("check_name"),
      col(s"__v_${c.name}").as("violations"),
      col(s"__t_${c.name}").as("total")))
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.violations"), col("r.total"),
        (col("r.violations") === 0L).as("pass"))
  }

  /** Referential-integrity check: rows of `child` whose `childKey` has no
    * match in `parent.parentKey` (orphans). Same output row shape as
    * [[audit]]; union the two. Anti-join on the key — broadcast when the
    * parent is a dimension, shuffle otherwise; Catalyst decides.
    */
  def refIntegrity(name: String, child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(broadcast(total))
      .select(lit(name).as("check_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }
}
