package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch (Misra & Gries '82) as a typed
  * mergeable Aggregator — the bounded-memory answer to "which keys are
  * frequent" when the key space is too large to shuffle.
  *
  * Guarantee: after summarizing a stream of n items with k counters,
  * every item whose true frequency exceeds n/(k+1) is present in the
  * summary (counts are underestimates; the summary is a SUPERSET of the
  * heavy hitters, never a miss). The merge implements the mergeable-
  * summaries construction (Agarwal et al., PODS'12): pointwise-add two
  * summaries, then subtract the (k+1)-th largest count from every entry
  * and drop the non-positive — the n/(k+1) guarantee survives arbitrary
  * merge trees, which is exactly what Spark's partial aggregation does
  * (each partition folds locally; only ≤ k counters cross the shuffle).
  *
  * At 100 TB: a full `groupBy(key).count()` over a trillion-shingle
  * corpus shuffles the entire key space; this pass ships ≤ k counters
  * per partition to a single row. Candidate sets from different merge
  * orders can differ at the margin, so callers wanting deterministic
  * output recount the ≤ k candidates exactly (broadcast filter + count)
  * and keep those above the threshold — see
  * `TextQueries.qTextHeavyHitters`: the recounted output is the EXACT
  * set {key : freq > n/(k+1)} regardless of partitioning (spec-pinned).
  */
class MisraGriesAgg(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      // full and x absent: decrement all counters (x's virtual counter
      // and one unit of each survivor cancel — the classic MG step)
      case None => b.flatMap { case (t, c) =>
        if (c > 1L) Some(t -> (c - 1L)) else None
      }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()

  /** Column form for DataFrame use. */
  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}
