package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; Beyer et
  * al., SIGMOD'07) as a typed mergeable Aggregator: the state is the k
  * smallest DISTINCT hash values seen, so distinct-count estimation is
  * (k−1)/U_(k) with U_(k) the k-th smallest hash normalized to [0,1),
  * relative error ~1/√k. Unlike HLL the state is the hashes themselves,
  * which makes the sketch CLOSED UNDER SET OPERATIONS: the k smallest
  * of a union of two sketches is exactly the union's sketch, and the
  * fraction of the union sketch present in both sides estimates Jaccard
  * — giving intersection sizes no HLL can produce without inclusion-
  * exclusion error blowup.
  *
  * Mergeability is exact, not approximate: the k smallest of (k
  * smallest of A) ∪ (k smallest of B) equals the k smallest of A ∪ B,
  * so Spark's partial aggregation (per-partition fold, ≤ k longs
  * crossing the shuffle, arbitrary merge trees) yields the IDENTICAL
  * sketch for any partitioning — the output is a deterministic function
  * of the input SET, which is what lets a DuckDB twin replay it
  * bit-for-bit.
  *
  * At 100 TB: a `countDistinct` shuffles the whole key space; this pass
  * ships ≤ k longs per partition per group.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, "k must be at least 2")

  override def zero: Seq[Long] = Vector.empty

  // buffer invariant: sorted ascending, distinct, size ≤ k
  override def reduce(b: Seq[Long], x: Long): Seq[Long] =
    if (b.size == k && x >= b.last) b
    else {
      val i = insertionPoint(b, x)
      if (i < b.size && b(i) == x) b
      else {
        val grown = (b.take(i) :+ x) ++ b.drop(i)
        if (grown.size > k) grown.take(k) else grown
      }
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(b: Seq[Long]): Seq[Long] = b

  private def insertionPoint(b: Seq[Long], x: Long): Int = {
    var lo = 0; var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  /** Column form for DataFrame use. */
  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}
