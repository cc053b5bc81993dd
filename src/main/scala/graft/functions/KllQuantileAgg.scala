package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KLL-style streaming quantile sketch (Karnin, Lang & Liberty,
  * FOCS'16 — simplified to a fixed per-level capacity and DETERMINISTIC
  * compaction) as a typed mergeable Aggregator: the bounded-memory
  * answer to "what are the quantiles" when the column is too large to
  * sort.
  *
  * Structure: a ladder of levels; level i holds items of weight 2^i.
  * New items enter level 0; a full level is sorted and every second
  * item (odd positions — deterministic, no RNG, so a fixed input +
  * fixed merge tree reproduces the sketch bit-for-bit) is promoted to
  * the next level. `merge` concatenates level-wise then re-compacts —
  * the mergeable-summaries shape that survives Spark's arbitrary
  * partial-aggregation trees; only O(k·log(n/k)) values cross the
  * shuffle.
  *
  * Rank error: each level-i compaction perturbs ranks by at most 2^i/2,
  * and level i compacts ~n/(k·2^i) times, so the worst-case total is
  * ~log2(n/k)/(2k)·n. With the default k=1024 that is ≤ 0.02·n out to
  * n ≈ 10^12 rows — the documented ε the exact-recount certification
  * checks against (see ops/Quantiles.scala: like the Misra-Gries
  * heavy-hitters pattern, the sketch only PROPOSES boundaries; exact
  * counts certify them and an exact in-band selection publishes
  * deterministic values, so merge-tree variation never reaches the
  * output).
  */
class KllQuantileAgg(k: Int)
  extends Aggregator[Double, KllQuantileAgg.Buf, Seq[(Double, Long)]] {
  import KllQuantileAgg.Buf
  require(k >= 8, "k must be at least 8")

  override def zero: Buf = Buf(0L, Vector(Vector.empty))

  private def compact(levels: Vector[Vector[Double]])
      : Vector[Vector[Double]] = {
    var ls = levels
    var i = 0
    while (i < ls.length) {
      if (ls(i).length >= k) {
        val sorted = ls(i).sorted
        // odd length (possible after merge concatenation): one item
        // must stay behind at this level or its weight would vanish
        val (kept, rest) =
          if (sorted.length % 2 == 1) (Vector(sorted.head), sorted.tail)
          else (Vector.empty[Double], sorted)
        // promote odd positions (0-based): deterministic halving
        val promoted = rest.indices.collect {
          case j if j % 2 == 1 => rest(j)
        }.toVector
        ls = ls.updated(i, kept)
        if (i + 1 >= ls.length) ls = ls :+ promoted
        else ls = ls.updated(i + 1, ls(i + 1) ++ promoted)
      }
      i += 1
    }
    ls
  }

  override def reduce(b: Buf, x: Double): Buf = {
    val l0 = b.levels(0) :+ x
    val ls = b.levels.updated(0, l0)
    Buf(b.n + 1, if (l0.length >= k) compact(ls) else ls)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val depth = math.max(a.levels.length, b.levels.length)
    val combined = Vector.tabulate(depth) { i =>
      val av = if (i < a.levels.length) a.levels(i) else Vector.empty
      val bv = if (i < b.levels.length) b.levels(i) else Vector.empty
      av ++ bv
    }
    Buf(a.n + b.n, compact(combined))
  }

  /** Weighted summary, sorted by value: (value, weight) with
    * Σ weight = n ± 0 (compaction preserves total weight exactly:
    * each promotion halves the count but doubles the weight).
    */
  override def finish(b: Buf): Seq[(Double, Long)] =
    b.levels.zipWithIndex.flatMap { case (l, i) =>
      val w = 1L << i
      l.map(v => (v, w))
    }.sortBy(_._1)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}

object KllQuantileAgg {
  case class Buf(n: Long, levels: Vector[Vector[Double]])

  /** Estimated value at quantile p from a finished weighted summary:
    * the first value whose cumulative weight reaches ceil(p·W).
    */
  def estimate(summary: Seq[(Double, Long)], p: Double): Double = {
    require(summary.nonEmpty, "empty sketch")
    val total = summary.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(p * total).toLong)
    var cum = 0L
    summary.foreach { case (v, w) =>
      cum += w
      if (cum >= target) return v
    }
    summary.last._1
  }
}
