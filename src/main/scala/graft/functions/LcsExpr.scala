package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-substring DP shared by the interpreted and codegen'd
  * paths of [[LcsPackExpr]]. Classic rolling-row DP (O(|a|·|b|) time,
  * O(min-side) memory would need the swap trick on the shorter side —
  * here O(|b|) suffices because candidate texts are bounded).
  *
  * Character semantics are Java UTF-16 code units, which coincide with
  * code points (and with DuckDB's character positions) for BMP text —
  * the engine's substring/LCS parity contract is documented for
  * ASCII/BMP corpora; astral-plane inputs would count surrogate halves.
  */
object LcsUtil {
  /** len and start pack into one long as `len·2²¹ + start`. */
  final val Pack: Long = 1L << 21

  /** Max supported input length (2²¹−1 would overflow the pack; the
    * real bound is the DP cost — lcs_pack is a per-candidate-PAIR
    * verifier, not a corpus scan; chunk first if texts exceed this).
    */
  final val MaxLen: Int = (1 << 21) - 1

  def compute(au: UTF8String, bu: UTF8String): Long = {
    val a = au.toString
    val b = bu.toString
    val n = a.length
    val m = b.length
    if (n > MaxLen || m > MaxLen)
      throw new IllegalArgumentException(
        s"lcs_pack inputs must be under $MaxLen chars (got $n, $m): " +
          "run it on candidate pairs / chunks, not whole oversized blobs")
    if (n == 0 || m == 0) return 0L
    // dp(j) = length of the common suffix of a[..i) and b[..j); runs end
    // scanning i ascending, so the FIRST maximal run found has the
    // minimal start in `a` — the deterministic tie-break the relational
    // (islands) formulation reproduces with ORDER BY len DESC, start ASC
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var best = 0
    var start = 0
    var i = 1
    while (i <= n) {
      val ci = a.charAt(i - 1)
      var j = 1
      while (j <= m) {
        if (ci == b.charAt(j - 1)) {
          val v = prev(j - 1) + 1
          cur(j) = v
          if (v > best) { best = v; start = i - v + 1 }
        } else cur(j) = 0
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best.toLong * Pack + start
  }
}

/** Native codegen'd exact longest-common-substring between two strings,
  * packed into one long: `len · 2²¹ + start`, where `start` is the
  * 1-based character position of the match in the LEFT argument — the
  * minimum such position among maximal matches (deterministic) — and
  * the whole value is 0 when the inputs share no character. Unpack with
  * `pk div 2097152` (length) and `pk % 2097152` (start).
  *
  * This is the exact-refinement step behind fingerprint candidate pairs
  * (winnowing/MinHash): O(|a|·|b|) per PAIR, so it must run strictly
  * after a candidate filter — the expression is deliberately scalar so
  * the pair-bounded verify stays inside whole-stage codegen next to
  * `levenshtein`. One packed long (rather than a struct of two calls)
  * keeps the DP to a single evaluation per row.
  */
case class LcsPackExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"left must be string, got ${left.dataType}")
    else if (right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right must be string, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsUtil.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LcsUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsPackExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "lcs_pack"
}
