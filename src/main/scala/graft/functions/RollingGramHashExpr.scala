package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable rolling k-gram hash family.
  *
  * One value per character position p (1-based, code points): the hash
  * of the k-gram starting at p, as a single BIGINT. The hash is a PAIR
  * of 31-bit polynomial hashes packed into one long:
  *
  *   h_m(p) = (Σ_{j=0}^{k-1} cp(p+j) · B^{k-1-j}) mod M_m
  *   g(p)   = h_1(p) · M_2 + h_2(p)
  *
  * with B = 131, M_1 = 2147483647 (2³¹−1), M_2 = 2147483629 (both
  * prime). Range: g < M_1·M_2 ≈ 2^61.999 — effectively a 62-bit hash.
  *
  * Why this recurrence and not md5 (VERDICT r8 finding #3): the md5
  * formulation (`split(text,"")` → per-position `md5(array_join(slice))`
  * → hex → conv) materializes one UTF8String per character plus one
  * digest + hex string + radix parse PER POSITION — ~20–30× the text's
  * own bytes in short-lived garbage, which is exactly the allocation
  * profile that collapses first under heap pressure. This expression is
  * one fused loop: decode code points once, O(1) rolling update per
  * position, one primitive long[] out — zero per-position allocation,
  * and it stays inside whole-stage codegen.
  *
  * Why 31-bit pairs and not one wide modulus: every intermediate of
  * both recurrences — h·B + cp, cp·B^{k-1} mod M, and the packed
  * combination — fits comfortably in a SIGNED 64-bit long
  * (max cp 0x10FFFF · M₁ < 2⁵² ; M₁·M₂ < 2⁶³), so the IDENTICAL
  * arithmetic runs in DuckDB BIGINT with `list_reduce` lambdas — the
  * oracle twins replay the exact recurrence with no 128-bit types and
  * no overflow. A single ~2⁶¹ modulus would need 128-bit products on
  * the Scala side (Math.multiplyHigh gymnastics) for the same strength.
  *
  * Position semantics are UNICODE CODE POINTS, matching Spark's
  * `substring`/`split(text,"")` and DuckDB's `substring`/
  * `string_split(text,'')` — so span positions derived from these
  * hashes index both engines' substring functions identically.
  *
  * Null text → null; fewer than k code points → empty array.
  */
case class RollingGramHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"text must be string, got ${left.dataType}")
    else if (right.dataType != IntegerType || !right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("k must be a foldable int literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    RollingHash.gramHashes(a.asInstanceOf[UTF8String],
      b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.RollingHash.gramHashes($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingGramHashExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rolling_gram_hash"
}

object RollingHash {
  /** Base of the polynomial recurrence. Small by design: h·B + cp must
    * fit signed-64 for h < M (M·131 < 2⁴⁶ here — wide margin). */
  val Base = 131L
  /** 2³¹ − 1 (Mersenne prime). */
  val M1 = 2147483647L
  /** Largest prime below M1 with distinct residues — pair independence. */
  val M2 = 2147483629L

  /** Reference (non-rolling) hash of one k-gram — the recurrence both
    * engines share, in its direct form. Used by specs to pin the
    * rolling implementation against an independent evaluation. */
  def gramHash(cps: Array[Int], from: Int, k: Int): Long = {
    var h1 = 0L; var h2 = 0L; var i = from
    val end = from + k
    while (i < end) {
      h1 = (h1 * Base + cps(i)) % M1
      h2 = (h2 * Base + cps(i)) % M2
      i += 1
    }
    h1 * M2 + h2
  }

  private[functions] def codePoints(str: String): Array[Int] = {
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var ci = 0; var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    cps
  }

  private val Empty = new GenericArrayData(Array.empty[Long])

  /** All per-position k-gram hashes of s — the codegen target. */
  def gramHashes(s: UTF8String, k: Int): ArrayData = {
    val cps = codePoints(s.toString)
    val n = cps.length
    if (n < k || k <= 0) return Empty
    val out = new Array[Long](n - k + 1)
    // B^(k-1) mod M — the drop-term factor of the rolling update
    var bp1 = 1L; var bp2 = 1L; var j = 1
    while (j < k) { bp1 = bp1 * Base % M1; bp2 = bp2 * Base % M2; j += 1 }
    var h1 = 0L; var h2 = 0L; var i = 0
    while (i < k) {
      h1 = (h1 * Base + cps(i)) % M1
      h2 = (h2 * Base + cps(i)) % M2
      i += 1
    }
    out(0) = h1 * M2 + h2
    var p = 1
    val last = n - k
    while (p <= last) {
      // drop cp(p-1), shift, add cp(p+k-1); every product < 2⁵³
      h1 = ((h1 - cps(p - 1) * bp1 % M1 + M1) % M1 * Base +
        cps(p + k - 1)) % M1
      h2 = ((h2 - cps(p - 1) * bp2 % M2 + M2) % M2 * Base +
        cps(p + k - 1)) % M2
      out(p) = h1 * M2 + h2
      p += 1
    }
    new GenericArrayData(out)
  }
}
