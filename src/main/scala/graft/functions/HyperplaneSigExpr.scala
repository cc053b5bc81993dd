package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the portable hyperplane-LSH signature:
  * `hyperplane_sig(vec, table, nBits)` packs nBits sign bits of
  * Σᵢ sign(table, j, i)·vec[i] into a long (bit j has weight
  * 2^(nBits−1−j)).
  *
  * The sign family is the PORTABLE md5-parity derivation
  * (Similarity.hyperplaneSign — parity of the first hex digit of
  * md5("graft-hyp:t:j:i")), precomputed ONCE per executor into a
  * double[][] and baked in via a reference object: eval cost is one
  * fused multiply-add loop per row with zero allocation, inside
  * whole-stage codegen. The HOF formulation (nBits separate
  * aggregate(zip_with(...)) chains over per-(t,j) literal sign arrays)
  * interpreted every lambda per element — measured 5.7 s vs ~1 s for
  * q_sim_topk_lsh at sf0.1 — and the earlier per-element md5 form was
  * 7.9 s. Same motivation as CosineSimilarityExpr: per-row array
  * reductions in an ANN hot path want a codegen Expression.
  *
  * Semantics (bit-identical to the HOF form for non-null input): the
  * projection accumulates left-to-right in dim order — the same op
  * order as the DuckDB oracle twin's list_sum, so bucket membership
  * can't flip between engines; multiplication by ±1.0 is IEEE-identical
  * to a conditional negate. `table`/`nBits` must be foldable int
  * literals (they parameterize the sign family). Null vec → null
  * signature (the row drops out of banding).
  */
case class HyperplaneSigExpr(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = first.dataType == ArrayType(FloatType, false) ||
      first.dataType == ArrayType(FloatType, true)
    if (!vecOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"vec must be array<float>, got ${first.dataType}")
    else if (second.dataType != IntegerType || !second.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("table must be a foldable int literal")
    else if (third.dataType != IntegerType || !third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("nBits must be a foldable int literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
  }

  /** Precomputed sign matrix [nBits][maxDim] for this table id. */
  @transient private lazy val signs: Array[Array[Double]] = {
    val t = second.eval().asInstanceOf[Int]
    val nBits = third.eval().asInstanceOf[Int]
    Array.tabulate(nBits, graft.ops.Similarity.HyperplaneMaxDim)(
      (j, i) => graft.ops.Similarity.hyperplaneSign(t, j, i))
  }

  override def nullSafeEval(a: Any, tv: Any, nv: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sig = 0L
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      val m = math.min(n, row.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += x.getFloat(i).toDouble * row(i); i += 1 }
      sig = sig * 2 + (if (acc > 0) 1L else 0L)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val s = ctx.addReferenceObj("hyperplaneSigns", signs, "double[][]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val row = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $s.length; $j++) {
         |  double[] $row = $s[$j];
         |  int $m = java.lang.Math.min($n, $row.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $row[$i];
         |  }
         |  $sig = $sig * 2 + ($acc > 0 ? 1L : 0L);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): HyperplaneSigExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "hyperplane_sig"
}
