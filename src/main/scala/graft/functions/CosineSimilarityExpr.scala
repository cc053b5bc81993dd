package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns, with whole-stage codegen (`doGenCode`).
  *
  * Why a custom Expression (SURVEY.md §7 step 8): the HOF formulation
  * (`aggregate(zip_with(a,b,*),...)`) materializes an intermediate array
  * per row and interprets two lambdas per element. In the ANN inner loop —
  * |Q|·|corpus| evaluations — that's the dominant cost. This expression
  * compiles to a single fused float loop (dot + both norms in one pass, no
  * allocation), and stays inside whole-stage codegen.
  *
  * Semantics: double accumulation left-to-right (same op order as
  * VectorFunctions.dot, so results are bit-identical); NaN on zero-norm
  * input; null if either side is null; arrays must be equal length
  * (shorter length wins, matching zip_with's null-pad... we instead use
  * min-length which equals both for fixed-dim embeddings).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, false) ||
        left.dataType == ArrayType(FloatType, true)) {
      if (right.dataType == ArrayType(FloatType, false) ||
          right.dataType == ArrayType(FloatType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"left must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Σ popcount(aᵢ & bᵢ) over two array<long> bitsets — the fused inner
  * loop of bitset-verified set-similarity joins (graft.ops.Dedup). Same
  * rationale as CosineSimilarityExpr: the HOF formulation
  * (zip_with + aggregate + bit_count) allocates per pair and measured
  * ~2× slower end-to-end; this compiles to a branch-free long loop.
  * popcount(a) itself is `bitmap_and_count(a, a)`.
  */
case class BitmapAndCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bitmap_and_count"
}

/** Registration — the deploy path is `SparkSessionExtensions`
  * (`spark.sql.extensions=graft.functions.GraftExtensions`); `register`
  * is the in-process equivalent for tests and local sessions.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bitmap_and_count",
      exprs => BitmapAndCountExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_sig",
      exprs => HyperplaneSigExpr(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lcs_pack",
      exprs => LcsPackExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_gram_hash",
      exprs => RollingGramHashExpr(exprs(0), exprs(1)),
      "built-in")
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarityExpr].getName, "cosine_sim"),
        (exprs: Seq[Expression]) => CosineSimilarityExpr(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bitmap_and_count"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[BitmapAndCountExpr].getName, "bitmap_and_count"),
        (exprs: Seq[Expression]) => BitmapAndCountExpr(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("hyperplane_sig"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[HyperplaneSigExpr].getName, "hyperplane_sig"),
        (exprs: Seq[Expression]) =>
          HyperplaneSigExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("lcs_pack"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[LcsPackExpr].getName, "lcs_pack"),
        (exprs: Seq[Expression]) => LcsPackExpr(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_gram_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RollingGramHashExpr].getName, "rolling_gram_hash"),
        (exprs: Seq[Expression]) => RollingGramHashExpr(exprs(0), exprs(1))))
    // optimizer rule: textbook HOF cosine rewrites to the fused native
    // expression (see NativeCosineRule — 61× on all-pairs scoring)
    ext.injectOptimizerRule(_ => NativeCosineRule)
    // planner strategy: AsOfJoinPlan → the custom sort-merge as-of
    // physical operator (graft.plans.SortMergeAsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
