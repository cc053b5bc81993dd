package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function cosine pattern
  *
  * {{{ aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)
  *     / (sqrt(<same over (a,a)>) * sqrt(<same over (b,b)>)) }}}
  *
  * (what `VectorFunctions.cosine` builds, and what a user writing
  * textbook DataFrame vector math produces) into the fused native
  * `CosineSimilarityExpr` — measured 61× on the ANN all-pairs loop
  * (HOFs never enter whole-stage codegen; the native expression does).
  *
  * The rewrite preserves results bit-for-bit on well-formed input: the
  * native expression accumulates per-element products/squares in the
  * same left-to-right order as the HOF folds (parity is pinned in
  * CustomFunctionsSpec). One documented divergence: a zero-norm vector
  * yields NULL from the HOF form (double division by zero) but NaN from
  * the native expression — both "not a similarity", neither orders into
  * a top-k.
  *
  * Only fires when both sides are `array<float>` (the expression's
  * input contract). Registered via `GraftExtensions`
  * (injectOptimizerRule) for `spark.sql.extensions` users, or
  * `spark.experimental.extraOptimizations :+= NativeCosineRule` on an
  * existing session.
  */
object NativeCosineRule extends Rule[LogicalPlan] {

  /** Extract (a, b) from the analyzed dot-product fold
    * ArrayAggregate(ZipWith(a, b, (x,y) => dbl(x)*dbl(y)), 0.0, +, id).
    */
  private def dotArgs(e: Expression): Option[(Expression, Expression)] =
    e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(
                Cast(_: NamedLambdaVariable, DoubleType, _, _),
                Cast(_: NamedLambdaVariable, DoubleType, _, _), _),
                _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(
              _: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
            LambdaFunction(_: NamedLambdaVariable, _, _)) =>
        Some((a, b))
      case _ => None
    }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case div @ Divide(dab, Multiply(Sqrt(daa), Sqrt(dbb), _), _) =>
        (dotArgs(dab), dotArgs(daa), dotArgs(dbb)) match {
          case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
              if a.semanticEquals(a1) && a.semanticEquals(a2) &&
                b.semanticEquals(b1) && b.semanticEquals(b2) &&
                isFloatArray(a) && isFloatArray(b) =>
            CosineSimilarityExpr(a, b)
          case _ => div
        }
    }
}
