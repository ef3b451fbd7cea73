package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  *             (acc, v) -> acc + v)
  *
  * and replace it with the fused native [[DotProduct]] expression.
  *
  * Spark evaluates array lambdas interpreted (CodegenFallback) and
  * zip_with materializes an intermediate array per row; the rewrite makes
  * the natural way to write vector math also the fast way. Summation
  * order is identical (left-to-right, double), so the rewrite is
  * result-preserving bit-for-bit.
  */
object RewriteVectorOps extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean = a match {
    case v: NamedLambdaVariable => v.exprId == b.exprId
    case _ => false
  }

  private def asDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(child, DoubleType, _, _) => sameVar(child, v)
    case other => sameVar(other, v)
  }

  private object DotPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(vx: NamedLambdaVariable, vy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(macc, mel, _),
              Seq(vacc: NamedLambdaVariable, vel: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(vfin: NamedLambdaVariable), _))
          if asDoubleOf(mx, vx) && asDoubleOf(my, vy) &&
            sameVar(macc, vacc) && sameVar(mel, vel) && sameVar(fin, vfin) &&
            isFloatArray(a) && isFloatArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotPattern(a, b) => DotProduct(a, b)
    }
}
