package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x) * CAST(y)), 0.0, (s,p) -> s+p)
  *
  * into the fused codegen'd [[DotProduct]] expression. Bit-exact (same
  * left-to-right double accumulation, same null-on-length-mismatch
  * semantics) while skipping the per-row intermediate products array —
  * the hot loop of brute-force similarity search.
  *
  * Injected via GraftExtensions.injectOptimizerRule; fires only on the
  * exact shape VectorOps.dot emits, so user HOFs with different lambdas
  * are untouched.
  */
case class FuseVectorFolds(unused: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x and y are the lambda vars (in either order), each cast to double. */
  private def isCastOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(
                xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _), Seq(
              sv: NamedLambdaVariable, pv: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(
              fv: NamedLambdaVariable), _))
          if isFloatArray(a) && isFloatArray(b) &&
            isCastOf(mx, xv) && isCastOf(my, yv) &&
            ((al, ar) match {
              case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
                l.exprId == sv.exprId && r.exprId == pv.exprId
              case _ => false
            }) &&
            fin.exprId == fv.exprId =>
        DotProduct(a, b)
    }
}
