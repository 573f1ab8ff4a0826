package graft

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native Catalyst functions and
  * optimizer rules (active once the session is built with
  * `.withExtensions(new GraftExtensions)` — Sessions.local does). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def binary(name: String)(f: (Expression, Expression) => Expression)
        : Seq[Expression] => Expression = { children =>
      if (children.size != 2)
        throw new IllegalArgumentException(
          s"$name expects exactly 2 arguments, got ${children.size}")
      f(children.head, children(1))
    }
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      binary("cosine_sim")(CosineSim)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_product"),
      binary("dot_product")(functions.DotProduct)))
    ext.injectOptimizerRule(plans.FuseVectorFolds)
  }
}
