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
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) =>
        functions.DotProduct(children.head, children(1))))
    ext.injectOptimizerRule(plans.FuseVectorFolds)
  }
}
