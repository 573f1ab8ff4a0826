package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused cosine-similarity over two ArrayType(FloatType) columns: one pass
  * computes dot and both norms (the HOF formulation in VectorOps walks the
  * arrays three times and allocates an intermediate array per pair).
  *
  * Whole-stage-codegen'd via doGenCode — the generated loop is branch-free
  * over the float payloads, so the brute-force similarity path stays inside
  * the codegen pipeline. Accumulation is left-to-right in DOUBLE, exactly
  * matching VectorOps.dot/norm2 and the DuckDB list_reduce oracles, so the
  * result is bit-identical to the HOF path.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  // can return NULL even for non-null inputs (length mismatch, null
  // element, or a zero-norm side — cosine is undefined for the zero vector)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths or a null element → NULL, matching the
    // zip_with/aggregate HOF formulation (null pads/products poison it)
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      // zero-norm side → NULL, never NaN: a raw 0/0 here would emit NaN,
      // which Spark ORDERS AS THE LARGEST DOUBLE and passes `cos >= t`
      // filters — zero vectors (padding rows, failed normalizations) would
      // surface as top-ranked "near-duplicates". NULL matches the Divide
      // formulation in VectorOps.cosine and the DuckDB oracle (x/0 → NULL).
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $xi = (double) $a.getFloat($i);
            double $yi = (double) $b.getFloat($i);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          if (!${ev.isNull}) {
            if ($na == 0.0 || $nb == 0.0) {
              ${ev.isNull} = true; // zero-norm → NULL, matching nullSafeEval
            } else {
              ${ev.value} = $dot /
                (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
            }
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
