package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) columns, built from codegen'd
  * higher-order functions (no UDFs — stays inside WholeStageCodegen).
  *
  * Parity contract: every fold runs in DOUBLE with a pinned order
  * (0.0 + p1 + p2 + …), exactly reproducible in DuckDB via
  * list_reduce(list_prepend(0.0, …)) — see graft.operators.Similarity
  * oracles. Do not replace with float accumulation or engine-native
  * list_dot_product (different accumulation order → low-bit drift).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, p) => s + p)

  /** Σ aᵢ² in double, left fold. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity; NULL when either side has zero norm (cosine is
    * undefined for the zero vector), REGARDLESS of the other side. Two
    * traps force the explicit norm guard, not just a denominator nullif:
    * under Spark's ANSI default a raw Divide by a 0.0 denominator THROWS
    * (DIVIDE_BY_ZERO) where DuckDB yields NULL, and when the other side
    * carries an Inf element the denominator is 0·Inf = NaN — a nullif
    * never sees the zero and the result silently becomes NaN, which Spark
    * ORDERS AS THE LARGEST DOUBLE (a zero-vector pair would top neighbor
    * rankings). Zero vectors are normal in production embedding feeds
    * (padding rows, failed normalizations); this branch, CosineSim, and
    * the [[oCosine]] oracle fragment all pin the same NULL contract —
    * PropertySuite's cosine law drives all three over random vectors. */
  def cosine(a: Column, b: Column): Column = {
    val na2 = norm2(a); val nb2 = norm2(b)
    when(na2 === 0.0 || nb2 === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / nullif(sqrt(na2) * sqrt(nb2), lit(0.0)))
  }

  /** Squared L2 distance in double, left fold. */
  def dist2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dd = x.cast("double") - y.cast("double")
        dd * dd
      }),
      lit(0.0), (s, p) => s + p)

  /** DuckDB oracle fragment matching [[dot]]: fold of a·b with 1-based
    * index lambda, double accumulation, pinned order. */
  def oDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform($a, (x, i) -> CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (s, p) -> s + p)"""

  /** DuckDB oracle fragment matching [[cosine]]: NULL on a zero-norm side
    * (checked BEFORE the division — see the cosine scaladoc for why a
    * denominator nullif is not enough), else the same pinned-fold
    * arithmetic. */
  def oCosine(a: String, b: String): String =
    s"""CASE WHEN ${oDot(a, a)} = 0.0 OR ${oDot(b, b)} = 0.0 THEN NULL
             ELSE ${oDot(a, b)} /
                  nullif(sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)}), 0.0)
        END"""

  /** DuckDB oracle fragment matching [[dist2]]. */
  def oDist2(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform($a, (x, i) ->
          (CAST(x AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
          (CAST(x AS DOUBLE) - CAST($b[i] AS DOUBLE)))),
        (s, p) -> s + p)"""
}
