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

  /** Cosine similarity; callers guarantee non-zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

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

  /** DuckDB oracle fragment matching [[dist2]]. */
  def oDist2(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform($a, (x, i) ->
          (CAST(x AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
          (CAST(x AS DOUBLE) - CAST($b[i] AS DOUBLE)))),
        (s, p) -> s + p)"""
}
