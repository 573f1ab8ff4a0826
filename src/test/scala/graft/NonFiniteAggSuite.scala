package graft

import org.apache.spark.sql.functions._

/** Pins the IEEE fallback contract of the exact-decimal parity aggregates
  * (Core.scala `Par` scaladoc): Spark's CAST(double AS DECIMAL) yields NULL
  * for NaN/±Inf even under ANSI, so a decimal-only sum silently DROPPED
  * non-finite rows (sum([1,2,NaN]) = 3.0 before the fix, and dstd emitted
  * garbage from moments that disagreed on n). Any NaN — or both infinities
  * — must poison to NaN; a lone ±Inf to that Inf; all-finite groups stay
  * bit-identical to the decimal path.
  */
class NonFiniteAggSuite extends SparkSpec {

  private def agg1(xs: Seq[Double], c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    xs.toDF("x").agg(c).head.get(0)
  }

  test("dsum: IEEE propagation for non-finite, exact decimal for finite") {
    assert(agg1(Seq(1.25, 2.5, 3.25), Par.dsum(col("x"))) == 7.0)
    assert(agg1(Seq(1.0, 2.0, Double.NaN), Par.dsum(col("x")))
      .asInstanceOf[Double].isNaN)
    assert(agg1(Seq(1.0, Double.PositiveInfinity), Par.dsum(col("x")))
      == Double.PositiveInfinity)
    assert(agg1(Seq(1.0, Double.NegativeInfinity), Par.dsum(col("x")))
      == Double.NegativeInfinity)
    assert(agg1(Seq(Double.PositiveInfinity, Double.NegativeInfinity),
      Par.dsum(col("x"))).asInstanceOf[Double].isNaN)
  }

  test("davg: count stays consistent with the sum branch") {
    assert(agg1(Seq(1.0, 2.0, 3.0), Par.davg(col("x"))) == 2.0)
    assert(agg1(Seq(1.0, 2.0, Double.NaN), Par.davg(col("x")))
      .asInstanceOf[Double].isNaN)
    assert(agg1(Seq(1.0, Double.PositiveInfinity), Par.davg(col("x")))
      == Double.PositiveInfinity)
  }

  test("dstd: any non-finite value yields NaN, finite groups unchanged") {
    val fin = agg1(Seq(10.0, 12.0, 14.0), Par.dstd(col("x")))
      .asInstanceOf[Double]
    assert(math.abs(fin - 2.0) < 1e-12)
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity))
      assert(agg1(Seq(10.0, 12.0, bad), Par.dstd(col("x")))
        .asInstanceOf[Double].isNaN, s"dstd with $bad must be NaN")
  }

  test("per-group isolation: one group's NaN never leaks into another") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("b", 2.0), ("b", 3.0))
      .toDF("k", "x")
    val r = df.groupBy("k").agg(Par.dsum(col("x")).as("s"))
      .orderBy("k").collect()
    assert(r(0).getDouble(1).isNaN)
    assert(r(1).getDouble(1) == 5.0)
  }
}
