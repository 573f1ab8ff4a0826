package graft

import graft.functions.StableMoments
import org.apache.spark.sql.functions._

/** Custom function surface: the fused Catalyst expression and the typed
  * UDAF (capabilities beyond the oracled query set). */
class FunctionsSuite extends SparkSpec {

  test("cosine_sim expression matches the HOF fold bit-exactly") {
    val v = Tables.t(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    val a = v.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = v.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val both = a.join(b, col("ia") < col("ib"))
      .select(
        expr("cosine_sim(ea, eb)").as("expr_cos"),
        graft.functions.VectorOps.cosine(col("ea"), col("eb")).as("hof_cos"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact, not approx
    }
  }

  test("cosine_sim/dot_product null semantics match the HOF formulation") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    // length mismatch → NULL (zip_with pads with null)
    val mism = df.select(
      expr("cosine_sim(array(1.0F, 2.0F), array(1.0F))").as("c"),
      expr("dot_product(array(1.0F, 2.0F), array(1.0F))").as("d"),
      expr("""aggregate(zip_with(array(1.0F, 2.0F), array(1.0F),
                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0.0 AS DOUBLE), (s, p) -> s + p)""").as("hof")).head()
    assert(mism.isNullAt(0) && mism.isNullAt(1) && mism.isNullAt(2))
    // null element → NULL (poisons the fold)
    val withNull = df.select(
      expr("cosine_sim(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F))")
        .as("c"),
      expr("dot_product(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F))")
        .as("d"),
      expr("""aggregate(zip_with(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F),
                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0.0 AS DOUBLE), (s, p) -> s + p)""").as("hof")).head()
    assert(withNull.isNullAt(0) && withNull.isNullAt(1) && withNull.isNullAt(2))
    // null argument → NULL
    val nullArg = df.select(
      expr("cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))").as("c"))
      .head()
    assert(nullArg.isNullAt(0))
  }

  test("cosine_sim of a vector with itself is 1.0") {
    val one = Tables.t(spark, sf, "embeddings").limit(5)
      .select(expr("cosine_sim(embedding, embedding)").as("c")).collect()
    one.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("StableMoments UDAF matches built-in avg/variance") {
    import spark.implicits._
    val xs = Tables.t(spark, sf, "lineitem")
      .select(col("l_extendedprice")).as[Double]
    val m = xs.select(StableMoments.of.toColumn).head()
    val ref = Tables.t(spark, sf, "lineitem")
      .agg(count(lit(1)), avg("l_extendedprice"), var_samp("l_extendedprice"))
      .head()
    assert(m.n == ref.getLong(0))
    assert(math.abs(m.mean - ref.getDouble(1)) < 1e-6)
    assert(math.abs(m.variance - ref.getDouble(2)) / ref.getDouble(2) < 1e-9)
  }

  test("StableMoments merge is associative across partitionings") {
    import spark.implicits._
    val xs = Tables.t(spark, sf, "lineitem").select(col("l_quantity")).as[Double]
    val m1 = xs.repartition(1).select(StableMoments.of.toColumn).head()
    val m32 = xs.repartition(32).select(StableMoments.of.toColumn).head()
    assert(m1.n == m32.n)
    assert(math.abs(m1.mean - m32.mean) < 1e-9)
    assert(math.abs(m1.variance - m32.variance) < 1e-6)
  }
}
