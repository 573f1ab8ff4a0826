package graft

import org.apache.spark.sql.functions._

// encoders need top-level case classes (inner classes have no static scope)
case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String)
case class FlagStats(flag: String, n: Long, qty: Double)

/** Typed Dataset[T] API surface: case-class encoders, typed map/filter,
  * groupByKey aggregation — the type-safe face of the same engine. */
class DatasetSuite extends SparkSpec {

  test("typed map/filter/groupByKey matches the untyped aggregation") {
    import spark.implicits._
    val ds = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Li]
    val typed = ds
      .filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var q = 0.0
        rows.foreach { r => n += 1; q += r.l_quantity }
        FlagStats(flag, n, q)
      }
      .collect().map(f => f.flag -> f.n).toMap
    val untyped = Tables.t(spark, sf, "lineitem")
      .where(col("l_quantity") > 10)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == untyped)
  }

  test("typed joinWith produces pair rows") {
    import spark.implicits._
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).as[(Long, Long)]
    val lines = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
    val joined = orders.joinWith(lines, orders("o_orderkey") === lines("l_orderkey"))
    assert(joined.count() == 6000L)
    val (o, l) = joined.head()
    assert(o._1 == l._1)
  }

  test("typed reduceGroups computes per-key maxima") {
    import spark.implicits._
    val ds = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Li]
    val maxPerFlag = ds.groupByKey(_.l_returnflag)
      .reduceGroups((a, b) => if (a.l_quantity >= b.l_quantity) a else b)
      .map { case (flag, li) => flag -> li.l_quantity }
      .collect().toMap
    val expected = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(max("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(maxPerFlag == expected)
  }
}
