package graft

import org.apache.spark.sql.functions._

/** The SQL front door: the same capabilities via spark.sql over registered
  * views, including the injected native function. */
class SqlSuite extends SparkSpec {

  private def reg(): Unit =
    Tables.names.foreach { n =>
      Tables.t(spark, sf, n).createOrReplaceTempView(n)
    }

  test("flagship pricing summary via spark.sql matches the DataFrame DSL") {
    reg()
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""").collect()
    val viaDsl = SparkEntry.queries("agg_group")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(viaSql.map(_.toString).toSeq == viaDsl.map(_.toString).toSeq)
  }

  test("cosine_sim is callable from SQL (GraftExtensions injection)") {
    reg()
    val r = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
         FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id
         WHERE a.vec_id < 3 ORDER BY a.vec_id""").collect()
    assert(r.length == 3)
    r.foreach(row => assert(math.abs(row.getDouble(1) - 1.0) < 1e-12))
  }

  test("correlated subqueries plan as semi/anti joins") {
    reg()
    val exists = spark.sql(
      """SELECT count(*) FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o.o_orderkey AND l_discount >= 0.09)
      """).head.getLong(0)
    val viaDsl = SparkEntry.queries("join_semi")(spark, sf).count()
    assert(exists == viaDsl)
  }
}
