package graft

import org.apache.spark.sql.functions._

/** Per-operator unit checks on sf0.001 with hand-computable expectations,
  * plus smoke coverage that every declared query builds and runs. */
class OperatorSuite extends SparkSpec {

  test("every declared query has distinct keys and builds a plan") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every oracleSql key has a matching query key") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qk)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry flagship returns the 6 Q1 groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0 && rows.length <= 9) // |returnflag|×|linestatus|
    val cnt = rows.map(_.getAs[Long]("count_order")).sum
    assert(cnt == 6000L) // sf0.001 lineitem rows
  }

  test("agg_group sums match a direct computation") {
    val li = Tables.t(spark, sf, "lineitem")
    val expected = li.agg(sum("l_quantity")).head.getDouble(0)
    val got = SparkEntry.queries("agg_group")(spark, sf)
      .agg(sum("sum_qty")).head.getDouble(0)
    assert(math.abs(expected - got) < 1e-6)
  }

  test("join_semi rows are a subset of orders; anti is the complement") {
    val semi = SparkEntry.queries("join_semi")(spark, sf).count()
    val anti = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "lineitem")
          .where(col("l_discount") >= 0.09),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(semi + anti == 1500L) // sf0.001 orders rows
  }

  test("dedup_exact is idempotent and keeps the first doc per hash") {
    val d1 = SparkEntry.queries("dedup_exact")(spark, sf)
    val n1 = d1.count()
    // dedup of the dedup result (by the same hash) changes nothing
    assert(d1.select("h").distinct().count() == n1)
  }

  test("sessionization: session count is between 1 and events per user") {
    val s1 = SparkEntry.queries("ts_session")(spark, sf)
    val perUser = s1.groupBy("user_id").count()
    val users = Tables.t(spark, sf, "events").select("user_id").distinct().count()
    assert(perUser.count() == users)
    val total = s1.agg(sum("n_events")).head.getLong(0)
    assert(total == 1000L) // every event lands in exactly one session
  }

  test("sliding window multiplies counts by windows-per-event") {
    val slide = SparkEntry.queries("ts_sliding")(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(slide == 4 * 1000L) // 1h window / 15m slide = 4 windows per event
  }

  test("cosine top-k: self-similarity excluded, scores within [-1,1]") {
    val tk = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    assert(tk.length == 20 * 5)
    assert(tk.forall(r => r.getAs[Long]("pid") != r.getAs[Long]("vid")))
    assert(tk.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
  }

  test("kmeans_lloyd assigns every vector to exactly one cluster") {
    val km = SparkEntry.queries("kmeans_lloyd")(spark, sf)
    assert(km.agg(sum("n")).head.getLong(0) == 500L)
  }

  test("histogram bin counts sum to row count") {
    val h = SparkEntry.queries("agg_histogram")(spark, sf)
    assert(h.agg(sum("cnt")).head.getLong(0) == 6000L)
  }

  test("set algebra: |union distinct| >= |intersect|; except disjoint") {
    val u = SparkEntry.queries("set_union")(spark, sf).count()
    val i = SparkEntry.queries("set_intersect")(spark, sf).count()
    val e = SparkEntry.queries("set_except")(spark, sf).count()
    assert(u >= i && i + e <= u + e)
  }
}
