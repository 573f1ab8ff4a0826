package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Bucketed-table co-located joins: the pre-shuffle strategy that makes
  * repeated fact-fact joins free at 100 TB (both sides bucketed by the join
  * key → sort-merge join with ZERO shuffle exchanges at query time). */
class BucketingSuite extends SparkSpec {

  private def countShuffles(p: SparkPlan): Int = {
    var n = 0
    def walk(q: SparkPlan): Unit = {
      if (q.isInstanceOf[ShuffleExchangeLike]) n += 1
      q.children.foreach(walk)
      q match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
    }
    walk(p)
    n
  }

  test("bucketed orders⋈lineitem sort-merge join needs no shuffle") {
    // external table paths (warehouse.dir is a static conf — leave it)
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    val joined = spark.table("ord_b").join(spark.table("li_b"),
      col("o_orderkey") === col("l_orderkey"))
    val n = joined.count()
    assert(n == 6000L) // every lineitem matches its order

    val agg = spark.table("ord_b").join(spark.table("li_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity"))
    agg.collect()
    // join AND per-orderkey aggregation reuse the bucket partitioning:
    // zero shuffle exchanges in the whole executed plan
    assert(countShuffles(agg.queryExecution.executedPlan) == 0,
      agg.queryExecution.executedPlan.toString.take(3000))
  }
}
