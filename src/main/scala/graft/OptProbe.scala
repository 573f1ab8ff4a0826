package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Par._

/** Scratch A/B harness for the optimization round: times named variant
  * pairs (current shape vs candidate shape) with the bench methodology
  * (noop sink, min over passes) and prints per-variant seconds + job
  * counts. Variants live here so the declared defs stay untouched until
  * a candidate wins and is verified.
  *
  * Usage: runMain graft.OptProbe [variantName ...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-optprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val sc = spark.sparkContext
    import spark.implicits._

    def L = Tables.t(spark, d, "lineitem")
    def D = Tables.t(spark, d, "documents")
    def E = Tables.t(spark, d, "events")

    /** guide §2.5 "input skew" fix candidate: redistribute an under-split
      * scan before per-row-heavy work; identity when the scan already has
      * enough splits. */
    def fanOut(df: DataFrame, key: Column): DataFrame = {
      val p = sc.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
    }

    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    def aggGroupOn(li: DataFrame) = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(discPrice * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

    def pctile(sort: DataFrame => DataFrame) = {
      val base = L.select(col("l_returnflag"), col("l_quantity"),
        floor(col("l_quantity")).cast("bigint").as("bkt"))
      val wLoc = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag", "bkt").orderBy("l_quantity")
      val counts = base.groupBy("l_returnflag", "bkt")
        .agg(count(lit(1)).as("cnt"))
      val wOff = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("bkt")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offs = counts.select(col("l_returnflag"), col("bkt"),
        coalesce(sum("cnt").over(wOff), lit(0L)).as("off"),
        sum("cnt").over(org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag")).as("n"))
      def pick(p: Double, v: String) = {
        val pos = lit(p) * (col("n") - 1).cast("double")
        val lo = floor(pos).cast("bigint") + 1
        val hi = ceil(pos).cast("bigint") + 1
        (max(when(col("rn") === lo, col(v))),
          max(when(col("rn") === hi, col(v))), max(pos - floor(pos)))
      }
      val ranked = base
        .withColumn("lrn", row_number().over(wLoc).cast("bigint"))
        .join(broadcast(offs), Seq("l_returnflag", "bkt"))
        .withColumn("rn", col("off") + col("lrn"))
      val (lo50, hi50, f50) = pick(0.5, "l_quantity")
      val (lo25, hi25, f25) = pick(0.25, "l_quantity")
      sort(ranked.groupBy("l_returnflag")
        .agg(lo50.as("lo50"), hi50.as("hi50"), f50.as("f50"),
          lo25.as("lo25"), hi25.as("hi25"), f25.as("f25"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"),
          (col("lo50") + (col("hi50") - col("lo50")) * col("f50")).as("median_qty"),
          (col("lo25") + (col("hi25") - col("lo25")) * col("f25")).as("q1_qty"),
          col("cnt")))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pctile_orderby" -> (() => pctile(_.orderBy("l_returnflag"))),
      "pctile_p1" -> (() => pctile(df =>
        df.repartition(1).sortWithinPartitions("l_returnflag"))),
      "agg_group_cur" -> (() => aggGroupOn(L)
        .orderBy("l_returnflag", "l_linestatus")),
      "agg_group_fan" -> (() => aggGroupOn(
          fanOut(L, col("l_orderkey")))
        .orderBy("l_returnflag", "l_linestatus")),
      "agg_group_fan_p1" -> (() => aggGroupOn(
          fanOut(L, col("l_orderkey")))
        .repartition(1).sortWithinPartitions("l_returnflag", "l_linestatus")),
      "agg_histogram_cur" -> (() => L
        .groupBy(floor(col("l_extendedprice") / 10000).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")),
      "agg_histogram_p1" -> (() => L
        .groupBy(floor(col("l_extendedprice") / 10000).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .repartition(1).sortWithinPartitions("bucket")),
      "fn_cast_like_late" -> (() => L
        .select("l_orderkey", "l_extendedprice", "l_quantity", "l_shipdate",
          "l_returnflag")
        .orderBy("l_orderkey")
        .select(col("l_orderkey"),
          col("l_extendedprice").cast("decimal(18,4)").as("dec"),
          col("l_quantity").cast("int").as("qi"),
          col("l_shipdate").cast("string").as("sd"),
          col("l_returnflag").cast("binary").as("cb"))),
      "fn_cast_like_cur" -> (() => L.select(col("l_orderkey"),
          col("l_extendedprice").cast("decimal(18,4)").as("dec"),
          col("l_quantity").cast("int").as("qi"),
          col("l_shipdate").cast("string").as("sd"),
          col("l_returnflag").cast("binary").as("cb"))
        .orderBy("l_orderkey", "dec", "qi")),
      "fn_cast_like_fan" -> (() => fanOut(L, col("l_orderkey"))
        .select(col("l_orderkey"),
          col("l_extendedprice").cast("decimal(18,4)").as("dec"),
          col("l_quantity").cast("int").as("qi"),
          col("l_shipdate").cast("string").as("sd"),
          col("l_returnflag").cast("binary").as("cb"))
        .orderBy("l_orderkey", "dec", "qi"))
    )

    val only = args.toSet
    val picked = variants.filter { case (n, _) => only.isEmpty || only(n) }

    @volatile var jobs = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    })
    // warmup
    for ((_, fn) <- picked)
      fn().write.mode("overwrite").format("noop").save()
    for ((name, fn) <- picked) {
      var best = Double.MaxValue
      var lastJobs = 0
      for (_ <- 1 to 3) {
        jobs = 0
        val t0 = System.nanoTime()
        fn().write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        lastJobs = jobs
        best = math.min(best, t)
      }
      println(f"$name%-24s $best%6.2f s  jobs $lastJobs")
    }
    spark.stop()
  }
}
