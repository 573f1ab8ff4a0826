package graft
object FloorProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-floorprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val keys = Seq("agg_histogram", "agg_grouping_sets", "scan_parquet",
      "join_outer", "fn_date", "sort_limit")
    // warm everything once
    for (k <- keys) SparkEntry.queries(k)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    for (k <- keys) {
      var planNs = 0L; var execNs = 0L; var jobs0 = 0; var jobs1 = 0
      val sc = spark.sparkContext
      val listener = new org.apache.spark.scheduler.SparkListener {
        var n = 0
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          synchronized { n += 1 }
      }
      sc.addSparkListener(listener)
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(k)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        planNs += t1 - t0; execNs += t2 - t1
      }
      Thread.sleep(200)
      sc.removeSparkListener(listener)
      printf("%-18s plan %5.0f ms  exec %5.0f ms  jobs/run ~%d%n",
        k, planNs / 3e6, execNs / 3e6, listener.n / 3)
    }
    spark.stop()
  }
}
