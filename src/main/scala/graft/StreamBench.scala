package graft

import org.apache.spark.sql.functions._

/** Streaming-throughput probe (tooling main, like FloorProbe/PrintPlans):
  * replays the sf events parquet through three representative streaming
  * twins — a watermarked windowed aggregation, the mapGroupsWithState
  * EWMA, and the transformWithState EWMA — and prints rows/sec plus a
  * batch-equality row count. The semantic twin proofs live in
  * StreamingSuite at sf0.001; this measures the STATE-OP THROUGHPUT the
  * suites never time, at driver-bench scale (sf0.1 = 100k events).
  *
  * Usage: runMain graft.StreamBench [sfDir]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-streambench")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // the file stream source requires a DIRECTORY to watch — stage the
    // single-file events parquet into one (hard link: no copy cost)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sb_src")
    val src = srcDir.toString
    try java.nio.file.Files.createLink(srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    catch {
      // EXDEV (different filesystems) or an FS with no hard-link support
      // (UnsupportedOperationException) → plain copy
      case _: java.nio.file.FileSystemException |
           _: UnsupportedOperationException =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sfDir/events.parquet"),
          srcDir.resolve("events.parquet"))
    }
    val n = spark.read.parquet(src).count()

    def run(name: String, mode: String,
        build: String => org.apache.spark.sql.DataFrame): Unit = {
      val ck = java.nio.file.Files
        .createTempDirectory(s"graft_sb_$name").toString
      val t0 = System.nanoTime()
      val q = build(src).writeStream
        .format("noop").option("checkpointLocation", ck)
        .outputMode(mode).start()
      q.processAllAvailable(); q.stop()
      val s = (System.nanoTime() - t0) / 1e9
      // state footprint: keyed-state row count from the progress feed plus
      // the on-disk checkpoint state bytes (for the RocksDB run this is the
      // SST+changelog footprint a 100 TB deployment would provision for)
      val stateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).maxOption.getOrElse(0L)
      val stateBytes = {
        val root = java.nio.file.Paths.get(ck, "state")
        if (java.nio.file.Files.exists(root)) {
          val st = java.nio.file.Files.walk(root)
          try st.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally st.close()
        } else 0L
      }
      // Predef.printf — functions._ shadows it with the SQL printf Column
      System.out.printf(
        "%-16s %6.1f s  %9.0f events/s  %9d state rows  %8.1f MiB state%n",
        name, Double.box(s), Double.box(n / s), Long.box(stateRows),
        Double.box(stateBytes / 1048576.0))
    }

    run("window_agg", "update", d => graft.streaming.Streams.tumbling(
      graft.streaming.Streams.fileSource(spark, d)))
    def events(d: String) = graft.streaming.Streams.fileSource(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.Streams.Event]
    run("ewma_mgws", "append",
      d => graft.streaming.Streams.ewmaPerUser(events(d)).toDF())
    // the Spark 4 arbitrary-state API runs on the RocksDB state store only
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run("ewma_tws", "append",
      d => graft.streaming.Streams.ewmaPerUserTws(events(d)).toDF())
    spark.stop()
  }
}
