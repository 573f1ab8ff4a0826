package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Checkpoint recovery: stop a streaming aggregation mid-input, restart
  * from the checkpoint, feed more data — state carries over exactly
  * (the durability contract a 100 TB continuous pipeline depends on). */
class StreamingRecoverySuite extends SparkSpec {

  test("windowed aggregation resumes from checkpoint across restarts") {
    val dir = Files.createTempDirectory("graft_recov_src").toString
    val ckpt = Files.createTempDirectory("graft_recov_ckpt").toString
    val out = "recovery_sink"

    def start() = Streams.tumbling(Streams.fileSource(spark, dir))
      .writeStream.format("memory").queryName(out)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    // phase 1: only the first half of events (split the parquet by copy —
    // use the sf0.001 file, then "arrive" the sf0.01 file as new data)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q1 = start()
    q1.processAllAvailable()
    val afterPhase1 = spark.table(out).agg(sum("n")).head.getLong(0)
    assert(afterPhase1 == 1000L)
    q1.stop()

    // phase 2: restart from checkpoint, new file arrives
    Files.copy(Paths.get("/root/testdata/sf0.01/events.parquet"),
      Paths.get(s"$dir/b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q2 = start()
    q2.processAllAvailable()
    val afterPhase2 = spark.table(out).agg(sum("n")).head.getLong(0)
    q2.stop()
    // the restarted query did NOT reprocess phase-1 rows from scratch into
    // double counts — complete mode totals = both files exactly once
    assert(afterPhase2 == 1000L + 10000L)
  }
}
