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

  test("span-df MapState survives a checkpoint restart") {
    // Phase 1 ingests the corpus and stops; phase 2 restarts from the
    // checkpoint and ingests a doc_id-shifted echo of the first 100 docs.
    // The echo's spans can only be accounted dfreq=2 if the RocksDB
    // MapState (doc_id -> n_occ per span hash) from phase 1 was restored —
    // fresh state would score every echoed span dfreq=1 and have no
    // n_occ entry for the original doc_ids to re-emit.
    val dir = Files.createTempDirectory("graft_recov_span").toString
    val ckpt = Files.createTempDirectory("graft_recov_span_ck").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.t(spark, sf, "documents")
      // the memory sink cannot recover an update-mode query from a
      // checkpoint — foreachBatch can, collecting into a per-run buffer
      val buf = new scala.collection.mutable.ArrayBuffer[Streams.SpanAcc]
      def start() =
        Streams.spanAccounting(Streams.documentsSource(spark, dir))
          .writeStream
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[Streams.SpanAcc], _: Long) =>
              buf.synchronized { buf ++= df.collect() }; ()
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()

      docs.coalesce(1).write.mode("overwrite").parquet(dir)
      val q1 = start()
      q1.processAllAvailable()
      q1.stop()

      val echo = docs.where(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + 10000)
      echo.coalesce(1).write.mode("append").parquet(dir)
      // keep phase 1's emissions but remember the boundary: the processor's
      // contract is max-per-(h, doc_id) over the WHOLE stream — a span
      // whose df already reached 2 in phase 1 does NOT re-emit its
      // untouched entries after the echo (O(touched) emission; the
      // retroactive full-inventory sweep fires only on the df 1→2 cross)
      val phase1 = buf.synchronized { val v = buf.toVector; buf.clear(); v }
      val q2 = start()
      q2.processAllAvailable()
      try {
        val phase2 = buf.synchronized(buf.toVector)
        // restart-recovery evidence: the corrections phase 2 emits for
        // PHASE-1 docs (dfreq >= 2 retroactive sweeps, n_occ inventories)
        // exist only if the MapState survived the checkpoint restart — a
        // lost store would re-count df from 1 and emit echo entries only
        assert(phase2.exists(a => a.doc_id < 100 && a.dfreq >= 2),
          "restarted run emitted no retroactive correction for phase-1 docs")
        // phase1 ∪ phase2 max-merge = the downstream truth, equal to the
        // batch dedup_span over the union corpus, restricted to the docs
        // whose complete inventories the two phases carry
        import spark.implicits._
        val streamed = spark.createDataset(phase1 ++ phase2)
          .groupBy("h", "doc_id")
          .agg(max("n_occ").as("n_occ"), max("dfreq").as("dfreq"))
          // touched keys re-emit entries for OTHER docs sharing the span
          // (complete per-span, but not all spans of those docs) — compare
          // only the docs whose full span inventory phase 2 re-emitted
          .where(col("doc_id") < 100 || col("doc_id") >= 10000)
          .groupBy("doc_id")
          .agg(sum("n_occ").as("n_spans"),
            sum(when(col("dfreq") >= 2, col("n_occ")).otherwise(0L))
              .as("n_dup_spans"))
          .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
            (col("n_dup_spans").cast("double") / col("n_spans"))
              .as("dup_frac"))
        val batchDir = Files.createTempDirectory("graft_recov_span_b")
        docs.unionByName(echo).coalesce(1).write.mode("overwrite")
          .parquet(s"$batchDir/documents.parquet")
        val batch = SparkEntry.queries("dedup_span")(spark, batchDir.toString)
          .where(col("doc_id") < 100 || col("doc_id") >= 10000)
        assert(streamed.count() == batch.count())
        assert(streamed.exceptAll(batch).isEmpty &&
          batch.exceptAll(streamed).isEmpty)
      } finally q2.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
