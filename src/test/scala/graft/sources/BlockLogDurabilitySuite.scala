package graft.sources

import org.apache.spark.sql.functions._

/** Durability of the graft-blocks connector's two round-9-ADVICE fixes:
  *
  * 1. HIGH — the streaming reader's discovery-log compaction must never
  *    leave the checkpoint without a complete membership file. The old
  *    scheme rewrote ONE `compact` file in place (delete-then-rename): a
  *    crash between the two, after segment GC, made a restart re-ingest
  *    already-committed files. The fix writes monotonically numbered
  *    `compact_<n>` generations to fresh names and GCs predecessors only
  *    after the new generation is durable — so every crash window leaves
  *    at least one complete generation, and restart loads the highest.
  *
  * 2. MEDIUM — data-block renames must let the NEW bytes win. Block file
  *    length is fully determined by blockLen, so the checkpoint-log
  *    "target exists with source's length ⇒ completed replay" shortcut
  *    silently dropped any genuine rewrite of an existing block_id.
  */
class BlockLogDurabilitySuite extends graft.SparkSpec {

  private def blocks = spark.read.format("graft-blocks")
    .option("blocks", 16).option("blockLen", 64).option("splits", 4).load()

  test("rewriting an existing block replaces its content (new bytes win)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_rw").toString
    blocks.write.format("graft-blocks").option("path", dir)
      .mode("overwrite").save()
    def payloadSum(id: Long): Double = spark.read.format("graft-blocks")
      .option("path", dir).load()
      .where(col("block_id") === id)
      .select(expr("aggregate(payload, 0D, (acc, x) -> acc + CAST(x AS DOUBLE))"))
      .head.getDouble(0)
    val before = payloadSum(2L)
    // same block_id, same length, DIFFERENT payload — the genuine-rewrite
    // case the old keep-existing shortcut silently dropped
    blocks.where(col("block_id") === 2)
      .withColumn("payload", expr("transform(payload, x -> x * 3.0F)"))
      .write.format("graft-blocks").option("path", dir)
      .mode("append").save()
    val after = payloadSum(2L)
    // per-element float rounding of x*3.0F bounds the drift well under 1e-3
    assert(math.abs(after - before * 3.0) < 1e-3,
      s"rewrite dropped: before=$before after=$after (want ${before * 3.0})")
    // streaming-sink path takes the same rename: replay a fresh epoch
    // carrying another rewrite of block 2 and confirm it lands too
    val sw = new BlockWriteBuilder(dir, BlockSource.schema).build().toStreaming
    val factory = sw.createStreamingWriterFactory(null)
    val row = blocks.where(col("block_id") === 2)
      .withColumn("payload", expr("transform(payload, x -> x * 5.0F)"))
      .queryExecution.toRdd.collect().head.copy()
    val w = factory.createWriter(0, 0L, 99L)
    w.write(row)
    sw.commit(99L, Array(w.commit()))
    // ×5 of the ORIGINAL synthetic payload (blocks reads the synthetic
    // source, not the rewritten dir), replacing the ×3 content above
    assert(math.abs(payloadSum(2L) - before * 5.0) < 1e-3,
      "streaming-commit rename kept stale block content")
  }

  test("renameIntoData replay with a consumed source keeps the block") {
    // Round-12 ADVICE low: fs.rename also returns false when the SOURCE is
    // missing — a replayed/raced commit whose tmp was already consumed by
    // the first completion. Without the guard the fallback deleted the
    // committed target and then failed the require: data loss from a
    // benign replay.
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_replay")
    val fs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val from = new org.apache.hadoop.fs.Path(dir.toString, "tmp_block")
    val to = new org.apache.hadoop.fs.Path(dir.toString, "block_0.bin")
    val out = fs.create(from)
    out.write(Array[Byte](1, 2, 3)); out.close()
    BlockWrites.renameIntoData(fs, from, to) // first completion consumes tmp
    BlockWrites.renameIntoData(fs, from, to) // replay: tmp already gone
    assert(fs.exists(to), "replay deleted the committed block")
    val in = fs.open(to)
    val buf = new Array[Byte](3); in.readFully(buf); in.close()
    assert(buf.toSeq == Seq[Byte](1, 2, 3), "replay corrupted the block")
  }

  // ---- the compaction tests drive BlockMicroBatchStream at the connector
  // API level (as BlockExactlyOnceSuite drives the sink): a running
  // StreamExecution defers source.commit to the NEXT batch's start, so
  // stream-level tests cannot pin WHEN compaction fires — direct calls can,
  // and a fresh instance over the same checkpoint IS a crash-restart.

  private def landInto(dir: String, lo: Int, hi: Int): Unit =
    blocks.where(col("block_id") >= lo && col("block_id") < hi)
      .write.format("graft-blocks").option("path", dir)
      .mode("append").save()

  private def newStream(dir: String, ckpt: String) =
    new BlockMicroBatchStream(dir, 2, BlockSource.schema, ckpt,
      maxFilesPerTrigger = None, logCompactThreshold = 4)

  private def plannedIds(s: BlockMicroBatchStream, lo: Long, hi: Long): Seq[Long] =
    s.planInputPartitions(s.deserializeOffset(lo.toString),
        s.deserializeOffset(hi.toString))
      .flatMap { case BlockFiles(files) => files.map(_._1) }
      .map { f => val m = """.*block_(\d+)\.bin$""".r; f match {
        case m(id) => id.toLong } }
      .sorted.toSeq

  test("compaction keeps a complete numbered generation at every restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_cg").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_blk_cg_ck").toString
    val ld = new java.io.File(ckpt, "graft_blocks_seen")
    def compacts: Seq[String] = Option(ld.listFiles).getOrElse(Array.empty)
      .map(_.getName).filter(n => n == "compact" || n.startsWith("compact_"))
      .sorted.toSeq
    def segs: Seq[String] = Option(ld.listFiles).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("seg_")).sorted.toSeq

    // 6 committed entries cross threshold 4 → generation 0, segments gone
    landInto(dir, 0, 6)
    val s1 = newStream(dir, ckpt)
    assert(s1.latestOffset().json() == "6")
    assert(plannedIds(s1, 0, 6) == (0L until 6L))
    s1.commit(s1.deserializeOffset("6"))
    assert(compacts == Seq("compact_000000000"), s"generations: $compacts")
    assert(segs.isEmpty, s"segments survived compaction: $segs")

    // simulate the crash window the old scheme died in: predecessor
    // generation and a stale (already-folded) segment both still present
    // alongside the new generation — a crash between steps 1 and 4
    val gen0 = new java.io.File(ld, "compact_000000000").toPath
    java.nio.file.Files.copy(gen0, new java.io.File(ld, "compact").toPath)
    val names = scala.io.Source.fromFile(gen0.toFile, "UTF-8").getLines()
      .filter(_.nonEmpty).toSeq
    assert(names.length == 6)
    val pw = new java.io.PrintWriter(new java.io.File(ld, "seg_000000099"), "UTF-8")
    try names.take(2).foreach(n => pw.println(s"$n\t${64 * 4 + 12}"))
    finally pw.close()

    // restart: highest generation wins, stale duplicates dedupe away, the
    // older generation is GC'd at load, and NO committed file re-ingests
    landInto(dir, 6, 12)
    val s2 = newStream(dir, ckpt)
    assert(compacts == Seq("compact_000000000"),
      s"older generation not GC'd at load: $compacts")
    assert(s2.latestOffset().json() == "12")
    assert(plannedIds(s2, 6, 12) == (6L until 12L),
      "restart re-planned already-committed files")
    s2.commit(s2.deserializeOffset("12"))
    // the 6 newly retired entries re-crossed the threshold → generation 1
    // replaced generation 0, and exactly one generation remains
    assert(compacts == Seq("compact_000000001"), s"generations: $compacts")

    // third restart with nothing new: membership holds, nothing re-plans
    val s3 = newStream(dir, ckpt)
    assert(s3.latestOffset().json() == "12", "third start re-ingested")
    // generation 1 must carry the FULL membership (gen 0 folded in)
    val gen1 = new java.io.File(ld, "compact_000000001")
    val folded = scala.io.Source.fromFile(gen1, "UTF-8").getLines()
      .filter(_.nonEmpty).size
    assert(folded == 12, s"generation 1 holds $folded of 12 names")
  }

  test("legacy un-numbered `compact` checkpoints upgrade in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_lg").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_blk_lg_ck").toString
    val ld = new java.io.File(ckpt, "graft_blocks_seen")
    landInto(dir, 0, 5)
    val s1 = newStream(dir, ckpt)
    assert(s1.latestOffset().json() == "5")
    s1.commit(s1.deserializeOffset("5")) // 5 ≥ 4 → generation 0
    // rewrite the checkpoint to the pre-generation on-disk layout
    val gen = new java.io.File(ld, "compact_000000000")
    assert(gen.exists, Option(ld.listFiles).getOrElse(Array.empty)
      .map(_.getName).mkString(", "))
    java.nio.file.Files.move(gen.toPath, new java.io.File(ld, "compact").toPath)

    // restart loads the legacy file: no re-ingest, tailing continues
    landInto(dir, 5, 6)
    val s2 = newStream(dir, ckpt)
    assert(s2.latestOffset().json() == "6")
    assert(plannedIds(s2, 5, 6) == Seq(5L),
      "legacy upgrade re-planned committed files")
    s2.commit(s2.deserializeOffset("6")) // k=1 < 4: no compaction yet
    landInto(dir, 6, 9)
    assert(s2.latestOffset().json() == "9")
    s2.commit(s2.deserializeOffset("9")) // k=4 → first NUMBERED generation
    def compacts: Seq[String] = Option(ld.listFiles).getOrElse(Array.empty)
      .map(_.getName).filter(n => n == "compact" || n.startsWith("compact_"))
      .sorted.toSeq
    assert(compacts == Seq("compact_000000000"),
      s"legacy file not superseded/GC'd: $compacts")
    val s3 = newStream(dir, ckpt)
    assert(s3.latestOffset().json() == "9", "upgrade lost membership")
  }
}
