package graft

import org.apache.spark.sql.functions._

/** DataSource V2 block connector: split planning, pruning, determinism,
  * and the reference's incrementation pipeline running on it. */
class BlockSourceSuite extends SparkSpec {

  private def blocks = spark.read.format("graft-blocks")
    .option("blocks", 64).option("blockLen", 256).option("splits", 8).load()

  test("produces the full grid with deterministic payloads") {
    val df = blocks
    assert(df.count() == 64)
    assert(df.rdd.getNumPartitions == 8) // split planning honored
    val first = df.where(col("block_id") === 3)
      .select(element_at(col("payload"), 1)).head.getFloat(0)
    val again = blocks.where(col("block_id") === 3)
      .select(element_at(col("payload"), 1)).head.getFloat(0)
    assert(first == again) // deterministic across reads
    assert(graft.sources.BlockSource.element(3L, 0) == first)
  }

  test("column pruning reaches the connector (no payload for metadata queries)") {
    val pruned = blocks.select("block_id", "n_bytes")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("pruned=[block_id,n_bytes]"), scan.take(1200))
    assert(pruned.agg(sum("n_bytes")).head.getLong(0) == 64L * 256 * 4)
  }

  test("write path round-trips: rows → block files → identical rows back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_w").toString
    blocks.write.format("graft-blocks").option("path", dir)
      .mode("overwrite").save()
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.matches("block_\\d+\\.bin")) == 64)
    val back = spark.read.format("graft-blocks").option("path", dir)
      .option("splits", 8).load()
    assert(back.count() == 64)
    // payload sums (and every metadata column) must survive the round-trip
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .select(col("block_id"), col("grid_x"), col("grid_y"), col("n_bytes"),
        expr("aggregate(payload, 0D, (acc, x) -> acc + CAST(x AS DOUBLE))")
          .as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(sums(back) == sums(blocks))
    // overwrite truncates: a second write of FEWER blocks leaves no strays
    blocks.where(col("block_id") < 16).write.format("graft-blocks")
      .option("path", dir).mode("overwrite").save()
    assert(spark.read.format("graft-blocks").option("path", dir).load()
      .count() == 16)
    // pruned read off files skips the payload (header-only fetch)
    val pruned = spark.read.format("graft-blocks").option("path", dir).load()
      .select("block_id", "n_bytes")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("pruned=[block_id,n_bytes]"), scan.take(1200))
    assert(pruned.agg(sum("n_bytes")).head.getLong(0) == 16L * 256 * 4)
  }

  test("streaming write sink lands the same block files as the batch path") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_blk_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_blk_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_blk_ck").toString
    blocks.write.mode("overwrite").parquet(srcDir)
    val q = spark.readStream.schema(graft.sources.BlockSource.schema)
      .parquet(srcDir)
      .writeStream.format("graft-blocks").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.format("graft-blocks").option("path", outDir).load()
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .select(col("block_id"),
        expr("aggregate(payload, 0D, (acc, x) -> acc + CAST(x AS DOUBLE))")
          .as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(back.count() == 64)
    assert(sums(back) == sums(blocks))
  }

  test("streaming read tails the block dir exactly once across restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_sr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_blk_sr_ck").toString
    def land(lo: Int, hi: Int): Unit =
      blocks.where(col("block_id") >= lo && col("block_id") < hi)
        .write.format("graft-blocks").option("path", dir)
        .mode("append").save()
    // foreachBatch sink: the memory sink cannot recover from a checkpoint
    val buf = new scala.collection.mutable.ArrayBuffer[Long]
    def start() = spark.readStream.format("graft-blocks")
      .option("path", dir).option("splits", 4).load()
      .select("block_id")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= df.collect().map(_.getLong(0)) }; ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def seen: Seq[Long] = buf.synchronized(buf.sorted.toSeq)

    land(0, 8)
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen == (0L until 8L))
      land(8, 20) // growth mid-query: next trigger picks up ONLY the new files
      q1.processAllAvailable()
      assert(seen == (0L until 20L))
    } finally q1.stop()

    // restart from the checkpoint: the persisted discovery log keeps
    // offsets meaningful — replays emit nothing old, new files still land
    land(20, 32)
    buf.synchronized(buf.clear()) // keep ONLY what the restarted run emits
    val q2 = start()
    try {
      q2.processAllAvailable()
      val afterRestart = seen
      assert(afterRestart == (20L until 32L),
        s"restart re-emitted or missed blocks: $afterRestart")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger bounds every micro-batch (backlog drains in slices)") {
    // 12 pre-existing files + a cap of 5: the first start must NOT plan
    // one batch with the whole backlog — triggers drain it as 5/5/2.
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_adm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_blk_adm_ck").toString
    blocks.where(col("block_id") < 12)
      .write.format("graft-blocks").option("path", dir)
      .mode("append").save()
    val sizes = new scala.collection.mutable.ArrayBuffer[Long]
    val q = spark.readStream.format("graft-blocks")
      .option("path", dir).option("maxFilesPerTrigger", 5).load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        if (n > 0) sizes.synchronized { sizes += n }; ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = sizes.synchronized(sizes.toList)
    assert(got.sum == 12, s"batches: $got")
    assert(got.forall(_ <= 5), s"a batch exceeded the cap: $got")
    assert(got == List(5L, 5L, 2L), s"expected 5/5/2 drain, got $got")
  }

  test("continuous incrementation: blocks stream in → map → exactly-once blocks out") {
    // The reference's block incrementation pipeline as ONE continuous
    // query over the custom connector on BOTH ends: micro-batch tail of
    // an input volume, element-wise payload map, exactly-once staged
    // commit into an output volume. Data lands incrementally; the final
    // output volume must equal the batch formulation bit-for-bit.
    val inDir = java.nio.file.Files.createTempDirectory("graft_blk_pin").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_blk_pout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_blk_pck").toString
    def land(lo: Int, hi: Int): Unit =
      blocks.where(col("block_id") >= lo && col("block_id") < hi)
        .write.format("graft-blocks").option("path", inDir)
        .mode("append").save()
    land(0, 32)
    val q = spark.readStream.format("graft-blocks")
      .option("path", inDir).option("splits", 4).load()
      .withColumn("payload",
        expr("transform(payload, x -> x + CAST(1.0 AS FLOAT))"))
      .writeStream.format("graft-blocks").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      land(32, 64) // volume keeps growing mid-query
      q.processAllAvailable()
    } finally q.stop()
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .select(col("block_id"),
        expr("aggregate(payload, 0D, (acc, x) -> acc + CAST(x AS DOUBLE))")
          .as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val streamed = spark.read.format("graft-blocks").option("path", outDir).load()
    val batch = spark.read.format("graft-blocks").option("path", inDir).load()
      .withColumn("payload",
        expr("transform(payload, x -> x + CAST(1.0 AS FLOAT))"))
    assert(streamed.count() == 64)
    assert(sums(streamed) == sums(batch))
  }

  test("corrupt block file fails with a diagnostic, not garbage rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/block_0.bin"),
      Array.fill[Byte](32)(0x7f))
    val e = intercept[Exception] {
      spark.read.format("graft-blocks").option("path", dir).load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bad magic")), e.toString)
  }

  test("reference incrementation pipeline runs block-parallel on the source") {
    val inc = blocks.select(col("block_id"),
      expr("transform(payload, x -> CAST(x AS DOUBLE) + 1.0)").as("v"))
    val total = inc.select(explode(col("v")).as("x")).agg(sum("x"))
      .head.getDouble(0)
    // payload elements are in (-0.5, 0.5) → after +1, mean ≈ 1.0
    assert(math.abs(total / (64 * 256) - 1.0) < 0.01)
  }
}
