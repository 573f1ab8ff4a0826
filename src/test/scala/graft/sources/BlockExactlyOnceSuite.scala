package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

/** The exactly-once contract of the graft-blocks STREAMING sink, driven at
  * the connector API level so we can kill an epoch mid-flight (a running
  * StreamExecution would never let us): a failed epoch exposes NO partial
  * block, a replayed epoch commits each block exactly once, and a replay of
  * an ALREADY-COMMITTED epoch (crash between sink commit and checkpoint
  * advance — the classic at-least-once window) changes nothing. */
class BlockExactlyOnceSuite extends graft.SparkSpec {

  private val N = 16

  private def row(id: Long) = InternalRow.fromSeq(Seq(
    id, (id % 8).toInt, (id / 8).toInt, N.toLong * 4,
    ArrayData.toArrayData(Array.tabulate(N)(i => BlockSource.element(id, i)))))

  test("mid-epoch failure exposes nothing; replays commit exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blk_eo").toString
    spark.sparkContext.setLogLevel("ERROR") // the deliberate task failures below would WARN-spam
    val sw = new BlockWriteBuilder(dir, BlockSource.schema).build().toStreaming
    val factory = sw.createStreamingWriterFactory(null) // info unused

    def visible: Seq[Long] = spark.read.format("graft-blocks")
      .option("path", dir).load()
      .select("block_id").collect().map(_.getLong(0)).sorted.toSeq

    // ---- attempt 1 of epoch 0: task 0 commits, task 1 dies, query killed
    val w0 = factory.createWriter(0, 0L, 0L)
    w0.write(row(0)); w0.write(row(1))
    val m0 = w0.commit()
    val w1 = factory.createWriter(1, 1L, 0L)
    w1.write(row(2))
    w1.abort() // task failure
    // a DEAD attempt: wrote to staging, then the executor vanished — no
    // commit message, no task-side abort ever reaches the driver
    factory.createWriter(1, 2L, 0L).write(row(2))
    assert(visible.isEmpty, "a block from an uncommitted epoch is visible")
    sw.abort(0L, Array(m0)) // driver-side epoch abort on query death
    // the epoch-scoped sweep must also have cleaned the dead attempt's file
    val fs0 = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(Option(fs0.globStatus(new Path(dir, "_staging/*")))
      .getOrElse(Array.empty).isEmpty, "dead-attempt staging leaked past abort")

    // ---- restart: full replay of epoch 0 succeeds
    val wa = factory.createWriter(0, 10L, 0L)
    wa.write(row(0)); wa.write(row(1))
    val wb = factory.createWriter(1, 11L, 0L)
    wb.write(row(2))
    sw.commit(0L, Array(wa.commit(), wb.commit()))
    assert(visible == Seq(0L, 1L, 2L))

    // ---- replay of the already-committed epoch: a no-op, never a dupe
    // (plus a losing speculative attempt whose staging only the commit-time
    // sweep can reclaim)
    val wc = factory.createWriter(0, 20L, 0L)
    wc.write(row(0)); wc.write(row(1))
    val wd = factory.createWriter(1, 21L, 0L)
    wd.write(row(2))
    factory.createWriter(1, 22L, 0L).write(row(2)) // speculative, vanishes
    sw.commit(0L, Array(wc.commit(), wd.commit()))
    assert(visible == Seq(0L, 1L, 2L))

    // content survives the stage→rename path bit-exactly
    val sums = spark.read.format("graft-blocks").option("path", dir).load()
      .select(col("block_id"),
        expr("aggregate(payload, 0D, (acc, x) -> acc + CAST(x AS DOUBLE))").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L to 2L).foreach { id =>
      val want = Array.tabulate(N)(i => BlockSource.element(id, i).toDouble).sum
      assert(math.abs(sums(id) - want) < 1e-9, s"block $id payload diverged")
    }

    // commit log exists; staging fully drained
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(dir, "_commits/epoch_0")))
    val staged = Option(fs.globStatus(new Path(dir, "_staging/*")))
      .getOrElse(Array.empty)
    assert(staged.isEmpty, staged.map(_.getPath).mkString(", "))
  }
}
