package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector modeling the reference's block-parallel volume
  * ingest: a volume is a grid of blocks, each row one block with typed
  * metadata and a deterministic synthetic payload (stand-in for the NIfTI
  * decode, which needs codecs this container lacks).
  *
  * Demonstrates the real connector contract at 100 TB: split planning
  * (one InputPartition per block range → executor-parallel reads),
  * column pruning (SupportsPushDownRequiredColumns — payloads are not
  * materialized for metadata-only queries), and zero driver involvement
  * in row production.
  *
  * With a `path` option the connector is also a WRITE target (the
  * reference's pipelines write blocks back to storage): each task writes
  * its rows as fixed-format `block_<id>.bin` files through the Hadoop
  * FileSystem API (12-byte header: magic, grid_x, grid_y; then the float32
  * payload little-endian), and a path-read plans one split per file group
  * and reads them back — header-only when the payload column is pruned.
  *
  * All filesystem access resolves through the SESSION's Hadoop
  * configuration (captured driver-side at plan/build time and shipped to
  * tasks), so `spark.hadoop.*` credentials and `fs.defaultFS` work against
  * HDFS/object stores exactly as for the built-in sources — a bare
  * `new Configuration()` would silently drop them (round-8 ADVICE).
  *
  * Write semantics:
  *   - BATCH: `block_<id>.bin` files are keyed by block_id with
  *     deterministic content, so task retries/speculation are idempotent
  *     per file.
  *   - STREAMING: exactly-once via a commit log. Tasks stage to
  *     `_staging/e<epoch>_p<part>_t<task>_block_<id>.bin`; the driver's
  *     `StreamingWrite.commit(epoch)` renames staged files to their final
  *     names and then atomically records `_commits/epoch_<epoch>` (tmp +
  *     rename). A replayed epoch whose manifest already exists only cleans
  *     its staging leftovers — a failure/retry can never re-expose partial
  *     or duplicate blocks, because nothing outside `_staging/` is touched
  *     before the epoch's tasks all succeeded, and reads glob only
  *     top-level `block_*.bin`.
  *
  * Read semantics:
  *   - BATCH: split-planned pruned reads of `block_*.bin` (or synthetic).
  *   - STREAMING (micro-batch): tails the directory, each file exactly
  *     once; discovery order is pinned in a persistent log under the
  *     stream checkpoint so restarts resolve offsets to the same files.
  *     Every write path lands files via tmp+rename, so a discovered file
  *     is always complete.
  *
  * Usage:
  *   spark.read.format("graft-blocks")
  *     .option("blocks", 64).option("blockLen", 1024).load()         // synthetic
  *   df.write.format("graft-blocks").option("path", dir)
  *     .mode("overwrite").save()                                     // blocks out
  *   spark.read.format("graft-blocks").option("path", dir).load()    // blocks in
  *   spark.readStream.format("graft-blocks").option("path", dir).load() // tail
  */
class BlockSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-blocks"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new BlockTable(
      opts.getInt("blocks", 64),
      opts.getInt("blocklen", 1024),
      opts.getInt("splits", 8),
      Option(opts.get("path")))
  }
}

object BlockSource {
  val schema: StructType = StructType(Seq(
    StructField("block_id", LongType, nullable = false),
    StructField("grid_x", IntegerType, nullable = false),
    StructField("grid_y", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", ArrayType(FloatType, containsNull = false))))

  val Magic: Int = 0x47424C4B // "GBLK"
  val HeaderLen: Int = 12     // magic + grid_x + grid_y

  /** Deterministic synthetic voxel payload (splitmix-style per element). */
  def element(blockId: Long, i: Int): Float = {
    var z = blockId * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z & 0xFFFFFF).toFloat / 0xFFFFFF.toFloat) - 0.5f
  }

  /** Session Hadoop conf (spark.hadoop.*, fs.defaultFS), captured on the
    * driver. Call sites are all driver-side (plan/build time). */
  private[sources] def hadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** Positive-int option parse that names the option in its error — a bare
    * .toInt surfaced opaque NumberFormatExceptions, and a zero/negative
    * cap would stall a stream (round-8 ADVICE). */
  private[sources] def posInt(options: CaseInsensitiveStringMap,
      name: String): Option[Int] =
    Option(options.get(name)).map { v =>
      val n =
        try v.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft-blocks: $name must be a positive integer, got '$v'")
        }
      if (n <= 0) throw new IllegalArgumentException(
        s"graft-blocks: $name must be > 0, got $n")
      n
    }
}

/** Minimal serializable Hadoop-conf carrier (the task-side half of the
  * session-conf contract; Configuration itself is not Serializable). Also
  * used by operators that write through the Hadoop FS API from executors
  * (Multimodal's .nii corpus writer). */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private class BlockTable(blocks: Int, blockLen: Int, splits: Int,
    path: Option[String]) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = path
    .map(p => s"graft_blocks($p)")
    .getOrElse(s"graft_blocks($blocks x $blockLen)")
  override def schema(): StructType = BlockSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockScanBuilder(blocks, blockLen, splits, path,
      BlockSource.posInt(options, "maxFilesPerTrigger"),
      BlockSource.posInt(options, "logCompactThreshold").getOrElse(4096))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val p = path.getOrElse(throw new IllegalArgumentException(
      "graft-blocks write requires a 'path' option"))
    new BlockWriteBuilder(p, info.schema())
  }
}

private class BlockScanBuilder(blocks: Int, blockLen: Int, splits: Int,
    path: Option[String], maxFilesPerTrigger: Option[Int],
    logCompactThreshold: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = BlockSource.schema
  private var limit: Option[Int] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // One row per block/file, planned from a driver-side listing: truncating
  // the plan to the first `n` blocks yields EXACTLY n rows, so the limit is
  // fully absorbed (isPartiallyPushed = false drops the query-side Limit) —
  // a tail probe over a 100 TB volume opens `n` files, not all of them.
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = false
  override def build(): Scan =
    new BlockScan(blocks, blockLen, splits, path, required, maxFilesPerTrigger,
      logCompactThreshold, limit)
}

private class BlockScan(blocks: Int, blockLen: Int, splits: Int,
    path: Option[String], required: StructType,
    maxFilesPerTrigger: Option[Int] = None,
    logCompactThreshold: Int = 4096,
    limit: Option[Int] = None) extends Scan with Batch
    with SupportsReportStatistics with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-blocks pruned=[${required.fieldNames.mkString(",")}]" +
      limit.map(n => s" pushedLimit=$n").getOrElse("") +
      path.map(p => s" path=$p").getOrElse("")

  /** Driver-side listing, shared by planning and statistics (one RPC
    * round, memoized — planInputPartitions and estimateStatistics both
    * need it). Already truncated to the pushed limit. */
  private lazy val fileList: Array[(String, Long)] = path match {
    case None => Array.empty
    case Some(p) =>
      val dir = new Path(p)
      val fs = dir.getFileSystem(BlockSource.hadoopConf())
      if (!fs.exists(dir)) throw new IllegalArgumentException(
        s"graft-blocks: path does not exist: $p")
      // globStatus returns null (not empty) when the pattern's parent is
      // missing — normalize so the zero-file case plans zero splits
      val files = Option(fs.globStatus(new Path(dir, "block_*.bin")))
        .getOrElse(Array.empty)
        .map(st => (st.getPath.toString, st.getLen))
        .sortBy(_._1)
      limit.map(files.take).getOrElse(files)
  }

  private def effBlocks: Int = limit.map(math.min(blocks, _)).getOrElse(blocks)

  override def planInputPartitions(): Array[InputPartition] = path match {
    case None =>
      val n = effBlocks
      val per = math.max(1, math.ceil(n.toDouble / splits).toInt)
      if (per == 1)
        // one block per split → each partition carries its block_id as a
        // key-grouped partition key (see outputPartitioning)
        (0 until n).map(id => KeyedBlockRange(id)).toArray[InputPartition]
      else
        (0 until n by per)
          .map(start => BlockRange(start, math.min(n, start + per)))
          .toArray[InputPartition]
    case Some(_) =>
      // driver lists metadata only; rows are produced executor-side
      val files = fileList
      val per = math.max(1, math.ceil(files.length.toDouble / splits).toInt)
      if (per == 1)
        files.flatMap { case (f, len) => f match {
          case BlockScan.BlockName(id) =>
            Some(KeyedBlockFile(f, len, id.toLong): InputPartition)
          case _ => Some(BlockFiles(Seq((f, len))): InputPartition)
        }}
      else
        files.grouped(per).map(g => BlockFiles(g.toSeq)).toArray[InputPartition]
  }

  /** Exact row count and payload-aware byte size from metadata alone: the
    * synthetic grid is closed-form; the file listing carries lengths. With
    * honest sizes a small volume joins as the BROADCAST side instead of
    * inheriting the DSv2 default (max-long → always shuffle). Pruning the
    * payload shrinks the estimate to header bytes — column-pruned
    * metadata probes stay under the broadcast threshold even when the
    * volume's payloads are TBs. */
  override def estimateStatistics(): Statistics = {
    val payloadKept = required.fieldNames.contains("payload")
    val (rows, bytes) = path match {
      case None =>
        val n = effBlocks.toLong
        (n, n * (if (payloadKept) BlockSource.HeaderLen + 4L * blockLen
                 else BlockSource.HeaderLen.toLong))
      case Some(_) =>
        (fileList.length.toLong,
          if (payloadKept) fileList.map(_._2).sum
          else fileList.length.toLong * BlockSource.HeaderLen)
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  /** When the plan degenerates to one block per partition (splits >= n),
    * report KeyGroupedPartitioning on block_id: two volumes read this way
    * join on block_id with ZERO exchange on either side (storage-
    * partitioned join, `spark.sql.sources.v2.bucketing.enabled`), and a
    * groupBy(block_id) needs no shuffle — the layout the reference's
    * block-parallel volume pipelines rely on. Coarser plans (and plans
    * that pruned block_id away, which Spark could not resolve the key
    * against) report unknown. */
  override def outputPartitioning(): Partitioning = {
    lazy val parts = planInputPartitions()
    if (required.fieldNames.contains("block_id") &&
        parts.nonEmpty && parts.forall(_.isInstanceOf[HasPartitionKey]))
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("block_id")), parts.length)
    else new UnknownPartitioning(parts.length)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlockReaderFactory(blockLen, path.isDefined, required,
      new SerializableHadoopConf(BlockSource.hadoopConf()))

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    path match {
      case Some(p) =>
        new BlockMicroBatchStream(p, splits, required, checkpointLocation,
          maxFilesPerTrigger, logCompactThreshold)
      case None => throw new UnsupportedOperationException(
        "graft-blocks streaming read requires a 'path' option")
    }
}

private object BlockScan {
  val BlockName = """.*block_(\d+)\.bin$""".r
}

/** Micro-batch READ: tails a block directory, emitting each `block_*.bin`
  * file exactly once. Discovery order is pinned in a persistent ordered
  * file log under the stream's checkpoint location (tmp+rename rewrite),
  * so an offset is just an index into that log — a restarted query
  * resolves the same (start, end] to the same files even if the directory
  * has since grown, and files that sort before the watermark are still
  * picked up (discovery appends, the log never re-sorts). Pairs with the
  * exactly-once streaming sink: its commit renames blocks into place
  * atomically, so a discovered file is always complete. */
private class BlockMicroBatchStream(path: String, splits: Int,
    required: StructType, ckptDir: String,
    maxFilesPerTrigger: Option[Int],
    logCompactThreshold: Int = 4096) extends MicroBatchStream
    with SupportsAdmissionControl {

  private case class IdxOffset(idx: Long) extends Offset {
    override def json(): String = idx.toString
  }

  private val fs = new Path(path).getFileSystem(BlockSource.hadoopConf())
  // the checkpoint may live on a DIFFERENT filesystem than the data path
  // (hdfs checkpoint over an object-store block dir) — resolve separately
  private val ckptFs = new Path(ckptDir).getFileSystem(BlockSource.hadoopConf())
  // APPEND-ONLY SEGMENTED discovery log: each refresh that finds new files
  // writes ONLY those entries as one numbered segment (tmp+rename; plain
  // appends are unsupported on object stores). A monolithic rewrite would
  // be O(total²) bytes over the life of a long tail; segments keep each
  // persist proportional to what actually arrived. Restart replays the
  // segments in numeric order, reproducing the exact discovery order.
  //
  // COMPACTION (round-8 ADVICE: the tail of a long-running 100 TB volume
  // must not pay O(total-files) driver memory and restart replay): once
  // commit(end) has retired logCompactThreshold entries, everything below
  // the committed offset is folded into a fresh MONOTONICALLY NUMBERED
  // `compact_<n>` membership file (names only — those indexes can never be
  // planned again, so lengths are dropped), the uncommitted tail is
  // rewritten as a single fresh segment, the old segments are deleted, and
  // only THEN are older compact generations GC'd. Writing each generation
  // tmp+rename to a never-existing name (round-9 ADVICE high: the previous
  // scheme rewrote ONE `compact` file in place via delete-then-rename — a
  // crash between the delete and the rename left NO membership file, so
  // after segment GC a restart re-ingested already-committed files) means
  // a complete generation is durable at every instant once one has ever
  // been written: restart loads the highest-numbered one. `assigned` then
  // holds just the uncommitted tail; only `seen` (pure names, needed to
  // recognize already-ingested files in the directory glob) stays
  // O(total). Every load DEDUPES against `seen`, which makes each crash
  // window between those steps replay-safe (a file can appear in both a
  // compact generation and a not-yet-deleted segment).
  private val logDir = new Path(ckptDir, "graft_blocks_seen")
  // legacy single-file name from the pre-generation scheme, still loaded
  // (as the oldest generation) so existing checkpoints upgrade in place
  private def isCompactName(n: String): Boolean =
    n == "compact" || n.startsWith("compact_")
  // ordered (file, length) discovery log for entries >= base, + full
  // membership; loaded from the persisted log so restart offsets keep
  // meaning
  private val assigned = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  private val seen = scala.collection.mutable.HashSet.empty[String]
  private var base = 0L      // entries retired into the compact generation
  private var committed = 0L // highest offset commit(end) has sealed
  private var nextSeg = 0L
  private var nextCompact = 0L
  private var currentCompact: Option[Path] = None
  locally {
    if (ckptFs.exists(logDir)) {
      // "compact" (legacy) sorts before every "compact_<n>" (strict prefix),
      // and the zero-padded numbering sorts numerically — last is newest
      val compacts = ckptFs.listStatus(logDir).map(_.getPath)
        .filter(p => isCompactName(p.getName)).sortBy(_.getName)
      compacts.lastOption.foreach { newest =>
        val in = ckptFs.open(newest)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).foreach { name => seen += name; base += 1 }
        finally in.close()
        committed = base
        currentCompact = Some(newest)
        nextCompact = newest.getName match {
          case s if s.startsWith("compact_") =>
            s.stripPrefix("compact_").toLong + 1
          case _ => 0L
        }
        // older generations are fully shadowed by the newest (each folds in
        // its predecessor) — GC whatever a crashed compaction left behind
        compacts.init.foreach(p => ckptFs.delete(p, false))
      }
    }
    if (ckptFs.exists(logDir)) {
      val segs = ckptFs.listStatus(logDir)
        .map(_.getPath)
        .filter(_.getName.startsWith("seg_"))
        .sortBy(_.getName)
      segs.foreach { seg =>
        val in = ckptFs.open(seg)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).foreach { line =>
            val i = line.lastIndexOf('\t')
            val entry = (line.substring(0, i), line.substring(i + 1).toLong)
            if (!seen(entry._1)) { assigned += entry; seen += entry._1 }
          }
        finally in.close()
      }
      segs.lastOption.foreach(p =>
        nextSeg = p.getName.stripPrefix("seg_").toLong + 1)
    }
  }

  private def persist(fresh: Seq[(String, Long)]): Unit = {
    val tmp = new Path(logDir, f".seg_$nextSeg%09d.tmp")
    val os = ckptFs.create(tmp, true)
    try os.write(fresh.map { case (f, n) => s"$f\t$n" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally os.close()
    BlockWrites.renameIntoLog(ckptFs, tmp, new Path(logDir, f"seg_$nextSeg%09d"))
    nextSeg += 1
  }

  private def refresh(): Unit = {
    val files = Option(fs.globStatus(new Path(new Path(path), "block_*.bin")))
      .getOrElse(Array.empty)
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy(_._1)
    val fresh = files.filterNot { case (f, _) => seen(f) }
    if (fresh.nonEmpty) {
      persist(fresh.toSeq) // durable BEFORE visible in any offset
      assigned ++= fresh
      seen ++= fresh.map(_._1)
    }
  }

  override def latestOffset(): Offset =
    { refresh(); IdxOffset(base + assigned.length) }

  // ---- admission control: bound each micro-batch so a first start over a
  // huge existing volume (or a burst of arrivals) never plans one
  // batch containing the whole backlog — the property that makes tailing
  // a 100 TB volume tractable. maxFilesPerTrigger caps files per batch;
  // the remainder stays pending and later triggers drain it.
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    refresh()
    val s = start.asInstanceOf[IdxOffset].idx
    limit match {
      case mf: ReadMaxFiles =>
        IdxOffset(math.min(base + assigned.length, s + mf.maxFiles()))
      case _ => IdxOffset(base + assigned.length)
    }
  }

  override def reportLatestOffset(): Offset = IdxOffset(base + assigned.length)

  override def initialOffset(): Offset = IdxOffset(0L)
  override def deserializeOffset(json: String): Offset = IdxOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IdxOffset].idx
    val e = end.asInstanceOf[IdxOffset].idx
    require(s >= base, // commit(end) only retires SEALED offsets, so any
      // replayable batch's start is >= committed >= base by construction
      s"graft-blocks: batch start $s precedes compacted base $base")
    val slice = assigned.slice((s - base).toInt, (e - base).toInt)
    if (slice.isEmpty) Array.empty
    else {
      val per = math.max(1, math.ceil(slice.length.toDouble / splits).toInt)
      slice.grouped(per).map(g => BlockFiles(g.toSeq)).toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlockReaderFactory(0, fromFiles = true, required,
      new SerializableHadoopConf(BlockSource.hadoopConf()))

  /** Spark's contract: data up to `end` is durably committed in the query
    * log and will never be re-planned — so retire it from the driver's
    * ordered log once enough has accumulated (threshold amortizes the
    * O(committed) compact rewrite over many batches). */
  override def commit(end: Offset): Unit = {
    committed = math.max(committed, end.asInstanceOf[IdxOffset].idx)
    val k = (committed - base).toInt
    if (k >= logCompactThreshold) {
      // 1. fold the previous generation + the k retired names into a FRESH
      //    numbered generation (tmp + rename to a never-existing name, so
      //    the predecessor stays durable until this one is visible; stream
      //    the old file through so compaction never holds it in memory)
      val genName = f"compact_$nextCompact%09d"
      val gen = new Path(logDir, genName)
      val tmp = new Path(logDir, s".$genName.tmp")
      val os = ckptFs.create(tmp, true)
      try {
        currentCompact.foreach { prev =>
          val in = ckptFs.open(prev)
          try org.apache.hadoop.io.IOUtils.copyBytes(in, os, 65536, false)
          finally in.close()
        }
        os.write(assigned.take(k).map(_._1)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      } finally os.close()
      BlockWrites.renameIntoLog(ckptFs, tmp, gen)
      // 2. rewrite the uncommitted tail as ONE fresh segment so the old
      //    segments (now shadowed by the generation + this segment) can go
      val tail = assigned.drop(k)
      if (tail.nonEmpty) persist(tail.toSeq)
      val keep = if (tail.nonEmpty) Some(f"seg_${nextSeg - 1}%09d") else None
      // 3. drop every older segment; load-time dedup covers a crash here
      // 4. drop older compact generations — only now that the new one is
      //    durable (a crash anywhere above leaves the predecessor intact
      //    and restart loads the highest complete generation)
      ckptFs.listStatus(logDir).map(_.getPath)
        .filter { p =>
          val n = p.getName
          (n.startsWith("seg_") && !keep.contains(n)) ||
            (isCompactName(n) && n != genName)
        }
        .foreach(p => ckptFs.delete(p, false))
      currentCompact = Some(gen)
      nextCompact += 1
      assigned.remove(0, k)
      base += k
    }
  }
  override def stop(): Unit = ()
}

private case class BlockRange(start: Int, end: Int) extends InputPartition
private case class BlockFiles(files: Seq[(String, Long)]) extends InputPartition

/** Single-block splits carrying their block_id as the key-grouped
  * partition key (storage-partitioned joins; see outputPartitioning). */
private case class KeyedBlockRange(id: Int) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(id.toLong)
}
private case class KeyedBlockFile(file: String, len: Long, blockId: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(blockId)
}

private class BlockReaderFactory(blockLen: Int, fromFiles: Boolean,
    required: StructType, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case f: BlockFiles => new FileBlockReader(f, required, conf)
      case f: KeyedBlockFile =>
        new FileBlockReader(BlockFiles(Seq((f.file, f.len))), required, conf)
      case r: BlockRange => new SyntheticBlockReader(r, blockLen, required)
      case r: KeyedBlockRange =>
        new SyntheticBlockReader(BlockRange(r.id, r.id + 1), blockLen, required)
      case other => throw new IllegalStateException(
        s"graft-blocks: unexpected partition type $other")
    }
}

private class SyntheticBlockReader(r: BlockRange, blockLen: Int,
    required: StructType) extends PartitionReader[InternalRow] {
  private var id = r.start - 1
  override def next(): Boolean = { id += 1; id < r.end }
  override def get(): InternalRow = {
    val values = required.fieldNames.map {
      case "block_id" => id.toLong
      case "grid_x" => id % 8
      case "grid_y" => id / 8
      case "n_bytes" => blockLen.toLong * 4
      case "payload" =>
        // only materialized when the payload column survives pruning
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array.tabulate(blockLen)(i => BlockSource.element(id.toLong, i)))
      case other => throw new IllegalStateException(
        s"BlockSource: unknown required column '$other'")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}

/** Reads block files back; when `payload` is pruned only the 12-byte
  * header is fetched per file (n_bytes comes from the listing's length). */
private class FileBlockReader(part: BlockFiles, required: StructType,
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {
  private val needPayload = required.fieldNames.contains("payload")
  private val it = part.files.iterator
  private var fs: FileSystem = _
  private var cur: (String, Long) = _
  private val BlockName = """.*block_(\d+)\.bin$""".r

  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }

  override def get(): InternalRow = {
    val (file, len) = cur
    val p = new Path(file)
    if (fs == null) fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val bytes =
      try {
        val want = if (needPayload) len.toInt else BlockSource.HeaderLen
        val buf = new Array[Byte](want)
        in.readFully(0, buf)
        buf
      } finally in.close()
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == BlockSource.Magic,
      s"graft-blocks: bad magic in $file")
    val gx = bb.getInt(); val gy = bb.getInt()
    // validate before toLong: a glob match like block_x.bin must fail with
    // the offending path, not a bare NumberFormatException
    val blockId = file match {
      case BlockName(idStr) => idStr.toLong
      case _ => throw new IllegalStateException(
        s"graft-blocks: unparseable block file name: $file")
    }
    val values = required.fieldNames.map {
      case "block_id" => blockId
      case "grid_x" => gx
      case "grid_y" => gy
      case "n_bytes" => len - BlockSource.HeaderLen
      case "payload" =>
        val n = (len.toInt - BlockSource.HeaderLen) / 4
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array.tabulate(n)(_ => bb.getFloat()))
      case other => throw new IllegalStateException(
        s"BlockSource: unknown required column '$other'")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}

// ------------------------------------------------------------------ write

private class BlockWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    // capture the session conf ONCE, driver-side, at build time
    private val conf = new SerializableHadoopConf(BlockSource.hadoopConf())
    override def toBatch: BatchWrite =
      new BlockBatchWrite(path, schema, doTruncate, conf)
    override def toStreaming: StreamingWrite =
      new BlockStreamingWrite(path, schema, conf)
  }
}

private object BlockWrites {
  def prepareDir(path: String, truncate: Boolean, conf: Configuration): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (truncate && fs.exists(dir))
      Option(fs.globStatus(new Path(dir, "block_*.bin")))
        .getOrElse(Array.empty)
        .foreach(st => fs.delete(st.getPath, false))
    fs.mkdirs(dir)
    ()
  }

  /** Atomic-visibility rename for CHECKPOINT-LOG files only (discovery-log
    * segments, compact generations, commit manifests). On these call sites
    * content is deterministic per replay, so a target that already exists
    * with the SOURCE's length is a replay of an already-completed rename:
    * keep the visible file and drop the source — a delete-then-rename here
    * would briefly un-expose a file a concurrent reader has already logged
    * (round-8 ADVICE: the transient-FNF window). Only a LENGTH-MISMATCHED
    * leftover (a torn write from a pre-tmp-era crash) is deleted and
    * replaced. NEVER use this for data blocks: block length is fully
    * determined by blockLen, so same-length does NOT imply same content
    * there — see [[renameIntoData]] (round-9 ADVICE medium). */
  def renameIntoLog(fs: FileSystem, from: Path, to: Path): Unit = {
    val existing =
      try Some(fs.getFileStatus(to).getLen)
      catch { case _: java.io.FileNotFoundException => None }
    existing match {
      case Some(len) if len == fs.getFileStatus(from).getLen =>
        fs.delete(from, false)
      case other =>
        if (other.isDefined) fs.delete(to, false)
        require(fs.rename(from, to),
          s"graft-blocks: rename $from -> $to failed")
    }
    ()
  }

  /** Data-block rename: the NEW bytes must always win. A same-length target
    * may be a genuine rewrite of an existing block_id (every block of a
    * given volume has the same blockLen-determined size), so the keep-
    * existing shortcut above would silently drop updated content —
    * first-write-wins, an overwrite bug. Plain rename first: on a
    * POSIX-backed FileSystem it atomically replaces the target (no
    * transient-FNF window for a tailing reader); only when the FS refuses
    * an overwriting rename (HDFS-style semantics) fall back to
    * delete-then-rename. */
  def renameIntoData(fs: FileSystem, from: Path, to: Path): Unit = {
    if (!fs.rename(from, to)) {
      // Replay guard (round-12 ADVICE low): rename also returns false when
      // the SOURCE is missing — a replayed/raced commit whose tmp was
      // already consumed by the first completion. Deleting the target then
      // would turn a benign replay into data loss of a committed block.
      // Only when the source still exists is the failure an
      // HDFS-style refusal to overwrite, where new bytes must win.
      if (!fs.exists(from) && fs.exists(to)) return
      fs.delete(to, false)
      require(fs.rename(from, to),
        s"graft-blocks: rename $from -> $to failed")
    }
    ()
  }
}

/** Idempotent direct-write batch path (deterministic per-block file names;
  * retries/speculation rewrite identical bytes). */
private class BlockBatchWrite(path: String, schema: StructType,
    truncate: Boolean, conf: SerializableHadoopConf) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    BlockWrites.prepareDir(path, truncate, conf.value)
    new BlockWriterFactory(path, schema, conf, stagePrefix = None)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Exactly-once streaming sink: stage → (all tasks succeed) → rename →
  * manifest. See the class Scaladoc up top for the full protocol. */
private class BlockStreamingWrite(path: String, schema: StructType,
    conf: SerializableHadoopConf) extends StreamingWrite {

  private def manifest(epochId: Long) =
    new Path(path, s"_commits/epoch_$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    BlockWrites.prepareDir(path, truncate = false, conf.value)
    // top-level factory class: an anonymous one would capture this
    // (non-serializable) StreamingWrite as its outer instance
    new BlockStreamingWriterFactory(path, schema, conf)
  }

  /** Remove every `_staging/e<epoch>_*` leftover: staged files of FAILED
    * or speculative task attempts never appear in any commit message, so
    * without this epoch-scoped sweep they would accumulate forever. Safe
    * at commit time — the epoch is decided, so any file still in staging
    * for it is dead (a straggler attempt that loses the commit race will
    * abort anyway). */
  private def sweepStaging(fs: FileSystem, epochId: Long): Unit =
    Option(fs.globStatus(new Path(path, s"_staging/e${epochId}_*")))
      .getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, false))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    val staged = messages.collect { case BlockCommit(blocks) => blocks }.flatten
    if (fs.exists(manifest(epochId))) {
      // epoch replayed after a successful commit (failure between commit
      // and checkpoint advance): final files are already visible and
      // correct — only clean this replay's staging leftovers
      staged.foreach { case (_, p) => fs.delete(new Path(p), false) }
    } else {
      staged.foreach { case (id, p) =>
        BlockWrites.renameIntoData(fs, new Path(p), new Path(path, s"block_$id.bin"))
      }
      // manifest write is the commit point: tmp + rename is atomic per
      // FileSystem contract, so a crash mid-commit leaves either no
      // manifest (epoch replays, renames re-run idempotently) or a
      // complete one (replays become no-ops above)
      val tmp = new Path(path, s"_commits/.epoch_$epochId.tmp")
      val os = fs.create(tmp, true)
      try os.write(staged.map(_._1).sorted.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
      finally os.close()
      BlockWrites.renameIntoLog(fs, tmp, manifest(epochId))
    }
    sweepStaging(fs, epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case BlockCommit(blocks) => blocks }.flatten
      .foreach { case (_, p) => fs.delete(new Path(p), false) }
    sweepStaging(fs, epochId)
  }
}

private class BlockStreamingWriterFactory(path: String, schema: StructType,
    conf: SerializableHadoopConf) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new BlockWriterFactory(path, schema, conf,
      stagePrefix = Some(s"e${epochId}_p${partitionId}_t$taskId"))
      .createWriter(partitionId, taskId)
}

/** Staged block files from one committed task: (block_id, staged path). */
private case class BlockCommit(blocks: Seq[(Long, String)])
    extends WriterCommitMessage

private class BlockWriterFactory(path: String, schema: StructType,
    conf: SerializableHadoopConf, stagePrefix: Option[String])
    extends DataWriterFactory {
  private val iId = schema.fieldIndex("block_id")
  private val iGx = schema.fieldIndex("grid_x")
  private val iGy = schema.fieldIndex("grid_y")
  private val iPay = schema.fieldIndex("payload")

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private lazy val fs = {
        val f = new Path(path).getFileSystem(conf.value)
        // small-file writes: skip ChecksumFileSystem's per-file .crc
        // sidecar (and the glob-read path never expects one)
        f.setWriteChecksum(false)
        f
      }
      private val staged = scala.collection.mutable.ListBuffer.empty[(Long, String)]
      private var n = 0L
      override def write(row: InternalRow): Unit = {
        val id = row.getLong(iId)
        val arr = row.getArray(iPay)
        val bb = java.nio.ByteBuffer
          .allocate(BlockSource.HeaderLen + 4 * arr.numElements())
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(BlockSource.Magic)
        bb.putInt(row.getInt(iGx))
        bb.putInt(row.getInt(iGy))
        var i = 0
        while (i < arr.numElements()) { bb.putFloat(arr.getFloat(i)); i += 1 }
        stagePrefix match {
          case Some(pre) =>
            val p = new Path(path, s"_staging/${pre}_block_$id.bin")
            staged += ((id, p.toString))
            val os = fs.create(p, true)
            try os.write(bb.array()) finally os.close()
          case None =>
            // ATOMIC visibility for the direct batch path too: a streaming
            // reader tailing this directory must never glob a mid-write
            // file (it would log a partial length and underflow on read).
            // Tmp name is attempt-unique so speculative twins can't
            // clobber each other; the dot prefix keeps it out of the glob.
            val tmp = new Path(path, s".block_$id.bin.p${partitionId}_t$taskId")
            val os = fs.create(tmp, true)
            try os.write(bb.array()) finally os.close()
            BlockWrites.renameIntoData(fs, tmp, new Path(path, s"block_$id.bin"))
        }
        n += 1
      }
      override def commit(): WriterCommitMessage = BlockCommit(staged.toList)
      override def abort(): Unit =
        // best-effort task-side cleanup; the driver's epoch abort sweeps
        // whatever a dead task could not
        staged.foreach { case (_, p) => fs.delete(new Path(p), false) }
      override def close(): Unit = ()
    }
}
