package graft.operators

import graft.{Q, Scratch, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing (task brief: treat image/audio/video
  * as opaque binary columns with typed metadata).
  *
  * The real containers' decode libs are not in this environment, so the
  * decode step is a clearly-marked deterministic STUB — but the Spark-side
  * plumbing is real: binaryFile ingest, typed Dataset[MediaBlock] schema,
  * partition-parallel feature extraction via mapPartitions (the Scala
  * analogue of mapInPandas batch processing), and a relational join back
  * to metadata.
  *
  * Scale notes: binaryFile rows carry content inline — at 100 TB the scan
  * parallelizes per file; feature extraction is a narrow map (no shuffle);
  * `spark.sql.files.maxPartitionBytes` controls batch sizing exactly as a
  * Pandas-UDF batch size would.
  */
object Multimodal {

  /** One opaque media block with typed metadata. */
  case class MediaBlock(id: Long, kind: String, width: Int, height: Int,
      bytes: Array[Byte])

  /** Extracted features: byte stats + a 4-bin byte histogram. */
  case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
      checksum: Long, hist: Seq[Long], thumb_w: Int, thumb_h: Int)

  /** STUB decoder: a real deployment would decode image/audio frames here
    * (e.g. via a JNI codec); this deterministic stand-in computes byte
    * statistics so tests can assert exact values. The signature and batch
    * shape (iterator→iterator, partition-local) are the real contract. */
  def decodePartition(blocks: Iterator[MediaBlock]): Iterator[MediaFeatures] =
    blocks.map { b =>
      var sum = 0L
      val hist = new Array[Long](4)
      var i = 0
      while (i < b.bytes.length) {
        val v = b.bytes(i) & 0xff
        sum = (sum * 31 + v) % 1000000007L
        hist(v >> 6) += 1
        i += 1
      }
      MediaFeatures(b.id, b.kind, b.bytes.length.toLong, sum,
        hist.toSeq, b.width / 2, b.height / 2)
    }

  /** Distributed feature extraction over a typed Dataset. */
  def extract(blocks: Dataset[MediaBlock]): Dataset[MediaFeatures] = {
    import blocks.sparkSession.implicits._
    blocks.mapPartitions(decodePartition)
  }

  /** binaryFile ingest: each file → (path, modificationTime, length, content).
    * The filter is a pathGlobFilter over an existing directory rather than a
    * glob in the load path: a glob that matches zero files throws
    * PATH_NOT_FOUND, while an empty directory is a legal 0-row scan
    * (binaryFile's schema is fixed — nothing to infer).
    */
  def readBlobs(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  // ---------------------------------------------------------------------
  // NIfTI-1: a REAL neuroimaging block format, per the public spec
  // (https://nifti.nimh.nih.gov/nifti-1, nifti1.h): 348-byte little-endian
  // header (sizeof_hdr=348 @0, dim[8] int16 @40, datatype int16 @70,
  // bitpix int16 @72, vox_offset float32 @108, scl_slope float32 @112,
  // scl_inter float32 @116, magic "n+1\0" @344 for single-file .nii),
  // followed by the voxel payload at vox_offset.
  // ---------------------------------------------------------------------

  /** One serialized single-file NIfTI-1 image. */
  case class NiftiBlob(id: Long, blob: Array[Byte])

  /** Header fields + fused decode→scale→increment→reduce statistics. */
  case class NiftiStats(id: Long, nx: Int, ny: Int, nz: Int, n_vox: Long,
      vmin: Double, vmax: Double, vsum: Double)

  private val HdrLen = 348
  private val VoxOffset = 352 // header + 4-byte empty extender
  private val DtFloat32 = 16  // NIFTI_TYPE_FLOAT32

  /** Write-once .nii scratch dirs — the join_bucketed pattern: the one-time
    * encode+write is corpus prep, the declared query measures the
    * read→decode→reduce path. The corpus is PERSISTENT across JVMs
    * (Scratch.persistent, fingerprint-keyed on the source embeddings
    * parquet): the driver launches Verify then Bench as separate JVMs each
    * round, and re-encoding 2,000 unchanged blobs per launch was ~7 s of
    * duplicated wall-clock inside the bench budget. This map only memoizes
    * the resolved path per (app, sfDir) so one JVM checks the sentinel
    * once. */
  private val niftiReady =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Serialize a float32 volume as a spec-conformant single-file NIfTI-1
    * blob (4×4×4 grid here; any dims whose product is vox.length work). */
  def encodeNifti(vox: Array[Float], dims: (Int, Int, Int),
      slope: Float, inter: Float): Array[Byte] = {
    val (nx, ny, nz) = dims
    require(nx * ny * nz == vox.length, s"dims $dims != ${vox.length} voxels")
    val buf = java.nio.ByteBuffer.allocate(VoxOffset + 4 * vox.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, HdrLen)                      // sizeof_hdr
    buf.putShort(40, 3.toShort)                // dim[0] = ndim
    buf.putShort(42, nx.toShort)
    buf.putShort(44, ny.toShort)
    buf.putShort(46, nz.toShort)
    (4 to 7).foreach(i => buf.putShort(40 + 2 * i, 1.toShort))
    buf.putShort(70, DtFloat32.toShort)        // datatype
    buf.putShort(72, 32.toShort)               // bitpix
    buf.putFloat(108, VoxOffset.toFloat)       // vox_offset
    buf.putFloat(112, slope)                   // scl_slope
    buf.putFloat(116, inter)                   // scl_inter
    buf.put(344, 'n'.toByte); buf.put(345, '+'.toByte)
    buf.put(346, '1'.toByte); buf.put(347, 0.toByte) // magic "n+1\0"
    var p = VoxOffset
    vox.foreach { v => buf.putFloat(p, v); p += 4 }
    buf.array()
  }

  /** The REAL decoder: parses the NIfTI-1 header (validates sizeof_hdr and
    * magic), reads dims/datatype/scaling, decodes float32 voxels at
    * vox_offset, applies the spec's affine scaling (slope·v + inter; slope 0
    * ⇒ unscaled), applies the pipeline's map step (+1 voxel incrementation —
    * the canonical I/O-bound neuroimaging benchmark pipeline), and reduces
    * to stats in one partition-local pass (pinned left-fold double sum). */
  def decodeNiftiPartition(blobs: Iterator[NiftiBlob]): Iterator[NiftiStats] =
    blobs.map { b =>
      val buf = java.nio.ByteBuffer.wrap(b.blob)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(buf.getInt(0) == HdrLen, s"block ${b.id}: not a NIfTI-1 header")
      require(buf.get(344) == 'n' && buf.get(345) == '+' &&
        buf.get(346) == '1' && buf.get(347) == 0,
        s"block ${b.id}: bad magic (want single-file n+1)")
      val ndim = buf.getShort(40).toInt
      require(ndim >= 1 && ndim <= 7, s"block ${b.id}: dim[0]=$ndim")
      val dims = (1 to ndim).map(i => buf.getShort(40 + 2 * i).toInt)
      require(buf.getShort(70) == DtFloat32,
        s"block ${b.id}: only FLOAT32 payloads supported here")
      val rawSlope = buf.getFloat(112)
      val slope = if (rawSlope == 0f) 1.0 else rawSlope.toDouble
      val inter = buf.getFloat(116).toDouble
      val off = buf.getFloat(108).toInt
      // Payload-bounds validation: dims are attacker-/corruption-controlled
      // on external files, so compute the voxel count in Long (Int products
      // overflow to wrong/negative counts) and require the declared payload
      // to fit inside the blob — a truncated file fails with a diagnostic,
      // not an IndexOutOfBoundsException.
      val nL = dims.map(_.toLong).product
      require(dims.forall(_ >= 1) && nL <= Int.MaxValue,
        s"block ${b.id}: bad dims $dims")
      require(off >= HdrLen && off + 4L * nL <= b.blob.length,
        s"block ${b.id}: payload [$off, ${off + 4L * nL}) outside " +
          s"${b.blob.length}-byte blob")
      val n = nL.toInt
      var i = 0
      var sum = 0.0
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      while (i < n) {
        val v = buf.getFloat(off + 4 * i).toDouble * slope + inter + 1.0
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      NiftiStats(b.id, dims.head,
        if (ndim > 1) dims(1) else 1, if (ndim > 2) dims(2) else 1,
        n.toLong, mn, mx, sum)
    }

  /** Columnar Arrow-batch decode — the batch shape a 100 TB multimodal
    * pipeline uses instead of row-at-a-time processing. PySpark exposes it
    * as `DataFrame.mapInArrow`; that API is Python-only, so the Scala-side
    * contract is the same `mapPartitions` with each partition marshalled
    * through Arrow `VectorSchemaRoot` batches: ids in a BigIntVector,
    * blobs in a VarBinaryVector (off-heap Arrow buffers), decode reading
    * back FROM the Arrow memory. Asserted bit-equal to the row-wise path
    * in MultimodalSuite — proving the plumbing (schema, batch size,
    * off-heap round-trip) without a Python worker. */
  def decodeNiftiArrow(blobs: Iterator[NiftiBlob],
      batchRows: Int = 128): Iterator[NiftiStats] = {
    if (!blobs.hasNext) return Iterator.empty
    // ONE allocator + root per PARTITION, not per batch: allocator/vector
    // construction and teardown every 128 rows was measurable churn on the
    // hot decode path. The vectors are reset() (buffers kept, counts
    // zeroed) and refilled per batch; everything closes once, when the
    // input iterator is exhausted (or a decode throws).
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val idVec = new org.apache.arrow.vector.BigIntVector("id", alloc)
    val blobVec = new org.apache.arrow.vector.VarBinaryVector("blob", alloc)
    val root = org.apache.arrow.vector.VectorSchemaRoot.of(idVec, blobVec)
    val batches = blobs.grouped(batchRows)
    var open = true
    def closeAll(): Unit = if (open) { open = false; root.close(); alloc.close() }
    // exhaustion/throw below close deterministically, but a consumer that
    // ABANDONS the iterator early (limit/take, downstream task failure)
    // would leak the off-heap allocator — inside a task, completion fires
    // regardless of how the iterator ends (round-8 ADVICE)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
    new Iterator[Vector[NiftiStats]] {
      def hasNext: Boolean = {
        val h = open && batches.hasNext
        if (!h) closeAll()
        h
      }
      def next(): Vector[NiftiStats] = {
        val batch = batches.next()
        try {
          idVec.reset(); blobVec.reset()
          batch.zipWithIndex.foreach { case (b, i) =>
            idVec.setSafe(i, b.id)
            blobVec.setSafe(i, b.blob)
          }
          root.setRowCount(batch.size)
          // one batch-wide decode iterator (not a singleton per row), and
          // strict materialization: the Arrow buffers are reused by the
          // next batch, so the decoded stats must not be lazily backed by
          // Arrow memory
          decodeNiftiPartition((0 until root.getRowCount).iterator
            .map(i => NiftiBlob(idVec.get(i), blobVec.get(i)))).toVector
        } catch { case t: Throwable => closeAll(); throw t }
      }
    }.flatten
  }

  val defs: Map[String, Q] = Map(
    // Binary/block ingest of the sf directory itself (the parquet files as
    // opaque blobs) — deterministic file names/sizes; no SQL oracle
    // (DuckDB reads parquet content, not arbitrary blobs) → rows-only check.
    "scan_binary" -> Q(
      (s, d) => readBlobs(s, d, "*.parquet")
        .select(
          element_at(split(col("path"), "/"), -1).as("file_name"),
          col("length"))
        .orderBy("file_name"),
      None),

    // Custom DataSource V2 block connector (graft.sources.BlockSource):
    // split-planned, column-pruned, deterministic — the reference's
    // block-grid ingest as a first-class Spark source. Synthetic (no
    // files), so no DuckDB oracle → rows-only check.
    "scan_blocks" -> Q(
      (s, d) => s.read.format("graft-blocks")
        .option("blocks", 64).option("blockLen", 256).load()
        .select(col("block_id"), col("grid_x"), col("grid_y"), col("n_bytes"),
          expr("aggregate(payload, 0D, (acc, x) -> acc + CAST(x AS DOUBLE))")
            .as("payload_sum"))
        .orderBy("block_id"),
      None),

    // The flagship reference pipeline (read → decode → increment → stats)
    // made REAL and ORACLED: each embedding row is serialized as a genuine
    // single-file NIfTI-1 volume (4×4×4 float32, scl_slope=2 scl_inter=0.5),
    // then an independent spec parser reads the binary header, decodes the
    // voxels at vox_offset, applies header scaling, increments (+1), and
    // reduces — partition-parallel typed mapPartitions, narrow, no shuffle.
    // DuckDB replays the arithmetic straight off the embeddings table, so a
    // single flipped bit anywhere in the 352-byte header round-trip fails
    // the hash. At 100 TB the same parser runs over binaryFile content
    // (scan_binary) with maxPartitionBytes sizing the batches.
    "mm_decode" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .map { case (id, emb) =>
            NiftiBlob(id, encodeNifti(emb, (4, 4, 4), 2.0f, 0.5f)) }
          .mapPartitions(decodeNiftiPartition)
          .toDF()
          .orderBy("id")
      },
      Some("""SELECT vec_id AS id,
                     CAST(4 AS INT) AS nx, CAST(4 AS INT) AS ny,
                     CAST(4 AS INT) AS nz, CAST(64 AS BIGINT) AS n_vox,
                     list_min(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)) AS vmin,
                     list_max(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)) AS vmax,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)),
                       (s, p) -> s + p) AS vsum
              FROM embeddings ORDER BY id""")),

    // The END-TO-END multimodal read path: the same decode as mm_decode but
    // with the blobs read back from STORAGE — write each embedding row once
    // per (application, sfDir) as a real single-file .nii (executor-side
    // foreachPartition through the Hadoop FileSystem API, no driver loop),
    // then scan via the binaryFile source and decode `content`. The write
    // and the scan resolve the SAME path against the same filesystem: the
    // local FS under the default tmpdir base (local mode), or whatever
    // shared FS `spark.graft.scratchDir` names on a cluster — executors
    // writing to their private /tmp while the driver globs its own is
    // exactly the failure the configurable base exists to prevent.
    // This is the actual read→decode→map→reduce shape every multimodal
    // corpus job runs: scan parallelizes per file, decode is a narrow typed
    // mapPartitions, `spark.sql.files.maxPartitionBytes` sizes the batches.
    // Same oracle as mm_decode — a flipped bit anywhere in the file
    // round-trip (encode → FS → binaryFile → parse) fails the hash.
    "mm_pipeline" -> Q(
      (s, d) => {
        import s.implicits._
        val dir = niftiReady.computeIfAbsent(
          (s.sparkContext.applicationId, d), { _ =>
            // the sfDir must be part of the corpus tag: two sfDirs would
            // otherwise share a directory and the glob would read a mixed
            // corpus
            Scratch.persistent(s,
              "nii_" + d.replaceAll("[^a-zA-Z0-9]", "_"),
              Seq(s"$d/embeddings.parquet")) { out =>
              // session Hadoop conf (spark.hadoop.* credentials,
              // fs.defaultFS) captured driver-side and shipped to the
              // writing tasks — a bare new Configuration() would resolve
              // the wrong filesystem on a cluster whose scratchDir points
              // at HDFS/S3 (round-8 ADVICE)
              val hconf = new graft.sources.SerializableHadoopConf(
                s.sessionState.newHadoopConf())
              Tables.t(s, d, "embeddings")
                .select(col("vec_id"), col("embedding"))
                .as[(Long, Array[Float])]
                .foreachPartition { it: Iterator[(Long, Array[Float])] =>
                  val fs = new org.apache.hadoop.fs.Path(out)
                    .getFileSystem(hconf.value)
                  // no .crc sidecars: the local FS wraps
                  // ChecksumFileSystem, and a second create per 352-byte
                  // blob is 6× the write cost (measured 2.9 s → 18.2 s for
                  // the 2,000-file corpus)
                  fs.setWriteChecksum(false)
                  it.foreach { case (id, emb) =>
                    val os = fs.create(
                      new org.apache.hadoop.fs.Path(s"$out/block_$id.nii"),
                      true)
                    try os.write(encodeNifti(emb, (4, 4, 4), 2.0f, 0.5f))
                    finally os.close()
                  }
                }
            }
          })
        readBlobs(s, dir, "*.nii")
          .select(
            regexp_extract(col("path"), "block_(\\d+)\\.nii$", 1)
              .cast("bigint").as("id"),
            col("content"))
          .as[(Long, Array[Byte])]
          .mapPartitions(it => decodeNiftiPartition(
            it.map { case (id, blob) => NiftiBlob(id, blob) }))
          .toDF()
          .orderBy("id")
      },
      Some("""SELECT vec_id AS id,
                     CAST(4 AS INT) AS nx, CAST(4 AS INT) AS ny,
                     CAST(4 AS INT) AS nz, CAST(64 AS BIGINT) AS n_vox,
                     list_min(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)) AS vmin,
                     list_max(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)) AS vmax,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)),
                       (s, p) -> s + p) AS vsum
              FROM embeddings ORDER BY id""")),

    // The Arrow COLUMNAR-BATCH decode as a first-class declared query: same
    // encode→decode→stats as mm_decode, but each partition is marshalled
    // through off-heap Arrow VectorSchemaRoot batches (decodeNiftiArrow) —
    // the JVM-side equivalent of the mapInArrow batch contract a 100 TB
    // multimodal pipeline feeds to native/Python codecs. Same oracle as
    // mm_decode: identical arithmetic must survive the Arrow round-trip.
    "mm_arrow" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .map { case (id, emb) =>
            NiftiBlob(id, encodeNifti(emb, (4, 4, 4), 2.0f, 0.5f)) }
          .mapPartitions(it => decodeNiftiArrow(it, batchRows = 128))
          .toDF()
          .orderBy("id")
      },
      Some("""SELECT vec_id AS id,
                     CAST(4 AS INT) AS nx, CAST(4 AS INT) AS ny,
                     CAST(4 AS INT) AS nz, CAST(64 AS BIGINT) AS n_vox,
                     list_min(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)) AS vmin,
                     list_max(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)) AS vmax,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * 2.0 + 0.5 + 1.0)),
                       (s, p) -> s + p) AS vsum
              FROM embeddings ORDER BY id""")),

    // Frame sampling: every-2-seconds frame index per synthetic "video"
    // (duration derived from the key) — the plumbing a video corpus uses to
    // pick decode points before the (stubbed) decoder runs. Narrow
    // sequence+explode, no shuffle; fully SQL-expressible → oracled.
    "mm_frames" -> Q(
      (s, d) => Tables.t(s, d, "embeddings")
        .select(col("vec_id"),
          explode(sequence(lit(0), (col("vec_id") % 30 + 5).cast("int"),
            lit(2))).as("t_s"))
        .select(col("vec_id"), col("t_s").cast("bigint").as("t_s"),
          (col("t_s") * 4).cast("bigint").as("frame_idx"))
        .orderBy("vec_id", "t_s"),
      Some("""SELECT vec_id, t_s, t_s * 4 AS frame_idx FROM (
                SELECT vec_id,
                       unnest(range(0, (vec_id % 30 + 5) + 1, 2)) AS t_s
                FROM embeddings)
              ORDER BY vec_id, t_s"""))
  )
}
