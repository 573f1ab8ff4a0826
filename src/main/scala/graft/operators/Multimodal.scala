package graft.operators

import graft.{Q, Tables}
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

  /** binaryFile ingest: each file → (path, modificationTime, length, content). */
  def readBlobs(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  val defs: Map[String, Q] = Map(
    // Binary/block ingest of the sf directory itself (the parquet files as
    // opaque blobs) — deterministic file names/sizes; no SQL oracle
    // (DuckDB reads parquet content, not arbitrary blobs) → rows-only check.
    "scan_binary" -> Q(
      (s, d) => readBlobs(s, d + "/*.parquet")
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

    // The decode/feature-extract pipeline as a GRADED query: documents'
    // text re-encoded as opaque binary payloads → typed Dataset[MediaBlock]
    // → partition-parallel STUB decode (mapPartitions — the Scala analogue
    // of a Pandas-UDF batch) → scalar features. Deterministic, but the
    // byte-fold checksum is not DuckDB-expressible → rows-only check.
    "mm_decode" -> Q(
      (s, d) => {
        import s.implicits._
        val blocks = Tables.t(s, d, "documents").select(
          col("doc_id").as("id"), lit("text").as("kind"),
          (col("n_chars") % 64 + 16).cast("int").as("width"),
          (col("n_chars") % 48 + 16).cast("int").as("height"),
          encode(col("text"), "UTF-8").as("bytes")).as[MediaBlock]
        extract(blocks).toDF()
          .select(col("id"), col("n_bytes"), col("checksum"),
            element_at(col("hist"), 1).as("h0"),
            element_at(col("hist"), 4).as("h3"),
            col("thumb_w"), col("thumb_h"))
          .orderBy("id")
      },
      None),

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
