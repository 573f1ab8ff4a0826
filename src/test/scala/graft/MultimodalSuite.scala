package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlock, MediaFeatures}
import org.apache.spark.sql.functions._

/** Binary-column plumbing: binaryFile ingest + partition-parallel decode
  * stub over a typed Dataset (schema, partitioning, and batch shape are the
  * real contract; the codec itself is stubbed — no media libs here). */
class MultimodalSuite extends SparkSpec {

  test("binaryFile ingest lists the sf parquet files with real sizes") {
    val rows = Multimodal.readBlobs(spark, sf, "*.parquet")
      .select(element_at(split(col("path"), "/"), -1).as("f"), col("length"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Tables.names.map(_ + ".parquet").toSet)
    assert(rows.values.forall(_ > 0))
    val real = new java.io.File(s"$sf/lineitem.parquet").length()
    assert(rows("lineitem.parquet") == real)
  }

  test("decode stub extracts deterministic features partition-parallel") {
    import spark.implicits._
    val blocks = spark.createDataset(Seq(
      MediaBlock(1L, "image", 64, 48, Array[Byte](0, 1, 64, -1, -64)),
      MediaBlock(2L, "audio", 0, 0, Array[Byte](127, 127)),
      MediaBlock(3L, "image", 10, 10, Array.empty[Byte])
    )).repartition(3) // force multi-partition execution
    val feats = Multimodal.extract(blocks).collect().map(f => f.id -> f).toMap
    assert(feats(1L).n_bytes == 5)
    // hist bins: values 0,1 → bin0; 64 → bin1; 255(-1) → bin3; 192(-64) → bin3
    assert(feats(1L).hist == Seq(2L, 1L, 0L, 2L))
    assert(feats(1L).thumb_w == 32 && feats(1L).thumb_h == 24)
    assert(feats(2L).hist == Seq(0L, 2L, 0L, 0L))
    assert(feats(3L).n_bytes == 0 && feats(3L).checksum == 0L)
    // checksum is the same polynomial both times (deterministic)
    val again = Multimodal.extract(blocks).collect().map(f => f.id -> f).toMap
    assert(again(1L).checksum == feats(1L).checksum)
  }

  test("NIfTI-1 round-trip: spec-conformant header, scaling, exact stats") {
    import Multimodal.{NiftiBlob, encodeNifti, decodeNiftiPartition}
    val vox = Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f)
    val blob = encodeNifti(vox, (3, 2, 1), 2.0f, 0.5f)
    // spec geometry: 348-byte header + 4-byte extender + 4 B/voxel
    assert(blob.length == 352 + 4 * 6)
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt(0) == 348)            // sizeof_hdr
    assert(buf.getShort(40) == 3)           // dim[0]
    assert(buf.getShort(70) == 16)          // NIFTI_TYPE_FLOAT32
    assert(buf.getShort(72) == 32)          // bitpix
    assert(new String(blob.slice(344, 347), "US-ASCII") == "n+1")
    val st = decodeNiftiPartition(Iterator(NiftiBlob(7L, blob))).next()
    // decode → scale (2v + 0.5) → increment (+1): 1..6 → 3.5..13.5
    assert(st.id == 7L && (st.nx, st.ny, st.nz) == ((3, 2, 1)))
    assert(st.n_vox == 6L && st.vmin == 3.5 && st.vmax == 13.5)
    assert(st.vsum == (1 to 6).map(v => v * 2.0 + 0.5 + 1.0).sum)
    // scl_slope = 0 means unscaled per spec
    val flat = decodeNiftiPartition(
      Iterator(NiftiBlob(8L, encodeNifti(vox, (6, 1, 1), 0.0f, 0.0f)))).next()
    assert(flat.vmin == 2.0 && flat.vmax == 7.0) // v*1 + 0 + 1
    // corrupted magic must be rejected, not silently mis-decoded
    val bad = blob.clone(); bad(344) = 'x'.toByte
    intercept[IllegalArgumentException] {
      decodeNiftiPartition(Iterator(NiftiBlob(9L, bad))).next()
    }
  }

  test("NIfTI decoder rejects malformed payload bounds with a diagnostic") {
    import Multimodal.{NiftiBlob, encodeNifti, decodeNiftiPartition}
    val blob = encodeNifti(Array(1.0f, 2.0f, 3.0f, 4.0f), (4, 1, 1), 1f, 0f)
    // truncated payload: header declares 4 voxels, file holds 2
    val truncated = blob.take(352 + 8)
    val e1 = intercept[IllegalArgumentException] {
      decodeNiftiPartition(Iterator(NiftiBlob(1L, truncated))).next()
    }
    assert(e1.getMessage.contains("outside"))
    // adversarial dims whose Int product overflows to a small/negative
    // count: 65535^3 ≈ 2.8e14 — must be caught by the Long-range check,
    // not read garbage. (Shorts are signed: -1 reads back as dim -1.)
    val evil = blob.clone()
    val buf = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(42, -1); buf.putShort(44, -1); buf.putShort(46, -1)
    val e2 = intercept[IllegalArgumentException] {
      decodeNiftiPartition(Iterator(NiftiBlob(2L, evil))).next()
    }
    assert(e2.getMessage.contains("bad dims"))
  }

  test("Arrow columnar-batch decode is bit-equal to the row-wise path") {
    import spark.implicits._
    import Multimodal.{NiftiBlob, encodeNifti}
    val blobs = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) =>
        NiftiBlob(id, encodeNifti(emb, (4, 4, 4), 2.0f, 0.5f)) }
    // distributed: each partition marshalled through Arrow batches (small
    // batchRows forces multiple batches per partition)
    val viaArrow = blobs
      .mapPartitions(it => Multimodal.decodeNiftiArrow(it, batchRows = 7))
      .collect().sortBy(_.id)
    val rowWise = blobs.mapPartitions(Multimodal.decodeNiftiPartition)
      .collect().sortBy(_.id)
    assert(viaArrow.length == rowWise.length && viaArrow.nonEmpty)
    assert(viaArrow.toSeq == rowWise.toSeq) // exact doubles, same order
  }

  test("mm_pipeline reads real .nii files back through binaryFile, equal to mm_decode") {
    val viaFiles = SparkEntry.queries("mm_pipeline")(spark, sf).collect()
    val inQuery = SparkEntry.queries("mm_decode")(spark, sf).collect()
    assert(viaFiles.length == inQuery.length && viaFiles.length > 0)
    assert(viaFiles.map(_.toString).toSeq == inQuery.map(_.toString).toSeq)
  }
}
