package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlock, MediaFeatures}
import org.apache.spark.sql.functions._

/** Binary-column plumbing: binaryFile ingest + partition-parallel decode
  * stub over a typed Dataset (schema, partitioning, and batch shape are the
  * real contract; the codec itself is stubbed — no media libs here). */
class MultimodalSuite extends SparkSpec {

  test("binaryFile ingest lists the sf parquet files with real sizes") {
    val rows = Multimodal.readBlobs(spark, s"$sf/*.parquet")
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
}
