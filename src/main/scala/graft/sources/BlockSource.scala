package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  * Usage:
  *   spark.read.format("graft-blocks")
  *     .option("blocks", 64).option("blockLen", 1024).load()
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
      opts.getInt("splits", 8))
  }
}

object BlockSource {
  val schema: StructType = StructType(Seq(
    StructField("block_id", LongType, nullable = false),
    StructField("grid_x", IntegerType, nullable = false),
    StructField("grid_y", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", ArrayType(FloatType, containsNull = false))))

  /** Deterministic synthetic voxel payload (splitmix-style per element). */
  def element(blockId: Long, i: Int): Float = {
    var z = blockId * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z & 0xFFFFFF).toFloat / 0xFFFFFF.toFloat) - 0.5f
  }
}

private class BlockTable(blocks: Int, blockLen: Int, splits: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_blocks($blocks x $blockLen)"
  override def schema(): StructType = BlockSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlockScanBuilder(blocks, blockLen, splits)
}

private class BlockScanBuilder(blocks: Int, blockLen: Int, splits: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BlockSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new BlockScan(blocks, blockLen, splits, required)
}

private class BlockScan(blocks: Int, blockLen: Int, splits: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-blocks pruned=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1, math.ceil(blocks.toDouble / splits).toInt)
    (0 until blocks by per)
      .map(start => BlockRange(start, math.min(blocks, start + per)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BlockReaderFactory(blockLen, required)
}

private case class BlockRange(start: Int, end: Int) extends InputPartition

private class BlockReaderFactory(blockLen: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[BlockRange]
    new PartitionReader[InternalRow] {
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
  }
}
