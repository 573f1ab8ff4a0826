package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator UDAF: modular product (mod 1e9+7).
  *
  * Chosen because modular multiplication is commutative AND associative, so
  * the partial/final merge order across partitions cannot change the result
  * — the property any custom distributed aggregate must have (float sums
  * don't; this does by construction). The DuckDB oracle replays it as a
  * pinned list_reduce fold, which is equal for the same reason.
  */
object ModProduct extends Aggregator[Long, Long, Long] {
  val M = 1000000007L
  override def zero: Long = 1L
  override def reduce(b: Long, a: Long): Long = b * (((a % M) + M) % M) % M
  override def merge(b1: Long, b2: Long): Long = b1 * b2 % M
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
