package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11): a numerically-stable streaming
  * moments aggregator (Welford/Chan parallel merge) producing
  * (count, mean, sample variance) in one pass.
  *
  * Scale notes: constant-size buffer, associative merge — partial
  * aggregation (map-side combine) applies, so the shuffle carries one
  * 24-byte buffer per group per partition regardless of row count.
  */
object StableMoments {

  case class Buf(n: Long, mean: Double, m2: Double)
  case class Moments(n: Long, mean: Double, variance: Double)

  val of: Aggregator[Double, Buf, Moments] =
    new Aggregator[Double, Buf, Moments] {
      override def zero: Buf = Buf(0L, 0.0, 0.0)

      override def reduce(b: Buf, x: Double): Buf = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        Buf(n, mean, b.m2 + d * (x - mean))
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          val mean = a.mean + d * b.n / n
          val m2 = a.m2 + b.m2 + d * d * a.n * b.n / n
          Buf(n, mean, m2)
        }
      }

      override def finish(b: Buf): Moments =
        Moments(b.n, b.mean, if (b.n > 1) b.m2 / (b.n - 1) else Double.NaN)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
    }
}
