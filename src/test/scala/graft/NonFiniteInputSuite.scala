package graft

import org.apache.spark.sql.functions._

/** Non-finite-double robustness: production metric feeds carry NaN (0/0 in
  * an upstream transform) and ±Infinity (overflowed counters), while every
  * driver fixture is finite — the same masked-crash class as the ts_funnel
  * ANSI bug. Under `spark.sql.ansi.enabled=true`, `CAST(double AS DECIMAL)`
  * throws on non-finite input, so the exact-decimal parity sums in
  * `Par.dsum`/`davg`/`dstd` are the suspect surface. The contract this
  * suite pins: a query over non-finite measures either propagates the
  * IEEE result (NaN/Inf out) or drops the rows a filter already excludes —
  * it never throws.
  *
  * TPC-H money/quantity columns stay intact (NOT NULL and finite by spec,
  * same reasoning as NullInputSuite); the mangled surfaces are
  * `events.value` (a free-form metric) and `embeddings.embedding` elements
  * (failed normalizations emit NaN vectors in real feeds).
  */
class NonFiniteInputSuite extends SparkSpec {

  private lazy val nfDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nonfinite").toString
    def copy(t: String, mangle: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      mangle(spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet"))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents"))
      copy(t, identity)
    copy("events", df => df
      .withColumn("value",
        when(col("event_id") % 19 === 0, lit(Double.NaN))
          .when(col("event_id") % 23 === 0, lit(Double.PositiveInfinity))
          .when(col("event_id") % 29 === 0, lit(Double.NegativeInfinity))
          .otherwise(col("value"))))
    copy("embeddings", df => df
      .withColumn("embedding",
        when(col("vec_id") % 19 === 0,
          transform(col("embedding"), _ => lit(Float.NaN)))
          .otherwise(col("embedding"))))
    dir
  }

  test("declared aggregates PROPAGATE non-finite values, never drop them") {
    // The silent failure mode this family guards against: decimal-cast
    // sums turning NaN rows into NULLs and reporting a confident finite
    // total. ts_tumbling buckets containing a poisoned event must emit a
    // NaN/Inf sum_value while counts stay exact (1,000 events total).
    val r = SparkEntry.queries("ts_tumbling")(spark, nfDir).collect()
    assert(r.map(_.getAs[Long]("n")).sum == 1000L)
    val sums = r.map(_.getAs[Double]("sum_value"))
    assert(sums.exists(_.isNaN), "no NaN bucket — non-finite rows were dropped")
    assert(sums.exists(v => !v.isNaN && !v.isInfinite), "no clean bucket")

    // rolling frames: a frame touching a poisoned event yields NaN median
    // and a non-finite rolling sum; clean frames stay exact
    val roll = SparkEntry.queries("ts_rolling")(spark, nfDir).collect()
    assert(roll.map(_.getAs[Double]("roll_med")).exists(_.isNaN))
    assert(roll.map(_.getAs[Double]("roll_sum"))
      .exists(v => v.isNaN || v.isInfinite))
    assert(roll.map(_.getAs[Double]("roll_sum"))
      .exists(v => !v.isNaN && !v.isInfinite))
  }

  test("every declared query survives NaN/Infinity measure values") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (k, fn) =>
        try { fn(spark, nfDir).collect(); None }
        catch { case e: Throwable =>
          Some(k -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ").take(200)}")
        }
    }
    failures.foreach { case (k, m) => info(s"NONFINITE-FAIL $k — $m") }
    assert(failures.isEmpty, failures.map(_._1).mkString(", "))
  }
}
