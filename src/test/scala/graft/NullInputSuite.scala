package graft

import org.apache.spark.sql.functions._

/** Null-value robustness: real corpora carry NULL text/lang/source rows
  * (failed extractions) and NULL event values/props (schema drift), while
  * every driver fixture is fully populated. Injecting NULLs into the
  * nullable "payload" columns — ids and timestamps stay intact — every
  * declared query must still run: NULL rows may be dropped, grouped under
  * the NULL key, or propagate NULL outputs, but never throw.
  */
class NullInputSuite extends SparkSpec {

  private lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    def copy(t: String, mangle: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      mangle(spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet"))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"))
      copy(t, identity) // TPC-H columns are NOT NULL by spec — leave intact
    copy("documents", df => df
      .withColumn("text",
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("text")))
      .withColumn("lang",
        when(col("doc_id") % 11 === 0, lit(null)).otherwise(col("lang")))
      .withColumn("source",
        when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("source")))
      .withColumn("n_chars",
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("n_chars"))))
    copy("events", df => df
      .withColumn("value",
        when(col("event_id") % 11 === 0, lit(null)).otherwise(col("value")))
      .withColumn("props",
        when(col("event_id") % 13 === 0, lit(null)).otherwise(col("props")))
      .withColumn("event_type",
        when(col("event_id") % 17 === 0, lit(null)).otherwise(col("event_type"))))
    // embedding itself stays non-null: the data model contracts a fixed-dim
    // vector per row (TestdataVintageSuite pins the column type); a feed
    // with failed embeddings filters them before this table
    copy("embeddings", df => df
      .withColumn("label",
        when(col("vec_id") % 11 === 0, lit(null)).otherwise(col("label"))))
    dir
  }

  test("every declared query survives NULL payload columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (k, fn) =>
        try { fn(spark, nullDir).collect(); None }
        catch { case e: Throwable =>
          Some(k -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ").take(200)}")
        }
    }
    failures.foreach { case (k, m) => info(s"NULL-FAIL $k — $m") }
    assert(failures.isEmpty, failures.map(_._1).mkString(", "))
  }
}
