package graft

import org.apache.spark.sql.functions._

/** Empty-input robustness: a 0-row day/partition is a NORMAL production
  * case (fresh pipeline, empty date partition, over-aggressive upstream
  * filter). Every declared query must either return a result (possibly
  * 0 rows) on a directory of empty tables, or fail with a clearly
  * graft-attributed message — never a bare engine stack trace from deep
  * inside an operator.
  */
class EmptyInputSuite extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("every declared query survives empty input tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (k, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(k -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ").take(200)}")
        }
    }
    failures.foreach { case (k, m) => info(s"EMPTY-FAIL $k — $m") }
    assert(failures.isEmpty, failures.map(_._1).mkString(", "))
  }
}
