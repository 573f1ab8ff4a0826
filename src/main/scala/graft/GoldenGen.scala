package graft

import java.nio.file.{Files, Paths}

/** Regression-snapshot generator: for each declared query, records
  * (rowCount, order-sensitive content hash) at a given sf into a JSON file
  * consumed by GoldenSuite — catches regressions without needing DuckDB.
  *
  * Usage: runMain graft.GoldenGen <sfDir> <outFile>
  */
object GoldenGen {

  /** FNV-1a over the JSON lines in output order (queries end in a total
    * ORDER BY, so this is deterministic). */
  def contentHash(lines: Iterator[String]): Long = {
    var h = 0xcbf29ce484222325L
    lines.foreach { s =>
      var i = 0
      while (i < s.length) {
        h ^= s.charAt(i)
        h *= 0x100000001b3L
        i += 1
      }
      h ^= '\n'
      h *= 0x100000001b3L
    }
    h
  }

  def snapshot(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : Map[String, (Long, Long)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val rows = fn(spark, sfDir).toJSON.collect()
      name -> (rows.length.toLong, contentHash(rows.iterator))
    }.toMap

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = Sessions.local("graft-golden")
    spark.sparkContext.setLogLevel("WARN")
    val entries = snapshot(spark, sfDir).toSeq.sortBy(_._1)
      .map { case (k, (n, h)) => s"""  "$k": [$n, $h]""" }
    Files.writeString(Paths.get(outFile),
      entries.mkString("{\n", ",\n", "\n}\n"))
    spark.stop()
  }
}
