package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Generates OPERATORS.md: one row per declared query with its measured
  * row count, shuffle count, and oracle status at a given sf — the
  * machine-verified version of SURVEY.md §2's inventory.
  *
  * Usage: runMain graft.PrintInventory <sfDir> <outFile>
  */
object PrintInventory {

  private def countShuffles(p: SparkPlan): Int = {
    var n = 0
    def walk(q: SparkPlan): Unit = {
      if (q.isInstanceOf[ShuffleExchangeLike]) n += 1
      q.children.foreach(walk)
      q.subqueries.foreach(walk)
      q match { case a: AdaptiveSparkPlanExec => walk(a.executedPlan); case _ => }
    }
    walk(p)
    n
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = Sessions.local("graft-inventory")
    spark.sparkContext.setLogLevel("ERROR")
    val oracled = SparkEntry.oracleSql.keySet
    val sb = new StringBuilder
    sb.append("# OPERATORS — machine-generated inventory (graft.PrintInventory)\n\n")
    sb.append(s"Scale dir: `$sfDir`. One row per `SparkEntry.queries` entry; ")
    sb.append("shuffles counted on the AQE-final executed plan (includes the ")
    sb.append("final presentation ORDER BY).\n\n")
    sb.append("| query | rows | shuffles | oracle |\n|---|---:|---:|---|\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val rows = df.collect().length // executes THIS QueryExecution → AQE-final
      val shuffles = countShuffles(df.queryExecution.executedPlan)
      val o = if (oracled(name)) "DuckDB hash-match" else "rows-only"
      sb.append(s"| `$name` | $rows | $shuffles | $o |\n")
    }
    sb.append(s"\nTotal: ${SparkEntry.queries.size} queries, " +
      s"${oracled.size} oracled.\n")
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
