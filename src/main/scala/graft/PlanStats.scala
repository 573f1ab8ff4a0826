package graft

import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Optimization-round measurement harness (guide §1): for EVERY declared
  * query, one line of
  *   name  plan_ms  exec_ms  jobs  exchanges  range_exchanges  sorts
  * where plan_ms is analysis+optimization+physical planning, exec_ms is a
  * noop-sink execution (full plan, §1.4), jobs is the Spark job count of
  * that execution (AQE materializes each shuffle stage as a job — the
  * 0.3–0.4 s/query floor lives there), and the plan-shape counts come from
  * the pre-AQE executedPlan tree. Also dumps `.explain("formatted")` per
  * query when an outDir is given — the judge-facing before/after evidence.
  *
  * Usage: runMain graft.PlanStats <sfDir> <statsFile> [explainDir] [suffix] [key ...]
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val sfDir = args(0)
    val statsFile = args(1)
    val explainDir = if (args.length > 2 && args(2).nonEmpty) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else "before"
    val only = args.drop(4).toSet
    val spark = Sessions.local("graft-planstats")
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }

    // one untimed warmup pass (JIT, write-once corpora) so the timed pass
    // sees steady state — same policy as Bench
    for ((n, fn) <- names) {
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case NonFatal(_) => }
    }

    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    }
    sc.addSparkListener(listener)
    val sb = new StringBuilder
    sb.append("name\tplan_ms\texec_ms\tjobs\texchanges\trange_ex\tbcast\tsorts\n")
    explainDir.foreach(d => Files.createDirectories(Paths.get(d)))
    for ((name, fn) <- names) {
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val planned = df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        val planStr = planned.toString
        val nBc = planStr.split("BroadcastExchange").length - 1
        val nEx = planStr.split("Exchange ").length - 1 - nBc
        val nRange = planStr.split("Exchange rangepartitioning").length - 1
        val nSort = planStr.split("Sort \\[").length - 1
        jobs = 0
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        Thread.sleep(50) // let late listener events land
        sb.append(f"$name\t${(t1 - t0) / 1e6}%.0f\t${(t2 - t1) / 1e6}%.0f\t$jobs\t$nEx\t$nRange\t$nBc\t$nSort%n")
        explainDir.foreach { d =>
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(d, s"${name}_$suffix.txt"), plan)
        }
      } catch { case NonFatal(e) =>
        sb.append(s"$name\tFAIL\t${e.getMessage}\n")
      }
    }
    sc.removeSparkListener(listener)
    Files.writeString(Paths.get(statsFile), sb.toString)
    println(s"[planstats] wrote ${names.size} rows to $statsFile")
    spark.stop()
  }
}
