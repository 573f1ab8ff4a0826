package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = args.toSet // optional per-query filter for local runs
    val spark = Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Per-query time = min over SPARK_GRAFT_BENCH_RUNS (default 3) FULL-SUITE
    // passes, not back-to-back repeats of one query: this host shows
    // minutes-long contention bursts (same query 3.7s quiet vs 78s
    // contended), and consecutive repeats all land inside one burst while a
    // later pass escapes it. Pass 1 also absorbs JIT for every query.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val times = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (name, fn) <- names) {
      val t0 = System.nanoTime()
      // noop sink executes the FULL plan (count() would let Catalyst
      // eliminate the final sort and prune projected expressions,
      // timing a near-metadata scan for projection-only queries)
      val t = try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      times(name) = t :: times.getOrElse(name, Nil)
    }
    // any failed pass marks the query failed (-1); failures are counted
    // separately and never skew the total
    val results = names.map { case (n, _) =>
      val ts = times(n)
      n -> (if (ts.contains(-1.0)) -1.0 else ts.min)
    }
    val nFailed = results.count(_._2 < 0)
    // The driver captures only the LAST 2000 bytes of stdout (measured from
    // BENCH_r01.json) — everything below keeps the 101-query line inside
    // that window: 1-decimal trimmed-zero numbers, basename sf, no failed
    // field when zero, and build.sbt suppresses sbt's [success] epilogue.
    def trim(s: String) =
      s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    // per-query at 1 dp (103 names alone are ~1.2 KB; exact per-query
    // numbers live in BASELINE.md), total at 2 dp. Headroom check: the
    // steady-state line is ~1.93 KB — at most ~4 more queries fit the
    // window before the format needs revisiting.
    def f1(v: Double) = if (v < 0) "-1" else trim(f"$v%.1f")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f1(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedField = if (nFailed > 0) s""","failed":$nFailed""" else ""
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"total","value":${trim(f"$total%.2f")},"unit":"sec","queries":$qs,"sf":"$sfName"$failedField}""")
    spark.stop()
  }
}
