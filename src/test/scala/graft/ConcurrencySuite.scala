package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** A service embedding this library runs queries concurrently on one
  * SparkSession (Spark schedules jobs from any thread). The builder-side
  * shared state — the kmPts persist shared by the kmeans_* keys, the
  * niftiReady write-once corpus, checkpointed aggregates, per-tag Scratch
  * dirs — must be safe under that: concurrent results must equal serial
  * ones, including the keys that race on a shared cache.
  */
class ConcurrencySuite extends SparkSpec {

  test("concurrent query execution matches serial results") {
    // Chosen to collide on every shared cache: kmeans_* share kmPts;
    // mm_pipeline/scan_binary hit binaryFile listing + niftiReady;
    // text_collocation/text_tfidf/dedup_span land checkpoints;
    // scan_partitioned/scan_text_rt write per-tag Scratch dirs.
    val keys = Seq(
      "kmeans_lloyd", "kmeans_iter", "kmeans_conv",
      "text_collocation", "text_tfidf", "dedup_span",
      "mm_pipeline", "scan_binary", "scan_partitioned", "scan_text_rt",
      "agg_group", "ts_funnel")

    def run(k: String): Seq[String] =
      SparkEntry.queries(k)(spark, sf).collect().map(_.toString).toSeq

    val serial = keys.map(k => k -> run(k)).toMap

    val pool = java.util.concurrent.Executors.newFixedThreadPool(keys.size)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val conc = Await.result(
        Future.sequence(keys.map(k => Future(k -> run(k)))),
        Duration(600, "s")).toMap
      for (k <- keys)
        assert(conc(k) == serial(k), s"$k diverged under concurrency")
    } finally pool.shutdown()
  }
}
