package graft

/** Partition-count invariance: every declared query must produce
  * bit-identical output regardless of how the shuffle is partitioned —
  * the property a 1000-executor deployment silently relies on. Locally the
  * fixed `spark.sql.shuffle.partitions=32` can MASK order-dependence
  * (float summation order, under-specified sort keys, collect_list order):
  * the golden hashes would stay stable run-to-run while a cluster with a
  * different partition count (or AQE coalescing shuffles differently)
  * diverges. This suite re-runs the full inventory in an isolated
  * `newSession()` with a co-prime partition count AND adaptive execution
  * disabled, then compares (rowCount, content hash) per query against the
  * default-session snapshot. Catches exactly the failure class the
  * per-query determinism rules (Core.scala `Par` scaladoc: exact decimal
  * sums, total-order ORDER BY) exist to prevent.
  */
class PartitionInvarianceSuite extends SparkSpec {

  test("every query is bit-identical under a different shuffle-partition count") {
    // Isolated SQL conf, shared SparkContext: suites run concurrently in
    // this JVM, so never mutate the shared session's conf.
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7") // co-prime with 32
    alt.conf.set("spark.sql.adaptive.enabled", "false")

    val base = GoldenGen.snapshot(spark, sf)
    val moved = GoldenGen.snapshot(alt, sf)

    assert(moved.keySet == base.keySet)
    val diverged = base.keys.toSeq.sorted.filter(k => base(k) != moved(k))
    diverged.foreach { k =>
      info(s"PARTITION-DIVERGENCE $k: base=${base(k)} alt=${moved(k)}")
    }
    assert(diverged.isEmpty,
      s"output depends on shuffle partitioning: ${diverged.mkString(", ")}")
  }
}
