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

  private lazy val base = GoldenGen.snapshot(spark, sf)

  /** Run the full inventory in an isolated `newSession()` (suites share
    * this JVM's session concurrently — never mutate its conf) and assert
    * per-query (rowCount, content hash) equality with the default run. */
  private def assertInvariant(tag: String)(confs: (String, String)*): Unit = {
    val alt = spark.newSession()
    confs.foreach { case (k, v) => alt.conf.set(k, v) }
    val moved = GoldenGen.snapshot(alt, sf)
    assert(moved.keySet == base.keySet)
    val diverged = base.keys.toSeq.sorted.filter(k => base(k) != moved(k))
    diverged.foreach { k =>
      info(s"$tag-DIVERGENCE $k: base=${base(k)} alt=${moved(k)}")
    }
    assert(diverged.isEmpty,
      s"output depends on $tag: ${diverged.mkString(", ")}")
  }

  test("every query is bit-identical under a different shuffle-partition count") {
    assertInvariant("PARTITION")(
      "spark.sql.shuffle.partitions" -> "7", // co-prime with 32
      "spark.sql.adaptive.enabled" -> "false")
  }

  test("every query is bit-identical with whole-stage codegen disabled") {
    // Interpreted eval vs doGenCode is two implementations of every
    // expression — divergence in a custom Catalyst expression (e.g. the
    // fused cosine_sim) or a subtle builtin-misuse would surface here.
    assertInvariant("CODEGEN")(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
  }

  test("every query is bit-identical with auto-broadcast disabled") {
    // The "dimension too big to broadcast" regime at 100 TB: every join
    // falls back to shuffle/sort-merge. Join results (incl. outer-join
    // NULL rows and semi/anti semantics) must not depend on strategy.
    assertInvariant("JOINSTRAT")(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
  }
}
