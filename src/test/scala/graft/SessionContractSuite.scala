package graft

/** Pins the Sessions.local configuration the rest of the repo depends on.
  * Two protected invariants: (1) ANSI mode stays ON — the short-doc /
  * funnel-drop-off fixes guard against element_at/cast throwing, and a
  * silently flipped `spark.sql.ansi.enabled=false` would let masked
  * crash paths reappear on a future Spark upgrade without any test going
  * red; (2) the oracle-parity settings (UTC, µs parquet output, NTZ
  * inference) that every hash-match comparison assumes.
  */
class SessionContractSuite extends SparkSpec {

  test("ANSI mode is on — the crash-path fixtures exercise what they claim") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("oracle-parity session settings hold") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType")
      == "TIMESTAMP_MICROS")
    assert(spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
      == "true")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    // shuffle width == worker threads: the local stand-in for sizing
    // spark.sql.shuffle.partitions to the cluster, not the 200 default
    assert(spark.conf.get("spark.sql.shuffle.partitions")
      == spark.sparkContext.defaultParallelism.toString)
  }
}
