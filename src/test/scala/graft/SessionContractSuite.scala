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

  test("case mapping is the JVM's FULL Unicode mapping — the oracle mirrors it") {
    // DuckDB's lower/upper use SIMPLE folding; the dedup_exact and
    // text_normalize oracles pre-expand exactly these divergent
    // codepoints (ß→SS before upper, İ→i+U+0307 before lower). If a
    // Spark upgrade ever switches to a collation-aware/simple mapping,
    // those mirrors silently corrupt — this pin goes red first.
    import org.apache.spark.sql.functions.{lower, upper, lit}
    val r = spark.range(1).select(
      lower(lit("\u0130")).as("li"), // dotted capital I
      upper(lit("straße")).as("us"), // straße
      lower(lit("STRAßE")).as("ls"),
      lower(lit("ΟΔΟΣ")).as("gs")) // uppercase Greek
      .collect().head
    assert(r.getString(0) == "i\u0307",
      "lower(U+0130) must be i + combining dot")
    assert(r.getString(1) == "STRASSE", "upper(ß) must be SS")
    assert(r.getString(2) == "straße", "lower(ß) must stay ß")
    // CONDITIONAL mapping boundary (round-13 ADVICE): the JVM's
    // final-sigma rule lowers word-final Σ to ς (U+03C2) where DuckDB's
    // simple folding always yields σ (U+03C3). The oracle mirrors
    // deliberately do NOT pre-expand it -- a conditional mapping has no
    // positional replace() mirror -- so uppercase Greek text is OUT of
    // the lower()-based oracles' validity domain (like dedup_edit's
    // ASCII-'en' bound). This pin makes the exclusion an explicit
    // engine fact rather than a silent divergence-in-waiting.
    assert(r.getString(3) == "οδος",
      "JVM final-sigma rule: lower(ΟΔΟΣ) must end in ς (U+03C2)")
  }
}
