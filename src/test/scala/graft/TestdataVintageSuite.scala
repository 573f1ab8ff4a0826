package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tripwire for silent /root/testdata regenerations (round-10 post-mortem:
  * the driver re-wrote events.ts from TIMESTAMP(NANOS) to timestamp[us]
  * between rounds and 24 queries crashed with an opaque DATATYPE_MISMATCH).
  * This suite turns the next vintage swap into a red test with a NAMED
  * diagnosis: which table, which column, which type appeared, and which
  * types the loaders are prepared to dispatch on. */
class TestdataVintageSuite extends SparkSpec {

  // the column contract every operator/oracle in this repo is written
  // against (FIXTURES.md); order-insensitive — only membership matters
  private val expected: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  test("every driver table has the contracted column set") {
    val diffs = Tables.names.flatMap { t =>
      val got = spark.read.parquet(s"$sf/$t.parquet").columns.toSet
      val want = expected(t)
      if (got == want) None
      else Some(s"$t: missing=${(want -- got).toList.sorted} " +
        s"unexpected=${(got -- want).toList.sorted}")
    }
    assert(diffs.isEmpty,
      s"\nTESTDATA VINTAGE CHANGED — column contract broken:\n  " +
        diffs.mkString("\n  "))
  }

  test("events.ts physical encoding is one the loader dispatches on") {
    // raw read WITHOUT the loader's rewrite: this is the type the dispatch
    // in Tables.t sees. Known vintages: BIGINT (TIMESTAMP(NANOS) under
    // nanosAsLong), TIMESTAMP_NTZ (timestamp[us], NTZ inference on), or
    // TIMESTAMP (LTZ, if inference were off). Anything else is a NEW
    // vintage: extend the dispatch in Core.scala before trusting results.
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(raw),
      s"\nTESTDATA VINTAGE CHANGED — events.ts reads as $raw; " +
        "Tables.t (Core.scala) only dispatches on " +
        "BIGINT (nanos-as-long) / TIMESTAMP_NTZ / TIMESTAMP. " +
        "Add a branch for the new encoding and re-check the DuckDB oracle " +
        "side (epoch_us semantics) before re-running Verify.")
  }

  test("loaders normalize every temporal column to TIMESTAMP_NTZ with sane values") {
    // post-load invariant all ts_* / win_* / join_asof queries rely on
    for (t <- Seq("events", "orders", "lineitem")) {
      val df = Tables.t(spark, sf, t)
      val temporal = df.schema.fields.filter(f =>
        f.dataType == TimestampType || f.dataType == TimestampNTZType)
      assert(temporal.nonEmpty, s"$t: no temporal column after load")
      temporal.foreach { f =>
        assert(f.dataType == TimestampNTZType,
          s"$t.${f.name}: loader left ${f.dataType}, want TIMESTAMP_NTZ")
      }
    }
    // value sanity: the events clock must land in the fixture epoch range
    // (a unit mix-up — ns read as µs — lands centuries away, not here)
    val r = Tables.t(spark, sf, "events")
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head
    assert(r.getInt(0) >= 2020 && r.getInt(1) <= 2030,
      s"events.ts years [${r.getInt(0)}, ${r.getInt(1)}] outside 2020-2030 " +
        "— the physical-unit dispatch in Tables.t mis-decoded this vintage")
  }

  test("documents/embeddings column types hold (text/similarity families)") {
    // a silent type flip here (e.g. embedding → array<double>, n_chars →
    // int) would break dozens of queries with opaque analysis errors —
    // same failure mode as the round-10 events swap, different tables
    val d = spark.read.parquet(s"$sf/documents.parquet").schema
    assert(d("doc_id").dataType == LongType, s"doc_id: ${d("doc_id").dataType}")
    assert(d("text").dataType == StringType, s"text: ${d("text").dataType}")
    assert(d("lang").dataType == StringType, s"lang: ${d("lang").dataType}")
    assert(d("source").dataType == StringType, s"source: ${d("source").dataType}")
    assert(d("n_chars").dataType == LongType, s"n_chars: ${d("n_chars").dataType}")
    val e = spark.read.parquet(s"$sf/embeddings.parquet").schema
    assert(e("vec_id").dataType == LongType, s"vec_id: ${e("vec_id").dataType}")
    assert(e("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      e("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embedding: ${e("embedding").dataType} — similarity/ANN family expects array<float>")
    assert(e("label").dataType == IntegerType, s"label: ${e("label").dataType}")
  }

  test("every table loads with rows at sf0.001") {
    Tables.names.foreach { t =>
      assert(Tables.t(spark, sf, t).limit(1).count() == 1,
        s"$t: empty or unreadable at $sf")
    }
  }
}
