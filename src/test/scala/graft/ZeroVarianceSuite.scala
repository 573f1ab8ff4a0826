package graft

import org.apache.spark.sql.functions._

/** Zero-variance / zero-norm robustness: the ANSI-arithmetic twin of
  * NonFiniteInputSuite. Under `spark.sql.ansi.enabled=true` a Divide whose
  * denominator evaluates to 0.0 THROWS (DIVIDE_BY_ZERO) — for doubles too —
  * while DuckDB yields NULL, so every data-derived denominator is a masked
  * crash+divergence: the driver fixtures never produce a constant-valued
  * group (sample sd = 0), a singleton group (n − 1 = 0), an all-zero weight
  * sum, or a zero-norm embedding, but production feeds produce all four
  * (stuck sensors, rare categories, filtered-out documents, padding
  * vectors). The contract this suite pins: degenerate denominators yield
  * NULL — never a throw, and never NaN (which Spark orders as the LARGEST
  * double, so a NaN cosine would pass `cos >= t` filters and top the
  * neighbor ranking — the dedup_embed wrong-answer mode fixed alongside).
  *
  * The same recipe is a full mangle vintage (tools/mangle.py `zerovar`) so
  * the DuckDB oracle replays every contract bit-exact cross-engine.
  */
class ZeroVarianceSuite extends SparkSpec {

  private lazy val zvDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_zerovar").toString
    def copy(t: String, mangle: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      mangle(spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet"))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "documents"))
      copy(t, identity)
    // 'error' becomes a constant-valued metric (a stuck sensor: sd = 0);
    // one appended 'zzz_single' row is the rare-category singleton (n = 1)
    copy("events", df => df
      .withColumn("value",
        when(col("event_type") === "error", lit(7.5)).otherwise(col("value")))
      .unionByName(df.orderBy(col("event_id").desc).limit(1)
        .select(
          (col("event_id") + 1000000L).as("event_id"), col("ts"),
          col("user_id"), lit("zzz_single").as("event_type"),
          lit(42.0).as("value"), col("props"))))
    // returnflag 'R' becomes the zero-variance group on BOTH moment axes:
    // constant quantity (corr/regression/skew undefined) and zero price
    // (agg_weighted's weight sum = 0)
    copy("lineitem", df => df
      .withColumn("l_quantity",
        when(col("l_returnflag") === "R", lit(25.0)).otherwise(col("l_quantity")))
      .withColumn("l_extendedprice",
        when(col("l_returnflag") === "R", lit(0.0))
          .otherwise(col("l_extendedprice"))))
    // every 17th embedding is the zero vector (padding rows / failed
    // normalizations) — vec_id 0 is both a probe and an IVF centroid
    copy("embeddings", df => df
      .withColumn("embedding",
        when(col("vec_id") % 17 === 0,
          transform(col("embedding"), _ => lit(0.0f)))
          .otherwise(col("embedding"))))
    dir
  }

  test("ts_anomaly: singleton and constant-valued groups score NULL, not throw") {
    val r = SparkEntry.queries("ts_anomaly")(spark, zvDir).collect()
      .map(row => row.getAs[String]("event_type") ->
        (row.getAs[Long]("n"), row.getAs[Long]("n_anom"),
          Option(row.getAs[java.lang.Double]("max_absz"))))
      .toMap
    // constant 'error': sd = 0 → every z NULL → nothing flagged
    assert(r("error")._2 == 0L && r("error")._3.isEmpty,
      s"constant group should score NULL: ${r("error")}")
    // singleton: n − 1 = 0 → sample sd undefined → NULL
    assert(r("zzz_single") == ((1L, 0L, None)), s"singleton: ${r("zzz_single")}")
    // healthy groups still score
    assert(r("click")._3.nonEmpty && r("view")._3.nonEmpty)
  }

  test("moment aggregates: zero-variance group → NULL, others unaffected") {
    def byFlag(k: String, c: String): Map[String, Option[Double]] =
      SparkEntry.queries(k)(spark, zvDir).collect()
        .map(r => r.getAs[String]("l_returnflag") ->
          Option(r.getAs[java.lang.Double](c)).map(_.doubleValue))
        .toMap
    val corr = byFlag("agg_corr", "corr_qty_price")
    assert(corr("R").isEmpty && corr("A").nonEmpty && corr("N").nonEmpty)
    val slope = byFlag("agg_regression", "slope")
    val icept = byFlag("agg_regression", "intercept")
    assert(slope("R").isEmpty && icept("R").isEmpty && slope("A").nonEmpty)
    val skew = byFlag("agg_skew_kurt", "skew")
    val kurt = byFlag("agg_skew_kurt", "kurt")
    assert(skew("R").isEmpty && kurt("R").isEmpty && skew("N").nonEmpty)
    val wavg = byFlag("agg_weighted", "wavg_disc")
    assert(wavg("R").isEmpty && wavg("A").nonEmpty,
      "all-zero weights must yield NULL weighted mean")
  }

  test("cosine family: zero-norm vectors are dropped, never NaN-ranked") {
    for (k <- Seq("sim_cosine_topk", "sim_cosine_expr")) {
      val rows = SparkEntry.queries(k)(spark, zvDir).collect()
      assert(rows.nonEmpty, s"$k empty")
      // no NULL/NaN cos survives the filter, and no zero vector appears
      // on either side of a ranked pair
      assert(rows.forall { r =>
        val c = r.getAs[java.lang.Double]("cos")
        c != null && !c.isNaN
      }, s"$k leaked a NULL/NaN cosine")
      assert(rows.forall { r =>
        r.getAs[Long]("pid") % 17 != 0 && r.getAs[Long]("vid") % 17 != 0
      }, s"$k ranked a zero vector")
    }
    // the fused-expression path and the HOF path agree row-for-row on the
    // degenerate corpus (the pre-fix behaviors diverged: NaN vs throw)
    val a = SparkEntry.queries("sim_cosine_topk")(spark, zvDir)
      .select("pid", "vid", "cos", "rn").collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("sim_cosine_expr")(spark, zvDir)
      .select("pid", "vid", "cos", "rn").collect().map(_.toSeq).toSeq
    assert(a == b, "HOF topk and cosine_sim topk diverge on zero vectors")
    // dedup_embed: a NaN cosine would order as +max and pass `>= 0.35` —
    // zero-vector pairs must be absent
    val pairs = SparkEntry.queries("dedup_embed")(spark, zvDir).collect()
    assert(pairs.forall { r =>
      r.getAs[Long]("ia") % 17 != 0 && r.getAs[Long]("ib") % 17 != 0
    }, "dedup_embed emitted a zero-vector pair")
    assert(pairs.forall(r => !r.getAs[Double]("cos").isNaN))
  }

  test("cosine_sim zero-norm → NULL under interpreted eval too") {
    // the codegen path runs in the queries above; pin the interpreted
    // (nullSafeEval) twin in a codegen-disabled session so the two
    // regimes can't drift on the zero-norm branch
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import scala.jdk.CollectionConverters._
    val df = s2.createDataFrame(
      Seq(org.apache.spark.sql.Row(
        Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val out = df.select(
      expr("cosine_sim(a, b)").as("z"),
      expr("cosine_sim(b, b)").as("ok")).collect().head
    assert(out.isNullAt(0), "zero-norm must be NULL in interpreted eval")
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12)
  }

  test("ts_resample anchors duplicate-timestamp events at the max event_id") {
    // surfaced by the zerovar vintage: the appended singleton shares its
    // timestamp with an existing event, the first duplicate (user, ts)
    // pair in any fixture. Contract (both engines — the oracle dedups
    // explicitly): the max-event_id row wins; the discarded row must not
    // anchor interpolation in either direction.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dupts").toString
    val h = 3600000000L
    Seq(
      (1L, 0L, 10.0, "view"), // t=0h, eid 1
      (2L, 2 * h, 30.0, "view"), // t=2h, eid 2 — discarded duplicate
      (99L, 2 * h, 100.0, "view")) // t=2h, eid 99 — the winning anchor
      .toDF("event_id", "t", "value", "event_type")
      .select(col("event_id"),
        expr("timestamp_micros(t)").cast("timestamp_ntz").as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("ts_resample")(spark, dir).collect()
      .map(x => x.getAs[java.time.LocalDateTime]("g_ts")
        .toEpochSecond(java.time.ZoneOffset.UTC) / 3600L ->
        x.getAs[Double]("v_interp")).toMap
    val g0 = r.keys.min
    assert(r(g0) == 10.0 && r(g0 + 1) == 55.0 && r(g0 + 2) == 100.0,
      s"duplicate-ts anchor drifted: $r")
  }

  test("every declared query survives zero-variance/zero-norm input") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (k, fn) =>
        try { fn(spark, zvDir).collect(); None }
        catch { case e: Throwable =>
          Some(k -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ").take(200)}")
        }
    }
    failures.foreach { case (k, m) => info(s"ZEROVAR-FAIL $k — $m") }
    assert(failures.isEmpty, failures.map(_._1).mkString(", "))
  }
}
