package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming dedup + stream-stream join: the streaming halves of the
  * LLM-pipeline story (continuous ingestion dedup; enrichment joins). */
class StreamingDedupSuite extends SparkSpec {

  private def eventsDir: String = {
    val dir = Files.createTempDirectory("graft_sdedup").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming dropDuplicates with watermark dedups per user+type") {
    val dir = eventsDir
    val q = Streams.fileSource(spark, dir)
      .withWatermark("ts", "24 hours")
      .dropDuplicates("user_id", "event_type")
      .writeStream.format("memory").queryName("sdedup_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sdedup_sink").count()
      val batch = Tables.t(spark, sf, "events")
        .select("user_id", "event_type").distinct().count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming normalize→dedup_exact twin equals the batch chain") {
    // Input with REAL duplicates: documents unioned with a messier copy of
    // itself (shifted ids, whitespace/case litter the normalize step must
    // erase) — 1000 rows in, 500 distinct normalized hashes out.
    val dir = Files.createTempDirectory("graft_sndedup").toString
    val docs = Tables.t(spark, sf, "documents")
    docs.unionByName(docs
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text",
          concat(lit("  "), upper(col("text")), lit("\t\t  "))))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val q = Streams.normalizeDedup(Streams.documentsSource(spark, dir))
      .writeStream.format("memory").queryName("sndedup_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sndedup_sink")
        .select("h").collect().map(_.getString(0)).toSet
      // the SAME function over the static read — batch ≡ stream on the
      // surviving hash set (representative ids differ by arrival order)
      val batch = Streams.normalizeDedup(spark.read.parquet(dir))
        .select("h").collect().map(_.getString(0)).toSet
      assert(streamed == batch)
      assert(streamed.size.toLong == docs.count())
      // and the hash set matches the declared dedup_exact query run over
      // the SAME union corpus with whitespace pre-collapsed: dedup_exact
      // hashes lower(trim(text)), normalizeDedup additionally collapses
      // internal \s+ — pre-collapsing makes the two hash expressions
      // STRUCTURALLY identical (not an accident of a corpus without
      // double spaces)
      val exactDir = Files.createTempDirectory("graft_sndedup_x").toString
      spark.read.parquet(dir)
        .withColumn("text", regexp_replace(col("text"), "\\s+", " "))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$exactDir/documents.parquet")
      val exact = SparkEntry.queries("dedup_exact")(spark, exactDir)
        .select("h").collect().map(_.getString(0)).toSet
      assert(streamed == exact)
    } finally q.stop()
  }

  test("doc-stream operators survive degenerate documents, batch-parity") {
    // The streaming twins of the batch short-doc/NULL sweeps: null text,
    // empty text, single token, embedded newlines, CJK — all normal in a
    // live ingestion feed, none in any driver fixture. Each doc-consuming
    // streaming op must complete, and the incremental result must equal
    // the same function over a static read of the same data.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sdegen").toString
    Seq(
      (1L, "line one\nline two", "en", "web"),
      (2L, null.asInstanceOf[String], "en", "web"),
      (3L, "", "en", "web"),
      (4L, "hello", "en", "web"),
      (5L, "漢字 テキスト 🙂", "ja", "web"),
      (6L, (1 to 60).map("w" + _).mkString(" "), "en", "web"),
      // full-Unicode case-mapping divergents (normalizeDedup lowercases —
      // the JVM mapping the batch oracles mirror must hold incrementally)
      (7L, "straße İstanbul grüße", "de", "web"),
      // the giant-document tail (ScaleSuite class): a 20k-token doc and a
      // 60k-char single token through the stateful incremental path
      (8L, (0 until 20000).map(i => s"t${i % 50}").mkString(" "), "en", "web"),
      (9L, "x" * 60000, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

    def parity(name: String, fn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val sink = s"sdegen_$name"
      val q = fn(Streams.documentsSource(spark, dir))
        .writeStream.format("memory").queryName(sink)
        .outputMode(if (name == "bigrams") "complete" else "append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table(sink).collect().map(_.toString).sorted.toSeq
        val static = fn(spark.read.parquet(dir)).collect()
          .map(_.toString).sorted.toSeq
        assert(streamed == static, s"$name diverged on degenerate docs")
      } finally q.stop()
    }
    parity("chunks", Streams.chunkStream)
    parity("pii", Streams.piiStream)
    parity("ndedup", Streams.normalizeDedup)
    parity("bigrams", Streams.bigramCounts)

    // spanAccounting is transformWithState (no batch execution) — the
    // contract here is completion without throwing on degenerate docs.
    // The Spark 4 arbitrary-state API runs on the RocksDB state store only.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Streams.spanAccounting(Streams.documentsSource(spark, dir))
      .writeStream.format("memory").queryName("sdegen_spans")
      .outputMode("update").start()
    try q.processAllAvailable()
    finally {
      q.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("chained stateful ops: dedup then windowed agg in ONE streaming query") {
    // Spark 4 runs multiple stateful operators in one append-mode query
    // (dropDuplicates state feeding windowed-agg state) — the continuous
    // ingest→dedup→corpus-stats pipeline as a single streaming job rather
    // than two jobs with an intermediate sink. Input: events duplicated
    // 2×; the dedup stage must collapse the copies so the downstream
    // hourly counts equal the batch counts over the ORIGINAL corpus.
    val dir = Files.createTempDirectory("graft_chain").toString
    val e = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"))
    e.unionByName(e).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
      .parquet(dir)
      .withWatermark("ts", "24 hours")
      .dropDuplicates("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("chain_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("chain_sink")
        .select(unix_micros(col("bucket")).as("b"), col("event_type"),
          col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = e
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("b"), col("event_type"),
          col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      // append mode only emits windows the watermark closed — every
      // emitted window must match batch, and most of the corpus closes
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch))
      assert(streamed.size >= batch.size / 2, s"${streamed.size}/${batch.size}")
    } finally q.stop()
  }

  test("stream-stream self join: purchases enriched with signups in-window") {
    val dir = eventsDir
    val src = Streams.fileSource(spark, dir)
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "24 hours")
    val signups = src.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "24 hours")
    val joined = purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_sink").count()
      // batch equivalent on the same window condition
      val e = Tables.t(spark, sf, "events")
      val bp = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val bs = e.where(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      val batch = bp.join(bs,
        col("p_user") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS")).count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup_span twin: MapState df accounting equals batch") {
    // Two micro-batches: documents, then a doc_id-shifted copy of the
    // first 100 — batch 2 RAISES dfreq on every span of those docs, so the
    // processor must re-emit corrected accounting for the ORIGINAL doc_ids
    // (dedup_span's retroactive df>=2 rule; keep-first emission can't
    // express it). Final truth is max per (h, doc_id): n_occ/dfreq are
    // monotone under Update mode.
    val dir = Files.createTempDirectory("graft_sspan").toString
    val docs = Tables.t(spark, sf, "documents")
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    // the Spark 4 arbitrary-state API runs on the RocksDB state store only
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Streams.spanAccounting(Streams.documentsSource(spark, dir))
      .writeStream.format("memory").queryName("sspan_sink")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val echo = docs.where(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + 10000)
      echo.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("sspan_sink")
        .groupBy("h", "doc_id")
        .agg(max("n_occ").as("n_occ"), max("dfreq").as("dfreq"))
        .groupBy("doc_id")
        .agg(sum("n_occ").as("n_spans"),
          sum(when(col("dfreq") >= 2, col("n_occ")).otherwise(0L))
            .as("n_dup_spans"))
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          (col("n_dup_spans").cast("double") / col("n_spans"))
            .as("dup_frac"))
      // the declared batch query over the SAME final corpus
      val batchDir = Files.createTempDirectory("graft_sspan_b").toString
      docs.unionByName(echo).coalesce(1).write.mode("overwrite")
        .parquet(s"$batchDir/documents.parquet")
      val batch = SparkEntry.queries("dedup_span")(spark, batchDir)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
      // and batch 2 genuinely corrected history: every original doc < 100
      // now has dup_frac 1.0 (its echo duplicates every span)
      val corrected = streamed.where(col("doc_id") < 100 &&
        col("n_dup_spans") === col("n_spans")).count()
      assert(corrected == 100L)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
