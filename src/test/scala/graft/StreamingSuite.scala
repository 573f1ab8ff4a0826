package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Proves the ts_* formulations run incrementally under Structured
  * Streaming (file source → memory sink) with identical results to batch. */
class StreamingSuite extends SparkSpec {

  private def eventsDir: String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("tumbling window agg matches the batch result incrementally") {
    val dir = eventsDir
    val q = Streams.tumbling(Streams.fileSource(spark, dir))
      .writeStream.format("memory").queryName("tumbling_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_sink")
        .select(unix_micros(col("bucket")).as("b"), col("event_type"), col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.t(spark, sf, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(Par.usec(col("window.start")).as("b"), col("event_type"),
          col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("fileSource starts on an empty directory before any data lands") {
    // Round-12 ADVICE medium: the schema peek used to throw
    // UNABLE_TO_INFER_SCHEMA on an empty source dir; the declared-schema
    // fallback lets the stream start first and ingest data that lands
    // later — the normal streaming-source lifecycle.
    val dir = Files.createTempDirectory("graft_stream_empty").toString
    val q = Streams.tumbling(Streams.fileSource(spark, dir))
      .writeStream.format("memory").queryName("empty_start_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_start_sink").count() == 0)
      Files.copy(Paths.get(s"$sf/events.parquet"),
        Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      val streamed = spark.table("empty_start_sink").count()
      val batch = Tables.t(spark, sf, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .count().count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("session windows produce sessions incrementally") {
    val dir = eventsDir
    val q = Streams.sessions(Streams.fileSource(spark, dir))
      .writeStream.format("memory").queryName("session_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("session_sink").agg(sum("n_events")).head.getLong(0)
      assert(n == 1000L) // every event in exactly one session
    } finally q.stop()
  }

  private def documentsDir: String = {
    val dir = Files.createTempDirectory("graft_stream_docs").toString
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(s"$dir/documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming text_chunk twin matches the batch chunking exactly") {
    val dir = documentsDir
    val q = Streams.chunkStream(Streams.documentsSource(spark, dir))
      .writeStream.format("memory").queryName("chunk_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("chunk_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val batch = SparkEntry.queries("text_chunk")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming text_pii twin matches the batch redaction exactly") {
    val dir = documentsDir
    val q = Streams.piiStream(Streams.documentsSource(spark, dir))
      .writeStream.format("memory").queryName("pii_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_sink").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = SparkEntry.queries("text_pii")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == batch)
      // every document's injected contact line was found and scrubbed
      assert(streamed.forall { case (_, red, ne, np) =>
        ne >= 1 && np >= 1 && !red.contains("@mail.com") })
    } finally q.stop()
  }

  test("streaming EWMA state op is bit-identical to the batch lag chain") {
    import spark.implicits._
    val dir = eventsDir
    val events = Streams.fileSource(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event]
    val q = Streams.ewmaPerUser(events)
      .writeStream.format("memory").queryName("ewma_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ewma_sink")
        .select("event_id", "ewma10").collect()
        .map(r => r.getLong(0) ->
          java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
      val batch = SparkEntry.queries("ts_ewma")(spark, sf)
        .select("event_id", "ewma10").collect()
        .map(r => r.getLong(0) ->
          java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
      assert(streamed.size == batch.size)
      assert(streamed == batch) // bit-exact, not approximately equal
    } finally q.stop()
  }

  test("streaming EWMA propagates NaN/Inf bit-identically to batch") {
    // The streaming state machine must agree with batch on non-finite
    // metric values too: a NaN poisons the 10-event window until it
    // falls out, an Inf dominates it — identically on both paths.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_nf").toString
    Tables.t(spark, sf, "events")
      .withColumn("value",
        when(col("event_id") % 19 === 0, lit(Double.NaN))
          .when(col("event_id") % 23 === 0, lit(Double.PositiveInfinity))
          .otherwise(col("value")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // the spark write lands a directory (unlike the flat-file fixture
    // copies above), so stream that directory directly
    val events = Streams.fileSource(spark, s"$dir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event]
    val q = Streams.ewmaPerUser(events)
      .writeStream.format("memory").queryName("ewma_nf_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ewma_nf_sink")
        .select("event_id", "ewma10").collect()
        .map(r => r.getLong(0) ->
          java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
      val batch = SparkEntry.queries("ts_ewma")(spark, dir)
        .select("event_id", "ewma10").collect()
        .map(r => r.getLong(0) ->
          java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
      assert(streamed == batch)
      val nanBits = java.lang.Double.doubleToLongBits(Double.NaN)
      assert(batch.values.exists(_ == nanBits), "fixture exercised no NaN")
    } finally q.stop()
  }

  test("ListState EWMA processor is bit-identical to the batch lag chain") {
    import spark.implicits._
    val dir = eventsDir
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Streams.fileSource(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event]
      val q = Streams.ewmaPerUserTws(events)
        .writeStream.format("memory").queryName("ewma_tws_sink")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("ewma_tws_sink")
          .select("event_id", "ewma10").collect()
          .map(r => r.getLong(0) ->
            java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
        val batch = SparkEntry.queries("ts_ewma")(spark, sf)
          .select("event_id", "ewma10").collect()
          .map(r => r.getLong(0) ->
            java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
        assert(streamed.size == batch.size)
        assert(streamed == batch) // bit-exact through the ListState buffer
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming funnel state machine matches the batch ts_funnel counts") {
    import spark.implicits._
    val dir = eventsDir
    val events = Streams.fileSource(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event]
    val q = Streams.funnelPerUser(events)
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // latest stage per user; stage k implies every stage below it
      val stages = spark.table("funnel_sink")
        .groupBy("user_id").agg(max("stage").as("stage"))
      val streamed = (
        stages.where(col("stage") >= 1).count(),
        stages.where(col("stage") >= 2).count(),
        stages.where(col("stage") >= 3).count())
      val b = SparkEntry.queries("ts_funnel")(spark, sf).head
      val batch = (b.getLong(0), b.getLong(1), b.getLong(2))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("transformWithState funnel twin matches flatMapGroupsWithState and batch") {
    import spark.implicits._
    val dir = eventsDir
    // the Spark 4 arbitrary-state API runs on the RocksDB state store only
    // (it refuses the HDFS-backed default provider)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Streams.fileSource(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event]
      val q = Streams.funnelPerUserTws(events)
        .writeStream.format("memory").queryName("funnel_tws_sink")
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        val stages = spark.table("funnel_tws_sink")
          .groupBy("user_id").agg(max("stage").as("stage"))
        val streamed = (
          stages.where(col("stage") >= 1).count(),
          stages.where(col("stage") >= 2).count(),
          stages.where(col("stage") >= 3).count())
        val b = SparkEntry.queries("ts_funnel")(spark, sf).head
        assert(streamed == (b.getLong(0), b.getLong(1), b.getLong(2)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("watermarked windowed bigram counts converge to the batch counts") {
    val dir = documentsDir
    val q = Streams.bigramCounts(Streams.documentsSource(spark, dir))
      .writeStream.format("memory").queryName("bigram_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // summed across event-time windows == the batch per-bigram counts
      val streamed = spark.table("bigram_sink")
        .groupBy("a", "b").agg(sum("c_ab").as("c"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val t = split(col("text"), " ")
      val batch = Tables.t(spark, sf, "documents")
        .select(explode(filter(
            transform(t, (x, i) =>
              when(i < size(t) - 1,
                struct(x.as("a"), element_at(t, i + lit(2)).as("b")))),
            _.isNotNull)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .where(length(col("a")) > 0 && length(col("b")) > 0)
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("transformWithState initial state: backfill bootstrap + live stream == batch") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // split the corpus at the median event time: everything before is
      // the batch backfill, everything after streams in live. Vintage-
      // agnostic: load through Tables.t (ts already normalized) and split
      // on epoch µs; the re-written live slice is µs parquet either way.
      val ev = Tables.t(spark, sf, "events")
        .withColumn("ts", col("ts").cast("timestamp"))
      val cutUs = ev.select(unix_micros(col("ts")).as("us"))
        .stat.approxQuantile("us", Array(0.5), 0.0)(0).toLong
      val hist = ev.where(unix_micros(col("ts")) < cutUs)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event]
      val liveDir = Files.createTempDirectory("graft_tws_init").toString
      ev.where(unix_micros(col("ts")) >= cutUs).coalesce(1)
        .write.mode("overwrite").parquet(liveDir)
      val initial = Streams.funnelBootstrap(hist)
      val live = Streams.fileSource(spark, liveDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event]
      val q = Streams.funnelPerUserTwsInit(live, initial)
        .writeStream.format("memory").queryName("funnel_init_sink")
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        // final stage per user = last sink update, falling back to the
        // bootstrapped stage for users with no live events (their state
        // is held but never re-emitted)
        val streamed = spark.table("funnel_init_sink")
          .groupBy("user_id").agg(max("stage").as("stage"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val boot = initial.collect()
          .map { case (u, s) => u -> Streams.stageOf(s) }.toMap
        val merged = (boot ++ streamed).values.toSeq
        val got = (
          merged.count(_ >= 1).toLong,
          merged.count(_ >= 2).toLong,
          merged.count(_ >= 3).toLong)
        val b = SparkEntry.queries("ts_funnel")(spark, sf).head
        assert(got == (b.getLong(0), b.getLong(1), b.getLong(2)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState event-time timers close sessions like batch ts_session") {
    import spark.implicits._
    val dir = eventsDir
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Streams.fileSource(spark, dir)
        .withWatermark("ts", "10 minutes")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event]
      val q = Streams.sessionsTws(events)
        .writeStream.format("memory").queryName("sess_tws_sink")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("sess_tws_sink")
          .select("user_id", "session_start_us", "n_events", "duration_us")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        // The closeable batch sessions: every non-trailing session (split
        // inline by a later event), plus each user's trailing session iff
        // the final watermark (max ts - 10 min) passed its timer
        // (last event + 30 min).
        val maxTsUs = Tables.t(spark, sf, "events")
          .agg(max(Par.usec(col("ts")))).head.getLong(0)
        val wmUs = maxTsUs - 10L * 60 * 1000000
        val gapUs = 30L * 60 * 1000000
        val batch = SparkEntry.queries("ts_session")(spark, sf)
        val lastSess = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
        val closeable = batch
          .withColumn("start_us", Par.usec(col("session_start")))
          .withColumn("end_us", col("start_us") + col("duration_us"))
          .withColumn("trailing",
            col("session_id") === max("session_id").over(lastSess))
          .where(!col("trailing") || col("end_us") + gapUs < wmUs)
          .select("user_id", "start_us", "n_events", "duration_us")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(streamed.nonEmpty)
        assert(streamed == closeable)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState MapState counts match batch groupBy exactly") {
    import spark.implicits._
    val dir = eventsDir
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Streams.fileSource(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Streams.Event]
      val q = Streams.typeCountsTws(events)
        .writeStream.format("memory").queryName("typecount_sink")
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("typecount_sink")
          .groupBy("user_id", "event_type").agg(max("n").as("n"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        val batch = Tables.t(spark, sf, "events")
          .groupBy("user_id", "event_type").count()
          .collect()
          .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(streamed.nonEmpty)
        assert(streamed == batch)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("flatMapGroupsWithState keeps running per-user state") {
    import spark.implicits._
    val dir = eventsDir
    val events = Streams.fileSource(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event]
    val q = Streams.runningPerUser(events)
      .writeStream.format("memory").queryName("state_sink")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // last update per user carries the final running count
      val total = spark.table("state_sink")
        .groupBy("user_id").agg(max("n").as("n"))
        .agg(sum("n")).head.getLong(0)
      assert(total == 1000L)
    } finally q.stop()
  }
}
