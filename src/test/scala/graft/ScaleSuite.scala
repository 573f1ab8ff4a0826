package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-pattern capabilities: partitioned sinks with partition pruning,
  * manual skew salting, and the reference's iterated pipelines (N-fold
  * increment; multi-iteration Lloyd with caching). */
class ScaleSuite extends SparkSpec {

  test("partitionBy sink + partition-pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.t(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("status") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      plan.take(1500))
    // only the O partition directory is read
    val all = spark.read.parquet(dir).count()
    assert(pruned.count() < all && pruned.count() > 0)
  }

  test("hot bucket: a viral boilerplate group dedups correctly") {
    // The hot-key shape of a scraped corpus: one boilerplate text mirrored
    // 40x (all landing in ONE dedup block/bucket) among 60 distinct docs.
    // Pair-listing ops emit exactly C(40,2) intra-group pairs — the output
    // itself is quadratic in group size, which is why the 100 TB path is
    // the cluster representation — and dedup_cluster collapses the clique
    // to one min-labeled component in O(1) rounds. dedup_exact keeps one
    // representative.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    val boiler = "the same mirrored boilerplate text repeated on every site"
    val docs =
      (0L until 40L).map(i => (i, boiler, "en", "web")) ++
      (100L until 160L).map(i =>
        (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f", "en", "web"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val near = SparkEntry.queries("dedup_near")(spark, dir).collect()
    assert(near.length == 40 * 39 / 2)
    assert(near.forall(r =>
      r.getAs[Long]("ia") < 40 && r.getAs[Long]("ib") < 40))

    val cl = SparkEntry.queries("dedup_cluster")(spark, dir).collect()
    assert(cl.length == 40)
    assert(cl.forall(_.getAs[Long]("cluster_id") == 0L))

    assert(SparkEntry.queries("dedup_exact")(spark, dir).count() == 61L)
  }

  test("hot user: one user holding ~95% of events sessionizes correctly") {
    // The power-law shape of any real event stream: a bot/whale user whose
    // per-user partition dwarfs every other. All per-user state here
    // (window partitions, collect_list funnels) is bounded by per-user
    // activity — this pins that a pathological-but-realistic hot key gets
    // the RIGHT answer, and that the whole ts_* family survives the skew.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hotuser").toString
    val t0 = 1767225600000000L // 2026-01-01T00:00Z in µs
    val types = Array("view", "click", "purchase")
    // hot user 1: 5,000 events 10 s apart (no 30-min gap → ONE session),
    // cycling view→click→purchase (completes the funnel)
    val hot = (0 until 5000).map { i =>
      (i.toLong, t0 + i * 10000000L, 1L, types(i % 3), i.toDouble, """{"k": 1}""")
    }
    // 50 cold users: 6 view-only events 1 h apart (every gap > 30 min →
    // six 1-event sessions each; they drop out of the funnel at stage 1)
    val cold = for (u <- 100L until 150L; i <- 0 until 6) yield
      (100000L + u * 10 + i, t0 + i * 3600000000L, u, "view", 1.0, """{"k": 2}""")
    (hot ++ cold).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val sess = SparkEntry.queries("ts_session")(spark, dir).collect()
    assert(sess.length == 1 + 50 * 6, s"got ${sess.length} sessions")
    val hotSess = sess.filter(_.getAs[Long]("user_id") == 1L)
    assert(hotSess.length == 1)
    assert(hotSess.head.getAs[Long]("n_events") == 5000L)
    assert(hotSess.head.getAs[Long]("duration_us") == 4999L * 10000000L)

    val fun = SparkEntry.queries("ts_funnel")(spark, dir).head
    assert(fun.getAs[Long]("n_view_users") == 51L)
    assert(fun.getAs[Long]("n_click_users") == 1L)
    assert(fun.getAs[Long]("n_purchase_users") == 1L)

    // the rest of the family must survive the same skew
    val failures = graft.operators.TimeSeries.defs.keys.toSeq.sorted.flatMap { k =>
      try { SparkEntry.queries(k)(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$k: ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, failures.mkString(", "))
  }

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    // events.user_id is the skew stand-in; salt by 8, partial agg, de-salt
    val e = Tables.t(spark, sf, "events")
    val direct = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = e
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum("value").as("ps"))
      .groupBy("event_type")
      .agg(sum("pn").as("n"), sum("ps").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
  }

  test("N-fold element-wise increment stays a single narrow stage") {
    var df = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    for (_ <- 1 to 10)
      df = df.withColumn("v", expr("transform(v, x -> x + 1.0)"))
    val agg = df.agg(sum(expr("aggregate(v, 0D, (s, x) -> s + x)")))
    val n = {
      var c = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        if (p.isInstanceOf[ShuffleExchangeLike]) c += 1
        p.children.foreach(walk)
        p match { case a: AdaptiveSparkPlanExec => walk(a.executedPlan); case _ => }
      }
      agg.collect(); walk(agg.queryExecution.executedPlan); c
    }
    assert(n <= 1, s"10 chained increments must not add shuffles, got $n")
    // value check: each of 500 vectors × 64 dims gained 10.0
    val base = Tables.t(spark, sf, "embeddings")
      .agg(sum(expr("aggregate(embedding, 0D, (s, x) -> s + CAST(x AS DOUBLE))")))
      .head.getDouble(0)
    assert(math.abs(agg.head.getDouble(0) - (base + 500 * 64 * 10.0)) < 1e-6)
  }

  test("iterative Lloyd converges with cached corpus (reference k-means shape)") {
    import graft.functions.VectorOps._
    val v = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).persist(StorageLevel.MEMORY_ONLY)
    try {
      var cents = v.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      var lastInertia = Double.MaxValue
      for (_ <- 1 to 3) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("d2").asc, col("cid").asc)
        val assigned = v.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cid"),
            dist2(col("embedding"), col("cemb")).as("d2"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
        val inertia = assigned.agg(sum("d2")).head.getDouble(0)
        assert(inertia <= lastInertia + 1e-9) // Lloyd never increases inertia
        lastInertia = inertia
        // recompute: element-wise mean per cluster via posexplode + collect
        cents = assigned
          .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("cid", "pos").agg(avg("x").as("m"))
          .groupBy("cid")
          .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
            .as("pm"))
          .select(col("cid"),
            expr("transform(pm, p -> CAST(p.m AS FLOAT))").as("cemb"))
      }
    } finally v.unpersist()
  }

  test("giant documents: a 100k-token doc and a 300k-char single token") {
    // The long tail of a scraped corpus: one document orders of magnitude
    // longer than the median (concatenated boilerplate, minified JS, a
    // whole book). Every driver fixture doc is a few dozen tokens, so
    // nothing exercises per-doc arrays of 10^5 elements (token lists,
    // shingle explodes, span inventories) or a single token of 3*10^5
    // chars (no delimiter at all - binary-ish junk). The contract:
    // closed-form answers stay exact, and no text/dedup key crashes or
    // degenerates quadratically in DOC LENGTH (pair ops stay blocked).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_giant").toString
    val nTok = 100000
    val vocab = 50
    val giant = (0 until nTok).map(i => s"t${i % vocab}").mkString(" ")
    val oneTok = "x" * 300000
    val docs = Seq(
      (1L, giant, "en", "web"),
      (2L, oneTok, "en", "web")) ++
      (100L until 106L).map(i =>
        (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e", "en", "web"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val toks = SparkEntry.queries("text_quality")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(toks(1L) == nTok.toLong && toks(2L) == 1L)

    // cycled vocab => beyond the first cycle every bigram repeats
    val rep = SparkEntry.queries("text_repetition")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rep(1L).getAs[Long]("n_bigrams") == (nTok - 1).toLong)
    assert(rep(1L).getAs[Double]("dup2_frac") > 0.99)

    // chunking (size 40, stride 30) tiles the giant doc: one chunk per
    // stride start, and the stride-sized prefixes of consecutive chunks
    // reconstruct the doc (PropertySuite's law) — here pin the count and
    // the exact token total with the 10-token overlap per interior chunk
    val chunks = SparkEntry.queries("text_chunk")(spark, dir)
      .where(col("doc_id") === 1L).collect()
    val nChunks = (nTok + 29) / 30
    assert(chunks.length == nChunks)
    val totalTokens = chunks.map(_.getAs[Long]("chunk_tokens")).sum
    // every chunk is 40 tokens except the tail ones clipped at nt
    val expected = (0 until nTok by 30).map(st => math.min(40, nTok - st)).sum
    assert(totalTokens == expected.toLong)

    // giant docs sit alone in their length bands - pair ops emit nothing
    // for them (blocking, not all-pairs, is what makes this linear)
    for (k <- Seq("dedup_near", "dedup_edit")) {
      val pairs = SparkEntry.queries(k)(spark, dir).collect()
      assert(pairs.forall(r =>
        r.getAs[Long]("ia") > 2L && r.getAs[Long]("ib") > 2L), k)
    }

    for (k <- Seq("text_ngrams", "text_quality", "text_fingerprint",
                  "text_langid", "text_entropy", "text_lang_stats",
                  "text_minhash", "text_normalize", "text_stem", "text_url",
                  "text_html", "text_pii", "dedup_exact", "dedup_simhash",
                  "dedup_lsh", "dedup_ngram", "dedup_span", "dedup_mllsh",
                  "text_collocation", "text_tfidf", "text_decontaminate",
                  "filter_c4", "scan_text_rt", "fn_array2"))
      withClue(s"$k on giant-doc corpus: ")(
        SparkEntry.queries(k)(spark, dir).collect())
  }
}
