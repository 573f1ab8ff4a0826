package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Par._

/** Round-17 measurement probes (guide §1: measure first). Tooling main —
  * prints stage-level timings for the suite's heavy keys and the per-job
  * floor anatomy, so optimization targets are chosen from numbers, not
  * guesses. Usage: runMain graft.R17Probe <experiment ...>
  *   floor    per-job overhead anatomy on minimal 2/3-job queries
  *   ngram    dedup_ngram stage breakdown (docs/pref/cand/verify)
  *   jac      jacPairs 0.9 stage breakdown (dedup_near family)
  *   cluster  dedup_cluster per-round timing + round count
  *   kmconv   kmeans_conv per-round timing + round count
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-r17probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val sc = spark.sparkContext
    val want = args.toSet

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $tag%-28s ${(System.nanoTime() - t0) / 1e6}%7.0f ms"); r
    }

    // job-count + in-job wall listener
    @volatile var jobs = 0
    @volatile var jobWallNs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); synchronized { jobs += 1 }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) synchronized { jobWallNs += System.nanoTime() - s }
      }
    })

    def D = Tables.t(spark, d, "documents")
    def L = Tables.t(spark, d, "lineitem")

    if (want("floor")) {
      println("== floor anatomy ==")
      val q2 = () => L.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))   // 1 exchange -> 2 jobs
      val q3 = () => Shape.presentSort(
        L.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n")),
        col("l_returnflag"), col("l_linestatus")) // 2 exchanges -> 3 jobs
      // coalesce(1) variant: NARROW single-partition collapse — the final
      // agg merge runs one task over the map-side partials, no second
      // exchange, no extra AQE job
      val q3c = () => L.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .coalesce(1)
        .sortWithinPartitions(col("l_returnflag"), col("l_linestatus"))
      for ((tag, q) <- Seq("2job" -> q2, "3job" -> q3, "3coal" -> q3c)) {
        noop(q()) // warm
        var best = Double.MaxValue; var sum = 0.0
        val reps = 10
        var lastJobs = 0; var lastWall = 0L
        for (_ <- 1 to reps) {
          jobs = 0; jobWallNs = 0L
          val t0 = System.nanoTime()
          noop(q())
          val t = (System.nanoTime() - t0) / 1e6
          Thread.sleep(30)
          lastJobs = jobs; lastWall = jobWallNs
          best = math.min(best, t); sum += t
        }
        println(f"$tag: best $best%.0f ms avg ${sum / reps}%.0f ms  jobs $lastJobs  in-job wall ${lastWall / 1e6}%.0f ms")
      }
    }

    // --- dedup_ngram variants (A/B per guide §1; the declared def is
    // untouched until a variant wins and verifies)
    val toks: Column = split(col("text"), " ")
    if (want("ngram")) {
      println("== dedup_ngram variants ==")
      val shingles = array_distinct(filter(
        transform(col("t"), (x, i) =>
          when(i < size(col("t")) - 2,
            concat_ws(" ", x, element_at(col("t"), i + lit(2)),
              element_at(col("t"), i + lit(3))))),
        _.isNotNull))
      def ngram(fanDocs: Boolean, wideCand: Boolean, lenFilter: Boolean,
          singleIx: Boolean): DataFrame = {
        val p = sc.defaultParallelism
        val raw = D.select(col("doc_id"), col("lang"), toks.as("t"))
          .select(col("doc_id"), col("lang"), shingles.as("ss"),
            size(shingles).as("nsh"))
        val docs = (if (fanDocs) raw.repartition(p, col("doc_id")) else raw)
          .iterCheckpoint()
        val pref = docs
          .select(col("doc_id"), col("lang"), col("nsh"),
            explode(col("ss")).as("sh"))
          .withColumn("df",
            count(lit(1)).over(Window.partitionBy("sh")))
          .groupBy("doc_id", "lang", "nsh")
          .agg(array_sort(collect_list(struct(col("df"), col("sh"))))
            .as("ord"))
          .select(col("doc_id"), col("lang"), col("nsh"),
            posexplode(slice(expr("transform(ord, x -> x.sh)"), lit(1),
              expr("CAST(nsh - ((nsh * 40 + 99) div 100) + 1 AS INT)")))
              .as(Seq("pos", "sh")))
        val lenCond = if (lenFilter)
          col("na") * 5 >= col("nb") * 2 && col("nb") * 5 >= col("na") * 2
          else lit(true)
        val cand0 = pref.select(col("lang"), col("sh"),
            col("doc_id").as("ia"), col("nsh").as("na"),
            col("pos").as("pa"))
          .join(pref.select(col("lang").as("lang_b"), col("sh").as("sh_b"),
              col("doc_id").as("ib"), col("nsh").as("nb"),
              col("pos").as("pb")),
            col("lang") === col("lang_b") && col("sh") === col("sh_b") &&
            col("ia") < col("ib") &&
            least(col("na") - col("pa"), col("nb") - col("pb")) * 7 >=
              (col("na") + col("nb")) * 2 && lenCond)
          .select("ia", "ib").distinct()
        val cand = if (wideCand) cand0.repartition(p, col("ia")) else cand0
        val joined = cand
          .join(docs.select(col("doc_id").as("ia"), col("ss").as("sa"),
            col("nsh").as("na")), "ia")
          .join(docs.select(col("doc_id").as("ib"), col("ss").as("sb"),
            col("nsh").as("nb")), "ib")
        val out = if (singleIx)
          joined.select(col("ia"), col("ib"),
              size(array_intersect(col("sa"), col("sb"))).as("c"),
              col("na"), col("nb"))
            .select(col("ia"), col("ib"),
              (col("c").cast("double") /
                (col("na") + col("nb") - col("c"))).as("jac"))
          else joined.select(col("ia"), col("ib"),
            (size(array_intersect(col("sa"), col("sb"))).cast("double") /
              (col("na") + col("nb") -
                size(array_intersect(col("sa"), col("sb"))))).as("jac"))
        out.where(col("jac") >= 0.4).orderBy("ia", "ib")
      }
      val variants = Seq(
        "A_current" -> (() => ngram(false, false, false, false)),
        "B_wide"    -> (() => ngram(false, true, false, false)),
        "C_wide_six"-> (() => ngram(false, true, true, true)),
        "D_all_fan" -> (() => ngram(true, true, true, true)))
      for ((tag, q) <- variants) noop(q()) // warm
      for (_ <- 1 to 2; (tag, q) <- variants) {
        jobs = 0
        val t0 = System.nanoTime()
        noop(q())
        println(f"$tag%-12s ${(System.nanoTime() - t0) / 1e6}%6.0f ms  jobs $jobs")
      }
      // row-identity check: variants must agree with the declared query
      val base = SparkEntry.queries("dedup_ngram")(spark, d)
      for ((tag, q) <- variants.drop(1)) {
        val diff = base.exceptAll(q()).count() + q().exceptAll(base).count()
        println(s"$tag vs declared: exceptAll diff rows = $diff")
      }
    }

    if (want("jac")) {
      println("== jacPairs(0.9) stages ==")
      val utoks = array_distinct(toks)
      for (rep <- 1 to 2) {
        println(s" pass $rep")
        val docs = time("docs ckpt (tokenize)") {
          D.select(col("doc_id"), col("lang"), col("source"),
            expr("n_chars div 50").as("band"),
            utoks.as("ts"), size(utoks).as("nt"))
            .iterCheckpoint()
        }
        val stream = docs.select(col("doc_id"), col("lang"), col("source"),
          col("band"), col("nt"), explode(col("ts")).as("token"))
        time("stream count")(println("  rows: " + stream.count()))
        val pref = stream.withColumn("df",
            count(lit(1)).over(Window.partitionBy("token")))
          .groupBy("doc_id", "lang", "source", "band", "nt")
          .agg(array_sort(collect_list(struct(col("df"), col("token"))))
            .as("ord"))
          .select(col("doc_id"), col("lang"), col("source"), col("band"),
            explode(slice(expr("transform(ord, x -> x.token)"), lit(1),
              expr(s"CAST(nt - ((nt * 90 + 99) div 100) + 1 AS INT)")))
              .as("token"))
        time("pref -> noop")(noop(pref))
        val ca = pref.select(col("lang"), col("source"), col("band"),
          col("token"), col("doc_id").as("ia"))
        val cb = pref.select(col("lang").as("lang_b"),
          col("source").as("source_b"), col("band").as("band_b"),
          col("token").as("token_b"), col("doc_id").as("ib"))
        val cand = ca.join(cb,
            col("lang") === col("lang_b") && col("source") === col("source_b") &&
            col("band") === col("band_b") && col("token") === col("token_b") &&
            col("ia") < col("ib"))
          .select("ia", "ib").distinct()
        time("cand -> noop")(noop(cand))
        jobs = 0
        time("FULL dedup_near")(noop(
          SparkEntry.queries("dedup_near")(spark, d)))
        println("  full-query jobs: " + jobs)
      }
    }

    // A/B: document frequency via count-over-window (r16 shape; one
    // full-stream shuffle by token + WindowExec buffering, unbounded per
    // hot token) vs groupBy(token).count + join-back (partial map-side
    // agg bounds the agg exchange; AQE broadcasts the tiny df table at
    // this SF so the stream is never shuffled by token at all, and at
    // scale falls back to SMJ with skew split — guide §2.5 / VERDICT
    // r16 item 6).
    if (want("dfjoin")) {
      println("== df attach: window vs groupBy+join ==")
      val utoks = array_distinct(toks)
      def near(dfJoin: Boolean): DataFrame = {
        val thr = 0.9
        val docs = D.select(col("doc_id"), col("lang"), col("source"),
          expr("n_chars div 50").as("band"),
          utoks.as("ts"), size(utoks).as("nt")).iterCheckpoint()
        val stream = docs.select(col("doc_id"), col("lang"), col("source"),
          col("band"), col("nt"), explode(col("ts")).as("token"))
        val withDf =
          if (dfJoin)
            stream.join(stream.groupBy("token")
              .agg(count(lit(1)).as("df")), "token")
          else stream.withColumn("df",
            count(lit(1)).over(Window.partitionBy("token")))
        val pref = withDf
          .groupBy("doc_id", "lang", "source", "band", "nt")
          .agg(array_sort(collect_list(struct(col("df"), col("token"))))
            .as("ord"))
          .select(col("doc_id"), col("lang"), col("source"), col("band"),
            explode(slice(expr("transform(ord, x -> x.token)"), lit(1),
              expr(s"CAST(nt - ((nt * 90 + 99) div 100) + 1 AS INT)")))
              .as("token"))
        val ca = pref.select(col("lang"), col("source"), col("band"),
          col("token"), col("doc_id").as("ia"))
        val cb = pref.select(col("lang").as("lang_b"),
          col("source").as("source_b"), col("band").as("band_b"),
          col("token").as("token_b"), col("doc_id").as("ib"))
        val cand = ca.join(cb,
            col("lang") === col("lang_b") && col("source") === col("source_b") &&
            col("band") === col("band_b") && col("token") === col("token_b") &&
            col("ia") < col("ib"))
          .select("ia", "ib").distinct()
          .transform(Shape.spread(_, col("ia")))
        cand
          .join(docs.select(col("doc_id").as("ia"), col("ts").as("tsa"),
            col("nt").as("na")), "ia")
          .join(docs.select(col("doc_id").as("ib"), col("ts").as("tsb"),
            col("nt").as("nb")), "ib")
          .select(col("ia"), col("ib"),
            (size(array_intersect(col("tsa"), col("tsb"))).cast("double") /
              (col("na") + col("nb") -
                size(array_intersect(col("tsa"), col("tsb"))))).as("jac"))
          .where(col("jac") >= thr)
          .select(col("ia"), col("ib"))
          .repartition(col("ia")).sortWithinPartitions("ia", "ib")
      }
      val shingles = array_distinct(filter(
        transform(col("t"), (x, i) =>
          when(i < size(col("t")) - 2,
            concat_ws(" ", x, element_at(col("t"), i + lit(2)),
              element_at(col("t"), i + lit(3))))),
        _.isNotNull))
      def ngramQ(dfJoin: Boolean): DataFrame = {
        val docs = D.select(col("doc_id"), col("lang"), toks.as("t"))
          .select(col("doc_id"), col("lang"), shingles.as("ss"),
            size(shingles).as("nsh"))
          .iterCheckpoint()
        val stream = docs.select(col("doc_id"), col("lang"), col("nsh"),
          explode(col("ss")).as("sh"))
        val withDf =
          if (dfJoin)
            stream.join(stream.groupBy("sh")
              .agg(count(lit(1)).as("df")), "sh")
          else stream.withColumn("df",
            count(lit(1)).over(Window.partitionBy("sh")))
        val pref = withDf
          .groupBy("doc_id", "lang", "nsh")
          .agg(array_sort(collect_list(struct(col("df"), col("sh"))))
            .as("ord"))
          .select(col("doc_id"), col("lang"), col("nsh"),
            posexplode(slice(expr("transform(ord, x -> x.sh)"), lit(1),
              expr("CAST(nsh - ((nsh * 40 + 99) div 100) + 1 AS INT)")))
              .as(Seq("pos", "sh")))
        val cand = pref.select(col("lang"), col("sh"),
            col("doc_id").as("ia"), col("nsh").as("na"),
            col("pos").as("pa"))
          .join(pref.select(col("lang").as("lang_b"), col("sh").as("sh_b"),
              col("doc_id").as("ib"), col("nsh").as("nb"),
              col("pos").as("pb")),
            col("lang") === col("lang_b") && col("sh") === col("sh_b") &&
            col("ia") < col("ib") &&
            least(col("na") - col("pa"), col("nb") - col("pb")) * 7 >=
              (col("na") + col("nb")) * 2)
          .select("ia", "ib").distinct()
          .transform(Shape.spread(_, col("ia")))
        cand
          .join(docs.select(col("doc_id").as("ia"), col("ss").as("sa"),
            col("nsh").as("na")), "ia")
          .join(docs.select(col("doc_id").as("ib"), col("ss").as("sb"),
            col("nsh").as("nb")), "ib")
          .select(col("ia"), col("ib"),
            (size(array_intersect(col("sa"), col("sb"))).cast("double") /
              (col("na") + col("nb") -
                size(array_intersect(col("sa"), col("sb"))))).as("jac"))
          .where(col("jac") >= 0.4)
          .orderBy("ia", "ib")
      }
      val variants = Seq(
        "near_window" -> (() => near(false)),
        "near_dfjoin" -> (() => near(true)),
        "ngram_window" -> (() => ngramQ(false)),
        "ngram_dfjoin" -> (() => ngramQ(true)))
      for ((tag, q) <- variants) noop(q()) // warm
      for (_ <- 1 to 3; (tag, q) <- variants) {
        jobs = 0
        val t0 = System.nanoTime()
        noop(q())
        println(f"$tag%-13s ${(System.nanoTime() - t0) / 1e6}%6.0f ms  jobs $jobs")
      }
      for ((a, b) <- Seq("near" -> (near(false), near(true)),
          "ngram" -> (ngramQ(false), ngramQ(true)))) {
        val (w, j) = b
        val diff = w.exceptAll(j).count() + j.exceptAll(w).count()
        println(s"$a window vs dfjoin: exceptAll diff rows = $diff")
      }
    }

    // A/B: establish the FINAL presentation range partitioning BEFORE the
    // window/agg (guide §2.4 "ordering the operations so that the
    // partitioning is established once can save a full pass") vs the
    // current hash-exchange-then-range-orderBy (two full-stream
    // exchanges). RangePartitioning(k) satisfies ClusteredDistribution
    // over any superset of k, so the window/agg adds NO exchange, and the
    // trailing sortWithinPartitions over disjoint ranges IS the total
    // order.
    if (want("rangefirst")) {
      println("== range-first vs hash+orderBy ==")
      def E = Tables.t(spark, d, "events")
      def O = Tables.t(spark, d, "orders")
      import graft.Par.{usec, dsumOver, anyNfOver}
      def tsRolling(rangeFirst: Boolean): DataFrame = {
        val ord = Window.partitionBy("event_type")
          .orderBy(col("t"), col("event_id"))
        val w7 = ord.rowsBetween(-6, Window.currentRow)
        val src = E.select(col("event_type"), col("event_id"), col("value"),
          usec(col("ts")).as("t"))
        val base = if (rangeFirst) src.repartitionByRange(col("event_type"))
          else src
        val out = base
          .select(col("event_type"), col("event_id"),
            row_number().over(ord).as("rn"),
            when(anyNfOver(col("value"), w7), lit(Double.NaN))
              .otherwise(expr("percentile(value, 0.5)").over(w7))
              .as("roll_med"),
            min("value").over(w7).as("roll_min"),
            max("value").over(w7).as("roll_max"),
            dsumOver(col("value"), w7).as("roll_sum"))
          .where(col("rn") >= 7)
          .select("event_type", "event_id", "roll_med", "roll_min",
            "roll_max", "roll_sum")
        if (rangeFirst) out.sortWithinPartitions("event_type", "event_id")
        else out.orderBy("event_type", "event_id")
      }
      def winRank(rangeFirst: Boolean): DataFrame = {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val base = if (rangeFirst) O.repartitionByRange(col("o_custkey")) else O
        val out = base
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("bigint").as("rn"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"))
          .where(col("rn") <= 3)
        if (rangeFirst) out.sortWithinPartitions("o_custkey", "rn")
        else out.orderBy("o_custkey", "rn")
      }
      def aggCollect(rangeFirst: Boolean): DataFrame = {
        val base = if (rangeFirst) L.repartitionByRange(col("l_orderkey")) else L
        val out = base.groupBy("l_orderkey")
          .agg(
            array_join(transform(sort_array(collect_list(col("l_linenumber"))),
              _.cast("string")), ",").as("lines"),
            array_join(sort_array(collect_set(col("l_returnflag"))), ",")
              .as("flags"))
        if (rangeFirst) out.sortWithinPartitions("l_orderkey")
        else out.orderBy("l_orderkey")
      }
      val variants = Seq(
        "rolling_hash"  -> (() => tsRolling(false)),
        "rolling_range" -> (() => tsRolling(true)),
        "rank_hash"     -> (() => winRank(false)),
        "rank_range"    -> (() => winRank(true)),
        "collect_hash"  -> (() => aggCollect(false)),
        "collect_range" -> (() => aggCollect(true)))
      for ((tag, q) <- variants) noop(q()) // warm
      for (_ <- 1 to 3; (tag, q) <- variants) {
        jobs = 0
        val t0 = System.nanoTime()
        noop(q())
        println(f"$tag%-14s ${(System.nanoTime() - t0) / 1e6}%6.0f ms  jobs $jobs")
      }
      // shape check: the range variant must have exactly ONE exchange and
      // no extra sort below the window
      for ((tag, q) <- Seq("rolling_range" -> tsRolling(true),
          "rank_range" -> winRank(true), "collect_range" -> aggCollect(true))) {
        val plan = q.queryExecution.executedPlan.toString
        val nEx = "(?<!Broadcast)Exchange ".r.findAllIn(plan).length
        println(s"$tag exchanges=$nEx")
      }
      // row identity incl. ORDER: compare as arrays (zip positions)
      for ((name, a, b) <- Seq(
          ("rolling", tsRolling(false), tsRolling(true)),
          ("rank", winRank(false), winRank(true)),
          ("collect", aggCollect(false), aggCollect(true)))) {
        val xs = a.collect(); val ys = b.collect()
        val same = xs.length == ys.length && xs.zip(ys).forall { case (x, y) => x == y }
        println(s"$name ordered-equal: $same (${xs.length} rows)")
      }
    }

    if (want("cluster")) {
      println("== dedup_cluster rounds ==")
      jobs = 0
      val t0 = System.nanoTime()
      noop(SparkEntry.queries("dedup_cluster")(spark, d)) // warm + observe
      println(f"full: ${(System.nanoTime() - t0) / 1e6}%.0f ms jobs $jobs")
      // instrumented replay
      val pr = time("jacPairs(0.9) ckpt") {
        SparkEntry.queries("dedup_near")(spark, d)
      }
      ()
    }

    // A/B: agg_percentile family — range-partition the stream by
    // (group, bkt) FIRST so the per-bucket counts aggregate and the rank
    // window consume ONE shared exchange (ReusedExchange also collapses
    // the second FileScan); vs the current independent counts-agg +
    // window-hash-exchange subtrees.
    if (want("pctl")) {
      println("== agg_percentile: shared range exchange vs two subtrees ==")
      def pctl(rangeFirst: Boolean): DataFrame = {
        val base0 = L.select(col("l_returnflag"), col("l_quantity"),
          floor(col("l_quantity")).cast("bigint").as("bkt"))
        val base = if (rangeFirst)
          base0.repartitionByRange(col("l_returnflag"), col("bkt"))
        else base0
        val wLoc = Window.partitionBy("l_returnflag", "bkt")
          .orderBy("l_quantity")
        val counts = base.groupBy("l_returnflag", "bkt")
          .agg(count(lit(1)).as("cnt"))
        val wOff = Window.partitionBy("l_returnflag").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = counts.select(col("l_returnflag"), col("bkt"),
          coalesce(sum("cnt").over(wOff), lit(0L)).as("off"),
          sum("cnt").over(Window.partitionBy("l_returnflag")).as("n"))
        def pick(p: Double, v: String): (Column, Column, Column) = {
          val pos = lit(p) * (col("n") - 1).cast("double")
          val lo = floor(pos).cast("bigint") + 1
          val hi = ceil(pos).cast("bigint") + 1
          (max(when(col("rn") === lo, col(v))),
            max(when(col("rn") === hi, col(v))),
            max(pos - floor(pos)))
        }
        val ranked = base
          .withColumn("lrn", row_number().over(wLoc).cast("bigint"))
          .join(broadcast(offs), Seq("l_returnflag", "bkt"))
          .withColumn("rn", col("off") + col("lrn"))
        val (lo50, hi50, f50) = pick(0.5, "l_quantity")
        val (lo25, hi25, f25) = pick(0.25, "l_quantity")
        Shape.presentSort(ranked.groupBy("l_returnflag")
          .agg(lo50.as("lo50"), hi50.as("hi50"), f50.as("f50"),
            lo25.as("lo25"), hi25.as("hi25"), f25.as("f25"),
            count(lit(1)).as("cnt"))
          .select(col("l_returnflag"),
            (col("lo50") + (col("hi50") - col("lo50")) * col("f50"))
              .as("median_qty"),
            (col("lo25") + (col("hi25") - col("lo25")) * col("f25"))
              .as("q1_qty"),
            col("cnt")), col("l_returnflag"))
      }
      for (rf <- Seq(false, true)) noop(pctl(rf)) // warm
      for (rep <- 1 to 3; rf <- Seq(false, true)) {
        jobs = 0
        val t0 = System.nanoTime()
        noop(pctl(rf))
        println(f"rangeFirst=$rf rep$rep ${(System.nanoTime() - t0) / 1e6}%6.0f ms  jobs $jobs")
      }
      for (rf <- Seq(false, true)) {
        val plan = pctl(rf).queryExecution.executedPlan.toString
        val nEx = "(?<!Broadcast)Exchange ".r.findAllIn(plan).length
        val nScan = "FileScan".r.findAllIn(plan).length
        val nReuse = "ReusedExchange".r.findAllIn(plan).length
        println(s"rangeFirst=$rf exchanges=$nEx scans=$nScan reused=$nReuse")
      }
      val a = pctl(false).collect(); val b = pctl(true).collect()
      println(s"ordered-equal: ${a.length == b.length &&
        a.zip(b).forall { case (x, y) => x == y }} (${a.length} rows)")
    }

    // per-key FIRST-execution-minus-steady cost (the diffuse JIT/codegen
    // pass-1 tax): decides which keys earn a slot in Bench's sf0.001 JIT
    // warm list — warming a key costs ~0.4-0.5 s of budget, so only keys
    // whose pass-1 tax exceeds that pay for themselves
    if (want("jitcost")) {
      println("== pass-1 tax per key (first minus min-of-2 steady) ==")
      val skip = Set("scan_parquet", "mm_pipeline", "join_bucketed",
        "dedup_mllsh") // corpus-warmed at sfDir already
      val names = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => !skip(n) }
      val firsts = scala.collection.mutable.Map[String, Double]()
      for ((n, fn) <- names) {
        val t0 = System.nanoTime()
        try noop(fn(spark, d)) catch { case scala.util.control.NonFatal(_) => }
        firsts(n) = (System.nanoTime() - t0) / 1e9
      }
      val steady = scala.collection.mutable.Map[String, Double]()
      for (_ <- 1 to 2; (n, fn) <- names) {
        val t0 = System.nanoTime()
        try noop(fn(spark, d)) catch { case scala.util.control.NonFatal(_) => }
        val t = (System.nanoTime() - t0) / 1e9
        steady(n) = math.min(steady.getOrElse(n, Double.MaxValue), t)
      }
      val taxed = names.map(_._1)
        .map(n => (n, firsts(n) - steady(n), firsts(n), steady(n)))
        .sortBy(-_._2)
      var cum = 0.0
      for ((n, tax, f, s) <- taxed if tax >= 0.15) {
        cum += tax
        println(f"$n%-22s tax $tax%5.2f  first $f%5.2f  steady $s%5.2f  cum $cum%5.1f")
      }
      println(f"total tax all keys: ${taxed.map(_._2).sum}%.1f s; " +
        f">=0.25s keys: ${taxed.count(_._2 >= 0.25)}; " +
        f">=0.4s keys: ${taxed.count(_._2 >= 0.4)}")
    }

    // total job+wall count over the full iterative keys (checkpoint rounds
    // included) — contention-immune shape evidence for the r17 batching
    if (want("iterjobs")) {
      println("== iterative keys: total jobs ==")
      for (k <- Seq("dedup_cluster", "graph_pagerank"))
        noop(SparkEntry.queries(k)(spark, d)) // warm
      for (rep <- 1 to 3; k <- Seq("dedup_cluster", "graph_pagerank")) {
        jobs = 0
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(k)(spark, d))
        println(f"$k%-16s rep$rep ${(System.nanoTime() - t0) / 1e6}%6.0f ms  jobs $jobs")
      }
    }

    if (want("ckpt")) {
      println("== checkpoint partitioning semantics ==")
      val a = L.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n")).iterCheckpoint()
      println("agg ckpt partitions: " + a.rdd.getNumPartitions)
      val b = L.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      println("agg noop-side partitions (after AQE): " + {
        noop(b); b.rdd.getNumPartitions })
      val c = L.select("l_returnflag", "l_orderkey")
        .repartition(col("l_returnflag")).sortWithinPartitions("l_orderkey")
        .where(col("l_orderkey") < 100).iterCheckpoint()
      println("repart-by-col+sort+filter ckpt partitions: " + c.rdd.getNumPartitions)
    }

    if (want("pgr")) {
      println("== graph_pagerank anatomy ==")
      for (rep <- 1 to 2) {
        println(s" pass $rep")
        val pr = time("pr ckpt (jacPairs 0.8)") {
          // exactly the declared pipeline up to the pair checkpoint
          val q = SparkEntry.queries("dedup_near") // warm tables only
          import org.apache.spark.sql.expressions.Window
          val utoks = array_distinct(split(col("text"), " "))
          val docs = D.select(col("doc_id"), col("lang"), col("source"),
            expr("n_chars div 50").as("band"),
            utoks.as("ts"), size(utoks).as("nt"))
            .iterCheckpoint()
          val stream = docs.select(col("doc_id"), col("lang"), col("source"),
            col("band"), col("nt"), explode(col("ts")).as("token"))
          val pref = stream.withColumn("df",
              count(lit(1)).over(Window.partitionBy("token")))
            .groupBy("doc_id", "lang", "source", "band", "nt")
            .agg(array_sort(collect_list(struct(col("df"), col("token"))))
              .as("ord"))
            .select(col("doc_id"), col("lang"), col("source"), col("band"),
              explode(slice(expr("transform(ord, x -> x.token)"), lit(1),
                expr(s"CAST(nt - ((nt * 80 + 99) div 100) + 1 AS INT)")))
                .as("token"))
          val ca = pref.select(col("lang"), col("source"), col("band"),
            col("token"), col("doc_id").as("ia"))
          val cb = pref.select(col("lang").as("lang_b"),
            col("source").as("source_b"), col("band").as("band_b"),
            col("token").as("token_b"), col("doc_id").as("ib"))
          val cand = ca.join(cb,
              col("lang") === col("lang_b") && col("source") === col("source_b") &&
              col("band") === col("band_b") && col("token") === col("token_b") &&
              col("ia") < col("ib"))
            .select("ia", "ib").distinct()
            .transform(Shape.spread(_, col("ia")))
          cand
            .join(docs.select(col("doc_id").as("ia"), col("ts").as("tsa"),
              col("nt").as("na")), "ia")
            .join(docs.select(col("doc_id").as("ib"), col("ts").as("tsb"),
              col("nt").as("nb")), "ib")
            .select(col("ia"), col("ib"),
              (size(array_intersect(col("tsa"), col("tsb"))).cast("double") /
                (col("na") + col("nb") -
                  size(array_intersect(col("tsa"), col("tsb"))))).as("jac"))
            .where(col("jac") >= 0.8)
            .select(col("ia"), col("ib"))
            .repartition(col("ia")).sortWithinPartitions("ia")
            .iterCheckpoint()
        }
        println("  pr partitions: " + pr.rdd.getNumPartitions +
          "  rows: " + pr.count())
        if (rep == 2) println(pr.queryExecution.executedPlan.toString.take(400))
        val edges = pr.union(pr.select(col("ib"), col("ia"))).toDF("a", "b")
        val deg = edges.groupBy("a").agg(count(lit(1)).as("degree"))
        val ed = time("ed ckpt")(edges.join(deg, "a").iterCheckpoint())
        println("  ed partitions: " + ed.rdd.getNumPartitions)
        val nv = time("nv count")(deg.count().toDouble)
        var r = deg.select(col("a").as("node"), lit(1.0 / nv).as("r"))
        for (i <- 1 to 5) {
          r = time(s"round $i ckpt") {
            ed.join(r, col("node") === col("a"))
              .groupBy("b")
              .agg(dsum(col("r") / col("degree")).as("m"))
              .select(col("b").as("node"),
                (lit(0.15 / nv) + lit(0.85) * col("m")).as("r"))
              .iterCheckpoint()
          }
        }
        println("  r partitions: " + r.rdd.getNumPartitions)
        time("present noop")(noop(
          r.select(col("node").as("doc_id"), col("r").as("pagerank"))
            .orderBy("doc_id")))
        jobs = 0
        time("FULL declared")(noop(
          SparkEntry.queries("graph_pagerank")(spark, d)))
        println("  full jobs: " + jobs)
      }
    }

    if (want("kmconv")) {
      println("== kmeans_conv ==")
      for (rep <- 1 to 2) {
        jobs = 0
        val t0 = System.nanoTime()
        noop(SparkEntry.queries("kmeans_conv")(spark, d))
        println(f"rep $rep: ${(System.nanoTime() - t0) / 1e6}%.0f ms jobs $jobs")
      }
    }

    spark.stop()
  }
}
