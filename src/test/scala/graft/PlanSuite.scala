package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan assertions: the properties that make these operators
  * survive a 100 TB scale-up (pushdown, pruning, broadcast vs shuffle,
  * shuffle counts) — checked on the actual executed plans, not by eye. */
class PlanSuite extends SparkSpec {

  private def planOf(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def formatted(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    planOf(df) match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def countShuffles(df: DataFrame): Int = {
    df.collect()
    var n = 0
    def walk(p: SparkPlan): Unit = {
      if (p.isInstanceOf[ShuffleExchangeLike]) n += 1
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
    }
    walk(planOf(df))
    n
  }

  test("no declared window runs with an empty partition spec (WARN-spam guard)") {
    // round-7 fix: the two deliberate single-partition windows partition by
    // a constant — same plan, but an EMPTY spec makes WindowExec WARN once
    // per task, and that spam buried the round-6 bench line. Guard both.
    import org.apache.spark.sql.execution.window.WindowExec
    for (key <- Seq("win_range_frame", "win_ntile_pct")) {
      val df = SparkEntry.queries(key)(spark, sf)
      df.collect()
      var found = 0
      def walk(p: SparkPlan): Unit = {
        p match {
          case w: WindowExec =>
            found += 1
            assert(w.partitionSpec.nonEmpty,
              s"$key: WindowExec with empty partition spec")
          case _ =>
        }
        p.children.foreach(walk)
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          // AQE wraps materialized stages; their plans are NOT children
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
      }
      walk(planOf(df))
      assert(found >= 1, s"$key: no WindowExec in plan")
    }
  }

  test("scan_pruned pushes the predicate and prunes columns at the scan") {
    val plan = SparkEntry.queries("scan_pruned")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_quantity,45.0)]"), s"no pushdown in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_linenumber:int,l_quantity:double>"), s"no pruning in:\n$plan")
  }

  test("events ts-range filters reach the parquet scan on the µs vintage") {
    // On the timestamp[us] testdata vintage the loader's ts rewrite is a
    // no-op cast that SimplifyCasts removes, so a time-range predicate
    // pushes down to the parquet scan (row-group pruning at 100 TB). The
    // old TIMESTAMP(NANOS)-as-BIGINT vintage structurally cannot push
    // (the filter sits above a conversion expression) — skip there.
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.LongType
    val raw = spark.read.parquet(s"$sf/events.parquet")
    assume(raw.schema("ts").dataType != LongType,
      "nanos-as-long vintage: ts pushdown is not expressible")
    val plan = Tables.t(spark, sf, "events")
      .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
      .select("event_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), " +
      "GreaterThanOrEqual(ts,"), s"ts filter not pushed in:\n${plan.take(2000)}")
  }

  test("no events-family query plans a cartesian product") {
    // The whole family re-verified after the round-11 vintage dispatch:
    // every join must stay equi/banded (BNLJ appears ONLY as the 1-row
    // scalar-broadcast pattern in ts_late/ts_gap_fill/ts_funnel, which is
    // a narrow per-partition filter at any scale — never a pair explosion).
    val keys = Seq("ts_tumbling", "ts_sliding", "ts_session", "ts_late",
      "ts_anomaly", "ts_gap_fill", "ts_holt", "ts_ewma", "ts_funnel",
      "ts_cohort", "ts_resample", "ts_backfill", "ts_rolling",
      "win_lag_lead", "join_asof", "join_asof_fwd", "join_theta_range",
      "agg_pivot", "agg_bitmap", "agg_approx_distinct", "fn_json",
      "fn_map2", "fn_xml", "scan_partitioned")
    keys.foreach { k =>
      val plan = planOf(SparkEntry.queries(k)(spark, sf)).toString
      assert(!plan.contains("CartesianProduct"),
        s"$k plans a cartesian:\n${plan.take(1500)}")
    }
    // round-12: the gap-fill spine's event-type dimension carries an
    // explicit broadcast() hint — the plan is a BroadcastNestedLoopJoin by
    // construction at ANY scale, not by AQE's runtime stats estimate.
    val gp = formatted(SparkEntry.queries("ts_gap_fill")(spark, sf))
    assert(gp.contains("BroadcastNestedLoopJoin"),
      s"ts_gap_fill spine crossJoin is not broadcast:\n${gp.take(1500)}")
  }

  test("round-11 plan consolidations hold (single-scan / bounded-shuffle shapes)") {
    def shape(key: String): (Int, Int) = {
      val plan = planOf(SparkEntry.queries(key)(spark, sf)).toString
      ("Exchange".r.findAllIn(plan).size, "FileScan".r.findAllIn(plan).size)
    }
    // ts_funnel: ONE per-user groupBy carries the whole stage fold
    val (fEx, fSc) = shape("ts_funnel")
    assert(fSc == 1, s"ts_funnel re-scans events ($fSc scans)")
    assert(fEx <= 3, s"ts_funnel regressed to multi-join shape ($fEx exchanges)")
    // ts_cohort: first-seen week rides a window, not a groupBy+self-join
    val (cEx, cSc) = shape("ts_cohort")
    assert(cSc == 1, s"ts_cohort re-scans events ($cSc scans)")
    assert(cEx <= 4, s"ts_cohort regressed ($cEx exchanges)")
    // text_tfidf: df derives from materialized tf — one corpus pass total
    // (the one remaining FileScan is nSrc's cheap source-column scan)
    val (_, tSc) = shape("text_tfidf")
    assert(tSc <= 1, s"text_tfidf re-tokenizes the corpus ($tSc scans)")
    // text_collocation: uni/bigram counts materialize once (no scans in
    // the final plan — the corpus passes happen at checkpoint time)
    val (_, colSc) = shape("text_collocation")
    assert(colSc == 0, s"text_collocation re-derives its counts ($colSc scans)")
    // kmeans_iter: the point set is cached, not re-read per Lloyd round
    val kmPlan = planOf(SparkEntry.queries("kmeans_iter")(spark, sf)).toString
    assert(kmPlan.contains("InMemoryTableScan"),
      "kmeans_iter no longer iterates over the cached point set")
  }

  test("join_bcast broadcasts both dimension tables (no fact shuffle for the join)") {
    val plan = formatted(SparkEntry.queries("join_bcast")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("join_smj keeps the fact-fact join as sort-merge (the 100 TB plan)") {
    val plan = formatted(SparkEntry.queries("join_smj")(spark, sf))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("map_increment is a pure narrow map — zero shuffles before the sort") {
    // only the presentation ORDER BY may shuffle (range partitioning)
    val n = countShuffles(SparkEntry.queries("map_increment")(spark, sf))
    assert(n <= 1, s"expected <=1 shuffle (final sort), got $n")
  }

  test("agg_group aggregates with partial+final hash agg and one data shuffle") {
    val df = SparkEntry.queries("agg_group")(spark, sf)
    val plan = formatted(df)
    assert(plan.contains("HashAggregate"), plan.take(2000))
    // one shuffle for the groupBy, one for the tiny final orderBy
    assert(countShuffles(df) <= 2)
  }

  test("whole-stage codegen covers the flagship aggregation") {
    // codegen stages print as "*(n) " prefixes in the executed plan
    val plan = formatted(SparkEntry.entry(spark))
    assert(plan.contains("*(1)"), plan.take(2000))
  }

  test("sim_cosine_expr keeps the custom expression in a codegen stage") {
    val df = SparkEntry.queries("sim_cosine_expr")(spark, sf)
    val plan = formatted(df)
    assert(plan.contains("cosine_sim"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("FuseVectorFolds rewrites the HOF dot fold into dot_product") {
    val df = SparkEntry.queries("sim_cosine_topk")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"),
      s"fold not fused:\n${optimized.take(2000)}")
    assert(!optimized.contains("zip_with"),
      s"zip_with survived fusion:\n${optimized.take(2000)}")
  }

  test("join_theta_range banding joins on equi keys (hash/SMJ, never BNLJ)") {
    val plan = formatted(SparkEntry.queries("join_theta_range")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("scan_partitioned prunes partitions at the scan") {
    val plan = formatted(SparkEntry.queries("scan_partitioned")(spark, sf))
    assert(plan.contains("PartitionFilters"), plan.take(3000))
    // the IN-filter on the partition column must reach the scan, not a Filter node
    assert(plan.contains("event_type#") || plan.contains("PartitionFilters: ["),
      plan.take(3000))
  }

  test("dedup_edit blocking joins on equi keys (hash/SMJ, never a cartesian)") {
    val plan = formatted(SparkEntry.queries("dedup_edit")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dedup_near keeps the prefix-filter formulation (no all-token pairs)") {
    // the round-13 AllPairs/PPJoin shape: a `slice` builds the rarest-token
    // prefix that feeds the candidate equi-join, and `array_intersect`
    // verifies exact Jaccard on candidates only. If either disappears the
    // formulation has regressed to a per-shared-token candidate generator —
    // the Σ C(df,2) blowup measured at 27.7 s/query at sf1.
    val plan = formatted(SparkEntry.queries("dedup_near")(spark, sf))
    assert(plan.contains("slice"), plan.take(3000))
    assert(plan.contains("array_intersect"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dedup_ngram keeps the shingle prefix-filter formulation (no df cap)") {
    // round-14 shape: rarest-shingle prefix (`slice`) feeds the candidate
    // equi-join, `array_intersect` verifies exact Jaccard on candidates
    // only. The pre-14 absolute df<=20 prune is gone — recall must not be
    // a function of corpus size (hot-shingle pairs stay visible).
    val plan = formatted(SparkEntry.queries("dedup_ngram")(spark, sf))
    assert(plan.contains("slice"), plan.take(3000))
    assert(plan.contains("array_intersect"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("sql_subquery is decorrelated into a join (no per-row subquery)") {
    val df = SparkEntry.queries("sql_subquery")(spark, sf)
    val plan = formatted(df)
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("text pipeline ops are narrow maps — only the presentation sort shuffles") {
    for (k <- Seq("text_pii", "text_html", "text_normalize", "text_repetition",
        "filter_c4")) {
      val n = countShuffles(SparkEntry.queries(k)(spark, sf))
      assert(n <= 1, s"$k: expected <=1 shuffle (final sort), got $n")
    }
    // chunking adds the explode but stays narrow too
    val n = countShuffles(SparkEntry.queries("text_chunk")(spark, sf))
    assert(n <= 1, s"text_chunk: expected <=1 shuffle, got $n")
  }

  test("scan_range generates in parallel with no shuffle before the sort") {
    val n = countShuffles(SparkEntry.queries("scan_range")(spark, sf))
    assert(n <= 1, s"expected <=1 shuffle, got $n")
  }

  test("join_bucketed runs with ZERO shuffle exchanges") {
    val df = SparkEntry.queries("join_bucketed")(spark, sf)
    // builder writes the bucketed tables, then the join+agg reuse buckets;
    // only the tiny presentation ORDER BY may exchange
    assert(countShuffles(df) <= 1,
      formatted(df).take(3000))
  }

  test("exact percentiles stay rank-based and bucketed (no buffering aggregate)") {
    // Tripwire for the round-5/6 rewrite: Spark's `percentile` /
    // `percentile_disc` aggregates buffer every group value in one reducer
    // (ObjectHashAggregate over a TypedImperativeAggregate) — the 100 TB
    // OOM. And the rank must come from a (group, value-bucket) window, not
    // a per-group-only window whose parallelism is the group count (3).
    for (k <- Seq("agg_percentile", "agg_percentile_disc")) {
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!plan.contains("ObjectHashAggregate"),
        s"$k buffers values in a TypedImperativeAggregate:\n${plan.take(2000)}")
      assert(!plan.contains("percentile"),
        s"$k uses the buffering percentile aggregate:\n${plan.take(2000)}")
      assert(plan.contains("Window"), s"$k lost the rank window:\n${plan.take(2000)}")
      assert(plan.contains("bkt#"),
        s"$k's rank window is not value-bucketed:\n${plan.take(2000)}")
    }
  }

  test("runtime bloom filter is injected on the probe side of a selective join") {
    // At 100 TB the shuffle join's probe side should be pre-pruned by a
    // bloom filter built from the selective build side (InjectRuntimeFilter
    // — Spark's own runtime semi-join reduction). Thresholds are production
    // defaults (10 GB probe-side scan) so the sf-sized fixture needs them
    // lowered to trip the same code path.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "128MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(0, 200000)
        .select(col("id").as("fk"), (col("id") % 1000).as("v"))
      val dim = spark.range(0, 10000)
        .select(col("id").as("dk"), (col("id") % 50).as("cat"))
        .where(col("cat") === 7) // selective build side
      val joined = fact.join(dim, col("fk") === col("dk"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
        s"runtime bloom filter not injected:\n${optimized.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("AQE splits a skewed fact-fact sort-merge join (OptimizeSkewedJoin)") {
    // The 100× story for fact-fact joins leans on AQE's runtime re-plan:
    // manual salting (agg_salted) covers aggregation skew, but join skew is
    // AQE's job. Thresholds are lowered so the sf-sized fixture trips the
    // same code path a 100 TB skewed key would.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32kb")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16kb")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 95% of the left rows share key 0 → one reducer partition dwarfs the
      // rest → AQE must mark the SMJ skew=true and split the skewed side.
      // The payload column must (a) survive column pruning — it feeds the
      // final aggregate — and (b) be incompressible (md5 hex), otherwise the
      // skewed partition is a constant-key run that LZ4 squeezes below the
      // 32kb threshold and OptimizeSkewedJoin never fires (seen live).
      val left = spark.range(0, 120000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          md5(concat(col("id").cast("string"), lit("payload"))).as("lv"))
      val right = spark.range(0, 20000)
        .select((col("id") % 4000).as("k"), col("id").as("rv"))
      // NB: aggregate on a key OTHER than the join key — a downstream agg on
      // the join key would let the SMJ output partitioning satisfy it, and
      // AQE then refuses to split skew (it would add an exchange).
      val joined = left.join(right, "k")
        .groupBy(pmod(col("rv"), lit(16)).as("g"))
        .agg(count(lit(1)).as("n"), max(col("lv")).as("m"))
      val plan = formatted(joined)
      assert(plan.contains("skew=true") || plan.contains("isSkew") ||
        plan.contains("skewed"),
        s"OptimizeSkewedJoin did not engage:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("round-13 extras keep their intended shapes (backfill/span/decontaminate/pagerank)") {
    // ts_backfill: one corpus scan; shuffles = the user_id window pair
    // (dedup on (user_id,t), intervals on user_id) + presentation sort.
    val bf = SparkEntry.queries("ts_backfill")(spark, sf)
    val bfPlan = formatted(bf)
    assert("FileScan".r.findAllIn(bfPlan).size == 1,
      s"ts_backfill re-scans events:\n${bfPlan.take(2000)}")
    assert(countShuffles(bf) <= 3,
      s"ts_backfill grew shuffles: ${countShuffles(bf)}")
    // dedup_span: the span inventory materializes ONCE (checkpoint) — the
    // final plan joins two reads of it with NO corpus re-scan.
    val span = SparkEntry.queries("dedup_span")(spark, sf)
    val spanPlan = formatted(span)
    assert(!spanPlan.contains("CartesianProduct"), spanPlan.take(2000))
    assert("FileScan".r.findAllIn(spanPlan).size == 0,
      s"dedup_span re-tokenizes the corpus:\n${spanPlan.take(2000)}")
    // text_decontaminate: the held-out probe side is broadcast BY HINT —
    // the corpus side must never shuffle on the 32-byte shingle hash.
    val dc = SparkEntry.queries("text_decontaminate")(spark, sf)
    val dcPlan = formatted(dc)
    assert(dcPlan.contains("BroadcastHashJoin"),
      s"text_decontaminate probe side is not broadcast:\n${dcPlan.take(2000)}")
    assert(!dcPlan.contains("SortMergeJoin"),
      s"text_decontaminate shuffles the corpus on h:\n${dcPlan.take(2000)}")
    // graph_pagerank: per-iteration work (join(ranks)+agg, one shuffle)
    // happens behind iterCheckpoint — the FINAL plan must be only the
    // presentation pass over the checkpointed ranks: no joins survive.
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
    val prPlan = formatted(pr)
    assert(!prPlan.contains("CartesianProduct"), prPlan.take(2000))
    assert(!prPlan.contains("Join"),
      s"graph_pagerank final plan re-derives iteration joins:\n${prPlan.take(2000)}")
    assert(countShuffles(pr) <= 1,
      s"graph_pagerank presentation pass grew shuffles: ${countShuffles(pr)}")
  }

  test("kmeans_conv round: point data never shuffles, probe rides the agg") {
    // One convergence-loop round over a materialized assignment (r17
    // shape, VERDICT r16 item 4). The round's ONLY shuffle is the K-row
    // snapshot aggregate — which carries BOTH the centroid recompute and
    // the changed-assignment count, so there is no separate probe pass —
    // and the literal-centroid re-assignment must stay a pure narrow
    // projection (zero shuffles, no broadcast). A reintroduced per-round
    // join with the point set or a split-out probe would jump these.
    import graft.operators.ML
    import graft.Par.IterCheckpoint
    import org.apache.spark.sql.functions.{col, lit}
    val assigned = ML.kmC0(ML.kmPts(spark, sf)).select(
        col("cid").as("vec_id"), col("ce").as("e"), col("cid"))
      .withColumn("prev_cid", lit(-1L)).iterCheckpoint()
    val snapPlan = ML.kmSnapAgg(assigned)
    assert(countShuffles(snapPlan) <= 1,
      s"kmeans_conv snapshot agg grew shuffles: ${countShuffles(snapPlan)}")
    val snap = snapPlan.take(8)
    val round = ML.kmReassignLit(assigned, snap)
    assert(countShuffles(round) == 0,
      s"kmeans_conv re-assignment is no longer narrow: ${countShuffles(round)}")
    assert(!round.queryExecution.executedPlan.toString.contains("Broadcast"),
      "kmeans_conv re-assignment reintroduced a broadcast")
  }
}
