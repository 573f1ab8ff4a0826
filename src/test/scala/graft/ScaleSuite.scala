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
}
