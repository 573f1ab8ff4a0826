package graft

import org.apache.spark.sql.functions._

/** Stage-attribution probe for dedup_edit (tooling main, like NgramProbe).
  * The sf30 probe corpus (218k (band, first-8) blocks, max block 2,455
  * docs, 112M blocked candidates for 58k true pairs) runs the key in
  * ~4 min; this decomposes that into candidate generation, the pair
  * DISTINCT, and the Levenshtein verify so the next cut is aimed.
  *
  * Usage: runMain graft.EditProbe [sfDir]
  *        runMain graft.EditProbe recall [sfDir]   — blocking recall vs a
  *          brute-force band±1 truth set (the declared band scope, NO
  *          prefix blocks): every missed pair is printed with its edit
  *          positions, so the "straddle gap" (edits hitting BOTH chars
  *          1-8 and 33-40 of the prefix) is measured, not assumed.
  */
object EditProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-editprobe")
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("recall")) {
      recall(spark, args.drop(1).headOption.getOrElse("/root/testdata/sf0.1"))
      spark.stop(); return
    }
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      System.out.printf("%-22s %7.2f s  (%d rows)%n",
        name, Double.box((System.nanoTime() - t0) / 1e9), Long.box(n))
    }

    val ePlan = Tables.t(spark, d, "documents")
      .where(col("lang") === "en").select(
        col("doc_id"), expr("n_chars div 100").as("band"),
        substring(lower(col("text")), 1, 40).as("pfx"))
      .withColumn("blk1", substring(col("pfx"), 1, 8))
      .withColumn("blk2", when(length(col("pfx")) === 40,
        substring(col("pfx"), 33, 8)))
    time("e build") { ePlan.count() }
    val e = ePlan.localCheckpoint()

    def pass(blk: String) = {
      val a = e.select(explode(array(col("band") - 1, col("band"),
        col("band") + 1)).as("bandx"), col(blk).as("blk"),
        col("doc_id").as("ia"))
      val b = e.select(col("band").as("band_b"), col(blk).as("blk_b"),
        col("doc_id").as("ib"))
      a.join(b, col("bandx") === col("band_b") &&
          col("blk") === col("blk_b") && col("ia") < col("ib"))
        .select("ia", "ib")
    }
    time("pass joins (enum)") { pass("blk1").union(pass("blk2")).count() }

    val cand = pass("blk1").union(pass("blk2")).distinct()
    time("+ distinct") { cand.count() }

    val candC = cand.localCheckpoint()
    time("rejoin + levenshtein") {
      candC
        .join(e.select(col("doc_id").as("ia"), col("pfx").as("pa")), "ia")
        .join(e.select(col("doc_id").as("ib"), col("pfx").as("pb")), "ib")
        .select(col("ia"), col("ib"),
          levenshtein(col("pa"), col("pb")).cast("bigint").as("dist"))
        .where(col("dist") <= 5)
        .count()
    }
    spark.stop()
  }

  /** Blocking recall of dedup_edit vs brute force over its DECLARED band
    * scope: truth = all en pairs with band gap ≤ 1 and prefix edit
    * distance ≤ 5, enumerated with NO prefix blocks (a salted band join —
    * bands are few, so the salt spreads one band's quadratic pair set
    * across the cluster; the thresholded levenshtein's length early-exit
    * discards the bulk in O(1)). Missed = truth pairs absent from the
    * shipped two-block result. Drives the add-a-third-block decision:
    * a middle-8 block is only worth its candidate volume if misses exist
    * on real data, not just on an adversarial fixture. */
  private def recall(spark: org.apache.spark.sql.SparkSession,
      d: String): Unit = {
    val e = Tables.t(spark, d, "documents")
      .where(col("lang") === "en").select(
        col("doc_id"), expr("n_chars div 100").as("band"),
        substring(lower(col("text")), 1, 40).as("pfx"))
      .localCheckpoint()
    val nSalt = 32
    val a = e.select(explode(array(col("band") - 1, col("band"),
        col("band") + 1)).as("bandx"),
      pmod(col("doc_id"), lit(nSalt)).as("salt"),
      col("doc_id").as("ia"), col("pfx").as("pa"))
    val b = e.select(col("band").as("band_b"),
        explode(sequence(lit(0), lit(nSalt - 1))).as("salt_b"),
        col("doc_id").as("ib"), col("pfx").as("pb"))
    val truth = a.join(b, col("bandx") === col("band_b") &&
        col("salt") === col("salt_b") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        levenshtein(col("pa"), col("pb"), 5).as("dist"))
      .where(col("dist") >= 0)
      .select("ia", "ib").distinct().localCheckpoint()
    val got = SparkEntry.queries("dedup_edit")(spark, d)
      .select("ia", "ib").localCheckpoint()
    val nTruth = truth.count()
    val missed = truth.except(got)
    val miss = missed.join(
        e.select(col("doc_id").as("ia"), col("pfx").as("pa")), "ia")
      .join(e.select(col("doc_id").as("ib"), col("pfx").as("pb")), "ib")
      .collect()
    System.out.printf("truth(band±1, dist≤5)=%d  blocked_hits=%d  missed=%d" +
      "  recall=%.4f%n", Long.box(nTruth), Long.box(nTruth - miss.length),
      Long.box(miss.length.toLong),
      Double.box(if (nTruth == 0) 1.0 else (nTruth - miss.length).toDouble / nTruth))
    miss.foreach { r =>
      val (pa, pb) = (r.getAs[String]("pa"), r.getAs[String]("pb"))
      val headEdit = pa.take(8) != pb.take(8)
      val tailEdit = pa.slice(32, 40) != pb.slice(32, 40)
      System.out.printf("MISS ia=%d ib=%d headEdit=%b tailEdit=%b%n  %s%n  %s%n",
        Long.box(r.getAs[Long]("ia")), Long.box(r.getAs[Long]("ib")),
        Boolean.box(headEdit), Boolean.box(tailEdit), pa, pb)
    }
  }
}
