package graft

import org.apache.spark.sql.functions._

/** Stage-attribution probe for dedup_edit (tooling main, like NgramProbe).
  * The sf30 probe corpus (218k (band, first-8) blocks, max block 2,455
  * docs, 112M blocked candidates for 58k true pairs) runs the key in
  * ~4 min; this decomposes that into candidate generation, the pair
  * DISTINCT, and the Levenshtein verify so the next cut is aimed.
  *
  * Usage: runMain graft.EditProbe [sfDir]
  */
object EditProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-editprobe")
    spark.sparkContext.setLogLevel("ERROR")
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
}
