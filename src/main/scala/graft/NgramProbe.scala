package graft

import org.apache.spark.sql.functions._

/** Stage-attribution probe for dedup_ngram (tooling main, like
  * FloorProbe/StreamBench — never in a query path). The cap-free
  * prefix-filter rewrite costs ~9 s at sf0.1 vs the old lossy
  * generator's 2.8 s; this decomposes that into its pipeline pieces so
  * the next optimization is aimed, not guessed. Each piece is timed by
  * materializing it with a cheap terminal count after a warm pass.
  *
  * Usage: runMain graft.NgramProbe [sfDir]
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local("graft-ngramprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(name: String)(body: => Long): Unit = {
      body // warm: JIT + shuffle files
      val t0 = System.nanoTime()
      val n = body
      System.out.printf("%-22s %7.2f s  (%d rows)%n",
        name, Double.box((System.nanoTime() - t0) / 1e9), Long.box(n))
    }

    val toks = split(col("text"), " ")
    val shingles = array_distinct(filter(
      transform(col("t"), (x, i) =>
        when(i < size(col("t")) - 2,
          concat_ws(" ", x, element_at(col("t"), i + lit(2)),
            element_at(col("t"), i + lit(3))))),
      _.isNotNull))
    val docsPlan = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("lang"), toks.as("t"))
      .select(col("doc_id"), col("lang"), shingles.as("ss"),
        size(shingles).as("nsh"))

    time("tokenize+shingle") { docsPlan.count() }

    val docs = docsPlan.localCheckpoint()
    val dfreq = docs.select(explode(col("ss")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    time("dfreq groupBy") { dfreq.count() }

    val pref = docs
      .select(col("doc_id"), col("lang"), col("nsh"),
        explode(col("ss")).as("sh"))
      .join(dfreq, "sh")
      .groupBy("doc_id", "lang", "nsh")
      .agg(array_sort(collect_list(struct(col("df"), col("sh"))))
        .as("ord"))
      .select(col("doc_id"), col("lang"),
        explode(slice(expr("transform(ord, x -> x.sh)"), lit(1),
          expr("CAST(nsh - ((nsh * 40 + 99) div 100) + 1 AS INT)")))
          .as("sh"))
    time("df-join+sort+prefix") { pref.count() }

    val prefC = pref.localCheckpoint()
    val cand = prefC.select(col("lang"), col("sh"), col("doc_id").as("ia"))
      .join(prefC.select(col("lang").as("lang_b"),
          col("sh").as("sh_b"), col("doc_id").as("ib")),
        col("lang") === col("lang_b") && col("sh") === col("sh_b") &&
        col("ia") < col("ib"))
      .select("ia", "ib").distinct()
    time("prefix self-join") { cand.count() }

    val candC = cand.localCheckpoint()
    val verified = candC
      .join(docs.select(col("doc_id").as("ia"), col("ss").as("sa"),
        col("nsh").as("na")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("ss").as("sb"),
        col("nsh").as("nb")), "ib")
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          (col("na") + col("nb") -
            size(array_intersect(col("sa"), col("sb"))))).as("jac"))
      .where(col("jac") >= 0.4)
    time("verify joins") { verified.count() }

    spark.stop()
  }
}
