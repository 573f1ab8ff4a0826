package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the 6 declared keys the driver can only rows-check
  * (their oracles are infeasible in DuckDB — sketches, MLlib hash
  * families, binary listings; SURVEY §8d). Each test bounds the DECLARED
  * query's output against an independently computed exact/ground-truth
  * answer at sf0.001, so "rows-only" never degrades to "unverified"
  * (round-8 verdict item 3). */
class RowsOnlyInvariantSuite extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  test("agg_approx_distinct: HLL estimate within ±5% of exact per group") {
    val approx = run("agg_approx_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (0.05 * n).toLong),
        s"$k: approx=$a exact=$n (>5% off — HLL default rsd is 0.05)")
    }
  }

  test("agg_approx_quantile: each quartile's true rank within ±2%") {
    val rows = run("agg_approx_quantile").collect()
    val prices = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (r <- rows; (q, want) <- Seq(
        r.getDouble(1) -> 0.25, r.getDouble(2) -> 0.5, r.getDouble(3) -> 0.75)) {
      val xs = prices(r.getString(0))
      val rank = xs.count(_ <= q).toDouble / xs.length
      assert(math.abs(rank - want) <= 0.02,
        s"${r.getString(0)}: value $q sits at rank $rank, want $want ± 0.02")
    }
  }

  test("dedup_mllsh: recall floor vs brute-force Jaccard near-dup pairs") {
    val got = run("dedup_mllsh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs ground truth — affordable ONLY at sf0.001 (≈500²/2)
    val shingled = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(1, size(t) - 2),
             i -> concat_ws(' ', t[i-1], t[i], t[i+1])))""").as("sh"))
    val truth = shingled.as("a").crossJoin(shingled.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        (lit(1.0) - size(array_intersect(col("a.sh"), col("b.sh"))) /
          size(array_union(col("a.sh"), col("b.sh")))).as("dist"))
      .where(col("dist") <= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    // every LSH-emitted pair must be a TRUE near-dup (the exact-distance
    // post-filter guarantees precision = 1.0)...
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(5)}")
    // ...and 2-band MinHash over true dist ≤ 0.3 must recall ≥ 90%
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall = ${got.size}/${truth.size} < 0.9")
  }

  test("sim_brp_ann: recall floor vs brute-force euclidean pairs") {
    val got = run("sim_brp_ann")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = Tables.t(spark, sf, "embeddings")
    val probes = vecs.where(col("vec_id") < 20)
    val truth = probes.as("a")
      .select(col("a.vec_id").as("ia"), col("a.embedding").as("ea"))
      .crossJoin(vecs.as("b")
        .select(col("b.vec_id").as("ib"), col("b.embedding").as("eb")))
      .where(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), sqrt(aggregate(
        zip_with(col("ea"), col("eb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)).as("dist"))
      .where(col("dist") <= 1.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "no probe pairs within 1.2 — test is vacuous")
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(5)}")
    val recall = got.size.toDouble / truth.size
    // 3 hyperplane tables at bucketLength 2.0: measured ≥0.9 at sf0.001;
    // a floor (not equality) because the hash family is seeded-random
    assert(recall >= 0.9, s"recall $recall = ${got.size}/${truth.size} < 0.9")
  }

  test("dedup_edit: blocking recall vs brute-force prefix-edit pairs") {
    // dedup_edit is oracled (blocks mirrored in SQL, parity exact), but its
    // two blocking passes — (band±1, chars 1-8) ∪ (band±1, chars 33-40) —
    // are a recall trade vs the UNBLOCKED semantic: all en pairs with
    // levenshtein(40-char lowered prefix) <= 5. Measure that trade against
    // exact all-pairs truth (affordable only at sf0.001, like dedup_mllsh).
    // On the planted sf1 corpus the same measurement (DuckDB, 1-in-4
    // id-block sample) reads 482/482 after the round-14 band±1 widening —
    // the 13 pre-widening misses were ALL band-boundary crossings.
    val got = run("dedup_edit")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.t(spark, sf, "documents")
      .where(col("lang") === "en")
      .select(col("doc_id"), substring(lower(col("text")), 1, 40).as("pfx"))
    val truth = e.as("a")
      .select(col("a.doc_id").as("ia"), col("a.pfx").as("pa"))
      .crossJoin(e.as("b")
        .select(col("b.doc_id").as("ib"), col("b.pfx").as("pb")))
      .where(col("ia") < col("ib") &&
        levenshtein(col("pa"), col("pb")) <= 5)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no edit-near pairs — test is vacuous")
    // the exact-distance post-filter guarantees precision = 1.0...
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(5)}")
    // ...and the two-pass block must recall >= 90% of the unblocked truth
    // (pass 1 alone misses first-8-divergent dups; measured here so the
    // round-13 "recall trade documented" claim carries a number)
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall = ${got.size}/${truth.size} < 0.9")
  }

  test("scan_binary: listing matches an independent directory walk") {
    val got = run("scan_binary")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = new java.io.File(sf).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    assert(got == want,
      s"missing=${(want.keySet -- got.keySet)} extra=${(got.keySet -- want.keySet)}")
  }

  test("scan_blocks: grid and payload sums match the closed-form source") {
    val got = run("scan_blocks").collect()
    assert(got.length == 64)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 8).toInt && r.getInt(2) == (id / 8).toInt)
      assert(r.getLong(3) == 256L * 4)
      val want = (0 until 256)
        .map(i => graft.sources.BlockSource.element(id, i).toDouble).sum
      assert(math.abs(r.getDouble(4) - want) < 1e-9,
        s"block $id payload sum ${r.getDouble(4)} != $want")
    }
  }
}
