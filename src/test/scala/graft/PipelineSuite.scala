package graft

import org.apache.spark.sql.functions._

/** Property checks for the round-3 operators: training-data pipeline ops,
  * scalar cast/hash/struct/map families, multiset set ops, resampling,
  * rolling stats, and the near-dup graph analytics. */
class PipelineSuite extends SparkSpec {

  test("text_chunk: chunks reassemble to the original token stream") {
    val docs = Tables.t(spark, sf, "documents")
    val chunks = SparkEntry.queries("text_chunk")(spark, sf)
    // stride 30 < size 40: dropping the 10-token overlap from every chunk
    // after the first reassembles the document exactly
    val rebuilt = chunks
      .withColumn("tail", when(col("chunk_idx") === 0, col("chunk_text"))
        .otherwise(expr("array_join(slice(split(chunk_text, ' '), 11, 100), ' ')")))
      // a last chunk shorter than the overlap is wholly contained in the
      // previous one — its tail is empty and contributes nothing
      .where(length(col("tail")) > 0)
      .groupBy("doc_id")
      .agg(expr("array_join(sort_array(collect_list(struct(chunk_idx, tail))).tail, ' ')")
        .as("whole"))
    // compare against documents.text
    val joined = rebuilt.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .where(col("whole") =!= col("text"))
    assert(joined.isEmpty, "chunk reassembly mismatch")
    // every chunk except a document's last has exactly ChunkSize tokens or
    // the doc is shorter than one chunk
    val bad = chunks.where(col("chunk_tokens") > 40 || col("chunk_tokens") < 1)
    assert(bad.isEmpty)
  }

  test("filter_c4: pass == conjunction of the rule bits") {
    val f = SparkEntry.queries("filter_c4")(spark, sf)
    assert(f.where(col("pass") =!=
      (col("ok_len") && col("ok_mean") && col("ok_rep"))).isEmpty)
    // the gate must actually split the corpus (thresholds are data-informed)
    val n = f.count(); val p = f.where(col("pass")).count()
    assert(p > 0 && p < n, s"degenerate gate: $p of $n pass")
  }

  test("text_pii: every injected contact string is found and scrubbed") {
    val p = SparkEntry.queries("text_pii")(spark, sf)
    assert(p.where(col("n_emails") =!= 1 || col("n_phones") =!= 1).isEmpty)
    assert(p.where(col("redacted").contains("@") ||
      col("redacted").rlike("555-[0-9]{4}")).isEmpty)
  }

  test("text_html: stripping removes exactly the injected markup") {
    val h = SparkEntry.queries("text_html")(spark, sf)
    assert(h.where(col("stripped").contains("<")).isEmpty)
    // every page carries at least the <html><p></p></html> wrapper
    assert(h.where(col("n_tags") < 4).isEmpty)
  }

  test("text_normalize: canonical form matches lower(text) + ' end'") {
    val n = SparkEntry.queries("text_normalize")(spark, sf)
    assert(n.where(!col("roundtrip_ok")).isEmpty)
  }

  test("graph_triangles: degrees sum to 2|E| and triangle counts sum to 3T") {
    val g = SparkEntry.queries("graph_triangles")(spark, sf)
    val degSum = g.agg(sum("degree")).head.getLong(0)
    val triSum = g.agg(sum("n_triangles")).head.getLong(0)
    assert(degSum % 2 == 0, "odd degree sum")
    assert(triSum % 3 == 0, "per-node triangle counts must sum to 3T")
  }

  test("set ops: multiset identities hold") {
    val li = Tables.t(spark, sf, "lineitem")
    val except = SparkEntry.queries("set_except_all")(spark, sf)
    val inter = SparkEntry.queries("set_intersect_all")(spark, sf)
    // INTERSECT ALL of A with its subset B has exactly |B| rows
    val nInter = inter.agg(sum("n")).head.getLong(0)
    assert(nInter == li.where(col("l_quantity") > 25).count())
    // EXCEPT ALL multiplicities are positive
    assert(except.where(col("n") <= 0).isEmpty)
  }

  test("ts_resample: interpolated values lie within the per-user value range") {
    val r = SparkEntry.queries("ts_resample")(spark, sf)
    val ev = Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
    val out = r.join(ev, "user_id")
      .where(col("v_interp") < col("lo") || col("v_interp") > col("hi"))
    assert(out.isEmpty, "linear interpolation escaped the value envelope")
  }

  test("ts_rolling: median lies between rolling min and max; sum bounded") {
    val r = SparkEntry.queries("ts_rolling")(spark, sf)
    assert(r.where(col("roll_med") < col("roll_min") ||
      col("roll_med") > col("roll_max")).isEmpty)
    assert(r.where(col("roll_sum") < col("roll_min") * 7 - 1e-9 ||
      col("roll_sum") > col("roll_max") * 7 + 1e-9).isEmpty)
  }

  test("agg_bitmap: bit_count of the mask equals the exact slot count") {
    val b = SparkEntry.queries("agg_bitmap")(spark, sf)
    assert(b.where(col("n_slots") =!= col("n_exact")).isEmpty,
      "int64 bitmap must be exact at <=64 slots")
  }

  test("dedup_lsh: verified pairs are oriented, unique, and jac-bounded") {
    val p = SparkEntry.queries("dedup_lsh")(spark, sf)
    assert(p.where(col("ia") >= col("ib")).isEmpty)
    assert(p.where(col("jac") < 0.4 || col("jac") > 1.0).isEmpty)
    assert(p.count() == p.select("ia", "ib").distinct().count())
  }

  test("scan_text_rt: round-trip preserves every document") {
    val t = SparkEntry.queries("scan_text_rt")(spark, sf)
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    assert(t.exceptAll(docs).isEmpty && docs.exceptAll(t).isEmpty)
  }

  test("fn_hash: md5/sha256 have canonical widths and are hex") {
    val h = SparkEntry.queries("fn_hash")(spark, sf)
    assert(h.where(length(col("h_md5")) =!= 32 ||
      length(col("h_sha256")) =!= 64).isEmpty)
    assert(h.where(!col("h_md5").rlike("^[0-9a-f]{32}$")).isEmpty)
  }

  test("fn_cast: overflow try_cast nulls out, roundtrips are exact") {
    val c = SparkEntry.queries("fn_cast")(spark, sf)
    // ×1e15 overflows int64 once o_totalprice > ~9223.37; below that the
    // product is an integral double (≥2^53) both engines convert identically
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    assert(c.join(o, "o_orderkey")
      .where(col("o_totalprice") > 9224 && col("overflow_null").isNotNull)
      .isEmpty)
    assert(c.where(col("key_rt") =!= col("o_orderkey")).isEmpty)
  }
}
