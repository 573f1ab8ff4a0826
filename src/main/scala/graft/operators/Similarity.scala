package graft.operators

import graft.{Q, Tables}
import graft.Shape.presentSort
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.9).
  *
  * Scale notes (100 TB design): the declared queries are brute-force
  * probe-set × corpus — correct and exact, with the probe set capped so the
  * cross join is (probes × corpus), never corpus². The corpus side streams
  * (narrow scan, no shuffle); probes are broadcast. The approximate scale
  * path — BucketedRandomProjectionLSH / MinHashLSH bucketing so candidates
  * are bucket-local — is exercised in MLSuite; an IVF-style coarse-centroid
  * variant is `sim_ivf_topk` below (bucket by nearest of K coarse centroids,
  * search only the probe's bucket — the shuffle is by bucket id, and each
  * probe compares against ~1/K of the corpus).
  */
object Similarity {

  private def V(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")
  private def D(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  private val PROBES = 20
  private val K = 5

  /** probe×corpus cosine top-K, shared by sim_cosine_topk / sim_knn_label.
    * Norms are precomputed per side before the join (narrow maps), so the
    * join evaluates one 64-dim fold per pair instead of three. */
  private def topk(s: SparkSession, d: String): DataFrame = {
    val v = V(s, d)
    val probes = v.where(col("vec_id") < PROBES)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"),
        sqrt(norm2(col("embedding"))).as("pn"))
    val corpus = v.select(col("vec_id").as("vid"),
      col("embedding").as("vemb"), col("label"),
      sqrt(norm2(col("embedding"))).as("vn"))
    // NULL cos (zero-norm side) ranks LAST — explicitly pinned on both
    // engines — and is filtered AFTER the rank: a pre-rank filter on cos
    // gets pushed into the join condition by Catalyst, re-evaluating the
    // dot fold per candidate pair (seen in EXPLAIN.md). Post-rank the
    // filter cannot cross the Window, non-null rows keep ranks 1..m
    // (row_number with nulls-last), so results are identical and the
    // fold runs once per pair.
    val w = Window.partitionBy("pid")
      .orderBy(col("cos").desc_nulls_last, col("vid").asc)
    broadcast(probes).join(corpus, col("pid") =!= col("vid"))
      .select(col("pid"), col("vid"), col("label"),
        // zero-norm side → cos NULL (the VectorOps.cosine contract — see
        // its scaladoc for why the norm guard must come BEFORE the
        // division: ANSI Divide throws on 0.0, and 0·Inf = NaN slips past
        // a nullif). Zero vectors are never neighbors, and a zero-norm
        // probe emits no rows, on BOTH engines.
        when(col("pn") === 0.0 || col("vn") === 0.0,
          lit(null).cast("double"))
          .otherwise(dot(col("pemb"), col("vemb")) /
            nullif(col("pn") * col("vn"), lit(0.0))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .where(col("rn") <= K && col("cos").isNotNull)
  }

  /** Oracle CTE computing the same top-K with identical fold arithmetic. */
  private val oTopk: String =
    s"""probes AS (SELECT vec_id AS pid, embedding AS pemb FROM embeddings
                  WHERE vec_id < $PROBES),
       scored AS (
         SELECT pid, c.vec_id AS vid, c.label,
                ${oCosine("pemb", "c.embedding")} AS cos
         FROM probes, embeddings c WHERE pid <> c.vec_id),
       ranked AS (
         SELECT pid, vid, label, cos,
                row_number() OVER (PARTITION BY pid
                                   ORDER BY cos DESC NULLS LAST, vid ASC)
                  AS rn
         FROM scored)"""

  val defs: Map[String, Q] = Map(

    // Exact top-5 cosine neighbors for the probe set (identical double
    // fold on both engines → raw doubles compare bit-exact).
    "sim_cosine_topk" -> Q(
      // presentSort (r16): output is PROBES x K rows — bounded constants
      (s, d) => presentSort(topk(s, d).select("pid", "vid", "cos", "rn"),
        col("pid"), col("rn")),
      Some(s"""WITH $oTopk
              SELECT pid, vid, cos, rn FROM ranked
              WHERE rn <= $K AND cos IS NOT NULL ORDER BY pid, rn""")),

    // kNN majority-vote label per probe (count desc, label asc tiebreak).
    // Unlabeled (NULL-label) neighbors do not vote — without the filter a
    // NULL group wins Spark's asc-nulls-first tiebreak and loses DuckDB's
    // nulls-last one. A probe whose entire top-K is unlabeled is emitted
    // by neither engine (no prediction).
    "sim_knn_label" -> Q(
      (s, d) => {
        val w = Window.partitionBy("pid")
          .orderBy(col("votes").desc, col("label").asc)
        topk(s, d)
          .where(col("label").isNotNull)
          .groupBy("pid", "label")
          .agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(w))
          .where(col("vr") === 1)
          .select(col("pid"), col("label").as("pred_label"), col("votes"))
          .transform(df => presentSort(df, col("pid"))) // bounded: <= PROBES rows
      },
      Some(s"""WITH $oTopk,
              votes AS (
                SELECT pid, label, count(*) AS votes FROM ranked
                WHERE rn <= $K AND cos IS NOT NULL
                  AND label IS NOT NULL GROUP BY pid, label)
              SELECT pid, label AS pred_label, votes FROM (
                SELECT pid, label, votes,
                       row_number() OVER (PARTITION BY pid
                                          ORDER BY votes DESC, label ASC) AS vr
                FROM votes)
              WHERE vr = 1 ORDER BY pid""")),

    // IVF-style ANN: corpus bucketed by nearest of 4 coarse centroids
    // (vec_id 0..3); probes search only their own bucket. The exact
    // arithmetic is the same pinned fold, so the oracle replays it.
    "sim_ivf_topk" -> Q(
      (s, d) => {
        val v = V(s, d)
        val cents = v.where(col("vec_id") < 4)
          .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("d2").asc, col("cid").asc)
        val bucketed = v.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cid"),
            dist2(col("embedding"), col("cemb")).as("d2"))
          .withColumn("arn", row_number().over(wAssign))
          .where(col("arn") === 1)
          // reused as probe AND corpus side; deliberately NOT persisted —
          // a builder-scope persist can't be unpersisted after the caller's
          // action, and a lingering cache would make Bench's min-of-N
          // measure cached reruns for this one query. The re-computed
          // assignment is a 4-centroid broadcast crossJoin — cheap.
          // Norms precomputed per VECTOR (narrow map), not per pair —
          // the join then evaluates one fold per pair; sqrt(na)·sqrt(nb)
          // is the exact expression VectorOps.cosine builds, bit-equal.
          .select(col("vec_id"), col("embedding"), col("cid"),
            sqrt(norm2(col("embedding"))).as("nrm"))
        val probes = bucketed.where(col("vec_id") < PROBES)
          .select(col("vec_id").as("pid"), col("embedding").as("pemb"),
            col("cid").as("pcid"), col("nrm").as("pn"))
        val wTop = Window.partitionBy("pid")
          .orderBy(col("cos").desc_nulls_last, col("vid").asc)
        broadcast(probes)
          .join(bucketed.select(col("vec_id").as("vid"),
              col("embedding").as("vemb"), col("cid"), col("nrm").as("vn")),
            col("pcid") === col("cid") && col("pid") =!= col("vid"))
          .select(col("pid"), col("vid"),
            when(col("pn") === 0.0 || col("vn") === 0.0,
              lit(null).cast("double"))
              .otherwise(dot(col("pemb"), col("vemb")) /
                nullif(col("pn") * col("vn"), lit(0.0))).as("cos"))
          // zero-norm vectors score NULL → rank last, filtered AFTER the
          // rank (pre-rank filters get pushed into the join condition and
          // re-evaluate the fold per pair — the topk note)
          .withColumn("rn", row_number().over(wTop).cast("bigint"))
          .where(col("rn") <= K && col("cos").isNotNull)
          .select("pid", "vid", "cos", "rn")
          .transform(df => presentSort(df, col("pid"), col("rn"))) // PROBES x K
      },
      Some(s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cemb
                             FROM embeddings WHERE vec_id < 4),
              assigned AS (
                SELECT vec_id, embedding, cid,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY ${oDist2("embedding", "cemb")} ASC, cid ASC)
                         AS arn
                FROM embeddings, cents),
              bucketed AS (SELECT vec_id, embedding, cid FROM assigned
                           WHERE arn = 1),
              probes AS (SELECT vec_id AS pid, embedding AS pemb, cid AS pcid
                         FROM bucketed WHERE vec_id < $PROBES),
              scored AS (
                SELECT pid, b.vec_id AS vid,
                       ${oCosine("pemb", "b.embedding")} AS cos
                FROM probes JOIN bucketed b
                  ON pcid = b.cid AND pid <> b.vec_id)
              SELECT pid, vid, cos, rn FROM (
                SELECT pid, vid, cos,
                       row_number() OVER (PARTITION BY pid
                                          ORDER BY cos DESC NULLS LAST,
                                                   vid ASC) AS rn
                FROM scored)
              WHERE rn <= $K AND cos IS NOT NULL ORDER BY pid, rn""")),

    // Same top-K computed by the custom fused Catalyst expression
    // (graft.functions.CosineSim, registered as cosine_sim via
    // GraftExtensions): one codegen'd pass per pair instead of three HOF
    // walks, bit-identical to the fold arithmetic — same oracle.
    "sim_cosine_expr" -> Q(
      (s, d) => {
        val v = V(s, d)
        val probes = v.where(col("vec_id") < PROBES)
          .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
        val corpus = v.select(col("vec_id").as("vid"),
          col("embedding").as("vemb"))
        val w = Window.partitionBy("pid")
          .orderBy(col("cos").desc_nulls_last, col("vid").asc)
        broadcast(probes).join(corpus, col("pid") =!= col("vid"))
          .select(col("pid"), col("vid"),
            expr("cosine_sim(pemb, vemb)").as("cos"))
          // cosine_sim → NULL on a zero-norm side (CosineSim contract);
          // NULLs rank last and are filtered AFTER the rank (the topk
          // note: pre-rank filters push into the join and re-evaluate
          // cosine_sim per candidate pair), same oracle filter
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .where(col("rn") <= K && col("cos").isNotNull)
          .select("pid", "vid", "cos", "rn")
          .transform(df => presentSort(df, col("pid"), col("rn"))) // PROBES x K
      },
      Some(s"""WITH $oTopk
              SELECT pid, vid, cos, rn FROM ranked
              WHERE rn <= $K AND cos IS NOT NULL ORDER BY pid, rn""")),

    // Embedding-cosine near-duplicate pairs over a bounded corpus slice
    // (vec_id < 200 — at 100 TB this becomes bucket-local pairs via the
    // IVF/LSH path above, never corpus²).
    "dedup_embed" -> Q(
      (s, d) => {
        val v = V(s, d).where(col("vec_id") < 200)
        val a = v.select(col("vec_id").as("ia"), col("embedding").as("ea"))
        val b = v.select(col("vec_id").as("ib"), col("embedding").as("eb"))
        a.join(b, col("ia") < col("ib"))
          .select(col("ia"), col("ib"),
            expr("cosine_sim(ea, eb)").as("cos"))
          // zero-norm pairs score NULL; `NULL >= 0.35` is NULL → dropped
          // on both engines. (Before the CosineSim zero-norm fix they
          // scored NaN, which Spark treats as the LARGEST double — every
          // zero-vector pair passed this filter while DuckDB dropped it.)
          .where(col("cos") >= 0.35)
          .transform(df => presentSort(df, col("ia"), col("ib"))) // <= C(200,2)
      },
      Some(s"""SELECT ia, ib, cos FROM (
                SELECT a.vec_id AS ia, b.vec_id AS ib,
                       ${oCosine("a.embedding", "b.embedding")} AS cos
                FROM embeddings a, embeddings b
                WHERE a.vec_id < 200 AND b.vec_id < 200 AND a.vec_id < b.vec_id)
              WHERE cos >= 0.35 ORDER BY ia, ib""")),

    // Random-projection (sign) LSH: 8 deterministic pseudo-random
    // hyperplanes (an LCG over the (plane, dim) index — identical integer
    // arithmetic on both engines), each vector's bucket = the 8 sign bits
    // of its projections. This is the bucketing step of sign-LSH ANN: at
    // 100 TB the signature is a narrow scan-local map and candidate pairs
    // are bucket-local (≈1/256 of the corpus per probe), like sim_ivf_topk
    // but with no centroid pass. Output audits the bucket histogram.
    "sim_rp_lsh" -> Q(
      (s, d) => {
        val bits = (0 until 8).map { j =>
          val w = s"CAST((CAST(1103515245 AS BIGINT) * (${j * 64} + k - 1)" +
            s" + 12345) % 2001 - 1000 AS DOUBLE)"
          expr(s"""IF(aggregate(
                     transform(sequence(1, 64),
                       k -> CAST(element_at(embedding, k) AS DOUBLE) * $w),
                     CAST(0.0 AS DOUBLE), (a, x) -> a + x) > 0.0,
                   CAST(${1L << j} AS BIGINT), CAST(0 AS BIGINT))""")
        }
        V(s, d)
          .select(col("vec_id"), col("label"), bits.reduceLeft(_ + _).as("sig"))
          .groupBy("sig")
          .agg(count(lit(1)).as("n_vecs"), countDistinct("label").as("n_labels"))
          .transform(df => presentSort(df, col("sig"))) // <= 256 buckets
      },
      Some {
        def bit(j: Int) = {
          val w = s"CAST((CAST(1103515245 AS BIGINT) * (${j * 64} + k - 1)" +
            s" + 12345) % 2001 - 1000 AS DOUBLE)"
          s"""CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(1, 65),
                  k -> CAST(embedding[k] AS DOUBLE) * $w)),
                (a, x) -> a + x) > 0.0
              THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
        }
        val sig = (0 until 8).map(bit).mkString(" + ")
        s"""SELECT sig, count(*) AS n_vecs, count(DISTINCT label) AS n_labels
            FROM (SELECT vec_id, label, $sig AS sig FROM embeddings)
            GROUP BY sig ORDER BY sig"""
      }),

    // Documents ⋈ embeddings with a mixed text + vector predicate.
    // MLlib BucketedRandomProjectionLSH AS a declared query — the
    // euclidean-ANN twin of dedup_mllsh (Jaccard), so BOTH MLlib LSH
    // families run under Bench watch. approxSimilarityJoin buckets each
    // vector by seeded random hyperplane projections and equi-joins on
    // (table, bucket) before the exact distance filter — bucket-local
    // candidates, never probes×corpus. Seeded ⇒ deterministic candidate
    // set; the hash family isn't SQL-expressible → rows-only (the oracled
    // ANN surface is sim_ivf_topk / sim_rp_lsh / dedup_embed).
    "sim_brp_ann" -> Q(
      (s, d) => {
        import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
        import org.apache.spark.ml.functions.array_to_vector
        val vecs = V(s, d).select(col("vec_id"),
          array_to_vector(col("embedding")).as("features"))
        val probes = vecs.where(col("vec_id") < PROBES)
        // MLlib's fit() needs at least one vector (it peeks the dimension
        // off the first row); an empty corpus is a legal input with a
        // well-defined answer — no candidate pairs. One cheap driver-side
        // existence probe, same class as kmeans_conv's convergence scalar.
        if (vecs.isEmpty)
          probes.select(col("vec_id").as("ia"), col("vec_id").as("ib"))
            .limit(0)
        else {
          val model = new BucketedRandomProjectionLSH()
            .setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
            .setInputCol("features").setOutputCol("hashes")
            .fit(vecs)
          // 1.2 ≈ the 1st percentile of the probe↔corpus distance
          // distribution (median 1.41, measured) — keeps genuine neighbors
          // only; looser caps pass most pairs and defeat the bucketing.
          model.approxSimilarityJoin(probes, vecs, 1.2, "dist")
            .select(col("datasetA.vec_id").as("ia"),
              col("datasetB.vec_id").as("ib"))
            .where(col("ia") =!= col("ib"))
            .orderBy("ia", "ib")
        }
      },
      None),

    "multimodal_join" -> Q(
      (s, d) => D(s, d)
        .join(V(s, d), col("doc_id") === col("vec_id"))
        .where(col("n_chars") >= 200)
        .select(col("doc_id"), col("lang"), col("label"), col("n_chars"),
          norm2(col("embedding")).as("emb_norm2"))
        .where(col("emb_norm2") > 1.0)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, label, n_chars, emb_norm2 FROM (
                SELECT doc_id, lang, label, n_chars,
                       ${oDot("embedding", "embedding")} AS emb_norm2
                FROM documents JOIN embeddings ON doc_id = vec_id
                WHERE n_chars >= 200)
              WHERE emb_norm2 > 1.0 ORDER BY doc_id"""))
  )
}
