package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
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
          .orderBy("cid")
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
                     CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(38,10)))
                       AS DOUBLE) / count(*) AS mean_d1
              FROM assigned WHERE rn = 1
              GROUP BY cid ORDER BY cid"""))
  )
}
