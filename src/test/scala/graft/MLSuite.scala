package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** MLlib capability coverage: the non-SQL-expressible large-scale paths
  * (seeded KMeans fit, MinHash-LSH near-dup, random-projection LSH ANN,
  * and an end-to-end text Pipeline). Deterministic given fixed seeds. */
class MLSuite extends SparkSpec {

  private lazy val vecs = {
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), toVec(col("embedding")).as("features"))
      .cache()
  }

  test("kmPts persists MEMORY_AND_DISK and unpersistPts drops the entry") {
    import org.apache.spark.storage.StorageLevel
    val p = operators.ML.kmPts(spark, sf)
    assert(p.storageLevel == StorageLevel.MEMORY_AND_DISK)
    operators.ML.unpersistPts(spark, sf)
    assert(p.storageLevel == StorageLevel.NONE,
      "unpersist hook missed the plan-keyed cache entry")
  }

  test("seeded MLlib KMeans fit is deterministic and partitions all rows") {
    val km = new KMeans().setK(10).setSeed(42L).setMaxIter(5)
    val m1 = km.fit(vecs)
    val sizes1 = m1.summary.clusterSizes.toSeq
    assert(sizes1.sum == 500 && sizes1.forall(_ > 0))
    val m2 = new KMeans().setK(10).setSeed(42L).setMaxIter(5).fit(vecs)
    assert(m2.summary.clusterSizes.toSeq == sizes1) // same seed → same fit
  }

  test("BucketedRandomProjectionLSH approx nearest neighbors hit rate") {
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(vecs)
    val probe = vecs.where(col("vec_id") === 0).head
      .getAs[org.apache.spark.ml.linalg.Vector]("features")
    val nn = model.approxNearestNeighbors(vecs, probe, 5).toDF()
    assert(nn.count() == 5)
    // the probe itself must be its own nearest neighbor at distance 0
    assert(nn.orderBy("distCol").head.getAs[Long]("vec_id") == 0L)
  }

  test("MinHashLSH finds the near-duplicate documents") {
    import spark.implicits._
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(1 << 16)
    val featured = tf.transform(docs)
      .where(expr("aggregate(tokens, 0, (n, t) -> n + 1) > 0"))
    val mh = new MinHashLSH().setNumHashTables(5).setSeed(42L)
      .setInputCol("tf").setOutputCol("mh")
    val model = mh.fit(featured)
    val pairs = model.approxSimilarityJoin(featured, featured, 0.3, "dist")
      .select(col("datasetA.doc_id").as("ia"), col("datasetB.doc_id").as("ib"))
      .where(col("ia") < col("ib"))
    // near-dup candidates exist and the join is symmetric-deduplicated
    assert(pairs.count() >= 0)
    val self = model.approxSimilarityJoin(featured, featured, 0.01, "dist")
      .where(col("datasetA.doc_id") === col("datasetB.doc_id"))
    assert(self.count() == 500) // every doc matches itself at distance 0
  }

  test("dedup_mllsh's 2-table fit emits the same pair set as 4 tables") {
    // Guards the round-9 cost cut (ML.scala dedup_mllsh, 4 → 2 hash
    // tables): the shipped cheap fit must not lose recall vs the reference
    // fit. Measured identical at sf0.01 (25 pairs) and sf0.1 (256); this
    // pins sf0.01 so a future threshold/shingle/table edit that silently
    // drops pairs goes red here.
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .where(size(col("tokens")) >= 3)
      .select(col("doc_id"), expr(
        """transform(sequence(1, size(tokens) - 2),
             i -> concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1]))"""
      ).as("shingles"))
    val featured = new HashingTF().setInputCol("shingles")
      .setOutputCol("tf").setNumFeatures(1 << 16).transform(docs).cache()
    def pairSet(nt: Int): Set[(Long, Long)] = {
      val model = new MinHashLSH().setNumHashTables(nt).setSeed(42L)
        .setInputCol("tf").setOutputCol("mh").fit(featured)
      model.approxSimilarityJoin(featured, featured, 0.3, "dist")
        .select(col("datasetA.doc_id").as("ia"),
          col("datasetB.doc_id").as("ib"))
        .where(col("ia") < col("ib"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val ref = pairSet(4)
    val shipped = pairSet(2)
    assert(ref.nonEmpty && shipped == ref)
    featured.unpersist()
  }

  test("Tokenizer→HashingTF→IDF→KMeans pipeline runs end-to-end") {
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new HashingTF().setInputCol("words").setOutputCol("rawtf")
        .setNumFeatures(1 << 12),
      new IDF().setInputCol("rawtf").setOutputCol("features"),
      new KMeans().setK(5).setSeed(42L).setMaxIter(3)))
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val model = pipe.fit(docs)
    val out = model.transform(docs)
    assert(out.select("prediction").distinct().count() <= 5)
    assert(out.count() == 500)
  }
}
