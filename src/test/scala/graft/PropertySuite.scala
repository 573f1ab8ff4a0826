package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic-law properties on ScalaCheck-generated data (SURVEY.md §5.3):
  * engine-level invariants that must hold for ANY input, not just the
  * fixtures. (Direct Gen sampling — the scalatest↔scalacheck bridge
  * artifact isn't in the offline cache.) */
class PropertySuite extends SparkSpec {

  private val rowsGen: Gen[List[(Long, Double)]] = Gen.listOf(Gen.zip(
    Gen.chooseNum(0L, 20L), Gen.chooseNum(-100.0, 100.0)))

  /** Deterministic multi-sample driver. */
  private def forSamples[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val params = Gen.Parameters.default.withSize(40)
      body(g.pureApply(params, Seed(42L + i)))
    }

  test("filter commutes with projection") {
    forSamples(rowsGen) { xs =>
      import spark.implicits._
      val df = xs.toDF("k", "v")
      val a = df.filter(col("v") > 0).select(col("k"), (col("v") * 2).as("w"))
      val b = df.select(col("k"), (col("v") * 2).as("w")).filter(col("w") > 0)
      assert(a.collect().map(_.toString).sorted.toSeq ==
        b.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("union count = sum of counts; distinct union is idempotent") {
    forSamples(Gen.zip(rowsGen, rowsGen)) { case (xs, ys) =>
      import spark.implicits._
      val a = xs.toDF("k", "v"); val b = ys.toDF("k", "v")
      assert(a.union(b).count() == xs.length + ys.length)
      val u = a.union(b).distinct()
      assert(u.union(u).distinct().count() == u.count())
    }
  }

  test("semi-join rows are a subset of left; semi + anti partition the left") {
    forSamples(Gen.zip(rowsGen, rowsGen)) { case (xs, ys) =>
      import spark.implicits._
      val a = xs.toDF("k", "v"); val b = ys.toDF("k", "v")
      val semi = a.join(b, Seq("k"), "left_semi").count()
      val anti = a.join(b, Seq("k"), "left_anti").count()
      assert(semi + anti == xs.length)
    }
  }

  test("dedup (keep-first by key) is idempotent") {
    forSamples(rowsGen) { xs =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val df = xs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "id")
      def dedup(d: org.apache.spark.sql.DataFrame) = d
        .withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy("id")))
        .where(col("rn") === 1).drop("rn")
      val once = dedup(df)
      val twice = dedup(once)
      assert(once.collect().map(_.toString).sorted.toSeq ==
        twice.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("histogram bin counts always sum to row count") {
    forSamples(rowsGen) { xs =>
      import spark.implicits._
      val df = xs.toDF("k", "v")
      val binned = df.groupBy(floor(col("v") / 10).as("bin")).count()
      assert(binned.agg(sum("count")).head.get(0) ==
        (if (xs.isEmpty) null else xs.length.toLong))
    }
  }

  test("exact decimal sum is partition-count invariant (bit-exact)") {
    forSamples(rowsGen) { xs =>
      if (xs.nonEmpty) {
        import spark.implicits._
        val df = xs.toDF("k", "v")
        val s1 = df.repartition(1).agg(Par.dsum(col("v"))).head.getDouble(0)
        val s7 = df.repartition(7).agg(Par.dsum(col("v"))).head.getDouble(0)
        assert(s1 == s7)
      }
    }
  }

  test("dsum matches a driver-side reference for any mix incl. NaN/Inf") {
    // The full contract in one law: all-finite lists sum exactly in
    // decimal(38,6) (Spark's cast = shortest-decimal then HALF_UP at
    // scale 6); any non-finite member flips to IEEE propagation. Both
    // branches must be partition-count invariant.
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.chooseNum(-1e6, 1e6),
      1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)))
    forSamples(gen, n = 8) { xs =>
      if (xs.nonEmpty) {
        import spark.implicits._
        val df = xs.toDF("v")
        val ref =
          if (xs.exists(x => x.isNaN || x.isInfinite)) xs.sum
          else xs.map(x => BigDecimal.decimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        for (p <- Seq(1, 7)) {
          val got = df.repartition(p).agg(Par.dsum(col("v"))).head.getDouble(0)
          assert(java.lang.Double.compare(got, ref) == 0,
            s"p=$p got=$got ref=$ref xs=${xs.take(12)}")
        }
      }
    }
  }

  test("session count never exceeds event count and is ≥ 1 per active user") {
    forSamples(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 5L),
      Gen.chooseNum(0L, 100000L)))) { xs =>
      if (xs.nonEmpty) {
        import spark.implicits._
        import org.apache.spark.sql.expressions.Window
        val df = xs.zipWithIndex
          .map { case ((u, t), i) => (u, t, i.toLong) }
          .toDF("user_id", "t", "id")
        val byT = Window.partitionBy("user_id").orderBy("t", "id")
        val sessions = df
          .withColumn("gap", col("t") - lag("t", 1).over(byT))
          .withColumn("new", when(col("gap").isNull || col("gap") > 1000, 1L)
            .otherwise(0L))
          .agg(sum("new")).head.getLong(0)
        val users = xs.map(_._1).distinct.length
        assert(sessions >= users && sessions <= xs.length)
      }
    }
  }

  private val corpusGen: Gen[List[String]] = Gen.nonEmptyListOf(
    Gen.chooseNum(1, 100).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff"))
        .map(_.mkString(" "))))

  private def writeDocs(texts: List[String], tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "web") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_chunk chunks reconstruct every document at any token count") {
    // Sliding windows of 40 tokens every 30: taking the first stride
    // tokens of each chunk except the last (all of it) must rebuild the
    // document exactly, and the chunk count is floor((nt-1)/30)+1 — for
    // ANY generated corpus, not just the fixtures.
    forSamples(corpusGen, n = 3) { texts =>
      val chunks = SparkEntry.queries("text_chunk")(spark,
          writeDocs(texts, "graft_prop_chunk")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
          r.getAs[String]("chunk_text")))
        .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
      for ((t, i) <- texts.zipWithIndex) {
        val toks = t.split(" ").toSeq
        val cs = chunks(i.toLong)
        assert(cs.length == (toks.length - 1) / 30 + 1)
        val rebuilt =
          cs.init.flatMap(_._3.split(" ").take(30)) ++ cs.last._3.split(" ")
        assert(rebuilt.toSeq == toks, s"doc $i failed to reconstruct")
      }
    }
  }

  test("text_minhash depends only on the token set, and stays in-modulus") {
    // A MinHash signature is a function of the token SET: reversing the
    // token order and doubling every token must not change it. Pairs each
    // generated doc with its reversed+duplicated twin and compares.
    forSamples(corpusGen, n = 3) { texts =>
      val twins = texts.map { t =>
        val toks = t.split(" "); (toks.reverse ++ toks).mkString(" ")
      }
      val sig = SparkEntry.queries("text_minhash")(spark,
          writeDocs(texts ++ twins, "graft_prop_mh")).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (1 to 4).map(c => r.getLong(c))).toMap
      for (i <- texts.indices) {
        assert(sig(i.toLong) == sig((texts.length + i).toLong),
          s"doc $i: signature is not order/multiplicity-free")
        assert(sig(i.toLong).forall(v => v >= 0 && v < 1000000007L))
      }
    }
  }

  test("NIfTI-1 encode→decode round-trips stats for any volume and dims") {
    import graft.operators.Multimodal.{NiftiBlob, encodeNifti, decodeNiftiPartition}
    val volGen = for {
      nx <- Gen.chooseNum(1, 8)
      ny <- Gen.chooseNum(1, 8)
      nz <- Gen.chooseNum(1, 8)
      vox <- Gen.listOfN(nx * ny * nz,
        Gen.chooseNum(-1000.0f, 1000.0f))
      slope <- Gen.oneOf(0.0f, 0.5f, 1.0f, 2.0f)
      inter <- Gen.oneOf(-1.0f, 0.0f, 0.25f)
    } yield (nx, ny, nz, vox.toArray, slope, inter)
    forSamples(volGen, n = 20) { case (nx, ny, nz, vox, slope, inter) =>
      val st = decodeNiftiPartition(Iterator(
        NiftiBlob(1L, encodeNifti(vox, (nx, ny, nz), slope, inter)))).next()
      // the decode applies the spec's affine scaling (slope 0 ⇒ unscaled)
      // + the pipeline's +1 — replay the same float→double arithmetic
      val sl = if (slope == 0f) 1.0 else slope.toDouble
      val scaled = vox.map(v => v.toDouble * sl + inter.toDouble + 1.0)
      assert((st.nx, st.ny, st.nz) == ((nx, ny, nz)))
      assert(st.n_vox == vox.length.toLong)
      assert(st.vmin == scaled.min && st.vmax == scaled.max)
      assert(st.vsum == scaled.foldLeft(0.0)(_ + _)) // pinned left fold
    }
  }

  test("cosine_sim ≡ the HOF fold for any vectors, incl. zero and non-finite") {
    // the fused Catalyst expression (CosineSim), the FuseVectorFolds-
    // rewritten HOF tree, and a driver-side reference must agree bit-for-
    // bit on ANY float vectors: finite, zero-norm (→ NULL, the ANSI
    // degenerate-denominator contract), and NaN/Inf elements (→ IEEE
    // propagation). Randomized over lengths too (mismatched pairs → NULL).
    import graft.functions.VectorOps
    val vecGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.frequency(
        6 -> Gen.chooseNum(-10.0f, 10.0f),
        2 -> Gen.const(0.0f),
        1 -> Gen.oneOf(Float.NaN, Float.PositiveInfinity))))
    val pairGen = Gen.listOfN(30, Gen.zip(vecGen, Gen.oneOf(true, false))
      .flatMap { case (a, sameLen) =>
        val bGen =
          if (sameLen) Gen.listOfN(a.length, Gen.chooseNum(-10.0f, 10.0f))
          else Gen.listOfN(a.length + 1, Gen.chooseNum(-10.0f, 10.0f))
        // all-zero b with probability ~1/4 to hit the zero-norm branch on
        // the RIGHT side as well
        Gen.zip(Gen.const(a), bGen, Gen.oneOf(0, 0, 0, 1)).map {
          case (x, y, 1) => (x, y.map(_ => 0.0f))
          case (x, y, _) => (x, y)
        }
      })
    forSamples(pairGen, n = 4) { pairs =>
      import spark.implicits._
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
        .toDF("id", "af", "bf")
        .select(col("id"), col("af").cast("array<float>").as("a"),
          col("bf").cast("array<float>").as("b"))
      val out = df.select(col("id"),
        expr("cosine_sim(a, b)").as("fused"),
        VectorOps.cosine(col("a"), col("b")).as("hof")).collect()
      def ref(a: List[Float], b: List[Float]): Option[Double] =
        if (a.length != b.length) None
        else {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          for ((x, y) <- a.zip(b)) {
            dot += x.toDouble * y.toDouble
            na += x.toDouble * x.toDouble; nb += y.toDouble * y.toDouble
          }
          if (na == 0.0 || nb == 0.0) None
          else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
        }
      for (r <- out) {
        val (a, b) = pairs(r.getAs[Long]("id").toInt)
        val expect = ref(a, b)
        val fused = Option(r.getAs[java.lang.Double]("fused")).map(_.doubleValue)
        val hof = Option(r.getAs[java.lang.Double]("hof")).map(_.doubleValue)
        def same(x: Option[Double], y: Option[Double]) = (x, y) match {
          case (Some(u), Some(v)) => // doubleToLongBits canonicalizes NaN
            java.lang.Double.doubleToLongBits(u) ==
              java.lang.Double.doubleToLongBits(v)
          case (None, None) => true
          case _ => false
        }
        assert(same(fused, expect), s"fused $fused != ref $expect for ($a, $b)")
        assert(same(hof, expect), s"hof $hof != ref $expect for ($a, $b)")
      }
    }
  }
}
