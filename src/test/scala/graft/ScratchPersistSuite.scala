package graft

import java.nio.file.{Files, Paths}

/** Contract of [[Scratch.persistent]] — the cross-JVM corpus cache behind
  * mm_pipeline's .nii blobs and join_bucketed's bucketed tables. The
  * properties that matter operationally:
  *   1. build runs ONCE for an unchanged source (the bench-budget win);
  *   2. a source change at the same path (the ns→µs vintage swap precedent)
  *      invalidates the corpus — stale bytes are never served;
  *   3. the sentinel only appears with a COMPLETE corpus (rename-in), so a
  *      JVM killed mid-build leaves no half corpus behind the sentinel.
  */
class ScratchPersistSuite extends SparkSpec {

  private def tmpSrc(): java.io.File = {
    val d = Files.createTempDirectory("graft_sps_src").toFile
    Files.writeString(Paths.get(d.getPath, "src.parquet"), "v1")
    d
  }

  test("builds once, then reuses for an unchanged source") {
    var builds = 0
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    def run(): String = Scratch.persistent(spark, tag,
      Seq(s"${src.getPath}/src.parquet")) { staging =>
      builds += 1
      Files.writeString(Paths.get(staging, "corpus.bin"), "built")
    }
    val p1 = run()
    val p2 = run()
    assert(p1 == p2 && builds == 1, "second call must reuse, not rebuild")
    assert(Files.readString(Paths.get(p1, "corpus.bin")) == "built")
    assert(Files.exists(Paths.get(p1, "_GRAFT_COMPLETE")),
      "sentinel must be present in the final dir")
  }

  test("a changed source at the same path invalidates the corpus") {
    var gen = 0
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    def run(): String = Scratch.persistent(spark, tag,
      Seq(s"${src.getPath}/src.parquet")) { staging =>
      gen += 1
      Files.writeString(Paths.get(staging, "corpus.bin"), s"gen$gen")
    }
    val p1 = run()
    assert(Files.readString(Paths.get(p1, "corpus.bin")) == "gen1")
    // same length, different mtime — the weakest change the fingerprint
    // must still catch (a re-generated vintage can be byte-length-equal)
    val f = Paths.get(src.getPath, "src.parquet")
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      Files.getLastModifiedTime(f).toMillis + 5000))
    val p2 = run()
    assert(p2 == p1 && gen == 2, "mtime change must trigger a rebuild")
    assert(Files.readString(Paths.get(p2, "corpus.bin")) == "gen2")
  }

  test("a leftover tombstone from a prior rebuild does not block the next") {
    var gen = 0
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    def run(): String = Scratch.persistent(spark, tag,
      Seq(s"${src.getPath}/src.parquet")) { staging =>
      gen += 1
      Files.writeString(Paths.get(staging, "corpus.bin"), s"gen$gen")
    }
    val p1 = run()
    // simulate a tombstone abandoned by a crash between the two renames of
    // an earlier rebuild IN THIS JVM (same applicationId → same tomb path);
    // before the fix the aside rename silently failed on it and the stale
    // corpus was then adopted on mere sentinel EXISTENCE
    val base = sys.props("java.io.tmpdir").stripSuffix("/")
    val tomb = Paths.get(
      s"$base/graft_corpus_${tag}_staging_tomb_${spark.sparkContext.applicationId}")
    Files.createDirectories(tomb)
    Files.writeString(tomb.resolve("junk.bin"), "abandoned")
    val f = Paths.get(src.getPath, "src.parquet")
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      Files.getLastModifiedTime(f).toMillis + 5000))
    val p2 = run()
    assert(gen == 2 && Files.readString(Paths.get(p2, "corpus.bin")) == "gen2",
      "rebuild must serve the NEW corpus, not adopt the stale one")
    assert(!Files.exists(tomb), "tombstone cleaned up after the rebuild")
  }

  test("the abandoned-staging sweep is age-gated (live peers survive)") {
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    val base = sys.props("java.io.tmpdir").stripSuffix("/")
    // a CONCURRENT builder's live staging dir: fresh mtime, foreign appId
    val peer = Paths.get(s"$base/graft_corpus_${tag}_staging_peerapp123")
    Files.createDirectories(peer)
    Files.writeString(peer.resolve("inflight.bin"), "peer mid-build")
    // an ABANDONED staging dir: foreign appId, mtime past the gate
    val dead = Paths.get(s"$base/graft_corpus_${tag}_staging_deadapp456")
    Files.createDirectories(dead)
    Files.setLastModifiedTime(dead, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    Scratch.persistent(spark, tag, Seq(s"${src.getPath}/src.parquet")) {
      staging => Files.writeString(Paths.get(staging, "corpus.bin"), "ok")
    }
    assert(Files.exists(peer),
      "a fresh foreign staging dir (live concurrent builder) must survive")
    assert(!Files.exists(dead), "an old abandoned staging dir is swept")
    // cleanup the surviving fake
    Files.delete(peer.resolve("inflight.bin")); Files.delete(peer)
  }

  test("sweep self-exclusion matches exact names, not an appId suffix") {
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    val base = sys.props("java.io.tmpdir").stripSuffix("/")
    // a FOREIGN abandoned staging dir whose appId merely ENDS WITH ours —
    // before the fix, endsWith(appId) spared it forever
    val collide = Paths.get(s"$base/graft_corpus_${tag}_staging_" +
      s"zz${spark.sparkContext.applicationId}")
    Files.createDirectories(collide)
    Files.setLastModifiedTime(collide, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    Scratch.persistent(spark, tag, Seq(s"${src.getPath}/src.parquet")) {
      staging => Files.writeString(Paths.get(staging, "corpus.bin"), "ok")
    }
    assert(!Files.exists(collide),
      "an old foreign staging dir with a colliding appId SUFFIX is swept")
  }

  test("a staging dir swept mid-build is detected and the build retried") {
    var builds = 0
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    val p = Scratch.persistent(spark, tag,
      Seq(s"${src.getPath}/src.parquet")) { staging =>
      builds += 1
      if (builds == 1) {
        // simulate a racing JVM's age-gated sweep deleting our LIVE staging
        // dir mid-build (dir mtime does not advance during nested writes) —
        // before the fix the sentinel create recreated the dir and a
        // sentinel-only corpus with the CORRECT fingerprint was installed
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(staging))
      } else {
        Files.writeString(Paths.get(staging, "corpus.bin"), "ok")
      }
    }
    assert(builds == 2, "swept staging must trigger exactly one retry")
    assert(Files.readString(Paths.get(p, "corpus.bin")) == "ok",
      "the retried build's corpus is the one installed")
    assert(Files.exists(Paths.get(p, "_GRAFT_COMPLETE")))
    assert(!Files.exists(Paths.get(p, "_GRAFT_BUILDING")),
      "the liveness marker must not leak into the installed corpus")
  }

  test("a failed build leaves no sentinel (no half corpus served later)") {
    val src = tmpSrc()
    val tag = s"spstest_${System.nanoTime()}"
    intercept[RuntimeException] {
      Scratch.persistent(spark, tag, Seq(s"${src.getPath}/src.parquet")) {
        staging =>
          Files.writeString(Paths.get(staging, "partial.bin"), "half")
          throw new RuntimeException("simulated mid-build death")
      }
    }
    val base = sys.props("java.io.tmpdir").stripSuffix("/")
    assert(!Files.exists(Paths.get(s"$base/graft_corpus_$tag",
      "_GRAFT_COMPLETE")), "no sentinel after a failed build")
    // and the next call rebuilds cleanly
    var rebuilt = false
    val p = Scratch.persistent(spark, tag,
      Seq(s"${src.getPath}/src.parquet")) { staging =>
      rebuilt = true
      Files.writeString(Paths.get(staging, "corpus.bin"), "ok")
    }
    assert(rebuilt && Files.readString(Paths.get(p, "corpus.bin")) == "ok")
  }
}
