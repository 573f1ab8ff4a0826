package graft

import scala.io.Source

/** Compares every declared query against the committed golden snapshot
  * (row count + order-sensitive content hash) at sf0.001 — regression
  * safety with no DuckDB dependency. Regenerate after intentional changes:
  * sbt "runMain graft.GoldenGen /root/testdata/sf0.001 src/test/resources/golden/sf0.001.json"
  */
class GoldenSuite extends SparkSpec {

  test("all queries match the golden snapshot at sf0.001") {
    val url = getClass.getResource("/golden/sf0.001.json")
    assume(url != null, "no golden snapshot committed yet")
    val src = Source.fromURL(url)
    val golden: Map[String, (Long, Long)] =
      try {
        val txt = src.mkString
        """"([^"]+)":\s*\[(-?\d+),\s*(-?\d+)\]""".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong))
          .toMap
      } finally src.close()

    val current = GoldenGen.snapshot(spark, sf)
    assert(current.keySet == golden.keySet,
      s"query set drift: +${current.keySet.diff(golden.keySet)} " +
        s"-${golden.keySet.diff(current.keySet)}")
    // scan_binary emits parquet file byte-lengths, so its content hash pins
    // the testdata VINTAGE (file sizes changed when the driver regenerated
    // the mount), not engine behavior. Compare row count only here;
    // RowsOnlyInvariantSuite verifies its content against a live directory
    // walk on whatever vintage is mounted (round-12 ADVICE low).
    val sizeDependent = Set("scan_binary")
    val bad = current.filter { case (k, v) =>
      if (sizeDependent(k)) golden(k)._1 != v._1 else golden(k) != v
    }
    assert(bad.isEmpty,
      s"golden mismatch (regenerate if intentional): ${bad.keys.toSeq.sorted}")
  }
}
