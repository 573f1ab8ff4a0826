package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Static tripwires over the main source tree for the non-distributed
  * patterns that would sink a 1000-executor deployment: materializing a
  * result on the driver inside a query path, or iterating a collected
  * result. Scalar driver actions (`.count()` for pagerank's |V|,
  * kmeans_conv's convergence probe) are fine — they reduce to one number;
  * `collect()`-class calls pull ROWS to the driver and are only allowed in
  * tooling mains (GoldenGen, PrintInventory, Verify, Bench).
  */
class StaticGuardSuite extends SparkSpec {

  private def mainSources: Seq[Path] =
    Files.walk(Paths.get("src/main/scala/graft")).iterator.asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)

  // Tooling entry points that legitimately materialize results driver-side.
  private val toolingFiles = Set(
    "GoldenGen.scala", "PrintInventory.scala", "PrintPlans.scala",
    "Verify.scala", "Bench.scala", "EditProbe.scala", "R17Probe.scala")

  test("no collect()-class driver materialization outside tooling mains") {
    val banned = Seq(".collect()", ".collectAsList(", ".toLocalIterator")
    val hits = for {
      p <- mainSources if !toolingFiles(p.getFileName.toString)
      (line, i) <- Files.readString(p).linesIterator.zipWithIndex.toSeq
      if !line.trim.startsWith("//") && !line.trim.startsWith("*")
      b <- banned if line.contains(b)
    } yield s"${p.getFileName}:${i + 1}: $b"
    assert(hits.isEmpty,
      s"driver-side row materialization in a query path:\n${hits.mkString("\n")}")
  }

  test("no unhinted crossJoin in operator sources") {
    // Every crossJoin in a query path must carry an explicit broadcast()
    // small side (the ts_gap_fill spine class) — AQE usually saves an
    // unhinted one locally, which is exactly why it hides until a cluster
    // planner chooses a cartesian product.
    val hits = for {
      p <- mainSources if p.toString.contains("/operators/")
      (line, i) <- Files.readString(p).linesIterator.zipWithIndex.toSeq
      if line.contains(".crossJoin(") && !line.contains("crossJoin(broadcast(")
    } yield s"${p.getFileName}:${i + 1}: ${line.trim.take(90)}"
    assert(hits.isEmpty,
      s"crossJoin without broadcast hint:\n${hits.mkString("\n")}")
  }
}
