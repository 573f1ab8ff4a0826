package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the LAST LINE of the last 2000 bytes of Bench stdout.
  * These tests pin the contract: for the FULL current inventory — and for a
  * synthetic future inventory half again larger — the emitted line stays
  * within BenchLine.SizeBudget (1900 B, ~100 B tail headroom) and parses as
  * one JSON object with the fields the driver reads. Pure string tests (no
  * SparkSession): BenchLine is deliberately Spark-free.
  */
class BenchLineSuite extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def check(line: String): com.fasterxml.jackson.databind.JsonNode = {
    assert(!line.contains("\n"), "must be a single line")
    assert(line.length <= BenchLine.SizeBudget,
      s"line ${line.length} B exceeds ${BenchLine.SizeBudget} B tail budget")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("queries").isObject)
    assert(node.get("sf").asText() == "sf0.1")
    node
  }

  // Deterministic per-name pseudo-times spanning the real 0.3–20 s shape
  // (9.9 max keeps f1() at 3 chars; the elision sort handles any magnitude).
  private def fakeTimes(names: Seq[String]): Seq[(String, Double)] =
    names.map(n => n -> (0.3 + (math.abs(n.hashCode) % 97) / 10.0))

  test("full current inventory fits the tail budget and parses") {
    val results = fakeTimes(SparkEntry.queries.keys.toSeq.sorted)
    val node = check(BenchLine.render(results, pending = 0, passes = 3, sfName = "sf0.1"))
    // total covers EVERY query even when the map elides fast ones
    val expected = results.map(_._2).sum
    assert(math.abs(node.get("value").asDouble - expected) < 0.01 * results.size)
    val kept = node.get("queries").size
    val elided = Option(node.get("elided")).map(_.asInt).getOrElse(0)
    assert(kept + elided == results.size)
  }

  test("synthetic 160-query inventory still fits and parses") {
    val names = (1 to 160).map(i => f"synthetic_query_name_$i%03d")
    val node = check(BenchLine.render(fakeTimes(names), 0, 1, "sf0.1"))
    assert(node.get("queries").size + node.get("elided").asInt == 160)
  }

  test("failed and pending queries are flagged, never silently dropped") {
    val results = fakeTimes((1 to 150).map(i => s"q$i")) :+ ("q_broken" -> -1.0)
    val node = check(BenchLine.render(results, pending = 9, passes = 0, sfName = "sf0.1"))
    assert(node.get("failed").asInt == 1)
    assert(node.get("pending").asInt == 9)
    // the failed entry survives elision (it sorts above every finite time)
    assert(node.get("queries").get("q_broken").asInt == -1)
    // total excludes the failure instead of skewing negative
    assert(node.get("value").asDouble > 0)
  }

  test("small result set emits the full map with no elision") {
    val node = check(BenchLine.render(
      Seq("a" -> 1.25, "b" -> 0.304), 0, 2, "sf0.1"))
    assert(node.get("queries").size == 2)
    assert(node.get("elided") == null)
    // 1-dp rounded-then-trimmed per-query, 2-dp trimmed total
    assert(node.get("queries").get("a").asDouble == 1.3)
    assert(node.get("queries").get("b").asDouble == 0.3)
  }
}
