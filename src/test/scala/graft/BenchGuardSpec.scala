package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression guard reads the previous round's committed
  * artifact; this pins that the medians survive FORMAT changes the old
  * regex scrape broke on (pretty-printing, reordered keys, nested
  * objects appearing before "queries").
  */
class BenchGuardSpec extends AnyFunSuite {

  test("compact artifact parses") {
    val m = Bench.parseQueryMedians(
      """{"metric":"total","queries":{"q1":1.5,"q2":0.25,"bad":null},"sf":"x"}""")
    assert(m === Map("q1" -> 1.5, "q2" -> 0.25))
  }

  test("pretty-printed and reordered artifact still parses") {
    val m = Bench.parseQueryMedians(
      """{
        |  "regressions_vs_committed": { "q9": { "now": 4.0, "prev": 1.0 } },
        |  "queries": {
        |    "q1": 1.5,
        |    "q2": 3
        |  },
        |  "metric": "total"
        |}""".stripMargin)
    assert(m === Map("q1" -> 1.5, "q2" -> 3.0))
  }

  test("garbage, missing queries, and wrong-typed queries yield empty") {
    assert(Bench.parseQueryMedians("not json at all") === Map.empty)
    assert(Bench.parseQueryMedians("""{"metric":"total"}""") === Map.empty)
    assert(Bench.parseQueryMedians("""{"queries":[1,2]}""") === Map.empty)
  }

  test("the committed artifact itself parses to per-query medians") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/bench_full.json")), "UTF-8")
    val m = Bench.parseQueryMedians(txt)
    assert(m.size > 100, s"expected the full suite, got ${m.size}")
    assert(m.values.forall(v => v >= 0.0 && v < 3600.0))
  }
}
