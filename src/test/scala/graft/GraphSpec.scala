package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed 3-iteration ranks on a 4-node graph") {
    // S1→{C1,C2}, S2→C1; C1/C2 dangling. Worked by hand with the exact
    // integer recurrence r' = 150000 + (85·(contrib + dang div n)) div 100:
    //   iter1: S=575000, C1=1850000, C2=1000000
    //   iter2: S=755625, C1=1488750, C2=1000000
    //   iter3: S=678858, C1=1642280, C2=999999  (truncation dust appears)
    val edges = Seq(("S1", "C1"), ("S1", "C2"), ("S2", "C1")).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "S1" -> 678858L, "S2" -> 678858L, "C1" -> 1642280L, "C2" -> 999999L))
  }

  test("pageRank: duplicate edges collapse; rank mass is conserved minus dust") {
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"))
      .toDF("src", "dst")
    val dup = Graph.pageRank(edges, iters = 2).as[(String, Long)].collect().toMap
    val once = Graph.pageRank(edges.distinct(), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(dup === once)
    // no dangling nodes here: total mass stays within integer-truncation
    // dust of n·10⁶ and every rank is positive
    val total = dup.values.sum
    assert(total <= 3000000L && total > 2999000L)
    assert(dup.values.forall(_ > 0))
  }

  test("pageRank on the trade graph: suppliers share one rank tier, heavy customers rise") {
    val pr = Graph.pageRank(Graph.tradeEdges(spark, sfDir), iters = 3)
    val byKind = pr
      .withColumn("kind", org.apache.spark.sql.functions.substring($"node", 1, 1))
    val kinds = byKind.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(kinds.keySet === Set("S", "C"))
    // deterministic under input repartitioning
    val again = Graph.pageRank(Graph.tradeEdges(spark, sfDir).repartition(5), iters = 3)
    assert(pr.except(again).count() === 0 && again.except(pr).count() === 0)
  }
}
