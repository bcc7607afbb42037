package graft

import graft.operators.Prune
import org.apache.spark.sql.functions._

class PruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sfDir)
    val parts = Tables.part(spark, sfDir).where($"p_size" === 1)
      .select("p_partkey", "p_brand")
    val pruned = Prune.bloomPrunedJoin(li, parts, "l_partkey", "p_partkey",
      expectedItems = 10000L)
      .select("l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val plain = li.join(parts, li("l_partkey") === parts("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(pruned === plain)
    assert(pruned.nonEmpty)
  }

  test("prune predicate keeps every matching key (no false negatives)") {
    val li = Tables.lineitem(spark, sfDir)
    val parts = Tables.part(spark, sfDir).where($"p_size" === 1)
      .select("p_partkey")
    val kept = li.where(
        Prune.bloomMightContain(parts, parts("p_partkey"), li("l_partkey"),
          expectedItems = 10000L))
      .select("l_partkey").distinct().as[Long].collect().toSet
    val trueKeys = li.join(parts, li("l_partkey") === parts("p_partkey"))
      .select("l_partkey").distinct().as[Long].collect().toSet
    assert(trueKeys.subsetOf(kept), "bloom must never drop a real match")
  }

  test("plan shape: scalar-subquery bloom, probe filtered before the join") {
    val li = Tables.lineitem(spark, sfDir)
    val parts = Tables.part(spark, sfDir).where($"p_size" === 1)
      .select("p_partkey", "p_brand")
    val plan = Prune.bloomPrunedJoin(li, parts, "l_partkey", "p_partkey")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
      s"expected a bloom probe filter in:\n$plan")
    assert(plan.contains("scalar-subquery") || plan.contains("Subquery"),
      s"expected the bloom to build as a scalar subquery in:\n$plan")
  }
}
