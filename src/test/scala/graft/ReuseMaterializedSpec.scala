package graft

import java.nio.file.Files

import graft.plans.ReuseMaterialized
import org.apache.spark.sql.functions._

class ReuseMaterializedSpec extends SparkSpec {
  import spark.implicits._

  private def fragment = Tables.lineitem(spark, sfDir)
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))

  test("GRAFT_REUSE hint substitutes a completed materialization into the plan") {
    val dir = Files.createTempDirectory("graft-reuse").toString
    spark.conf.set("spark.graft.materializer.dir", dir)
    ReuseMaterialized.saveNamed(spark, "li_agg", fragment)

    val reused = fragment.hint("GRAFT_REUSE", "li_agg").where($"n" > 0)
    val logical = reused.queryExecution.optimizedPlan.toString
    assert(!logical.toLowerCase.contains("aggregate"), "fragment should not recompute")
    val physical = reused.queryExecution.sparkPlan.toString
    assert(physical.contains("li_agg"), s"expected cached scan in plan:\n$physical")

    val got = reused.orderBy("l_returnflag").collect().map(_.toSeq)
    val direct = fragment.where($"n" > 0).orderBy("l_returnflag").collect().map(_.toSeq)
    assert(got.toSeq === direct.toSeq)
  }

  test("missing materialization leaves the plan untouched (no-op hint)") {
    spark.conf.set("spark.graft.materializer.dir",
      Files.createTempDirectory("graft-reuse-empty").toString)
    val df = fragment.hint("GRAFT_REUSE", "does_not_exist")
    assert(df.count() === fragment.count())
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("aggregate"))
  }
}
