package graft

import graft.functions.BottomK
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("bottom-k equals the exact window formulation") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.bottomKSample(docs, k = 7)
      .as[(String, Long, Int)].collect().toSet
    val w = Window.partitionBy("lang")
      .orderBy(Dedup.portableHash64(col("doc_id").cast("string")), col("doc_id"))
    val exact = docs
      .select(col("lang"), col("doc_id"), row_number().over(w).as("rk"))
      .where(col("rk") <= 7)
      .as[(String, Long, Int)].collect().toSet
    assert(got === exact)
  }

  test("merge across partitions: sample independent of input partitioning") {
    val base = (1L to 500L).toDF("id")
      .select(lit("g").as("g"), col("id"), (col("id") * 2654435761L % 1000003L).as("h"))
    def sample(parts: Int): Set[(Long, Long)] = base
      .repartition(parts)
      .groupBy("g").agg(BottomK.bottomK($"h", $"id", 10).as("p"))
      .select(explode($"p").as("e")).select("e.key", "e.id")
      .as[(Long, Long)].collect().toSet
    val one = sample(1)
    assert(one.size === 10)
    assert(sample(13) === one) // partial buffers + merges, same pick
  }

  test("partial aggregation: plan shows map-side partial before the shuffle") {
    val plan = Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(BottomK.bottomK(
        Dedup.portableHash64(col("doc_id").cast("string")), col("doc_id"), 5).as("p"))
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs as ObjectHashAggregate with a partial
    // mode instance below the exchange — the O(k)-per-partition shuffle
    assert(plan.contains("ObjectHashAggregate"))
    assert("partial_graft_bottom_k|partial.*bottom_k".r.findFirstIn(plan).isDefined,
      s"no partial aggregation in plan:\n$plan")
  }

  test("SQL-callable after registration") {
    BottomK.register(spark)
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT lang, graft_bottom_k(
        |  cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint),
        |  doc_id, 3) AS p
        |FROM documents GROUP BY lang""".stripMargin).count()
    assert(n > 0)
  }
}
