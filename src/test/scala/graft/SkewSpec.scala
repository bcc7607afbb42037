package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals direct groupBy aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedAgg(li, col("l_returnflag"), col("l_quantity"))
      .select($"key", $"n", round($"sum_value", 2).as("s"))
      .as[(String, Long, Double)].collect().map { case (k, n, s) => k -> ((n, s)) }.toMap
    val direct = li.groupBy($"l_returnflag".as("key"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("s"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted === direct)
  }

  test("saltedDistinctCount equals countDistinct") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedDistinctCount(li, col("l_returnflag"), col("l_partkey"))
      .as[(String, Long)].collect().toMap
    val direct = li.groupBy($"l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    // skewed big side: one hot key with 500 rows, a long tail of singletons
    val big = (Seq.fill(500)(1L) ++ (2L to 101L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (50L, "mid")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    val plain = big.join(small, "k")
      .select("k", "payload", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._1 == 1L) === 500)
  }
}
