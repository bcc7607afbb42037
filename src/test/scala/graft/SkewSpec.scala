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

  test("saltedJoin spreads a hot key of FULL-duplicate rows across buckets") {
    // every hot row identical: a row-content-only salt would collapse them
    // into one bucket; the per-row discriminator must spread them
    val big = Seq.fill(400)((1L, "same")).toDF("k", "payload")
    val small = Seq((1L, "hot")).toDF("k", "tag")
    val buckets = 8
    val saltCol = "_graft_salt"
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*)
        + monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val distinctSalts = salted.select(saltCol).distinct().count()
    assert(distinctSalts > 1, "duplicate rows must not all share one salt")
    // and the join result is still exact
    val got = Skew.saltedJoin(big, small, "k", buckets).count()
    assert(got === 400)
  }

  test("saltedJoin picks a non-colliding salt column name") {
    val big = Seq((1L, 7, "x"), (1L, 9, "y"), (2L, 3, "z"))
      .toDF("k", "_graft_salt", "payload")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
    val out = Skew.saltedJoin(big, small, "k", buckets = 4)
    // user column survives untouched; result matches the plain join
    assert(out.columns.contains("_graft_salt"))
    val got = out.select("k", "_graft_salt", "payload", "tag")
      .as[(Long, Int, String, String)].collect().sorted.toSeq
    val plain = big.join(small, "k")
      .select("k", "_graft_salt", "payload", "tag")
      .as[(Long, Int, String, String)].collect().sorted.toSeq
    assert(got === plain)
  }
}
