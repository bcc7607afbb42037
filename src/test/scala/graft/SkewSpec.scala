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
    val salted = Skew.saltedDistinctCount(li, $"l_returnflag", $"l_partkey")
      .as[(String, Long)].collect().toMap
    val direct = li.groupBy($"l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
  }

  test("saltedDistinctCount matches countDistinct NULL semantics") {
    // key 1: one real value + a NULL → 1; key 2: only NULLs → 0, not a
    // missing row and not an inflated 1
    val df = Seq((1L, Option("a")), (1L, Option("a")), (1L, None), (2L, None))
      .toDF("k", "v")
    val got = Skew.saltedDistinctCount(df, col("k"), col("v"))
      .as[(Long, Long)].collect().toMap
    val direct = df.groupBy($"k".as("key")).agg(countDistinct("v").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 0L))
    assert(got === direct)
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

  test("saltedJoin(rowId): ingest-offset discriminator spreads full-duplicate hot rows") {
    // 400 content-identical hot rows carrying an ingest offset — the
    // deterministic per-row column the rowId contract asks callers to pass
    val big = Seq.fill(400)((1L, "same")).zipWithIndex
      .map { case ((k, p), i) => (k, p, i.toLong) }.toDF("k", "payload", "off")
    val small = Seq((1L, "hot")).toDF("k", "tag")
    // replay the documented salt contract (hash of row columns ++ rowId,
    // mod buckets) to observe the spread the join gets internally
    val spread = big.select(
      pmod(xxhash64(col("k"), col("payload"), col("off"), col("off")), lit(8L))
        .cast("int").as("s")).distinct().count()
    assert(spread > 1, "offset-salted duplicates must land in multiple buckets")
    // and the join with the discriminator is still exact
    val got = Skew.saltedJoin(big, small, "k", buckets = 8,
      rowId = Some(col("off"))).count()
    assert(got === 400)
  }

  test("saltedJoin default salt is deterministic: full duplicates share ONE bucket") {
    // without a rowId the salt is a pure function of row content — identical
    // rows deliberately collapse into one bucket (no spreading), because a
    // nondeterministic spreader would migrate rows between (key, salt)
    // partitions on fetch-failure re-runs (SPARK-23207) and corrupt the join
    val big = Seq.fill(400)((1L, "same")).toDF("k", "payload")
    val small = Seq((1L, "hot")).toDF("k", "tag")
    val salts = big.select(
      pmod(xxhash64(col("k"), col("payload")), lit(8L)).cast("int").as("s"))
    assert(salts.distinct().count() === 1)
    assert(salts.distinct().count() === 1) // re-evaluation: same assignment
    assert(Skew.saltedJoin(big, small, "k", buckets = 8).count() === 400)
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
