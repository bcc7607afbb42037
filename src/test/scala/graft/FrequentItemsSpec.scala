package graft

import graft.functions.FrequentItems
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact when k covers the distinct cardinality") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.tokens(docs)
      .agg(FrequentItems.freqItems($"word", 64).as("f"))
      .select(explode($"f").as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    val exact = TextOps.wordCount(docs).as[(String, Long)].collect().toMap
    assert(got === exact) // no decrement ever fires → true counts
  }

  test("MG guarantee: frequency > n/k items survive, counts undercount by <= n/k") {
    val words = Seq.fill(100)("heavy_a") ++ Seq.fill(50)("heavy_b") ++
      (1 to 60).map(i => s"unique_$i")
    val n = words.size
    val k = 8
    val got = words.toDF("word")
      .repartition(4) // force partial buffers + merges
      .agg(FrequentItems.freqItems($"word", k).as("f"))
      .select(explode($"f").as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    val maxErr = n / k
    Seq("heavy_a" -> 100L, "heavy_b" -> 50L).foreach { case (item, truth) =>
      assert(truth > maxErr, "test setup: item must be above the guarantee threshold")
      assert(got.contains(item), s"$item (freq $truth > n/k=$maxErr) must survive")
      assert(got(item) <= truth, s"$item must never overcount")
      assert(got(item) >= truth - maxErr, s"$item undercount bounded by n/k")
    }
  }

  test("serialize round-trips items whose UTF-8 exceeds 64 KB") {
    // writeUTF would throw UTFDataFormatException at 65536 bytes; the
    // length-prefixed codec must survive any token length
    val agg = FrequentItems(org.apache.spark.sql.graft.ColumnBridge.expression(lit("x")), 4)
    val long = "tok" + ("a" * 70000)
    val multi = "é" * 40000 // 80 KB in UTF-8, exercises non-ASCII
    val buf = scala.collection.mutable.HashMap(long -> 7L, multi -> 3L, "small" -> 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
  }

  test("SQL-callable after registration") {
    FrequentItems.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("fi_docs")
    val rows = spark.sql(
      """SELECT graft_freq_items(word, 16) AS f FROM (
        |  SELECT explode(split(text, '\\s+')) AS word FROM fi_docs) t
        |WHERE word <> ''""".stripMargin)
      .select(explode(col("f"))).count()
    assert(rows > 0 && rows <= 16)
  }
}
