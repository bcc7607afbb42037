package graft

import graft.streaming.DedupStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DedupStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("rowLocalSignatures equals the explode+groupBy batch signatures") {
    val docs = Tables.documents(spark, sfDir)
    val batch = operators.Dedup.minhashSignatures(docs) // (doc_id, mh0..mh31)
    val local = operators.Dedup.rowLocalSignatures(docs)
      .select(col("doc_id") +: (0 until 32).map(i =>
        element_at(col("sig"), i + 1).as(s"mh$i")): _*)
    assert(local.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(local).count() === 0)
  }

  test("incremental pairs over two stream batches equal batch minhashPairs on the union") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val fixture = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      // guarantee CROSS-BATCH discoveries: batch 2 re-ingests two batch-1
      // texts under new ids (an exact re-crawl and a near-identical copy)
      val copies = Seq(
        (100001L, fixture.head._2),
        (100002L, fixture(1)._2 + " extra"))
      val b1 = fixture.filter(_._1 % 2 == 0)
      val b2 = fixture.filter(_._1 % 2 == 1) ++ copies
      val mem = MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "text")
      val q = DedupStreams.incrementalMinhashPairs(stream, threshold = 0.5)
        .writeStream.format("memory").queryName("inc_minhash_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        val afterB1 = spark.table("inc_minhash_parity")
          .select("a", "b", "jaccard").distinct().as[(Long, Long, Double)].collect().toSet
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_minhash_parity")
          .select("a", "b", "jaccard").distinct().as[(Long, Long, Double)].collect().toSet
        val union = (b1 ++ b2).toDF("doc_id", "text")
        val want = operators.Dedup.minhashPairs(union, threshold = 0.5)
          .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
        assert(got === want)
        // the synthetic copies pair with batch-1 docs — found via state,
        // not within either single batch
        assert((got -- afterB1).exists { case (a, b, _) => b >= 100001L && a % 2 == 0 },
          "expected a cross-batch pair against carried state")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batch-mode run equals batch minhashPairs modulo cross-band duplicates") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val got = DedupStreams.incrementalMinhashPairs(docs, threshold = 0.5)
      .toDF().distinct().as[(Long, Long, Double)].collect().toSet
    val want = operators.Dedup.minhashPairs(docs, threshold = 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got === want)
  }
}
