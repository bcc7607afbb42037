package graft

import graft.streaming.MediaStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MediaStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("incremental phash dup counts over two batches equal batch " +
    "phashDupCounts on the union") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val fixture = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toSeq.take(12)
      // batch 2 re-ingests two batch-1 payloads under new ids: identical
      // bytes → identical stub features → identical phash, so their
      // buckets MUST count across the batch boundary via carried state
      val copies = Seq((900001L, fixture.head._2), (900002L, fixture(1)._2))
      val b1 = fixture.take(6)
      val b2 = fixture.drop(6) ++ copies
      val mem = MemoryStream[(Long, String)]
      val media = operators.Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "image")
      val q = MediaStreams.incrementalPhashDups(media)
        .writeStream.format("memory").queryName("inc_phash_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_phash_parity")
          .as[(Long, Long, Long)].collect().toSeq
        assert(got.size === b1.size + b2.size, "one emission per arrival")
        // per bucket, arrivals were numbered 0,1,…,size-1 whatever the
        // batch boundaries
        got.groupBy(_._2).foreach { case (_, rows) =>
          assert(rows.map(_._3).sorted === rows.indices.map(_.toLong))
        }
        // the bucket's last emission equals the batch answer on the union
        val union = operators.Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", "image")
        val want = operators.Multimodal.phashDupCounts(union)
          .select("phash", "n_dups").as[(Long, Long)].collect().toSeq
        graft.plans.ReleaseRegistry.drain()
        val wantMax = want.groupBy(_._1).map { case (h, rs) => h -> rs.map(_._2).max }
        val gotMax = got.groupBy(_._2).map { case (h, rs) => h -> rs.map(_._3).max }
        assert(gotMax === wantMax)
        // the re-ingested payloads were counted against batch-1 state
        val copyRows = got.filter(r => r._1 >= 900001L)
        assert(copyRows.size === 2 && copyRows.forall(_._3 >= 1L),
          "cross-batch duplicates must see the carried bucket count")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
