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

  test("TTL bounds the LSH state: expired history neither pairs nor stays stored") {
    // TTL requires TimeMode.ProcessingTime, in which the operator keeps
    // reporting "another batch due" for TTL maintenance — so
    // processAllAvailable/AvailableNow never quiesce. The harness instead
    // keeps one paced query running (the maintenance batches ARE the
    // cleanup mechanism) and polls for sentinel emissions / the state-size
    // drop, with deadlines.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val fixture = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toSeq.take(8)
      // generous TTL relative to the 100 ms trigger: window-1 entries must
      // survive scheduling hiccups on a loaded host until the in-window
      // pair surfaces and the state size is sampled — a tight TTL makes
      // the test flaky-fail (entries expiring mid-assert), not wrong
      val ttl = java.time.Duration.ofSeconds(3)
      val mem = MemoryStream[(Long, String)]
      val q = DedupStreams
        .incrementalMinhashPairs(mem.toDF().toDF("doc_id", "text"),
          threshold = 0.5, ttl = Some(ttl))
        .writeStream.format("memory").queryName("inc_minhash_ttl")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("100 milliseconds"))
        .outputMode("append").start()
      try {
        def pairs(): Set[(Long, Long)] = spark.table("inc_minhash_ttl")
          .select("a", "b").as[(Long, Long)].collect().toSet
        def awaitPair(p: (Long, Long), what: String): Unit = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (!pairs().contains(p)) {
            assert(System.nanoTime() < deadline, s"timed out waiting for $what")
            Thread.sleep(100)
          }
        }
        def stateRows(): Long = Option(q.lastProgress)
          .filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
        // lastProgress lags the batch that actually processed the data —
        // poll until the reported state size is positive and stable
        // across consecutive maintenance-batch progress samples instead
        // of trusting a single read
        def stableStateRows(): Long = {
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          var cur = stateRows()
          var stable = 0
          while (stable < 3 && System.nanoTime() < deadline) {
            Thread.sleep(200)
            val next = stateRows()
            if (next > 0 && next == cur) stable += 1 else stable = 0
            cur = next
          }
          cur
        }

        // window 1: the base docs PLUS an exact in-batch copy — parity
        // must hold INSIDE the ttl window, so this pair has to surface
        mem.addData(fixture :+ (200001L, fixture.head._2): _*)
        awaitPair((fixture.head._1, 200001L), "same-window exact copy")
        val w1Rows = stableStateRows()

        // let every window-1 entry age out, then re-ingest the same texts
        // under fresh ids plus a sentinel in-batch copy: the sentinel
        // proves the batch processed; the expired history must contribute
        // no partner
        Thread.sleep(ttl.toMillis * 2)
        val reingest = fixture.map { case (id, t) => (id + 300000L, t) }
        mem.addData(reingest :+ (400001L, fixture.head._2): _*)
        awaitPair((fixture.head._1 + 300000L, 400001L), "window-2 sentinel copy")
        val crossWindow = pairs().filter { case (a, b) =>
          a <= 200001L && b >= 300000L }
        assert(crossWindow.isEmpty,
          s"expired state must not produce pairs, got $crossWindow")

        // physical bound: window 2 re-ingested the SAME texts (plus one
        // sentinel), so an unbounded store would now hold both
        // generations (~2x window 1's rows). TTL cleanup runs on the
        // paced maintenance batches — poll until the store is back at
        // (at most) one window's footprint.
        assert(w1Rows > 0, s"state metrics must be reported, got $w1Rows")
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (stateRows() > w1Rows) {
          assert(System.nanoTime() < deadline,
            s"state did not shrink back under TTL: ${stateRows()} > $w1Rows")
          Thread.sleep(200)
        }
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
