package graft

import graft.streaming.TextStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TextStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("heavy hitters are EXACT across batches while distinct <= k, " +
    "matching batch wordCount on the union") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val b1 = Seq((1L, "a a b c"), (2L, "c a"))
      val b2 = Seq((3L, "a b b d"), (4L, "d d d"))
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingHeavyHitters(
          mem.toDF().toDF("doc_id", "text"), k = 16, nShards = 4)
        .writeStream.format("memory").queryName("hh_exact")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val rows = spark.table("hh_exact")
          .as[(Int, Long, String, Long)].collect().toSeq
        // latest generation per shard supersedes earlier emissions
        val latest = rows.groupBy(_._1).flatMap { case (_, rs) =>
          val g = rs.map(_._2).max
          rs.filter(_._2 == g)
        }
        val got = latest.map(r => r._3 -> r._4).toMap
        val want = operators.TextOps.wordCount((b1 ++ b2).toDF("doc_id", "text"))
          .as[(String, Long)].collect().toMap
        assert(got === want)
      } finally q.stop()
    }
  }

  test("small k: under-estimates only, and every item above the deficit " +
    "bound survives") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // one shard so the MG bound applies to the full stream: 12 tokens,
      // k=2 -> deficit <= 12/2; 'a' (6 occurrences) must survive
      val b1 = Seq((1L, "a a a x y z"))
      val b2 = Seq((2L, "a a a u v w"))
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingHeavyHitters(
          mem.toDF().toDF("doc_id", "text"), k = 2, nShards = 1)
        .writeStream.format("memory").queryName("hh_bound")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val rows = spark.table("hh_bound")
          .as[(Int, Long, String, Long)].collect().toSeq
        val g = rows.map(_._2).max
        val latest = rows.filter(_._2 == g).map(r => r._3 -> r._4).toMap
        assert(latest.size <= 2, "state capacity is k counters")
        assert(latest.contains("a"), "true count 6 > n/k = 6-deficit bound")
        val truth = Map("a" -> 6L, "x" -> 1L, "y" -> 1L, "z" -> 1L,
          "u" -> 1L, "v" -> 1L, "w" -> 1L)
        latest.foreach { case (item, est) =>
          assert(est <= truth(item), s"$item over-estimated")
          assert(truth(item) - est <= 12L / 2, s"$item deficit beyond bound")
        }
      } finally q.stop()
    }
  }

  test("streamingSpanGate: arrivals audit against the static seen-span " +
    "sidecar; two-batch parity with the hand-computed batch gate") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val k = 3
      // seen corpus: spans of "s1..s5" (3 spans) and "t1..t3" (1 span)
      val seenDocs = Seq(
        (100L, "s1 s2 s3 s4 s5"),
        (101L, "t1 t2 t3")).toDF("doc_id", "text")
      val seen = operators.CorpusPipeline.spanHashes(seenDocs, k)
      val b1 = Seq(
        (1L, "s1 s2 s3 s4 x"), // spans: s1s2s3✓ s2s3s4✓ s3s4x ✗ -> 2/3 dup
        (2L, "a b c d"), // 2 spans, 0 dup -> keep
        (3L, "x y")) // < k tokens: no spans, passes unaudited
      val b2 = Seq(
        (4L, "t1 t2 t3"), // 1/1 dup -> 100% > 50% -> drop
        (1L, "a b c")) // doc 1 re-arrives clean: audited independently
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingSpanGate(
          mem.toDF().toDF("doc_id", "text"), seen, spanK = k, maxDupPct = 50)
        .writeStream.format("memory").queryName("span_gate_stream")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        val after1 = spark.table("span_gate_stream")
          .as[(Long, Long, Long, Boolean)].collect().toSet
        // 2/3 dup: 2*100 > 50*3 -> drop; doc 3 emits nothing
        assert(after1 === Set((1L, 3L, 2L, false), (2L, 2L, 0L, true)))
        mem.addData(b2: _*); q.processAllAvailable()
        val all = spark.table("span_gate_stream")
          .as[(Long, Long, Long, Boolean)].collect().toSeq
        val batch2 = all.diff(after1.toSeq).toSet
        // re-ingested doc 1 audited on its NEW text only (no carried state)
        assert(batch2 === Set((4L, 1L, 1L, false), (1L, 1L, 0L, true)))
      } finally q.stop()
    }
  }

  test("utf8Compare orders supplementary-plane strings like UTF-8 bytes, " +
    "where JVM String order diverges") {
    val bmpHigh = "" // private-use BMP char, one UTF-16 unit
    val astral = new String(Character.toChars(0x1F600)) // surrogate pair
    // UTF-8/code-point order: U+E000 < U+1F600; JVM compareTo says the
    // opposite (high surrogate 0xD83D < 0xE000)
    assert(TextStreams.utf8Compare(bmpHigh, astral) < 0)
    assert(bmpHigh.compareTo(astral) > 0, "JVM order must differ for this " +
      "pair or the regression this pins is vacuous")
    assert(TextStreams.utf8Compare("ab", "ab") === 0)
    assert(TextStreams.utf8Compare("ab", "abc") < 0)
    assert(TextStreams.utf8Compare("b", "a") > 0)
  }

  test("streamingLangId: arrivals tag against static trained profiles " +
    "with exact (pred, dist) parity vs the batch classifier") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // three languages with disjoint character inventories; every doc
      // that the BATCH op holds out (doc_id % 5 == 0) streams in here
      def mk(lang: String, text: String, ids: Seq[Long]) =
        ids.map(i => (i, text, lang))
      val rows =
        mk("aa", "alpha appla lapa", Seq(0L, 1L, 2L, 5L, 10L)) ++
        mk("bb", "bribo obrib ribbo", Seq(15L, 3L, 4L, 6L, 20L)) ++
        mk("cc", "cocci icoc ccio", Seq(25L, 7L, 8L, 9L, 30L))
      val corpus = rows.toDF("doc_id", "text", "lang")
      val profiles = operators.TextOps.ctLangProfiles(corpus, topN = 20)
      val want = operators.TextOps.ctLangId(corpus, topN = 20)
        .as[(Long, String, String, Long)].collect()
        .map(r => (r._1, r._3, r._4)).toSet
      val heldOut = rows.filter(_._1 % 5 == 0).map(r => (r._1, r._2))
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingLangId(
          mem.toDF().toDF("doc_id", "text"), profiles, topN = 20)
        .writeStream.format("memory").queryName("lang_stream")
        .outputMode("append").start()
      try {
        mem.addData(heldOut.take(3): _*); q.processAllAvailable()
        mem.addData(heldOut.drop(3): _*); q.processAllAvailable()
        val got = spark.table("lang_stream")
          .as[(Long, String, Long)].collect().toSet
        assert(got === want)
        // a gramless arrival emits nothing
        mem.addData((99L, "   ")); q.processAllAvailable()
        assert(spark.table("lang_stream").count() === want.size)
      } finally q.stop()
    }
  }

  test("streamingQualityScore: two-batch logit parity with the batch NB " +
    "scorer under the same trained weights, incl. the tokenless doc") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // training corpus: curated tier speaks distinct words
      val corpus = (0L until 20L).map { i =>
        val curated = i % 2 == 0
        (i, if (curated) "alpha beta gamma" else "junk junk filler",
          if (curated) "src1" else "src11")
      }.toDF("doc_id", "text", "source")
      val B = 64
      val weights = operators.TextOps.nbQualityTrain(corpus, buckets = B)
      val prior = operators.TextOps.nbPriorMicro(corpus)
      // batch reference over the docs the stream will carry
      val arrivals = Seq(
        (100L, "alpha beta gamma alpha", "srcX"),
        (101L, "junk filler", "srcX"),
        (102L, " ", "srcX"), // tokenless: bare prior
        (103L, "alpha junk", "srcX"))
      // batch scorer needs the TRAIN corpus present to refit; instead
      // score arrivals against the SAME weights by reusing its formula
      val wmap = weights.as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._4 - r._5)).toMap
      val want = arrivals.map { case (id, text, _) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        // hash64 is non-negative (60-bit), so plain % == pmod
        val s = toks.map(t => wmap(
          graft.functions.PortableMd5.hash64(t.getBytes("UTF-8")) % B)).sum
        (id, toks.length.toLong, prior + s, prior + s >= 0)
      }.toSet
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingQualityScore(
          mem.toDF().toDF("doc_id", "text"), weights, prior, buckets = B)
        .writeStream.format("memory").queryName("nb_stream")
        .outputMode("append").start()
      try {
        mem.addData(arrivals.take(2).map(a => (a._1, a._2)): _*)
        q.processAllAvailable()
        mem.addData(arrivals.drop(2).map(a => (a._1, a._2)): _*)
        q.processAllAvailable()
        val got = spark.table("nb_stream")
          .as[(Long, Long, Long, Boolean)].collect().toSet
        assert(got === want)
        // separation sanity: curated-vocab arrival kept, junk dropped
        val byId = got.map(r => r._1 -> r._4).toMap
        assert(byId(100L) && !byId(101L))
      } finally q.stop()
    }
  }

  test("streamingPerplexityGate: two-batch parity with the batch KN " +
    "scorer through the FULL save->load->stream artifact chain") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val lm = ((1L to 20L).map(i => (i, "p q s")) ++
        (21L to 40L).map(i => (i, "t q r")) ++
        (41L to 42L).map(i => (i, "u v w"))).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("knmodel").toString
      operators.TextOps.saveKnModel(lm, dir)
      val (big, tt, vs) = operators.TextOps.loadKnModel(spark, dir)
      // arrivals: fluent-bigrams/unattested-trigram, attested, an
      // unknown-context doc (every bigram drops -> NO emission), a
      // one-token doc (no bigrams -> no emission)
      val arrivals = Seq(
        (100L, "p q r"), (101L, "u v w"), (102L, "zz yy"), (103L, "p"))
      val want = operators.TextOps
        .knPerplexity(arrivals.toDF("doc_id", "text"), lm)
        .as[(Long, Long, Double)].collect()
        .map { case (id, n, bits) => (id, n, bits, bits <= 1.0) }.toSet
      assert(want.map(_._1) === Set(100L, 101L), "batch excludes 102/103")
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingPerplexityGate(
          mem.toDF().toDF("doc_id", "text"), big, tt, vs, maxBits = 1.0)
        .writeStream.format("memory").queryName("kn_stream")
        .outputMode("append").start()
      try {
        mem.addData(arrivals.take(2): _*)
        q.processAllAvailable()
        mem.addData(arrivals.drop(2): _*)
        q.processAllAvailable()
        val got = spark.table("kn_stream")
          .as[(Long, Long, Double, Boolean)].collect().toSet
        assert(got === want, s"stream $got vs batch $want")
        // the gate separates: the unattested-trigram doc is still fine
        // under a BIGRAM gate (0.5412 bits) — both arrivals keep at 1.0
        assert(got.forall(_._4))
      } finally q.stop()
    }
  }

  test("streamingPerplexityGate3: two-batch parity with batch " +
    "kn3Perplexity and the formulaic-spam gap vs the bigram gate") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val lm = ((1L to 20L).map(i => (i, "p q s")) ++
        (21L to 40L).map(i => (i, "t q r")) ++
        (41L to 42L).map(i => (i, "u v w"))).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("kn3stream").toString
      operators.TextOps.saveKn3Model(lm, dir)
      val (big, tri, tt, vs) = operators.TextOps.loadKn3Model(spark, dir)
      val arrivals = Seq((100L, "p q r"), (101L, "u v w"), (102L, "a b"))
      // trigram gate at 1.0 bits: the fluent-bigram/unattested-trigram
      // doc (5.776 bits) must DROP where the bigram gate kept it
      val want = operators.TextOps
        .kn3Perplexity(arrivals.toDF("doc_id", "text"), lm)
        .as[(Long, Long, Double)].collect()
        .map { case (id, n, bits) => (id, n, bits, bits <= 1.0) }.toSet
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingPerplexityGate3(
          mem.toDF().toDF("doc_id", "text"), big, tri, tt, vs, maxBits = 1.0)
        .writeStream.format("memory").queryName("kn3_stream")
        .outputMode("append").start()
      try {
        mem.addData(arrivals.take(1): _*)
        q.processAllAvailable()
        mem.addData(arrivals.drop(1): _*)
        q.processAllAvailable()
        val got = spark.table("kn3_stream")
          .as[(Long, Long, Double, Boolean)].collect().toSet
        assert(got === want, s"stream $got vs batch $want")
        val keep = got.map(r => r._1 -> r._4).toMap
        assert(!keep(100L) && keep(101L),
          s"trigram gate must drop the unattested-trigram doc: $got")
      } finally q.stop()
    }
  }

  test("streamingPerplexityGap: two-batch parity with batch knGap, both " +
    "orders' bits at ingest and the spam gap separating") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val lm = ((1L to 20L).map(i => (i, "p q s")) ++
        (21L to 40L).map(i => (i, "t q r")) ++
        (41L to 42L).map(i => (i, "u v w"))).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("kngapstream").toString
      operators.TextOps.saveKn3Model(lm, dir)
      val (big, tri, tt, vs) = operators.TextOps.loadKn3Model(spark, dir)
      // 100 = the formulaic doc: every bigram attested (p-q from block 1,
      // q-r from block 2) but the trigram p-q-r never occurs — LOW kn
      // bits, HIGH kn3 bits, LARGE gap. 101 = genuinely attested text:
      // both orders cheap, small gap. 102 = two tokens only: no trigram
      // leg, emits NOTHING (the batch inner join).
      val arrivals = Seq((100L, "p q r"), (101L, "u v w"), (102L, "p q"))
      val maxGap = 2.0
      val want = operators.TextOps
        .knGap(arrivals.toDF("doc_id", "text"), lm)
        .as[(Long, Long, Long, Double, Double, Double)].collect()
        .map { case (id, n2, n3, b2, b3, g) => (id, n2, n3, b2, b3, g, g <= maxGap) }
        .toSet
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingPerplexityGap(
          mem.toDF().toDF("doc_id", "text"), big, tri, tt, vs, maxGap)
        .writeStream.format("memory").queryName("kn_gap_stream")
        .outputMode("append").start()
      try {
        mem.addData(arrivals.take(1): _*)
        q.processAllAvailable()
        mem.addData(arrivals.drop(1): _*)
        q.processAllAvailable()
        val got = spark.table("kn_gap_stream")
          .as[(Long, Long, Long, Double, Double, Double, Boolean)]
          .collect().toSet
        assert(got === want, s"stream $got vs batch $want")
        val byId = got.map(r => r._1 -> r).toMap
        assert(!byId.contains(102L), "bigram-only doc emits nothing")
        assert(!byId(100L)._7 && byId(101L)._7,
          s"the gap must drop the formulaic doc and keep the attested one: $got")
        assert(byId(100L)._6 > byId(101L)._6,
          "spam gap must exceed the attested doc's gap")
      } finally q.stop()
    }
  }

  test("streamingDecontaminate: two-batch parity with the batch screen, " +
    "per-arrival emission pinned") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val bench = Seq(
        (100L, "q1 q2 q3 q4"),
        (101L, "z1 z2 z3")).toDF("doc_id", "text")
      val b1 = Seq(
        (1L, "q1 q2 q3 q4 tail"), // grams q1q2q3, q2q3q4 hit -> 2
        (2L, "clean doc here no overlap"))
      val b2 = Seq(
        (3L, "x z1 z2 z3"), // gram z1z2z3 hits -> 1
        (4L, "also clean text"),
        (1L, "q1 q2 q3 only")) // doc 1 RE-ARRIVES: audited independently
      val mem = MemoryStream[(Long, String)]
      val q = TextStreams.streamingDecontaminate(
          mem.toDF().toDF("doc_id", "text"), bench)
        .writeStream.format("memory").queryName("decontam_stream")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        val after1 = spark.table("decontam_stream")
          .as[(Long, Long)].collect().toSet
        // batch parity on batch 1 alone
        val want1 = graft.operators.TextOps.decontaminate(
          b1.toDF("doc_id", "text"), bench)
          .as[(Long, Long)].collect().toSet
        assert(after1 === want1 && after1 === Set((1L, 2L)))
        mem.addData(b2: _*); q.processAllAvailable()
        val all = spark.table("decontam_stream")
          .as[(Long, Long)].collect().toSeq
        // batch-2 arrivals audited against the same static benchmark;
        // the re-ingested doc 1 emits AGAIN with its new text's count —
        // no cross-batch state exists to suppress or accumulate it
        val batch2 = all.diff(after1.toSeq)
        val want2 = graft.operators.TextOps.decontaminate(
          b2.toDF("doc_id", "text"), bench)
          .as[(Long, Long)].collect().toSet
        assert(batch2.toSet === want2)
        assert(batch2.toSet === Set((3L, 1L), (1L, 1L)))
      } finally q.stop()
    }
  }

  test("streamingOovGate: two-batch parity with batch vocabCoverageWith " +
    "through the save->load->stream artifact chain") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a z"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("vocabstream").toString
    operators.TextOps.saveVocabModel(corpus, dir, topK = 2)
    val (vocab, _) = operators.TextOps.loadVocabModel(spark, dir)
    // arrivals: mostly-covered (keep), all-OOV (drop), tokenless (no row)
    val arrivals = Seq((100L, "a b z"), (101L, "z z"), (102L, " "))
    val want = operators.TextOps
      .vocabCoverageWith(arrivals.toDF("doc_id", "text"), vocab)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, c, oov) => (id, n, c, oov, oov <= 0.5) }.toSet
    assert(want.map(_._1) === Set(100L, 101L), "batch excludes tokenless")
    val mem = MemoryStream[(Long, String)]
    val q = TextStreams.streamingOovGate(
        mem.toDF().toDF("doc_id", "text"), vocab, maxOov = 0.5)
      .writeStream.format("memory").queryName("oov_stream")
      .outputMode("append").start()
    try {
      mem.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("oov_stream")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(got === want, s"stream $got vs batch $want")
      val keep = got.map(r => r._1 -> r._5).toMap
      assert(keep(100L) && !keep(101L))
    } finally q.stop()
  }
}
