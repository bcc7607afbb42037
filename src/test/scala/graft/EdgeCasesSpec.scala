package graft

import graft.operators.{Cdc, Dedup, Prune, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior of the round-5 operators: empty frames are
  * the inputs a long-running pipeline WILL eventually see (an empty CDC
  * batch, a fully-filtered corpus, a dimension with no survivors).
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))

  test("weightedSample and packSequences of an empty corpus are empty") {
    assert(TextOps.weightedSample(emptyDocs).count() === 0)
    assert(TextOps.packSequences(emptyDocs).count() === 0)
  }

  test("corpus-filter ops handle empty and sub-minimal documents") {
    // empty corpus → empty everywhere, no divide-by-zero
    assert(TextOps.repetitionSignals(emptyDocs).count() === 0)
    assert(TextOps.unigramEntropy(emptyDocs).count() === 0)
    assert(TextOps.lmPerplexity(emptyDocs).count() === 0)
    assert(TextOps.decontaminate(emptyDocs, emptyDocs).count() === 0)
    // single-token docs: no bigrams/3-grams → dropped from the n-gram ops,
    // entropy still defined (one token → 0 bits)
    val tiny = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(TextOps.repetitionSignals(tiny).count() === 0)
    assert(TextOps.lmPerplexity(tiny).count() === 0)
    assert(TextOps.decontaminate(tiny, tiny).count() === 0)
    val e = TextOps.unigramEntropy(tiny).as[(Long, Int, Double)].collect()
    assert(e.toSeq === Seq((1L, 1, 0.0)))
  }

  test("lexicalDiversity, vocabCoverage and videoSceneCuts on empty inputs") {
    assert(TextOps.lexicalDiversity(emptyDocs).count() === 0)
    assert(TextOps.vocabCoverage(emptyDocs).count() === 0)
    val emptyMedia = graft.operators.Multimodal.fromBinary(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType),
          StructField("bytes", BinaryType)))),
      "id", "bytes", "video")
    assert(graft.operators.Multimodal.videoSceneCuts(emptyMedia).count() === 0)
    assert(graft.operators.Multimodal.audioSegmentBounds(emptyMedia).count() === 0)
  }

  test("mergeUpsert with an empty change batch returns base unchanged") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal")
    val changes = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("key", LongType), StructField("op", StringType),
        StructField("ts", TimestampType), StructField("seq", LongType),
        StructField("bal", DoubleType))))
    val got = Cdc.mergeUpsert(base, changes, "id")
      .select("id", "name", "bal").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b", 20.0)))
  }

  test("resolveClusters with no pairs keeps every doc (union-find path)") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val got = Dedup.resolveClusters(docs, pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, true)))
  }

  test("bloomPrunedJoin with an empty build side returns no rows") {
    val probe = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val build = Seq.empty[(Long, String)].toDF("k", "tag")
    assert(Prune.bloomPrunedJoin(probe, build, "k", "k").count() === 0)
  }

  test("round-7 text/doc ops on empty and degenerate corpora") {
    // empty corpus: no pairs, no folds, no divergences — and no crashes
    assert(TextOps.ksSourceLens(emptyDocs).count() === 0)
    assert(TextOps.kFoldAssign(emptyDocs).count() === 0)
    assert(TextOps.jsdSources(emptyDocs).count() === 0)
    assert(TextOps.langFertility(emptyDocs).count() === 0)
    assert(Dedup.containmentPairs(emptyDocs).count() === 0)
    assert(graft.operators.RelationalX.hllOverlap(emptyDocs).count() === 0)
    // one source: every pairwise op is empty, per-source ops still emit
    val solo = Seq((1L, "a b c", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.ksSourceLens(solo).count() === 0)
    assert(graft.operators.RelationalX.hllOverlap(solo).count() === 0)
    assert(TextOps.jsdSources(solo).count() === 1)
    assert(TextOps.kFoldAssign(solo).count() === 1)
  }

  test("round-7 graph/event ops on empty and single-row inputs") {
    val noEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
    assert(graft.operators.Graph.labelPropagate(noEdges, iters = 2).count() === 0)
    val res = graft.operators.Graph.pageRankUntil(noEdges, epsMicro = 0L)
    assert(res.ranks.count() === 0)
    res.release()
    // a lone event has no holding interval and no attributable purchase
    val oneEvent = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.operators.EventOps.timeWeightedAvgOf(oneEvent).count() === 0)
    val attr = graft.operators.EventOps.attributionOf(oneEvent)
      .as[(String, Long, Double)].collect().toSeq
    assert(attr === Seq(("direct", 1L, 5.0)))
  }

  test("round-11 ops on empty and degenerate inputs") {
    import graft.operators.{Graph, Multimodal, Similarity}
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // empty graph: every round-11 graph op returns empty without jobs
    // failing on empty aggregates or the winner collect
    assert(Graph.katzCentrality(emptyEdges).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Graph.hits(emptyEdges).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Graph.clusteringCoefficient(emptyEdges).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Graph.linkPredictionRA(emptyEdges).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    // a single self-loop edge: canonicalization drops it everywhere
    val selfLoop = Seq((7L, 7L)).toDF("src", "dst")
    assert(Graph.clusteringCoefficient(selfLoop).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    // BPE on an empty corpus: no merges learned, encode yields no rows
    assert(TextOps.bpeMerges(emptyDocs).count() === 0)
    assert(TextOps.applyBpe(emptyDocs, Seq(("a", "b"))).count() === 0)
    // BPE on a vocabulary that exhausts before nMerges: ranks stay dense
    val tiny = Seq((1L, "xy")).toDF("doc_id", "text")
    val m = TextOps.bpeMerges(tiny, nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m === Seq((1, "x", "y", 1L)))
    // whitespace-only doc still gets a 0-token row through the encode
    val blank = Seq((1L, "s", 3L, "   ")).toDF("doc_id", "source", "n_chars", "text")
    val enc = TextOps.applyBpe(blank, Seq(("a", "b")))
      .select("bpe_tok").as[Long].collect().toSeq
    assert(enc === Seq(0L))
    // label-noise audit on an empty embedding table
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.labelNoiseAudit(emptyEmb).count() === 0)
    // media quality on an empty media frame
    val emptyMedia = Multimodal.fromBinary(
      Seq.empty[(Long, Array[Byte])].toDF("id", "bytes"), "id", "bytes", "image")
    assert(Multimodal.imageQuality(emptyMedia).count() === 0)
    assert(Multimodal.phashDupCounts(emptyMedia).count() === 0)
    graft.plans.ReleaseRegistry.drain()
  }

  test("round-13 ops on empty and degenerate inputs") {
    import graft.operators.{Multimodal, Similarity}
    // unigram trainer on an empty corpus: empty vocab, no exceptions
    // from the seed collects or the log of an empty total
    assert(TextOps.unigramVocab(emptyDocs).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(TextOps.unigramTokens(emptyDocs).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    // whitespace-only doc keeps a zero row through the encode
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    val t = TextOps.unigramTokens(blank).as[(Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(t === Seq((1L, 0L)))
    // single-char corpus: the vocab is exactly that char
    val one = Seq((1L, "a a a")).toDF("doc_id", "text")
    val v = TextOps.unigramVocab(one).as[(String, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(v.map(_._1) === Seq("a") && v.head._2 === 3L)
    // audio family on empty media and on a sub-window real WAV
    val emptyMedia = Multimodal.fromBinary(
      Seq.empty[(Long, Array[Byte])].toDF("id", "bytes"), "id", "bytes", "audio")
    assert(Multimodal.audioFingerprints(emptyMedia).count() === 0)
    assert(Multimodal.audioDupPairs(emptyMedia).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Multimodal.audioQuality(emptyMedia).count() === 0)
    val shortWav = Multimodal.MediaCodec.wavPcm16(Array.tabulate(10)(_.toShort))
    val m1 = Multimodal.fromBinary(Seq((1L, shortWav)).toDF("id", "b"),
      "id", "b", "audio")
    // decodable but < 1 window: zero fingerprint rows, but quality
    // still reports the real (windowless) sample stats
    assert(Multimodal.audioFingerprints(m1).count() === 0)
    val q = Multimodal.audioQuality(m1)
      .as[(Long, Boolean, Long, Long, Long, Long, Long)].collect().head
    assert(q._2 && q._3 === 10L && q._6 === 0L && q._7 === 0L)
    // MMR: empty corpus and a pool of one both behave
    val emptyEmb2 = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.mmrRerank(emptyEmb2, emptyEmb2).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    val two = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val sel = Similarity.mmrRerank(two, two.where($"vec_id" === 0L),
      k = 3, pool = 3)
      .as[(Long, Long, Int, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    // only one candidate exists (self excluded): one rank-1 row
    assert(sel === Seq((0L, 1L, 1, 70L * 0L)))
  }

  test("round-14 ops on empty and degenerate inputs") {
    val emptyDocs3 = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    // NB trainer on an empty corpus: the FULL bucket table with pure
    // smoothing weights (ln(1/B)), never NULL weights
    val w = TextOps.nbQualityTrain(emptyDocs3, buckets = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(w.length === 8 && w.forall(r => r._2 === 0L && r._3 === 0L))
    val lnInvB = math.round(math.log(1.0 / 8) * 1e6)
    assert(w.forall(r => r._4 === lnInvB && r._5 === lnInvB))
    // scorer/prior on a single-class training split: LOUD failure, not
    // an infinite prior cast to a legal-looking long
    val oneClass = Seq((1L, "a b", "src0"), (2L, "c", "src1"))
      .toDF("doc_id", "text", "source")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.TextOps.nbQualityScore(oneClass)
    }
    assert(ex.getMessage.contains("class prior undefined"))
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.nbPriorMicro(oneClass)
    }
    // trained lang-ID: empty corpus and a corpus whose every doc is
    // held out (no training rows) both yield empty frames, no throw
    val emptyLang = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    assert(TextOps.ctLangProfiles(emptyLang).count() === 0)
    assert(TextOps.ctLangId(emptyLang).count() === 0)
    val allHeldOut = Seq((0L, "a b c", "xx"), (5L, "d e f", "yy"))
      .toDF("doc_id", "text", "lang")
    assert(TextOps.ctLangId(allHeldOut).count() === 0)
    // wordpiece encode: empty corpus empty; whitespace-only doc keeps a
    // zero row (the unigram twin's contract)
    assert(TextOps.wordpieceTokens(emptyDocs).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    val blank2 = Seq((1L, "   ")).toDF("doc_id", "text")
    val wp = TextOps.wordpieceTokens(blank2).as[(Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(wp === Seq((1L, 0L)))
  }

  test("round-15 operators handle empty and sub-minimal inputs") {
    // trigram KN: empty corpus empty; a two-token doc has no trigrams ->
    // excluded (the bigram operator's exclusion one order up); a doc
    // whose trigram CONTEXT is unknown drops entirely via the inner join
    assert(TextOps.kn3Perplexity(emptyDocs).count() === 0)
    val two = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(TextOps.kn3Perplexity(two).count() === 0)
    val lm = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextOps.kn3Perplexity(
      Seq((9L, "x y z")).toDF("doc_id", "text"), lm).count() === 0)
    // image near-dup pairs: empty media and a single row both pair-free
    import graft.operators.Multimodal
    val emptyMedia = Multimodal.fromBinary(
      Seq.empty[(Long, Array[Byte])].toDF("id", "bytes"),
      "id", "bytes", "image")
    assert(Multimodal.phashNearPairs(emptyMedia).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    val one = Multimodal.fromBinary(
      Seq((1L, "solo payload".getBytes("UTF-8"))).toDF("id", "bytes"),
      "id", "bytes", "image")
    assert(Multimodal.phashNearPairs(one).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Multimodal.phashNearKeep(one).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    // artifact scorers on an empty scored corpus: empty, no throw
    val dir = java.nio.file.Files.createTempDirectory("kn_edge").toString
    TextOps.saveKn3Model(lm, dir)
    val (big, tri, tt, vs) = TextOps.loadKn3Model(spark, dir)
    assert(TextOps.knScoreWith(emptyDocs, big, tt, vs).count() === 0)
    assert(TextOps.kn3ScoreWith(emptyDocs, big, tri, tt, vs).count() === 0)
  }

  test("round-16 operators handle empty, degenerate, and null inputs") {
    import graft.operators.{Multimodal, Similarity}
    // knGap: empty corpus empty; a two-token doc scores the bigram leg
    // only, so the inner join excludes it from the gap frame
    assert(TextOps.knGap(emptyDocs).count() === 0)
    val lm = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val gap = TextOps.knGap(lm)
    assert(gap.where(col("doc_id") === 2L).count() === 0)
    assert(gap.where(col("doc_id") === 1L).count() === 1)
    // DCT hash: empty media empty; single row pair-free; NULL payloads
    // are DROPPED before hashing (not packed to a degenerate phash-0
    // bucket) in every perceptual-hash variant
    val emptyMedia = Multimodal.fromBinary(
      Seq.empty[(Long, Array[Byte])].toDF("id", "bytes"),
      "id", "bytes", "image")
    assert(Multimodal.phashDctNearPairs(emptyMedia).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    val withNulls = Multimodal.fromBinary(
      Seq((1L, "payload one".getBytes("UTF-8")),
        (2L, null.asInstanceOf[Array[Byte]]),
        (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "bytes"),
      "id", "bytes", "image")
    assert(Multimodal.perceptualHash(withNulls).count() === 1)
    assert(Multimodal.perceptualHashWide(withNulls).count() === 1)
    assert(Multimodal.perceptualHashDct(withNulls).count() === 1)
    // the two null rows must NOT pair with each other (the degenerate
    // phash-0 bucket the null-drop exists to prevent)
    assert(Multimodal.phashNearPairs(withNulls).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Multimodal.phashDctNearPairs(withNulls).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    assert(Multimodal.phashDctNearKeep(withNulls).count() === 0)
    graft.plans.ReleaseRegistry.drain()
    // k-means artifact on a degenerate one-point corpus: one centroid
    // row per seeded cluster id present, scoring assigns d2 = 0
    val onePoint = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val kdir = java.nio.file.Files.createTempDirectory("km_edge").toString
    Similarity.saveKmeansModel(onePoint, kdir, kClusters = 4, iters = 1)
    val (cents, _, _) = Similarity.loadKmeansModel(spark, kdir)
    assert(cents.count() === 1)
    val scored = Similarity.kmeansAssignWith(onePoint, cents)
      .as[(Long, Long, Double)].collect()
    assert(scored.length === 1 && scored.head._3 === 0.0)
    graft.plans.ReleaseRegistry.drain()
    // stored-model consumers on an empty scored shard: empty, no throw
    assert(Similarity.kmeansAssignWith(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      cents).count() === 0)
    assert(Similarity.semDedupWith(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      cents).count() === 0)
    graft.plans.ReleaseRegistry.drain()
  }
}
