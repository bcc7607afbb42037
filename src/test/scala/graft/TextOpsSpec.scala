package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    Seq((1L, "a b a"), (2L, "b c"), (3L, "x y z")).toDF("doc_id", "text")

  test("wordCount counts tokens across documents") {
    val got = TextOps.wordCount(docs).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  test("invertedIndex emits per-doc postings with occurrence counts") {
    val got = TextOps.invertedIndex(docs).as[(String, Long, Long)].collect().toSet
    assert(got.contains(("a", 1L, 2L)))
    assert(got.contains(("b", 1L, 1L)))
    assert(got.contains(("b", 2L, 1L)))
    assert(!got.exists { case (w, d, _) => w == "a" && d == 2L })
  }

  test("tokenStats: counts, distinct, ttr") {
    val row = TextOps.tokenStats(docs).where($"doc_id" === 1).head()
    assert(row.getAs[Int]("n_tokens") === 3)
    assert(row.getAs[Int]("n_uniq") === 2)
    assert(row.getAs[Double]("ttr") === 0.6667)
    assert(row.getAs[Double]("mean_tok_len") === 1.0)
  }

  test("lexicalDiversity: types, hapax, ratios; empty doc kept with nulls") {
    val d = Seq((1L, "a b a c"), (2L, "x x x"), (3L, " ")).toDF("doc_id", "text")
    val got = TextOps.lexicalDiversity(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 4 tokens, 3 types (a b c), hapax {b, c} → ttr .75, hapax 2/3
    assert(got(1L).getLong(1) === 4L && got(1L).getLong(2) === 3L)
    assert(got(1L).getDouble(3) === 0.75)
    assert(got(1L).getDouble(4) === 0.666667)
    // doc 2: one type repeated → ttr 1/3, zero hapax
    assert(got(2L).getLong(2) === 1L && got(2L).getDouble(4) === 0.0)
    // doc 3: no tokens → zero counts, null ratios
    assert(got(3L).getLong(1) === 0L && got(3L).isNullAt(3) && got(3L).isNullAt(4))
  }

  test("vocabCoverage: OOV rate against the corpus top-K vocab, " +
    "count-desc word-asc tie-break") {
    // counts: a=3 b=2 c=2 z=1 → topK=2 keeps {a, b} (c loses the b/c tie)
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a z")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(d, topK = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 2L, 0.333333)))
    assert(got(3L) === ((2L, 1L, 0.5)))
  }

  // Seeded property checks (the MapReduceSpec style): distributed
  // results must equal an in-memory reference on random corpora.
  test("property: lexicalDiversity and vocabCoverage match in-memory " +
    "references on random corpora; coverage is monotone in topK") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 5) {
      val raw = (1L to 30L).map(i => (i,
        List.fill(rnd.nextInt(12))(s"w${rnd.nextInt(8)}").mkString(" ")))
      val docs = raw.toDF("doc_id", "text")
      val lexWant = raw.map { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) id -> ((0L, 0L, None, None))
        else {
          val c = toks.groupBy(identity).map(_._2.length)
          val (n, t, h) = (toks.length.toLong, c.size.toLong,
            c.count(_ == 1).toLong)
          id -> ((n, t, Some(round6(t.toDouble / n)),
            Some(round6(h.toDouble / t))))
        }
      }.toMap
      val lexGot = TextOps.lexicalDiversity(docs).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      assert(lexGot === lexWant)
      val allToks = raw.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      def vocabOf(k: Int) = allToks.groupBy(identity)
        .map { case (w, o) => (w, o.length) }.toSeq
        .sortBy { case (w, c) => (-c, w) }.take(k).map(_._1).toSet
      def covWant(k: Int) = raw.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else {
          val cov = toks.count(vocabOf(k)).toLong
          Some(id -> ((toks.length.toLong, cov,
            round6(1.0 - cov.toDouble / toks.length))))
        }
      }.toMap
      val got3 = TextOps.vocabCoverage(docs, topK = 3).collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got3 === covWant(3))
      val got6 = TextOps.vocabCoverage(docs, topK = 6).collect().map(r =>
        r.getLong(0) -> r.getLong(2)).toMap
      // a larger vocabulary never covers fewer occurrences
      got3.foreach { case (id, (_, cov3, _)) =>
        assert(got6(id) >= cov3, s"doc $id: topK=6 covers less than topK=3")
      }
    }
  }

  test("nbCalibration: equal-population holdout bins, ordered " +
    "non-overlapping logit ranges, rates in [0,1]") {
    val docs = Tables.documents(spark, sfDir)
    val holdout = docs.where($"doc_id" % 5 === 0).count()
    val bins = TextOps.nbCalibration(docs)
      .orderBy("bin")
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    graft.plans.ReleaseRegistry.drain()
    assert(bins.map(_._1).toSeq === (0 until 10), s"bins: ${bins.toSeq}")
    assert(bins.map(_._2).sum === holdout)
    // equal population: rank-based cut → sizes differ by at most 1
    assert(bins.map(_._2).max - bins.map(_._2).min <= 1, s"${bins.toSeq}")
    // bins partition the logit axis in order (ties may share a boundary)
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bin ${a._1} hi > bin ${b._1} lo: ${bins.toSeq}")
    case _ => }
    assert(bins.forall(r => r._6 >= 0.0 && r._6 <= 1.0))
    assert(bins.forall(r => r._5 <= r._2), "n_pos bounded by n_docs")
  }

  test("vocab artifact round-trip: the stored vocabulary scores " +
    "bit-identically to the in-session fit") {
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a z")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("vocabmodel").toString
    TextOps.saveVocabModel(d, dir, topK = 2)
    val (vocab, k) = TextOps.loadVocabModel(spark, dir)
    assert(k === 2)
    assert(vocab.select("word").as[String].collect().toSet === Set("a", "b"))
    val direct = TextOps.vocabCoverage(d, topK = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val stored = TextOps.vocabCoverageWith(d, vocab)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(stored === direct)
  }

  test("fingerprint is token-order-insensitive") {
    val fp = TextOps.fingerprint(
      Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta")).toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    assert(fp(1L) === fp(2L))
  }

  test("langId picks the language with most marker hits, deterministic ties") {
    val d = Seq(
      (1L, "der hund und die katze ist da", "de"),
      (2L, "no markers here whatsoever", "xx")).toDF("doc_id", "text", "lang")
    val got = TextOps.langId(d).select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) === "de")
    assert(got(2L) === "en") // zero hits everywhere → first in priority order
  }

  test("tfidf: rarer words score higher; per-doc tf scales") {
    val d = Seq((1L, "rare common"), (2L, "common"), (3L, "common common")).toDF("doc_id", "text")
    val got = TextOps.tfidf(d).as[(Long, String, Double)]
      .collect().map { case (id, w, s) => (id, w) -> s }.toMap
    // idf(rare) = ln(4/2), idf(common) = ln(4/4) = 0
    assert(got((1L, "rare")) === math.rint(math.log(2.0) * 10000) / 10000)
    assert(got((1L, "common")) === 0.0)
    assert(got((3L, "common")) === 0.0) // tf=2 × idf=0
  }

  test("tokenCounts: whitespace vs BPE-ish regex tokenization") {
    val d = Seq((1L, "hello, world! it's 42")).toDF("doc_id", "text")
    val row = TextOps.tokenCounts(d).head()
    assert(row.getAs[Int]("n_ws_tokens") === 4)
    // hello , world ! it ' s 42
    assert(row.getAs[Int]("n_bpe_tokens") === 8)
  }

  test("columnAggregates matches direct computation on sf0.001") {
    val li = Tables.lineitem(spark, sfDir)
    val row = TextOps.columnAggregates(li).head()
    assert(row.getAs[Long]("n") === li.count())
    val expectSum = math.rint(li.agg(sum("l_quantity")).head().getDouble(0) * 100) / 100
    assert(row.getAs[Double]("sum_qty") === expectSum)
  }

  test("packSequences: bins are contiguous, ordered, and budget-consistent") {
    val budget = 512L
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.packSequences(docs, budget)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay the packing sequentially on the driver
    var cum = 0L
    got.foreach { case (id, n, bin) =>
      assert(bin === cum / budget, s"doc $id bin mismatch")
      cum += n
    }
    // bins are non-decreasing in doc order and start at 0
    assert(got.head._3 === 0L)
    assert(got.sliding(2).forall { case Array(a, b) => a._3 <= b._3; case _ => true })
  }

  test("packSequences plan: the only single-partition window is over per-partition offsets") {
    val plan = TextOps.packSequences(Tables.documents(spark, sfDir))
      .queryExecution.sparkPlan.toString
    // the doc-scale window must be partitioned by pid, not global
    assert(plan.contains("Window") && plan.contains("pid"),
      s"expected pid-partitioned window:\n$plan")
  }

  test("repetitionSignals: dup and top bigram fractions; short docs dropped") {
    val d = Seq(
      (1L, "a b a b a"), // bigrams: ab ba ab ba → dup=1-2/4=0.5, top=2/4=0.5
      (2L, "x y z"),     // bigrams: xy yz → dup=0, top=0.5
      (3L, "solo")       // < 2 tokens → dropped
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(d).as[(Long, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(1L -> (0.5, 0.5), 2L -> (0.0, 0.5)))
  }

  test("unigramEntropy: uniform text maxes entropy, repeated token zeroes it") {
    val d = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.unigramEntropy(d).as[(Long, Int, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === 2.0) // 4 equiprobable tokens → log2(4)
  }

  test("lmPerplexity: add-one-smoothed bigram cross-entropy, hand-computed") {
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // LM: c(a,b)=2 c(a,c)=1 c(a·)=3 V=3
    // p(b|a)=3/6 → 1 bit; p(c|a)=2/6 → log2(3)=1.585 bits
    val got = TextOps.lmPerplexity(d).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.585))
  }

  test("lmPerplexity against a reference corpus: unseen bigrams floor, unknown contexts drop") {
    val ref = Seq((10L, "a b"), (11L, "a b")).toDF("doc_id", "text")
    // LM: c(a,b)=2, c(a·)=2, V={a,b}→2
    val docs = Seq(
      (1L, "a b"),  // known bigram: p=(2+1)/(2+2) → log2(4/3)=0.415
      (2L, "a z"),  // known context, unseen bigram: p=(0+1)/4 → 2 bits
      (3L, "z z")   // unknown context → dropped entirely
    ).toDF("doc_id", "text")
    val got = TextOps.lmPerplexity(docs, ref).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> 0.415, 2L -> 2.0))
  }

  test("decontaminate counts distinct shared 3-grams against the benchmark") {
    val train = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown" + "quick brown fox"
      (2L, "totally clean document here now")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox sleeps")).toDF("doc_id", "text")
    val got = TextOps.decontaminate(train, bench, minHits = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L))
  }

  test("sourceKl: hand-computed divergences; dominant source sits closest") {
    val d = Seq(
      (1L, "a b", "s1"), (2L, "a b", "s2"),
      (3L, "a b", "s3"), (4L, "c c", "s3")  // s3 dominates the corpus mix
    ).toDF("doc_id", "text", "source")
    // corpus: a:3 b:3 c:2 (n=8). KL(s1)=KL(s2)=log2(4/3)=0.415;
    // KL(s3)=.5*log2(2/3)+.5*log2(2)=0.2075 — closer, it IS most of the mix
    val got = TextOps.sourceKl(d).as[(String, Double)].collect().toMap
    assert(got === Map("s1" -> 0.415, "s2" -> 0.415, "s3" -> 0.2075))
    val uniform = TextOps.sourceKl(
      Seq((1L, "x y", "a"), (2L, "x y", "b")).toDF("doc_id", "text", "source"))
      .as[(String, Double)].collect().toMap
    assert(uniform === Map("a" -> 0.0, "b" -> 0.0))
  }

  test("mixSources: deterministic, rate-monotone, full-rate keeps everything") {
    val docs = Tables.documents(spark, sfDir)
    val q = TextOps.mixSources(docs, Map("src0" -> 0.25))
    assert(q.collect().map(_.getLong(0)).toSeq ===
      TextOps.mixSources(docs, Map("src0" -> 0.25)).collect().map(_.getLong(0)).toSeq)
    val n0 = docs.where($"source" === "src0").count()
    val kept0 = q.where($"source" === "src0").count()
    assert(kept0 < n0, "sampled source must shrink")
    assert(q.where($"source" =!= "src0").count() ===
      docs.where($"source" =!= "src0").count(), "default rate 1.0 keeps all")
    assert(TextOps.mixSources(docs, Map.empty).count() === docs.count())
  }

  test("plan shapes: decontam/lm_perplexity broadcast the small side, mixSources is shuffle-free") {
    val docs = Tables.documents(spark, sfDir)
    val dec = TextOps.decontaminate(
      docs.where($"source" =!= "src0"), docs.where($"source" === "src0"))
      .queryExecution.sparkPlan.toString
    assert(dec.contains("BroadcastHashJoin"),
      s"benchmark n-grams must broadcast:\n$dec")
    // LM tables carry no broadcast hint (AQE decides); only the scalar
    // vocab count is hint-broadcast, and nothing may go cartesian
    val lm = TextOps.lmPerplexity(docs).queryExecution.sparkPlan.toString
    assert(lm.contains("BroadcastNestedLoopJoin") && !lm.contains("CartesianProduct"),
      s"vocab scalar must broadcast, no cartesian:\n$lm")
    val mix = TextOps.mixSources(docs, Map("src0" -> 0.25))
      .queryExecution.sparkPlan.toString
    assert(!mix.contains("Exchange"), s"mixSources must be row-local:\n$mix")
    // the topK-bounded vocab must broadcast into the coverage join and
    // the vocab fit must be a TakeOrdered, never a global sort
    val vc = TextOps.vocabCoverage(docs).queryExecution.sparkPlan.toString
    assert(vc.contains("BroadcastHashJoin"),
      s"vocab must broadcast into the coverage join:\n$vc")
    assert(vc.contains("TakeOrdered"),
      s"vocab fit must be TakeOrdered:\n$vc")
  }

  test("duplicatedSpans flags only cross-corpus repeated k-token spans") {
    val d = Seq(
      (1L, "one two three four five six seven eight tail1"),
      (2L, "one two three four five six seven eight tail2"), // shares the 8-span
      (3L, "totally different words in this document here now")
    ).toDF("doc_id", "text")
    val got = TextOps.duplicatedSpans(d).as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // docs 1/2: 2 spans each, only the first ("one..eight") is shared
    assert(got === Map(1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (1L, 0L)))
  }

  test("dupSubstrings: longest duplicated substring per doc, hand-checked") {
    val d = Seq(
      // docs 1/2 share a 6-token run ("alpha .. foxtrot"); doc 1's longest
      // duplicate is that run, doc 3 shares only a 2-token run with doc 1
      (1L, "alpha bravo charlie delta echo foxtrot uno dos"),
      (2L, "pre alpha bravo charlie delta echo foxtrot post"),
      (3L, "uno dos standalone words without other overlap"),
      (4L, "nothing here matches anything else at all truly")
    ).toDF("doc_id", "text")
    val got = TextOps.dupSubstrings(d).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) === (8L, 6L, 0L)) // 8 tokens, "alpha..foxtrot" = 6
    assert(got(2L) === (8L, 6L, 0L))
    assert(got(3L) === (7L, 2L, 0L)) // "uno dos"
    assert(got(4L) === (8L, 0L, 0L)) // nothing duplicated anywhere
  }

  test("dupSubstrings: self-repetition counts, lengths saturate at w") {
    // one doc, token "rep" repeated 12 times: the suffix at position 1
    // shares 11 tokens with the suffix at position 2 (overlapping
    // self-duplication, the Lee et al. semantics)
    val d = Seq((1L, Seq.fill(12)("rep").mkString(" "))).toDF("doc_id", "text")
    val full = TextOps.dupSubstrings(d).as[(Long, Long, Long, Long)].head()
    assert(full === ((1L, 12L, 11L, 5L))) // positions 1..5 have full 8-wide dup spans
    // w caps the reported length: same corpus, w = 4
    val capped = TextOps.dupSubstrings(d, w = 4).as[(Long, Long, Long, Long)].head()
    assert(capped._3 === 4L)
  }

  test("dupSubstrings agrees with duplicatedSpans on the fixed-width subset") {
    // n_dup_spans8 (positions whose duplicate length >= 8 at full width)
    // must equal duplicatedSpans' n_dup_spans on every doc of the corpus —
    // the suffix construction is the exact superset of the k=8 span hash
    val docs = Tables.documents(spark, sfDir)
    val sub = TextOps.dupSubstrings(docs).select($"doc_id", $"n_dup_spans8")
    val spans = TextOps.duplicatedSpans(docs).select($"doc_id", $"n_dup_spans")
    val joined = sub.join(spans, Seq("doc_id"), "left")
      .select($"doc_id", $"n_dup_spans8", coalesce($"n_dup_spans", lit(0L)).as("n_dup_spans"))
    val disagree = joined.where($"n_dup_spans8" =!= $"n_dup_spans").count()
    assert(disagree === 0, "fixed-width-8 subset must agree with dup_spans")
    // and the family is live on this corpus: some duplication exists
    assert(TextOps.dupSubstrings(docs).agg(max($"max_dup_len")).as[Long].head() > 0L)
  }

  test("decontamSubstrings: longest train-bench shared substring, hand-checked") {
    val train = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 x1"), // shares a2..a9 (8) with bench
      (2L, "q1 q2 q3 q4 q5 q6 q7 q8"),       // nothing shared
      (3L, "z1 z2 m1 m2 m3 m4 m5 m6"),       // shares z1 z2 (2) with bench
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),    // shared ONLY with train doc 6
      (6L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "b1 a2 a3 a4 a5 a6 a7 a8 a9 b2"),
      (101L, "z1 z2 yy")
    ).toDF("doc_id", "text")
    val got = TextOps.decontamSubstrings(train, bench)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(1L) === ((8L, 1L))) // a2..a9; only position 2 has an 8-wide hit
    assert(got(2L) === ((0L, 0L)))
    assert(got(3L) === ((2L, 0L)))
    // train-train duplication must NOT read as contamination
    assert(got(5L) === ((0L, 0L)) && got(6L) === ((0L, 0L)))
    // bench docs never appear in the output
    assert(!got.contains(100L) && !got.contains(101L))
  }

  test("decontamSubstrings is consistent with the 3-gram screen on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val train = docs.where($"source" =!= "src0")
    val bench = docs.where($"source" === "src0")
    val sub = TextOps.decontamSubstrings(train, bench)
    // an 8-token shared span contains shared 3-grams, so every doc with
    // n_contam_spans8 > 0 must be flagged by the 3-gram decontaminate
    val flagged3 = TextOps.decontaminate(train, bench, minHits = 1)
      .select("doc_id")
    val orphan = sub.where($"n_contam_spans8" > 0)
      .join(flagged3, Seq("doc_id"), "left_anti")
    assert(orphan.count() === 0)
    // and the screen is live: some cross-source sharing exists
    assert(sub.agg(max($"max_shared_len")).as[Long].head() > 0L)
  }

  test("substringDedup: variable-span rewrite keeps first occurrences, hand-checked") {
    val d = Seq(
      (1L, "p1 s1 s2 s3 s4 s5 s6 s7 s8 t1"), // first occurrence of s1..s8
      (2L, "s1 s2 s3 s4 s5 s6 s7 s8 t2 t3"), // repeats it -> 8 tokens drop
      (3L, Seq.fill(10)("r").mkString(" "))   // self-repetition: run collapses
    ).toDF("doc_id", "text")
    val got = TextOps.substringDedup(d).as[(Long, Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((10L, 10L, "p1 s1 s2 s3 s4 s5 s6 s7 s8 t1")))
    assert(got(2L) === ((10L, 2L, "t2 t3")))
    // doc 3: starts 2 and 3 duplicate start 1's span; coverage 2..10
    assert(got(3L) === ((10L, 1L, "r")))
  }

  test("substringDedup election survives doc_ids past any radix bound") {
    // the first-occurrence election is min(struct(doc_id, i)) — no
    // encoded doc_id·10⁷+i key, so ids that would overflow BIGINT under
    // the old radix (doc_id ≥ ~9.2e11) still elect correctly, and a
    // >10M-token document cannot bleed its positions into the next
    // doc_id's range (structurally impossible: the struct ordering is
    // lexicographic, never arithmetic)
    val big = Long.MaxValue / 2 // old encoding: big * 1e7 overflows
    val d = Seq(
      (big, "s1 s2 s3 s4 s5 s6 s7 s8 u1 u2"),
      (big + 1L, "s1 s2 s3 s4 s5 s6 s7 s8 v1 v2")
    ).toDF("doc_id", "text")
    val got = TextOps.substringDedup(d).as[(Long, Long, Long, String)]
      .collect().map(r => r._1 -> ((r._3, r._4))).toMap
    // the smaller doc_id keeps the span; the larger drops it
    assert(got(big) === ((10L, "s1 s2 s3 s4 s5 s6 s7 s8 u1 u2")))
    assert(got(big + 1L) === ((2L, "v1 v2")))
  }

  test("decontamSubstrings: degenerate 1-doc benchmark stays balanced and correct") {
    // a tiny benchmark against a wide train corpus makes each segment
    // corpus-scale; the pid-local scan + carry-frame combine must still
    // give exact answers (the guard the global segment window lacked)
    val train = (0L until 64L).map { i =>
      (i, (0 until 12).map(j => s"t${i}_$j").mkString(" ") +
        (if (i % 16 == 5) " k1 k2 k3 k4 k5 k6 k7 k8 k9" else ""))
    }.toDF("doc_id", "text").repartition(16)
    val bench = Seq((999L, "k1 k2 k3 k4 k5 k6 k7 k8 k9")).toDF("doc_id", "text")
    val got = TextOps.decontamSubstrings(train, bench)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got.size === 64)
    (0L until 64L).foreach { i =>
      if (i % 16 == 5) assert(got(i) === ((9L, 2L)), s"doc $i: ${got(i)}")
      else assert(got(i) === ((0L, 0L)), s"doc $i: ${got(i)}")
    }
  }

  test("substringDedup corpus invariants: untouched iff no dup span, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.substringDedup(docs).cache()
    assert(out.count() === docs.count(), "1:1 with the input corpus")
    assert(out.where($"n_kept" > $"n_tokens").count() === 0)
    // something must actually deduplicate on this corpus
    assert(out.where($"n_kept" < $"n_tokens").count() > 0)
    // a doc with NO >=8-token duplicated span has no flagged start and
    // must come through byte-identical in token count
    val noDup = TextOps.dupSubstrings(docs).where($"max_dup_len" < 8)
      .select("doc_id")
    val touched = out.join(noDup, "doc_id").where($"n_kept" =!= $"n_tokens")
    assert(touched.count() === 0)
    // deterministic under a different input partitioning
    val b = TextOps.substringDedup(docs.repartition(7))
    assert(out.except(b).count() === 0 && b.except(out).count() === 0)
    out.unpersist()
  }

  test("segmentDedup: rewrite keeps each distinct segment exactly once, in order") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.segmentDedup(docs, k = 8).cache()
    // 1:1 with the input — fully-deduplicated docs stay as empty text
    assert(out.count() === docs.count())
    // each distinct segment survives exactly once corpus-wide
    val segs = docs
      .select($"doc_id", split($"text", "\\s+").as("toks"))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(toks) / 8.0) as int) - 1), " +
          "i -> concat_ws(' ', slice(toks, i * 8 + 1, 8)))")).as("seg"))
    val distinctSegs = segs.distinct().count()
    val kept = out.agg(sum("n_kept")).as[Long].head()
    assert(kept === distinctSegs)
    // untouched docs reassemble to their original (single-spaced) text
    val untouched = out.where($"n_seg" === $"n_kept")
      .join(docs, "doc_id")
      .where($"clean_text" =!= regexp_replace(trim($"text"), "\\s+", " "))
    assert(untouched.count() === 0)
    // deterministic under a different input partitioning
    val b = TextOps.segmentDedup(docs.repartition(7), k = 8)
    assert(out.except(b).count() === 0 && b.except(out).count() === 0)
    out.unpersist()
  }

  test("curriculumBins: ranks are a permutation, bins balanced and entropy-monotone") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextOps.curriculumBins(docs, nBins = 10).cache()
    val n = docs.count()
    assert(out.count() === n)
    // ranks are exactly 1..n
    val (mn, mx, d) = out
      .agg(min("rank"), max("rank"), countDistinct("rank"))
      .as[(Long, Long, Long)].head()
    assert(mn === 1L && mx === n && d === n)
    // bins are 0..9 with sizes within one of each other (equal-population)
    val sizes = out.groupBy("bin").count().select("count").as[Long].collect()
    assert(sizes.length === 10 && sizes.max - sizes.min <= 1)
    // bin is monotone in rank: no row of a higher bin has a lower rank
    // than any row of a lower bin
    val cross = out.select($"bin".as("b1"), $"rank".as("r1"))
      .join(out.select($"bin".as("b2"), $"rank".as("r2")),
        $"b1" < $"b2" && $"r1" > $"r2")
    assert(cross.count() === 0)
    // deterministic under a different input partitioning
    val b = TextOps.curriculumBins(docs.repartition(7), nBins = 10)
    assert(out.except(b).count() === 0 && b.except(out).count() === 0)
    out.unpersist()
  }

  test("bm25TopK: hand-checked scoring — tf saturation and length normalization") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple apple apple apple apple apple apple apple"),
      (3L, "cherry date fig grape kiwi lemon mango nut orange pear")
    ).toDF("doc_id", "text")
    val q = Seq((0L, Seq("apple")), (1L, Seq("cherry", "banana"))).toDF("query_id", "terms")
    val out = TextOps.bm25TopK(docs, q, k = 10)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    val q0 = out.filter(_._1 == 0L).sortBy(_._4)
    // only docs 1 and 2 contain "apple"
    assert(q0.map(_._2).toSet === Set(1L, 2L))
    // doc 2 wins (tf=8 → tf-part 17.6/9.38 ≈ 1.88 vs doc 1's 2.2/1.57 ≈
    // 1.40) but saturation + length normalization keep the gap well under
    // the raw 8x tf ratio
    assert(q0.head._2 === 2L)
    assert(q0.head._3 / q0.last._3 < 1.5)
    // every score is positive (the +1 idf form cannot go negative even
    // at df close to N) and ranks are 1..n per query
    assert(out.forall(_._3 > 0))
    assert(out.filter(_._1 == 1L).map(_._4).sorted.toSeq === Seq(1, 2))
    // a multi-term query scores the union of matching docs
    assert(out.filter(_._1 == 1L).map(_._2).toSet === Set(1L, 3L))
    // exact expected score for the singleton-match case, computed from
    // the formula by hand: doc 3 for "cherry": tf=1, df=1, dl=10, N=3,
    // avgdl = 20/3; idf = ln((3-1+0.5)/(1+0.5)+1) = ln(8/3);
    // denom = 1 + 1.2*(0.25 + 0.75*10/(20/3)) = 1 + 1.2*1.375 = 2.65
    // score = idf * 2.2 / 2.65
    val cherry = out.find(t => t._1 == 1L && t._2 == 3L).get._3
    val expected = math.round(
      1000000.0 * math.log(8.0 / 3.0) * (1 * 2.2) / 2.65) / 1000000.0
    assert(math.abs(cherry - expected) < 2e-6)
  }

  test("chunkDocuments: overlapping windows cover the doc, trailing window kept") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens → 4 windows
      (2L, "a b c d e"),                      // 5 tokens → 2, last shorter
      (3L, "solo"))                            // under one window → 1 chunk
      .toDF("doc_id", "text")
    val got = TextOps.chunkDocuments(docs, chunkTokens = 4, overlap = 2)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    assert(got(1L) === Seq(
      ("t1 t2 t3 t4", 4), ("t3 t4 t5 t6", 4), ("t5 t6 t7 t8", 4), ("t7 t8 t9 t10", 4)))
    assert(got(2L) === Seq(("a b c d", 4), ("c d e", 3)))
    assert(got(3L) === Seq(("solo", 1)))
    // stable key: (doc_id, chunk_id) unique
    val keys = TextOps.chunkDocuments(docs, 4, 2).select("doc_id", "chunk_id")
    assert(keys.distinct().count() === keys.count())
  }

  test("chunkDocuments reconstruction property: stepped prefixes rebuild every doc") {
    // dropping each chunk's overlap prefix (except chunk 0) and
    // concatenating must reproduce the original token stream exactly,
    // for arbitrary docs and (chunkTokens, overlap) combinations
    val rng = new scala.util.Random(7)
    val docs = (1L to 25L).map { id =>
      (id, (0 until (1 + rng.nextInt(40))).map(i => s"w${rng.nextInt(9)}_$i").mkString(" "))
    }.toDF("doc_id", "text")
    for ((ck, ov) <- Seq((4, 2), (8, 0), (5, 4))) {
      val step = ck - ov
      val rebuilt = TextOps.chunkDocuments(docs, ck, ov)
        .as[(Long, Int, String, Int)].collect()
        .groupBy(_._1).view.mapValues { chunks =>
          chunks.sortBy(_._2).zipWithIndex.flatMap { case ((_, _, text, _), i) =>
            val toks = text.split(" ").toSeq
            if (i == 0) toks else toks.drop(ov min toks.length)
          }.mkString(" ")
        }.toMap
      val original = docs.as[(Long, String)].collect().toMap
        .view.mapValues(_.split("\\s+").mkString(" ")).toMap
      original.foreach { case (id, text) =>
        assert(rebuilt(id) === text,
          s"doc $id ck=$ck ov=$ov:\n orig: $text\n rebuilt: ${rebuilt(id)}")
      }
    }
  }

  test("sourceOverlap: hand-computed vocabulary Jaccard, zero-overlap pairs kept") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "b c d", "s1"), // s1 vocab {a,b,c,d}
      (3L, "c d e", "s2"),                      // s2 vocab {c,d,e}
      (4L, "x y", "s3"))                        // s3 vocab {x,y} — disjoint
      .toDF("doc_id", "text", "source")
    val got = TextOps.sourceOverlap(docs)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size === 3) // full matrix over 3 sources
    assert(got(("s1", "s2")) === ((2L, 0.4)))   // {c,d} / {a,b,c,d,e}
    assert(got(("s1", "s3")) === ((0L, 0.0)))   // disjoint pair present
    assert(got(("s2", "s3")) === ((0L, 0.0)))
  }

  test("zipfFit: least-squares slope matches a direct computation; ranks dense") {
    // counts: "a" x8, "b" x4, "c" x4, "d" x2, "e" x1 (pruned by minCount)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(2)("d") ++ Seq("e")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val row = TextOps.zipfFit(docs).head()
    assert(row.getLong(0) === 4L) // a,b,c,d survive minCount=2
    // ranks: a→1; b,c tie on count 4 → word order gives b→2, c→3; d→4
    val pts = Seq((8.0, 1.0), (4.0, 2.0), (4.0, 3.0), (2.0, 4.0))
      .map { case (c, r) => (math.log(r) / math.log(2), math.log(c) / math.log(2)) }
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getDouble(1) === math.rint(slope * 1e4) / 1e4)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("pmiPairs: hand-computed association scores; margins from the bigram table") {
    // corpus: "a b" x4, "a c" x1, "d b" x1 → bigram counts c12(a,b)=4,
    // c12(a,c)=1, c12(d,b)=1; margins c1(a)=5, c1(d)=1, c2(b)=5, c2(c)=1;
    // n=6 → pmi(a,b) = log2(4*6/(5*5)), pmi(d,b) = log2(1*6/(1*5))
    val docs = (Seq.fill(4)("a b") ++ Seq("a c", "d b")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.pmiPairs(docs, minCount = 1L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("a", "b")) === ((4L, math.rint(math.log(24.0 / 25.0) / math.log(2) * 1e4) / 1e4)))
    assert(got(("d", "b")) === ((1L, math.rint(math.log(6.0 / 5.0) / math.log(2) * 1e4) / 1e4)))
    assert(got(("a", "c"))._2 === math.rint(math.log(6.0 / 5.0) / math.log(2) * 1e4) / 1e4)
    // minCount prunes the tail
    assert(TextOps.pmiPairs(docs, minCount = 2L).count() === 1L)
  }

  test("single-scan plans reuse the aggregate exchange at runtime (AQE)") {
    // dup_spans / source_kl / lm_perplexity derive their secondary table
    // from the first aggregate's partials; the identical subtrees must
    // materialize as ONE shuffle at runtime — pin it so a refactor can't
    // silently reintroduce the double scan
    val docs = Tables.documents(spark, sfDir)
    Seq(
      "duplicatedSpans" -> TextOps.duplicatedSpans(docs),
      "sourceKl" -> TextOps.sourceKl(docs),
      "lmPerplexity" -> TextOps.lmPerplexity(docs),
      "pmiPairs" -> TextOps.pmiPairs(docs),
      "tfidf" -> TextOps.tfidf(docs),
      "dsirWeights" -> TextOps.dsirWeights(docs)).foreach { case (name, df) =>
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange") || plan.contains("reuses"),
        s"$name lost runtime exchange reuse:\n${plan.take(1500)}")
    }
  }

  test("corpus-filter invariants hold across the fixture corpus") {
    val docs = Tables.documents(spark, sfDir)
    // fractions live in [0,1]; a top bigram always exists
    assert(TextOps.repetitionSignals(docs).where(
      $"dup_bigram_frac" < 0 || $"dup_bigram_frac" > 1 ||
        $"top_bigram_frac" <= 0 || $"top_bigram_frac" > 1).count() === 0)
    // 0 <= H <= log2(n_tokens), modulo the 1e-4 output quantization
    assert(TextOps.unigramEntropy(docs).where(
      $"entropy_bits" < -0.001 ||
        $"entropy_bits" > log2($"n_tokens") + 0.001).count() === 0)
    // smoothed LM surprisal and KL are non-negative (within term rounding)
    assert(TextOps.lmPerplexity(docs).where($"bits_per_token" < 0).count() === 0)
    assert(TextOps.sourceKl(docs).where($"kl_bits" < -0.001).count() === 0)
  }

  test("rrfFuse: both-list docs beat single-list docs; scores are exact integers") {
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((0L, 11L, 1), (0L, 13L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val got = TextOps.rrfFuse(lex, sem)
      .select($"doc_id", $"rrf_micro", $"n_lists", $"rnk")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    // 1000000 div (60 + rnk): rnk1→16393, rnk2→16129, rnk3→15873
    assert(got(11L) === ((11L, 16129L + 16393L, 2L, 1)))
    assert(got(10L) === ((10L, 16393L, 1L, 2)))
    assert(got(13L) === ((13L, 16129L, 1L, 3)))
    assert(got(12L) === ((12L, 15873L, 1L, 4)))
  }

  test("rrfFuse: topK caps per query; ties break by doc_id") {
    val a = (1 to 30).map(i => (0L, i.toLong, i)).toDF("query_id", "doc_id", "rnk")
    val b = (1 to 30).map(i => (0L, (100 + i).toLong, i)).toDF("query_id", "doc_id", "rnk")
    val out = TextOps.rrfFuse(a, b, topK = 5)
      .orderBy("rnk").as[(Long, Long, Long, Long, Int)].collect()
    assert(out.length === 5)
    // same rnk in both lists → identical scores → lower doc_id first
    assert(out.map(_._2).toSeq === Seq(1L, 101L, 2L, 102L, 3L))
  }

  test("weightedSample: deterministic across runs, favors heavier docs") {
    val docs = Tables.documents(spark, sfDir)
    val a = TextOps.weightedSample(docs, 30).collect().map(_.getLong(0)).toSeq
    val b = TextOps.weightedSample(docs, 30).collect().map(_.getLong(0)).toSeq
    assert(a === b, "sample must be a pure function of doc ids")
    val sampleMean = TextOps.weightedSample(docs, 30)
      .agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      "size-weighted sampling must overrepresent longer docs on average")
  }

  test("ksSourceLens: D=0 for identical distributions, 1 for disjoint, sup in between") {
    import spark.implicits._
    // a and b have identical length multisets; c sits entirely above both
    val docs = Seq(
      (1L, "a", 10), (2L, "a", 20), (3L, "a", 30),
      (4L, "b", 10), (5L, "b", 20), (6L, "b", 30),
      (7L, "c", 100), (8L, "c", 200)).toDF("doc_id", "source", "n_chars")
    val d = TextOps.ksSourceLens(docs)
      .select("a", "b", "ks_d").as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(d(("a", "b")) === 0.0)
    assert(d(("a", "c")) === 1.0 && d(("b", "c")) === 1.0)
    // shifted overlap: x={10,20}, y={20,30} → sup gap = 1/2 at x=10
    val shifted = Seq((1L, "x", 10), (2L, "x", 20), (3L, "y", 20), (4L, "y", 30))
      .toDF("doc_id", "source", "n_chars")
    val ds = TextOps.ksSourceLens(shifted)
      .select("ks_d").as[Double].head()
    assert(ds === 0.5)
  }

  test("kFoldAssign: folds balanced within each stratum, pure function of ids") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val folds = TextOps.kFoldAssign(docs, k = 5)
    assert(folds.count() === docs.count())
    // within every stratum fold sizes differ by at most one
    val spread = folds.groupBy("source", "fold").count()
      .groupBy("source")
      .agg((max("count") - min("count")).as("spread"), countDistinct("fold").as("nf"))
      .as[(String, Long, Long)].collect()
    assert(spread.forall(_._2 <= 1L), s"unbalanced folds: ${spread.mkString(",")}")
    // re-sharding moves nothing (salted-hash rank is content-independent)
    val again = TextOps.kFoldAssign(docs.repartition(7), k = 5)
    assert(folds.exceptAll(again).isEmpty && again.exceptAll(folds).isEmpty)
  }

  test("jsdSources: zero for a distribution-identical source, bounded by 1 bit") {
    import spark.implicits._
    // s1 and s2 share the exact token distribution; s3 is fully disjoint
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"),
      (3L, "x y z w", "s3")).toDF("doc_id", "text", "source")
    val jsd = TextOps.jsdSources(docs)
      .as[(String, Double)].collect().toMap
    // s1's distribution equals neither corpus (corpus is the 2/3-1/3 mix)
    // but s1 and s2 must score identically; all values in [0, 1]
    assert(jsd("s1") === jsd("s2"))
    assert(jsd.values.forall(v => v >= 0.0 && v <= 1.0), jsd.toString)
    // the disjoint source diverges more than the majority-mix sources
    assert(jsd("s3") > jsd("s1"))
    // one-source corpus: P = C exactly → JSD 0
    val solo = TextOps.jsdSources(docs.where($"source" === "s1"))
      .as[(String, Double)].collect().toMap
    assert(solo("s1") === 0.0)
  }

  test("langFertility: ratios consistent with the integer sums") {
    val f = TextOps.langFertility(Tables.documents(spark, sfDir))
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(f.nonEmpty)
    f.foreach { case (lang, nDocs, nToks, nChars, cpt, tpd) =>
      assert(math.abs(cpt - nChars.toDouble / nToks) < 1e-4, lang)
      assert(math.abs(tpd - nToks.toDouble / nDocs) < 1e-4, lang)
    }
  }

  test("dsirWeights: target-profile docs outscore off-target docs") {
    import spark.implicits._
    // target (en) docs share a bigram vocabulary; the off-target (de) doc
    // repeats it too (scores high); the outlier doc shares nothing
    val docs = Seq(
      (1L, "en", "the quick fox jumps high"),
      (2L, "en", "the quick fox runs far"),
      (3L, "de", "the quick fox jumps high"),
      (4L, "de", "völlig anderes vokabular hier drüben")).toDF("doc_id", "lang", "text")
    val out = TextOps.dsirWeights(docs, targetLang = "en", buckets = 4096)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // per-gram average importance: doc 3 matches the target profile, doc 4
    // does not — the ratio signal the resampling step keys on
    assert(out(3L) > out(4L),
      s"target-profile doc must outscore the outlier: ${out(3L)} vs ${out(4L)}")
    // determinism: pure function of the data
    val again = TextOps.dsirWeights(docs, targetLang = "en", buckets = 4096)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out === again)
  }

  test("docKeywords: distinctive terms outrank ubiquitous ones, k bounds per doc") {
    val docs = Seq(
      (1L, "shared shared zebra zebra zebra unique1"),
      (2L, "shared shared other other unique2"),
      (3L, "shared filler filler filler unique3"))
      .toDF("doc_id", "text")
    val kw = TextOps.docKeywords(docs, k = 2)
    val byDoc = kw.select("doc_id", "word", "rnk").as[(Long, String, Int)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toList).toMap
    // 'shared' appears in every doc -> idf ln(4/4)=0 -> never a keyword
    byDoc.values.foreach(ws => assert(!ws.contains("shared"), s"ubiquitous term kept: $byDoc"))
    // doc 1's top keyword is its repeated distinctive term
    assert(byDoc(1L).head === "zebra")
    assert(byDoc.values.forall(_.size <= 2))
  }

  test("temperatureMix: small sources boost above 1, head sources below") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val w = TextOps.temperatureMix(docs, alpha = 0.7)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (nBig, pRawBig, pTempBig, boostBig) = w("big")
    val (nSmall, _, pTempSmall, boostSmall) = w("small")
    assert(nBig === 90L && nSmall === 10L)
    assert(math.abs(pRawBig - 0.9) < 1e-9)
    // temperature flattens: the head is downweighted, the tail boosted
    assert(pTempBig < 0.9 && pTempSmall > 0.1)
    assert(boostBig < 1.0 && boostSmall > 1.0)
    // still a distribution
    assert(math.abs(pTempBig + pTempSmall - 1.0) < 1e-5)
    // alpha=1 is proportional sampling: boost == 1 everywhere
    val prop = TextOps.temperatureMix(docs, alpha = 1.0)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(prop.forall(r => math.abs(r._5 - 1.0) < 1e-9))
  }

  test("psiBySource: matched distribution ~0, shifted source large, sanity vs thresholds") {
    // source A and B share the length distribution; C lives in different bins
    val docs = (
      (1 to 50).map(i => (i.toLong, "a", 100L + (i % 5) * 600L)) ++
      (51 to 100).map(i => (i.toLong, "b", 100L + (i % 5) * 600L)) ++
      (101 to 150).map(i => (i.toLong, "c", 8000L + (i % 3) * 600L))
    ).toDF("doc_id", "source", "n_chars")
    val psi = TextOps.psiBySource(docs)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(psi("a")._1 === 50L && psi("c")._1 === 50L)
    // a and b match each other but differ from the GLOBAL mix (which
    // includes c) — mild drift, well under c's
    assert(psi("a")._2 === psi("b")._2)
    assert(psi("c")._2 > 0.25, s"shifted source psi ${psi("c")._2}")
    assert(psi("c")._2 > psi("a")._2 * 2)
    // PSI is non-negative by construction (sum of (p-q)ln(p/q) terms)
    psi.values.foreach { case (_, v) => assert(v >= 0.0) }
  }

  test("filterCascade: monotone funnel with hand-checked stage counts") {
    val docs = Seq(
      (1L, "a b c d e f", "en", 11L),   // passes everything
      (2L, "a b", "en", 3L),            // fails min_tokens (2 < 5)
      (3L, "x y z w v u", "fr", 11L),   // fails lang_keep
      (4L, "a b c d e f", "en", 11L),   // exact dup of doc 1 -> fails unique
      (5L, null.asInstanceOf[String], "en", 0L), // fails nonempty
      (6L, "long doc here okay fine yes", "en", 20000L) // fails len_cap
    ).toDF("doc_id", "text", "lang", "n_chars")
    val got = TextOps.filterCascade(docs)
      .as[(Int, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1) === (("nonempty", 5L, 26L)))      // docs 1,2,3,4,6
    assert(got(2) === (("min_tokens", 4L, 24L)))    // drop doc 2 (2 tok)
    assert(got(3) === (("lang_keep", 3L, 18L)))     // drop doc 3 (fr)
    assert(got(4) === (("len_cap", 2L, 12L)))       // drop doc 6
    assert(got(5) === (("exact_unique", 1L, 6L)))   // doc 4 dups doc 1
    // funnel is monotone by construction
    val counts = (1 to 5).map(got(_)._2)
    assert(counts === counts.sorted.reverse)
  }

  test("bpePairStats: char pairs weighted by word frequency, hand-checked") {
    val docs = Seq(
      (1L, "aaa aa"),   // 'aaa' -> aa,aa ; 'aa' -> aa
      (2L, "ab ab"),    // 'ab' x2 collapses to one word with cnt 2
      (3L, "ab x")      // single-char word contributes no pair
    ).toDF("doc_id", "text")
    val got = TextOps.bpePairStats(docs, topN = 10)
      .as[(String, Long)].collect().toList
    // aa: 2 (inside 'aaa') + 1 (inside 'aa') = 3; ab: cnt(ab)=3
    assert(got.take(2).toSet === Set(("aa", 3L), ("ab", 3L)))
    assert(got.forall(_._1.length == 2))
    // tie at the top breaks on binary pair order
    assert(got.head === ("aa", 3L) && got(1) === ("ab", 3L))
  }

  test("tokenBudgetFill: greedy keep under an exact integer budget") {
    // source s1: tokens 5,3,2 by length order -> total 10, 30% budget = 3
    //   doc 11 (5 tok) starts at cum 0 < 3 -> kept; doc 12 starts at 5 -> out
    // source s2: tokens 4,4 -> total 8, budget 2 -> only first kept
    val docs = Seq(
      (11L, "s1", "a b c d e"),
      (12L, "s1", "a b c"),
      (13L, "s1", "a b"),
      (21L, "s2", "w x y z"),
      (22L, "s2", "w x y z")
    ).map { case (id, src, t) => (id, src, t, t.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val got = TextOps.tokenBudgetFill(docs, budgetPct = 30)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("s1") === ((3L, 1L, 5L)))
    assert(got("s2") === ((2L, 1L, 4L)))
    // every source's kept token mass exceeds its budget by at most the
    // last doc (greedy keeps the doc that STARTS under budget)
    val full = TextOps.tokenBudgetFill(docs, budgetPct = 100)
      .as[(String, Long, Long, Long)].collect()
    full.foreach { case (_, budget, _, kept) => assert(kept <= budget) }
  }

  test("epochShuffle: a deterministic permutation, decorrelated across epochs") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val e3 = TextOps.epochShuffle(docs, epoch = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    graft.plans.ReleaseRegistry.drain()
    // positions are exactly 1..n, each doc once
    assert(e3.map(_._2).sorted.toSeq === (1L to n))
    assert(e3.map(_._1).distinct.length === n.toInt)
    // identical re-run (determinism across partitionings/runs)
    val e3b = TextOps.epochShuffle(docs, epoch = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    graft.plans.ReleaseRegistry.drain()
    assert(e3.toMap === e3b.toMap)
    // a different epoch is a different permutation (fresh seed)
    val e4 = TextOps.epochShuffle(docs, epoch = 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    val same = e3.count { case (d, p) => e4(d) == p }
    assert(same < n / 10, s"epochs 3 and 4 agree on $same/$n positions")
    // and NOT the identity order
    assert(e3.count { case (d, p) => d + 1 == p } < n / 10)
  }

  test("bpeMerges learns the hand-computed merge sequence with canonical " +
    "greedy application between rounds") {
    // corpus: "aaab" x2, "ab" x1. Round 1: (a,a) weight 4 beats (a,b)
    // weight 3. Canonical apply: aaab -> [aa, a, b] (NOT [aa, aa?]/[a, aa,
    // b] — left-to-right greedy). Round 2: (a,b) 2+1=3 beats (aa,a) 2.
    // Apply: [aa, ab], [ab]. Round 3: (aa, ab) 2.
    val d = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(d, nMerges = 3)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
  }

  test("bpeMerges stops early when the vocabulary is fully merged") {
    val d = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); afterwards every word is one symbol — no
    // pairs remain, so ranks 2+ must not exist (no degenerate rows)
    val got = TextOps.bpeMerges(d, nMerges = 5).collect()
    assert(got.length === 1)
  }

  test("applyBpe counts canonical-greedy tokens per document") {
    val d = Seq((7L, "src", 8L, "aaaa aaa b")).toDF("doc_id", "source", "n_chars", "text")
    // merge (a,a): aaaa -> [aa, aa] = 2; aaa -> [aa, a] = 2; b -> 1
    val got = TextOps.applyBpe(d, Seq(("a", "a")))
      .select("doc_id", "bpe_tok").as[(Long, Long)].head()
    assert(got === ((7L, 5L)))
    // merges chain in rank order: (a,a) then (aa,aa): aaaa -> [aaaa] = 1
    val chained = TextOps.applyBpe(d, Seq(("a", "a"), ("aa", "aa")))
      .select("bpe_tok").as[Long].head()
    assert(chained === 4L)
  }

  test("native bpeTokenCount equals the HOF flush-append fold on tricky words") {
    val merges = Seq(("a", "a"), ("aa", "aa"), ("aa", "b"))
    val words = Seq("aaaa", "aaa", "aaab", "abab", "b", "", "aabaa",
      "xaaby", "a".repeat(9))
    val df = words.toDF("w")
    val native = df.select(
      graft.functions.TextFunctions.bpeTokenCount($"w", merges).as("n"))
      .as[Long].collect().toSeq
    // reference: the same fold via the interpreted HOF chain TextOps
    // trains with (bpeApplyOne) — symbolize, fold each merge, count
    val sep = ""
    def hof(w: String): Long = {
      var syms = w.map(_.toString).toList
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r)
            out(out.length - 1) = l + r
          else out += x
        }
        syms = out.toList
      }
      syms.length.toLong
    }
    assert(native === words.map(hof))
    assert(sep.length === 1) // the HOF path's separator stays a single char
  }

  test("bpeTokenCount property sweep: 300 random words × random merge " +
    "chains match the independent list-fold reference") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randWord(): String =
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(3))).mkString
    // merge chains that can produce multi-char symbols on both sides
    val merges = Seq(("a", "b"), ("ab", "c"), ("a", "a"), ("aa", "ab"), ("c", "c"))
    def reference(w: String): Long = {
      var syms = w.map(_.toString).toList
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r)
            out(out.length - 1) = l + r
          else out += x
        }
        syms = out.toList
      }
      syms.length.toLong
    }
    val words = Seq.fill(300)(randWord())
    val got = words.toDF("w")
      .select(graft.functions.TextFunctions.bpeTokenCount($"w", merges).as("n"))
      .as[Long].collect().toSeq
    assert(got === words.map(reference))
  }

  test("unigramSegment property sweep: 300 random words match the " +
    "exhaustive-enumeration reference under the score/length tie rule") {
    val rnd = new scala.util.Random(43)
    val alphabet = "abc"
    def randWord(): String =
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(3))).mkString
    // a vocab with deliberate score collisions so ties actually exercise
    // the longest-piece rule (several pieces share micro-nat scores)
    val vocab: Seq[(String, Long)] = Seq(
      "a" -> -1000000L, "b" -> -1200000L, "c" -> -1200000L,
      "ab" -> -2200000L, "bc" -> -2400000L, "ca" -> -2200000L,
      "abc" -> -3400000L, "bca" -> -3400000L, "aa" -> -2000000L,
      "aaa" -> -3000000L, "abca" -> -4400000L)
    val scores = vocab.toMap
    // independent reference: enumerate EVERY segmentation, keep max
    // total score, break ties by the reversed piece-length sequence
    // (lexicographically greatest) — the path-level equivalent of the
    // DP's per-cell longest-piece rule
    def segmentations(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val (h, t) = w.splitAt(l)
        if (scores.contains(h) || l == 1)
          segmentations(t).map(h :: _)
        else Seq.empty
      }
    def score(seg: List[String]): Long =
      seg.map(p => scores.getOrElse(p, -100000000L)).sum
    import scala.math.Ordering.Implicits.seqOrdering
    def best(w: String): List[String] =
      segmentations(w).maxBy(seg => (score(seg), seg.reverse.map(_.length)))
    val words = Seq.fill(300)(randWord())
    val got = words.toDF("w")
      .select(graft.functions.TextFunctions.unigramSegment($"w", vocab, 4).as("p"))
      .as[Seq[String]].collect().toSeq
    words.zip(got).foreach { case (w, g) =>
      assert(g.mkString === w, s"segmentation must tile the word: $w -> $g")
      assert(g.toList === best(w), s"word $w: native $g vs reference ${best(w)}")
    }
  }

  test("knPerplexity: hand-computed interpolated KN probabilities on a " +
    "tiny corpus; discounting and continuation smoothing exact") {
    // corpus bigrams: (a,b) x2, (b,a) x1, (a,c) x1  [doc1: a b a b; wait —
    // "a b a c": (a,b),(b,a),(a,c); doc2: "a b": (a,b)]
    val d = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    // tables: big={(a,b):2,(b,a):1,(a,c):1}; ctx: a->(c1=3,l1=2),
    // b->(c1=1,l1=1); cont: b->r2=1, a->r2=1, c->r2=1; T=3, V=3, T+V=6
    def p(c12: Long, c1: Long, l1: Long, r2: Long): Double =
      (math.max(4 * c12 - 3, 0) * 6 + 3.0 * l1 * (r2 + 1)) / (4.0 * c1 * 6)
    def bits(ps: Seq[Double]): Double = {
      val micro = ps.map(x => math.round(math.log(x) / math.log(2) * -1e6))
      math.round(micro.sum / (micro.length * 100.0)) / 10000.0
    }
    val want1 = bits(Seq(
      p(2, 3, 2, 1), // a->b
      p(1, 1, 1, 1), // b->a
      p(1, 3, 2, 1))) // a->c
    val want2 = bits(Seq(p(2, 3, 2, 1)))
    val got = TextOps.knPerplexity(d)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 === 3L && got(2L)._1 === 1L)
    assert(got(1L)._2 === want1, s"doc1: ${got(1L)} vs $want1")
    assert(got(2L)._2 === want2, s"doc2: ${got(2L)} vs $want2")
    // reference-corpus shape: unknown-context bigrams drop (grounding
    // contract); unseen w2 scores through the smoothed continuation
    val ref = Seq((9L, "a b a c")).toDF("doc_id", "text")
    val scored = TextOps.knPerplexity(
      Seq((5L, "a z q")).toDF("doc_id", "text"), ref)
      .as[(Long, Long, Double)].collect()
    // bigrams of doc 5: (a,z) grounded (a known), (z,q) dropped
    assert(scored.length === 1 && scored.head._2 === 1L)
    // ref corpus is doc 9 ALONE: ctx a -> (c1=2, l1=2); c12=0, r2(z)=0
    val wantUnseen = bits(Seq(p(0, 2, 2, 0)))
    assert(scored.head._3 === wantUnseen)
  }

  test("kn3Perplexity: trigram and bigram KN rank two documents " +
    "DIFFERENTLY on a constructed corpus (the quality-gap signal)") {
    // LM corpus: "p q" and "q r" are heavily attested bigrams (x20 each)
    // but the trigram "p q r" NEVER occurs ("p q" is always completed by
    // s; "q r" only follows t); "u v w" is a rarer (x2) but always-
    // completed trigram. The formulaic-spam shape: X reads fluent
    // bigram-by-bigram yet its exact three-word sequence is unattested.
    val lm = ((1L to 20L).map(i => (i, "p q s")) ++
      (21L to 40L).map(i => (i, "t q r")) ++
      (41L to 42L).map(i => (i, "u v w"))).toDF("doc_id", "text")
    val scored = Seq((100L, "p q r"), (200L, "u v w")).toDF("doc_id", "text")
    val kn2 = TextOps.knPerplexity(scored, lm)
      .select("doc_id", "kn_bits_per_token")
      .as[(Long, Double)].collect().toMap
    val kn3 = TextOps.kn3Perplexity(scored, lm)
      .select("doc_id", "kn3_bits_per_token")
      .as[(Long, Double)].collect().toMap
    // bigram model: X's bigrams are 10x more attested -> X scores better
    // (hand check: X 0.5412 vs Y 0.5594 bits/token)
    assert(kn2(100L) < kn2(200L), s"bigram ranking: $kn2")
    // trigram model: X's trigram is unattested under a 20-strong context
    // -> only discounted backoff mass survives (hand check: 5.776 vs
    // 0.185 bits/token) — the ranking flips
    assert(kn3(100L) > kn3(200L), s"trigram ranking: $kn3")
    assert(kn3(200L) < kn2(200L), "fully-attested trigram must beat its bigram score")
  }

  test("nbQualityScore: NB trained on provenance labels separates " +
    "held-out docs when the tiers have distinct vocabularies") {
    // curated tier (src0..src9) speaks 'good' words, raw tier 'spam'
    // words; held-out docs (doc_id % 5 == 0) must score by text alone
    val rows = (0L until 40L).map { i =>
      val curated = i % 2 == 0
      val src = if (curated) s"src${i % 10 / 2}" else s"src1${i % 10 / 2}"
      val text = if (curated) "insight rigor clarity depth insight"
                 else "clickbait spam noise filler spam"
      (i, text, src)
    }
    val d = rows.toDF("doc_id", "text", "source")
    val got = TextOps.nbQualityScore(d, buckets = 64)
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(got.length === 40)
    got.foreach { case (id, src, nTok, logit, pred) =>
      val curated = id % 2 == 0
      assert(nTok === 5)
      assert(pred === curated && (logit >= 0) === curated,
        s"doc $id ($src): logit $logit, pred $pred, want curated=$curated")
    }
  }

  test("nbQualityTrain: weight table is total (all buckets), counts and " +
    "micro-nat smoothing hand-check") {
    val d = Seq(
      (1L, "aa aa bb", "src0"),   // curated train: aa x2, bb x1
      (2L, "cc", "src15"),        // raw train: cc x1
      (0L, "zz", "src0")          // held out — must not affect counts
    ).toDF("doc_id", "text", "source")
    val B = 16
    val w = TextOps.nbQualityTrain(d, buckets = B)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(w.length === B)
    assert(w.map(_._1).sorted.toSeq === (0L until B.toLong))
    assert(w.map(_._2).sum === 3L && w.map(_._3).sum === 1L)
    // every lp matches round(ln((c+1)/(tot+B))·1e6) exactly
    w.foreach { case (_, np, nn, lpPos, lpNeg) =>
      assert(lpPos === math.round(math.log((np + 1).toDouble / (3 + B)) * 1e6))
      assert(lpNeg === math.round(math.log((nn + 1).toDouble / (1 + B)) * 1e6))
    }
  }

  test("nbQuality family trains on a caller-supplied label column " +
    "(non-source provenance)") {
    // label = doc parity, NOT the source prefix: the even docs speak the
    // curated vocabulary while EVERY source name is unparseable by the
    // default provenance label — a real pipeline labeling from an
    // upstream classifier / human-rated sample, not fixture naming
    val rows = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      val text = if (pos) "insight rigor clarity depth insight"
                 else "clickbait spam noise filler spam"
      (i, text, "srcX")
    }
    val d = rows.toDF("doc_id", "text", "source")
    val lbl = col("doc_id") % 2 === 0
    val got = TextOps.nbQualityScore(d, buckets = 64, labelCol = lbl)
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(got.length === 40)
    got.foreach { case (id, _, _, logit, pred) =>
      val want = id % 2 == 0
      assert(pred === want && (logit >= 0) === want,
        s"doc $id: logit $logit, pred $pred, want $want")
    }
    // the DEFAULT label is degenerate on this corpus (every source
    // unparseable -> null label -> zero docs in both classes): the
    // loud-prior contract must fire, not ship a garbage prior
    intercept[IllegalArgumentException](TextOps.nbPriorMicro(d))
  }

  test("saveNbModel/loadNbModel: reloaded artifact scores bit-identically " +
    "(train once, score many)") {
    val rows = (0L until 40L).map { i =>
      val curated = i % 2 == 0
      val src = if (curated) s"src${i % 10 / 2}" else s"src1${i % 10 / 2}"
      val text = if (curated) "insight rigor clarity depth insight"
                 else "clickbait spam noise filler spam"
      (i, text, src)
    }
    val d = rows.toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    TextOps.saveNbModel(d, dir, buckets = 64)
    val (w, prior, b) = TextOps.loadNbModel(spark, dir)
    assert(b === 64)
    assert(prior === TextOps.nbPriorMicro(d))
    val fresh = TextOps.nbQualityScore(d, buckets = 64)
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val loaded = TextOps.nbScoreWith(d, w, prior, b)
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(loaded === fresh)
  }

  test("saveKnModel/loadKnModel: knScoreWith from the stored artifact " +
    "is bit-identical to in-session knPerplexity") {
    val lm = ((1L to 20L).map(i => (i, "p q s")) ++
      (21L to 40L).map(i => (i, "t q r")) ++
      (41L to 42L).map(i => (i, "u v w"))).toDF("doc_id", "text")
    val scored = Seq((100L, "p q r"), (200L, "u v w"), (300L, "p q s t q r"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("knmodel").toString
    TextOps.saveKnModel(lm, dir)
    val (big, tt, vs) = TextOps.loadKnModel(spark, dir)
    val fresh = TextOps.knPerplexity(scored, lm)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val loaded = TextOps.knScoreWith(scored, big, tt, vs)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(loaded === fresh)
  }

  test("saveKn3Model/loadKn3Model: kn3ScoreWith from the stored artifact " +
    "is bit-identical to in-session kn3Perplexity") {
    val lm = ((1L to 20L).map(i => (i, "p q s")) ++
      (21L to 40L).map(i => (i, "t q r")) ++
      (41L to 42L).map(i => (i, "u v w"))).toDF("doc_id", "text")
    val scored = Seq((100L, "p q r"), (200L, "u v w"), (300L, "p q s x"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("kn3model").toString
    TextOps.saveKn3Model(lm, dir)
    val (big, tri, tt, vs) = TextOps.loadKn3Model(spark, dir)
    val fresh = TextOps.kn3Perplexity(scored, lm)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val loaded = TextOps.kn3ScoreWith(scored, big, tri, tt, vs)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(loaded === fresh && fresh.nonEmpty)
  }

  test("saveCtProfiles/loadCtProfiles: reloaded profiles classify " +
    "identically, and ctClassifyWith needs no label column") {
    def mk(lang: String, words: Seq[String], ids: Seq[Long]) =
      ids.map(i => (i, words.mkString(" "), lang))
    val rows =
      mk("aa", Seq("alpha", "appla", "lapa", "apal"), Seq(0L, 1L, 2L, 5L, 10L)) ++
      mk("bb", Seq("bribo", "obrib", "ribbo", "borb"), Seq(15L, 3L, 4L, 6L, 20L)) ++
      mk("cc", Seq("cocci", "icoc", "ccio", "occi"), Seq(25L, 7L, 8L, 9L, 30L))
    val d = rows.toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("ctmodel").toString
    TextOps.saveCtProfiles(d, dir, topN = 20)
    val (prof, topN, maxN) = TextOps.loadCtProfiles(spark, dir)
    assert(topN === 20 && maxN === 3)
    val fresh = TextOps.ctLangId(d, topN = 20)
      .select("doc_id", "pred_lang", "dist")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // classification from the stored artifact, over a frame carrying NO
    // lang column at all — the unlabeled-corpus deploy shape
    val loaded = TextOps.ctClassifyWith(
      d.where(col("doc_id") % 5 === 0).select("doc_id", "text"),
      prof, topN, maxN)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(loaded === fresh)
  }

  test("ctLangId: trained rank profiles classify held-out docs of a " +
    "corpus with real per-language character signal") {
    // three "languages" with disjoint character inventories; doc_id % 5
    // == 0 rows are held out and must be recovered from text alone
    def mk(lang: String, words: Seq[String], ids: Seq[Long]) =
      ids.map(i => (i, words.mkString(" "), lang))
    val rows =
      mk("aa", Seq("alpha", "appla", "lapa", "apal"), Seq(0L, 1L, 2L, 5L, 10L)) ++
      mk("bb", Seq("bribo", "obrib", "ribbo", "borb"), Seq(15L, 3L, 4L, 6L, 20L)) ++
      mk("cc", Seq("cocci", "icoc", "ccio", "occi"), Seq(25L, 7L, 8L, 9L, 30L))
    val d = rows.toDF("doc_id", "text", "lang")
    val got = TextOps.ctLangId(d, topN = 20)
      .as[(Long, String, String, Long)].collect()
    // held-out ids: 0,5,10 (aa), 15,20 (bb), 25,30 (cc)
    assert(got.length === 7)
    got.foreach { case (id, t, p, dist) =>
      assert(p === t, s"doc $id: predicted $p, true $t (dist $dist)")
      assert(dist >= 0)
    }
    // profiles: one rank chain per language, ranks contiguous from 1,
    // counts non-increasing along the rank order
    val prof = TextOps.ctLangProfiles(d, topN = 20)
      .as[(String, String, Int, Long)].collect()
    prof.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to sorted.length))
      assert(sorted.map(_._4).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)))
    }
  }

  test("ctLangFertility: rollup keys on the PREDICTED language and its " +
    "integer ratios match the labeled fertility on a separable corpus") {
    def mk(lang: String, words: Seq[String], ids: Seq[Long]) =
      ids.map(i => (i, words.mkString(" "), lang))
    val rows =
      mk("aa", Seq("alpha", "appla", "lapa"), Seq(0L, 1L, 2L, 5L, 10L)) ++
      mk("bb", Seq("bribo", "obrib", "ribbo"), Seq(15L, 3L, 4L, 6L, 20L))
    val d = rows.toDF("doc_id", "text", "lang")
    val got = TextOps.ctLangFertility(d, topN = 20)
      .as[(String, Long, Long, Long, Long)].collect()
    graft.plans.ReleaseRegistry.drain()
    // predictions are perfect on the separable corpus (ctLangId spec),
    // so the predicted-keyed rollup covers exactly the held-out docs of
    // each language: aa -> 3 docs x 3 words, bb -> 2 docs x 3 words
    val byLang = got.map(r => r._1 -> r).toMap
    assert(got.length === 2)
    assert(byLang("aa")._2 === 9L && byLang("bb")._2 === 6L)
    got.foreach { case (_, nw, np, fert, cpp) =>
      assert(fert === np * 1000000L / nw)
      assert(np >= nw && cpp > 0)
    }
  }

  test("ctLangId: out-of-place penalty and lang-ascending tie-break are " +
    "exact on a hand-computed two-language case") {
    // train docs make profiles diverge on one gram; the held-out doc's
    // grams overlap both profiles equally -> equal distance -> tie must
    // break toward the ascending language name
    val d = Seq(
      (1L, "xy", "l1"), (2L, "xy", "l2"), // identical training text
      (0L, "xy", "l9")                    // held out; true label ignored
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.ctLangId(d, topN = 10)
      .as[(Long, String, String, Long)].collect()
    assert(got.length === 1)
    val (id, t, p, dist) = got.head
    assert(id === 0L && t === "l9")
    assert(p === "l1", s"tie must break to the ascending lang, got $p")
    assert(dist === 0L, "identical profiles => zero out-of-place distance")
  }

  test("wordpieceSegment property sweep: 300 random words match the " +
    "independent greedy longest-match reference, incl. [UNK] collapse") {
    val rnd = new scala.util.Random(44)
    // 'd' appears in words but never in the vocab — so some words
    // exercise the whole-word [UNK] collapse, not just the happy path
    val alphabet = "abcd"
    def randWord(): String =
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(4))).mkString
    val vocab = Seq("a", "b", "c", "ab", "bc", "ca", "abc", "bca", "abca")
    val vset = vocab.toSet
    def reference(w: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var p = 0
      while (p < w.length) {
        val l = (math.min(4, w.length - p) to 1 by -1)
          .find(l => vset.contains(w.substring(p, p + l)))
        l match {
          case Some(n) => out += w.substring(p, p + n); p += n
          case None => return List("[UNK]")
        }
      }
      out.toList
    }
    val words = Seq.fill(300)(randWord())
    val got = words.toDF("w")
      .select(graft.functions.TextFunctions.wordpieceSegment($"w", vocab, 4).as("p"))
      .as[Seq[String]].collect().toSeq
    words.zip(got).foreach { case (w, g) =>
      assert(g.toList === reference(w), s"word $w: native $g vs reference")
      if (!w.contains('d'))
        assert(g.mkString === w, s"segmentation must tile the word: $w -> $g")
    }
  }

  test("wordpieceSegment: greedy longest-match rule differs from Viterbi " +
    "where greed is suboptimal, and supplementary-plane chars count as one") {
    // vocab where greedy 'ab' + UNKless single chars beats nothing, but
    // Viterbi would pick a|bc (higher total score) — greedy must take ab|c
    val vocab = Seq("a", "b", "c", "ab", "bc")
    val got = Seq("abc").toDF("w")
      .select(graft.functions.TextFunctions.wordpieceSegment($"w", vocab, 4).as("p"))
      .as[Seq[String]].head()
    assert(got === Seq("ab", "c"))
    // one astral code point = one unit: a 2-surrogate char in the vocab
    // matches as a single-length piece
    val astral = new String(Character.toChars(0x1F600))
    val got2 = Seq(astral + "a").toDF("w")
      .select(graft.functions.TextFunctions.wordpieceSegment(
        $"w", Seq(astral, "a"), 4).as("p"))
      .as[Seq[String]].head()
    assert(got2 === Seq(astral, "a"))
  }

  test("wordpieceSegment fails loud on vocab pieces longer than " +
    "maxPieceLen (latent native/oracle divergence guard)") {
    // a 5-code-point piece under maxPieceLen=4 could never match in the
    // greedy scan while an any-length SQL join WOULD — construction must
    // reject it rather than let the two replays diverge
    intercept[IllegalArgumentException] {
      graft.functions.WordPieceSegment(
        org.apache.spark.sql.catalyst.expressions.Literal("abcde"),
        Seq("a", "abcde"), 4)
    }
  }

  test("spanStrings is standalone-safe: arrays shorter than k yield an " +
    "EMPTY span list, not a descending-sequence slice crash") {
    val got = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.CorpusPipeline.spanStrings(
          split(col("text"), "\\s+"), 3).as("spans"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq.empty)
    assert(got(2L) === Seq("a b c", "b c d"))
  }

  test("wordpieceTokens: per-doc greedy counts on a tiny corpus, " +
    "hand-checked against the trained vocab") {
    val d = Seq(
      (1L, "abab abab abab cd"),
      (2L, "abab cd cd"),
      (3L, "ab xy")
    ).toDF("doc_id", "text")
    val got = TextOps.wordpieceTokens(d, seedMulti = 8, keepMulti = 4)
      .as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    // the trained vocab keeps every observed char, so no [UNK]; counts
    // are positive and bounded by char counts
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got.values.forall(_ >= 1))
    assert(got(1L) <= 14 && got(2L) <= 8 && got(3L) <= 4)
    // doc 3 ("ab" + "xy"): 'ab' merges iff trained vocab kept the piece;
    // either way xy segments as two chars unless 'xy' was kept — the
    // count is between 2 (both merged) and 4 (all chars)
    assert(got(3L) >= 2 && got(3L) <= 4)
  }

  test("unigramEm: alphabet guard fails LOUD when distinct single-char " +
    "seeds exceed the declared driver-memory bound") {
    val d = Seq((1L, "abcdef gh")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      TextOps.unigramEm(d, seedMulti = 4, keepMulti = 2,
        maxPieceLen = 4, maxWordLen = 12, maxAlphabet = 3)
    }
    graft.plans.ReleaseRegistry.drain()
    assert(ex.getMessage.contains("alphabet bound"), ex.getMessage)
    // at the real default the same corpus trains fine
    val (lp, wc) = TextOps.unigramEm(d, seedMulti = 4, keepMulti = 2,
      maxPieceLen = 4, maxWordLen = 12)
    graft.plans.ReleaseRegistry.drain()
    assert(lp.nonEmpty && wc.columns.contains("word"))
  }

  test("unigramVocab: EM on a tiny corpus learns the repeated piece, " +
    "hand-checked invariants") {
    val d = Seq(
      (1L, "abab abab abab cd"),
      (2L, "abab cd cd"),
      (3L, "ab xy")
    ).toDF("doc_id", "text")
    val vocab = TextOps.unigramVocab(d, seedMulti = 8, keepMulti = 4)
      .as[(String, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    val byPiece = vocab.map(r => r._1 -> r).toMap
    // every observed char survives the prune
    Seq("a", "b", "c", "d", "x", "y").foreach(c =>
      assert(byPiece.contains(c), s"char $c missing from $vocab"))
    // the dominant substring is in the vocab and carries real usage
    assert(byPiece.contains("abab") || byPiece.contains("ab"),
      s"the repeated piece must survive: $vocab")
    assert(vocab.map(_._2).sum > 0, "round-2 usage must be live")
    // scores are negative micro-nats, higher usage => higher (less
    // negative) score under the shared smoothing denominator
    assert(vocab.forall(_._3 < 0))
    val sorted = vocab.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo._2 == hi._2 || lo._3 < hi._3)
      case _ => ()
    }
  }

  test("unigramTokens: per-doc Viterbi counts, dominant piece compresses") {
    val d = Seq(
      (1L, "abab abab"), // 'abab'/'ab' learned -> far fewer than 8 chars
      (2L, ""),          // no words -> 0
      (3L, "abab zz")
    ).toDF("doc_id", "text")
    val got = TextOps.unigramTokens(d, seedMulti = 8, keepMulti = 4)
      .as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    assert(got(2L) === 0L)
    assert(got(1L) <= 4L, s"learned pieces must compress: $got") // <= 2 per word
    assert(got(3L) >= got(1L) / 2 + 1, s"zz costs at least its chars: $got")
    // determinism under a different input partitioning
    val again = TextOps.unigramTokens(d.repartition(5), seedMulti = 8, keepMulti = 4)
      .as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    assert(again === got)
  }

  test("unigramFertility: language rollup consistent with per-doc counts; " +
    "over-segmented language reads higher fertility") {
    val d = Seq(
      (1L, "abab abab abab abab", "en"),
      (2L, "abab abab", "en"),
      (3L, "xqw zjy vkp", "xx"), // rare words: pruned out at keepMulti=1
      (4L, "xqw zjy", "xx")
    ).toDF("doc_id", "text", "lang")
    // keepMulti=1: only the dominant piece ('abab') survives the prune,
    // so the rare-char language segments to single chars
    val fert = TextOps.unigramFertility(d, seedMulti = 8, keepMulti = 1)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    graft.plans.ReleaseRegistry.drain()
    assert(fert.keySet === Set("en", "xx"))
    // ppm identities hold exactly
    fert.values.foreach { r =>
      assert(r._4 === r._3 * 1000000L / r._2, s"fert identity: $r")
      assert(r._3 >= r._2, s"at least one piece per word: $r")
    }
    // 'abab' compresses under the learned vocab; the rare-char language
    // falls back to near-char segmentation -> strictly higher fertility
    assert(fert("xx")._4 > fert("en")._4, s"fertility order: $fert")
    // rollup equals the per-doc token sums per language
    val tok = TextOps.unigramTokens(d, seedMulti = 8, keepMulti = 1)
      .as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    assert(fert("en")._3 === tok(1L) + tok(2L))
    assert(fert("xx")._3 === tok(3L) + tok(4L))
  }

  test("tokenBudgetFillBpe keeps the greedy prefix under a real-token budget") {
    val d = Seq(
      (1L, "s", 30L, "aaab aaab aaab aaab"), // longest first
      (2L, "s", 20L, "aaab aaab"),
      (3L, "s", 10L, "ab")
    ).toDF("doc_id", "source", "n_chars", "text")
    val row = TextOps.tokenBudgetFillBpe(d, nMerges = 2, budgetPct = 50).head()
    // 2 merges: (a,a) then (a,b) -> aaab = [aa, ab] = 2 tokens, ab = 1.
    // totals: doc1 = 8, doc2 = 4, doc3 = 1 -> total 13, budget 6.
    // greedy: doc1 starts at 0 < 6 (kept, 8), doc2 starts at 8 >= 6 out.
    assert(row.getAs[Long]("budget_tokens") === 6L)
    assert(row.getAs[Long]("n_docs_kept") === 1L)
    assert(row.getAs[Long]("tokens_kept") === 8L)
  }

  test("interleaveBySource: sources round-robin while ranks stay dense") {
    val docs = Seq(
      (1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s1"),
      (5L, "s2"), (6L, "s2"), (7L, "s2"), (8L, "s2")
    ).toDF("doc_id", "source")
    val got = TextOps.interleaveBySource(docs)
      .orderBy("pos").as[(Long, String, Long, Long)].collect()
    graft.plans.ReleaseRegistry.drain()
    assert(got.map(_._4).toSeq === (1L to 8L))
    // balanced sources: positions alternate s1, s2, s1, s2, ...
    assert(got.map(_._2).toSeq === Seq("s1", "s2", "s1", "s2", "s1", "s2", "s1", "s2"))
    // within a source, rank order is the seeded-hash order (a permutation
    // of 1..4 per source, ascending along positions)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.sortBy(_._4).map(_._3).toSeq === (1L to 4L))
    }
  }
}
