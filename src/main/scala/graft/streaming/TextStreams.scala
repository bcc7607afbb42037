package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming heavy hitters over a growing token stream — the streaming
  * twin of the bounded-memory [[graft.functions.FrequentItems]]
  * aggregate (Misra–Gries summary), on the per-key-state pattern the
  * dedup and media streams established.
  *
  * Tokens shard by `hash(word) % nShards` so ALL occurrences of a word
  * land on one shard; each shard keeps at most `k` counters as state
  * whatever the vocabulary size. Per micro-batch, the arriving tokens
  * count exactly and fold into the carried summary with the SAME
  * mergeable-summaries step as the batch aggregate (sum counters, then
  * subtract the (k+1)-th largest so at most k survive) — so the
  * guarantees transfer verbatim per shard: every item with true
  * frequency > shardMass/k is present, every reported count
  * under-estimates by at most shardMass/k, and when a shard's distinct
  * count never exceeds k its counts are EXACT (pinned against
  * `wordCount` in TextStreamsSpec).
  *
  * Each batch emits the shard's refreshed summary stamped with a
  * per-shard generation counter; consumers keep the max-generation rows
  * per shard (emissions supersede, they don't accumulate — Append mode
  * keeps the per-bucket emission free of any global exchange). State is
  * ≤ k counters × nShards — constant, not corpus-scale.
  */
object TextStreams {

  /** Per-shard summary state: parallel item/count arrays + generation. */
  final case class MgState(items: Array[String], counts: Array[Long], gen: Long)

  /** One summary row: shard, its generation, a tracked item + estimate. */
  final case class HeavyHitter(shard: Int, gen: Long, item: String, est: Long)

  final class ShardHeavyHitters(k: Int)
      extends StatefulProcessor[Int, (Int, String), HeavyHitter] {
    @transient private var st: ValueState[MgState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MgState](
        "mg", Encoders.product[MgState], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[HeavyHitter] = {
      val prior = if (st.exists()) st.get() else MgState(Array.empty, Array.empty, 0L)
      val buf = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < prior.items.length) {
        buf.update(prior.items(i), prior.counts(i)); i += 1
      }
      // exact batch counts, then ONE mergeable-summaries fold — the SAME
      // capacity fit the batch aggregate's merge runs (shared code, so
      // the transferred deficit bound cannot drift between copies)
      rows.foreach { case (_, w) => buf.update(w, buf.getOrElse(w, 0L) + 1L) }
      graft.functions.FrequentItems.capacityFit(buf, k)
      val gen = prior.gen + 1
      val out = buf.toArray.sortBy { case (item, c) => (-c, item) }
      st.update(MgState(out.map(_._1), out.map(_._2), gen))
      out.iterator.map { case (item, c) => HeavyHitter(key, gen, item, c) }
    }
  }

  /** Tokenize a (possibly streaming) documents frame and run the sharded
    * summary. Requires the RocksDB state store provider on a real stream.
    */
  def streamingHeavyHitters(docs: DataFrame, k: Int = 64,
      nShards: Int = 32): Dataset[HeavyHitter] = {
    require(k >= 1 && nShards >= 1, "streamingHeavyHitters: k, nShards >= 1")
    import docs.sparkSession.implicits._
    docs
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .select(pmod(hash(col("word")), lit(nShards)).cast("int").as("shard"),
        col("word"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(new ShardHeavyHitters(k), TimeMode.None(),
        OutputMode.Append())
  }

  /** One contamination emission: an arriving train document + how many
    * of its distinct 3-grams hit the static benchmark.
    */
  final case class ContamHit(docId: Long, nContamGrams: Long)

  /** Per-document gram counter for [[streamingDecontaminate]]: a train
    * document is ONE streaming row, so every benchmark-matched gram of a
    * doc arrives inside the doc's own micro-batch — the keyed processor
    * only re-groups the join output per batch and carries NO state (a
    * re-ingested doc_id in a later batch is audited independently, the
    * screen's per-arrival contract, pinned in TextStreamsSpec).
    */
  final class DocContamCounter(minHits: Int)
      extends StatefulProcessor[Long, ContamHit, ContamHit] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[ContamHit],
        timerValues: TimerValues): Iterator[ContamHit] = {
      var n = 0L
      rows.foreach(_ => n += 1L)
      if (n >= minHits) Iterator.single(ContamHit(key, n))
      else Iterator.empty
    }
  }

  /** Streaming benchmark decontamination — the stream-static twin of
    * [[graft.operators.TextOps.decontaminate]]: train documents ARRIVE
    * (ingest is a stream at 100 TB; the benchmark is a fixed, tiny,
    * versioned artifact), each arriving doc's distinct 3-grams
    * ([[graft.operators.TextOps.triGrams]] — the SAME construction as
    * the batch screen) inner-join the broadcast static benchmark gram
    * table, and per-doc hit counts ≥ `minHits` emit exactly once, in
    * the arrival batch. The join is stream-static (stateless, Append
    * legal); the only keyed step is the per-batch regroup, so state is
    * ZERO whatever the corpus size — the cheapest possible screen shape:
    * no watermark, no carried bucket, nothing to expire.
    */
  def streamingDecontaminate(trainDocs: DataFrame, bench: DataFrame,
      minHits: Int = 1): Dataset[ContamHit] = {
    import trainDocs.sparkSession.implicits._
    val benchGrams =
      graft.operators.TextOps.triGrams(bench).select("gram").distinct()
    graft.operators.TextOps.triGrams(trainDocs)
      .join(broadcast(benchGrams), "gram")
      .select(col("doc_id").as("docId"), lit(1L).as("nContamGrams"))
      .as[ContamHit]
      .groupByKey(_.docId)
      .transformWithState(new DocContamCounter(minHits), TimeMode.None(),
        OutputMode.Append())
  }

  /** One span-gate emission: an arriving document's span audit against
    * the seen-span sidecar — total k-spans, prior-duplicated spans, and
    * the gate verdict (`keep = nDup·100 ≤ maxDupPct·nSpans`, the exact
    * integer compare of the batch gate).
    */
  final case class SpanAudit(docId: Long, nSpans: Long, nDup: Long,
      keep: Boolean)

  /** Per-document span counter for [[streamingSpanGate]] — the
    * [[DocContamCounter]] shape: a document is ONE streaming row, so all
    * of its span-flag rows arrive inside its own micro-batch; the keyed
    * processor re-groups the join output per batch and carries NO state
    * (a re-ingested doc_id is audited independently per arrival).
    */
  final class SpanGateAuditor(maxDupPct: Int)
      extends StatefulProcessor[Long, (Long, Boolean), SpanAudit] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[(Long, Boolean)],
        timerValues: TimerValues): Iterator[SpanAudit] = {
      var n = 0L
      var nd = 0L
      rows.foreach { case (_, dup) => n += 1L; if (dup) nd += 1L }
      Iterator.single(SpanAudit(key, n, nd,
        nd * 100L <= maxDupPct.toLong * n))
    }
  }

  /** Streaming twin of the curation substring gate
    * ([[graft.operators.CorpusPipeline]]'s span election): arriving
    * documents audit their k-token span hashes against the STATIC
    * seen-span sidecar (`_seensp`, one `h` column —
    * [[graft.operators.CorpusPipeline.spanHashes]] builds it; the
    * incremental curation path maintains it between runs), emitting each
    * doc's prior-duplication stats and gate verdict in its arrival
    * batch. The join is stream-static (stateless, Append legal) with
    * the sidecar broadcast exactly like the batch gate under AQE at
    * benchmark scale; the only keyed step is the per-batch regroup, so
    * state is ZERO whatever the corpus size — the
    * [[streamingDecontaminate]] shape on span hashes instead of
    * 3-grams.
    *
    * Intra-stream NOVEL duplication (two fresh docs sharing a span) is
    * deliberately out of scope here, exactly as in the batch split: the
    * sidecar-maintenance step (batch-incremental, which also elects
    * within the new slice) owns that half; this gate screens arrivals
    * against everything already seen. Docs with fewer than `spanK`
    * tokens carry no spans and pass unaudited (the batch gate keeps
    * docs with no stats).
    *
    * ONE-ARRIVAL-PER-BATCH contract (shared with [[DocContamCounter]]):
    * a document is assumed to arrive as ONE streaming row, so all its
    * span-flag rows land in its own micro-batch and the per-batch
    * regroup yields exactly one audit. Two arrivals of the SAME doc_id
    * inside one micro-batch merge into a single audit (span counts
    * summed across both texts), while cross-batch re-arrivals are
    * audited independently — re-ingest semantics depend on batch
    * boundaries. Pipelines that re-ingest and need per-arrival audits
    * within a batch must key rows by (doc_id, arrival) upstream.
    */
  /** One language-ID emission: an arriving document's predicted language
    * under the static trained rank profiles, with its out-of-place
    * distance.
    */
  final case class LangTag(docId: Long, predLang: String, dist: Long)

  /** UTF-8 binary string order — the collation of Spark's UTF8String
    * windows and the DuckDB oracle. JVM `String.compareTo` is UTF-16
    * code-UNIT order, which ranks supplementary-plane characters
    * (surrogate pairs, 0xD800-0xDFFF units) BELOW BMP chars ≥ U+E000;
    * code-point comparison restores the byte order without
    * materializing UTF-8 byte arrays per comparison.
    */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  private[graft] val Utf8Ordering: Ordering[String] =
    (a: String, b: String) => utf8Compare(a, b)

  /** Per-document classifier for [[streamingLangId]]: rows are the
    * arriving doc's raw gram instances; the per-batch regroup counts
    * them, ranks top-`topN` by (count desc, gram asc-in-UTF-8-binary
    * order) — the batch window's exact rule INCLUDING its collation
    * ([[utf8Compare]]; JVM string order would diverge on
    * supplementary-plane grams) — and scores the integer out-of-place
    * distance against the baked-in profile maps, argmin ties
    * lang-ascending under the same collation. The profile table rides
    * the processor as classifier-sized literal configuration
    * (|langs|·topN entries — the deployed artifact, like the quality
    * twin's prior). No carried state.
    */
  final class DocLangClassifier(profiles: Map[String, Map[String, Int]],
      topN: Int) extends StatefulProcessor[Long, (Long, String), LangTag] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[LangTag] = {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { case (_, g) =>
        counts.update(g, counts.getOrElse(g, 0L) + 1L)
      }
      if (counts.isEmpty || profiles.isEmpty) Iterator.empty
      else {
        val ranked = counts.toArray
          .sortBy { case (g, c) => (-c, g) }(
            Ordering.Tuple2(Ordering.Long, Utf8Ordering)).take(topN)
          .zipWithIndex.map { case ((g, _), i) => (g, i + 1) }
        val (lang, dist) = profiles.map { case (l, prof) =>
          l -> ranked.map { case (g, dr) =>
            prof.get(g).map(pr => math.abs(dr - pr).toLong)
              .getOrElse(topN.toLong)
          }.sum
        }.minBy { case (l, d) => (d, l) }(
          Ordering.Tuple2(Ordering.Long, Utf8Ordering))
        Iterator.single(LangTag(key, lang, dist))
      }
    }
  }

  /** Streaming twin of [[graft.operators.TextOps.ctLangId]]'s
    * classification half: arriving documents are tagged against the
    * STATIC trained rank profiles
    * ([[graft.operators.TextOps.ctLangProfiles]]'s output — collected
    * once at query build, |langs|·topN rows, the deployed-classifier
    * artifact) by the same integer out-of-place distance with the same
    * (count desc, gram asc) doc-rank rule and lang-ascending ties. One
    * row-local gram explode, then a single keyed per-batch regroup —
    * zero joins on the stream, zero carried state: the ingest-side
    * language tagger in front of the per-language batch pipeline. Docs
    * with no grams emit nothing (the batch operator's exclusion).
    */
  def streamingLangId(docs: DataFrame, profiles: DataFrame,
      topN: Int = 50, maxN: Int = 3): Dataset[LangTag] = {
    import docs.sparkSession.implicits._
    val pmap: Map[String, Map[String, Int]] = profiles
      .select(col("lang"), col("gram"), col("rnk").cast("int"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getInt(2)).toMap
      }
    docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), "\\s+"), x => x =!= "")).as("word"))
      .select(col("doc_id"), explode(
        graft.operators.TextOps.ctCharGrams(col("word"), maxN)).as("gram"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new DocLangClassifier(pmap, topN), TimeMode.None(),
        OutputMode.Append())
  }

  /** One quality emission: an arriving document's token count, NB logit
    * (integer micro-nats) and keep verdict under a TRAINED weight table.
    */
  final case class QualityScore(docId: Long, nTok: Long, logitMicro: Long,
      predPos: Boolean)

  /** Per-document scorer for [[streamingQualityScore]] — the per-batch
    * regroup shape ([[DocContamCounter]]): sums the arriving doc's
    * token-weighted log-likelihood ratios and adds the trained prior.
    * Rows are `(docId, tokenFlag, llr)`; a tokenless doc arrives as one
    * `(docId, 0, 0)` row and scores the bare prior, the batch scorer's
    * outer-explode contract.
    */
  final class DocQualityScorer(priorMicro: Long)
      extends StatefulProcessor[Long, (Long, Long, Long), QualityScore] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[QualityScore] = {
      var n = 0L
      var s = 0L
      rows.foreach { case (_, tk, llr) => n += tk; s += llr }
      val logit = priorMicro + s
      Iterator.single(QualityScore(key, n, logit, logit >= 0L))
    }
  }

  /** Streaming twin of [[graft.operators.TextOps.nbQualityScore]]:
    * arriving documents are scored against a STATIC trained NB weight
    * table ([[graft.operators.TextOps.nbQualityTrain]]'s output — the
    * deployed-classifier artifact) and the trained prior, emitting each
    * doc's integer micro-nat logit and keep verdict in its arrival
    * batch. Stream-static broadcast join on the `buckets`-row weight
    * table (stateless, Append legal); the only keyed step is the
    * per-batch regroup, so state is ZERO — the ingest-side quality
    * screen every curation stream runs in front of the batch pipeline.
    */
  def streamingQualityScore(docs: DataFrame, weights: DataFrame,
      priorMicro: Long, buckets: Int = 256): Dataset[QualityScore] = {
    import docs.sparkSession.implicits._
    val w = weights.select(col("bucket"),
      (col("lp_pos") - col("lp_neg")).as("llr"))
    docs
      .select(col("doc_id"),
        explode_outer(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .as("word"))
      .withColumn("bucket", when(col("word").isNotNull,
        pmod(graft.functions.Md5Hash64(col("word")), lit(buckets.toLong))))
      .join(broadcast(w), Seq("bucket"), "left")
      .select(col("doc_id"),
        when(col("word").isNotNull, 1L).otherwise(0L).as("tk"),
        coalesce(when(col("word").isNotNull, col("llr")), lit(0L)).as("llr"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new DocQualityScorer(priorMicro), TimeMode.None(),
        OutputMode.Append())
  }

  /** One perplexity-gate emission: an arriving document's grounded
    * bigram count, its interpolated-KN cross-entropy (the batch
    * operator's exact rounding), and the keep verdict
    * (`bits ≤ maxBits`). Docs with no grounded bigrams emit nothing —
    * the batch operator's exclusion.
    */
  final case class PerplexityScore(docId: Long, nBigrams: Long,
      knBitsPerToken: Double, keep: Boolean)

  /** Per-document term summer for [[streamingPerplexityGate]] — the
    * [[DocQualityScorer]] shape: a document is ONE streaming row, so
    * all its per-bigram micro-bit terms arrive inside its own
    * micro-batch; zero carried state. The final rounding replicates
    * Spark's `round(sum/(n·100), 0)/10⁴` HALF_UP exactly (BigDecimal —
    * `math.round` disagrees on negative half-way values, which a
    * highly-predictable doc's negative bit sum could in principle hit).
    */
  final class DocPerplexityScorer(maxBits: Double)
      extends StatefulProcessor[Long, (Long, Long), PerplexityScore] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[PerplexityScore] = {
      var n = 0L
      var s = 0L
      rows.foreach { case (_, it) => n += 1L; s += it }
      val bits = BigDecimal(s / (n * 100.0))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 10000.0
      Iterator.single(PerplexityScore(key, n, bits, bits <= maxBits))
    }
  }

  /** Streaming twin of [[graft.operators.TextOps.knPerplexity]]'s
    * reference-corpus scoring — the CCNet-style LM quality gate at
    * ingest: arriving documents score against a STATIC trained bigram
    * table ([[graft.operators.TextOps.saveKnModel]]'s stored artifact,
    * via [[graft.operators.TextOps.loadKnModel]]) with the trained
    * (tt, vs) scalars folded in as literals, emitting each doc's exact
    * integer-derived bits-per-token and keep verdict in its arrival
    * batch. The per-occurrence term is the SHARED
    * [[graft.operators.TextOps.KnTermMicroBits]] definition, so the
    * stream and the batch scorer cannot diverge (two-batch parity
    * pinned in TextStreamsSpec).
    *
    * Scale shape: stream-static joins against the LM tables — the
    * bigram table is the stored artifact and the context/continuation
    * tables re-derive from it on the STATIC side (computed once per
    * micro-batch plan, LM-sized, never keyed on the stream); the only
    * keyed step is the per-batch regroup, so carried state is ZERO.
    * Unknown-context bigrams drop via the stream-static inner join,
    * exactly as in batch.
    */
  def streamingPerplexityGate(docs: DataFrame, bigramCounts: DataFrame,
      tt: Long, vs: Long, maxBits: Double = 12.0): Dataset[PerplexityScore] = {
    import docs.sparkSession.implicits._
    knTermStream(docs, bigramCounts, tt, vs)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new DocPerplexityScorer(maxBits), TimeMode.None(),
        OutputMode.Append())
  }

  /** The bigram-KN per-occurrence term chain shared by
    * [[streamingPerplexityGate]] and [[streamingPerplexityGap]]:
    * stream-static joins against the stored bigram artifact, static-side
    * derived tables, the shared
    * [[graft.operators.TextOps.KnTermMicroBits]] term. (doc_id, it).
    */
  private def knTermStream(docs: DataFrame, bigramCounts: DataFrame,
      tt: Long, vs: Long): DataFrame = {
    val big = bigramCounts.select(col("w1"), col("w2"), col("c12"))
    val ctx = big.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("l1"))
    val cont = big.groupBy("w2").agg(count(lit(1)).as("r2"))
    graft.operators.TextOps.bigrams(docs)
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"), "left")
      .withColumn("tt", lit(tt)).withColumn("vs", lit(vs))
      .select(col("doc_id"),
        expr(graft.operators.TextOps.KnTermMicroBits).as("it"))
  }

  /** [[streamingPerplexityGate]] one order up — the trigram-KN ingest
    * gate over a stored [[graft.operators.TextOps.saveKn3Model]]
    * artifact: the same stream-static shape with the trigram table and
    * its derived context table joined in, the shared
    * [[graft.operators.TextOps.Kn3TermMicroBits]] term, and zero
    * carried state. Emits `n_trigrams`-based bits (the batch
    * [[graft.operators.TextOps.kn3Perplexity]] rounding; two-batch
    * parity pinned in TextStreamsSpec). Deploying BOTH gates and
    * thresholding their GAP is the formulaic-spam screen the
    * kn3Perplexity ranking-flip spec demonstrates.
    */
  def streamingPerplexityGate3(docs: DataFrame, bigramCounts: DataFrame,
      trigramCounts: DataFrame, tt: Long, vs: Long,
      maxBits: Double = 12.0): Dataset[PerplexityScore] = {
    import docs.sparkSession.implicits._
    kn3TermStream(docs, bigramCounts, trigramCounts, tt, vs)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new DocPerplexityScorer(maxBits), TimeMode.None(),
        OutputMode.Append())
  }

  /** The trigram-KN term chain shared by [[streamingPerplexityGate3]]
    * and [[streamingPerplexityGap]] — [[knTermStream]] one order up,
    * shared [[graft.operators.TextOps.Kn3TermMicroBits]]. (doc_id, it).
    */
  private def kn3TermStream(docs: DataFrame, bigramCounts: DataFrame,
      trigramCounts: DataFrame, tt: Long, vs: Long): DataFrame = {
    val big = bigramCounts.select(col("w1"), col("w2"), col("c12").as("c2"))
    val ctx2 = big.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("l1"))
    val cont = big.groupBy("w2").agg(count(lit(1)).as("r2"))
    val tri = trigramCounts.select(col("w1"), col("w2"), col("w3"), col("c123"))
    val ctx3 = tri.groupBy("w1", "w2")
      .agg(sum("c123").as("c12"), count(lit(1)).as("l12"))
    val big2 = big.select(col("w1").as("w2"), col("w2").as("w3"), col("c2"))
    val ctx2r = ctx2.select(col("w1").as("w2"), col("c1"), col("l1"))
    val cont2 = cont.select(col("w2").as("w3"), col("r2"))
    graft.operators.TextOps.trigrams(docs)
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(ctx3, Seq("w1", "w2"))
      .join(big2, Seq("w2", "w3"), "left")
      .join(ctx2r, Seq("w2"))
      .join(cont2, Seq("w3"), "left")
      .withColumn("tt", lit(tt)).withColumn("vs", lit(vs))
      .select(col("doc_id"),
        expr(graft.operators.TextOps.Kn3TermMicroBits).as("it"))
  }

  /** A scored document with BOTH KN orders' bits and their gap. */
  final case class PerplexityGapScore(docId: Long, nBigrams: Long,
      nTrigrams: Long, knBitsPerToken: Double, kn3BitsPerToken: Double,
      gapBits: Double, keep: Boolean)

  /** Per-document two-order term summer for [[streamingPerplexityGap]]:
    * terms arrive tagged with their order (2 or 3), sum separately, and
    * each order rounds on its own exact 10⁻⁴-bit grid (the
    * [[DocPerplexityScorer]] HALF_UP rule) BEFORE the gap subtracts the
    * integer grid values — bit-identical to the batch
    * [[graft.operators.TextOps.knGap]] join of the two scorers. A doc
    * missing either order's terms (under 3 tokens, or every context
    * unknown) emits nothing — the batch op's inner join.
    */
  final class DocGapScorer(maxGap: Double)
      extends StatefulProcessor[Long, (Long, Int, Long), PerplexityGapScore] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[(Long, Int, Long)],
        timerValues: TimerValues): Iterator[PerplexityGapScore] = {
      var n2 = 0L; var s2 = 0L; var n3 = 0L; var s3 = 0L
      rows.foreach {
        case (_, 2, it) => n2 += 1L; s2 += it
        case (_, _, it) => n3 += 1L; s3 += it
      }
      if (n2 == 0L || n3 == 0L) Iterator.empty
      else {
        def microBits(s: Long, n: Long): Long =
          BigDecimal(s / (n * 100.0))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        val l2 = microBits(s2, n2)
        val l3 = microBits(s3, n3)
        val gap = (l3 - l2) / 10000.0
        Iterator.single(PerplexityGapScore(key, n2, n3,
          l2 / 10000.0, l3 / 10000.0, gap, gap <= maxGap))
      }
    }
  }

  /** BOTH KN orders' bits-per-token — and their GAP, the formulaic-spam
    * signal — at ingest, in one pass: the streaming twin of
    * [[graft.operators.TextOps.knGap]] over a stored
    * [[graft.operators.TextOps.saveKn3Model]] artifact. Template spam
    * built from common word pairs reads fluent to the bigram gate
    * ([[streamingPerplexityGate]] keeps it) but its trigram
    * continuations are unattested — thresholding `gap_bits = kn3 − kn`
    * catches exactly that class without rejecting the genuinely fluent
    * text both orders predict. Each order's terms ride the shared
    * micro-bit definitions, so stream and batch cannot diverge
    * (two-batch parity vs [[graft.operators.TextOps.knGap]] pinned in
    * TextStreamsSpec).
    *
    * Scale shape: a union of the two stream-static term chains (each
    * LM-sized on the static side, zero carried state) + the per-batch
    * doc regroup both gates already pay.
    */
  def streamingPerplexityGap(docs: DataFrame, bigramCounts: DataFrame,
      trigramCounts: DataFrame, tt: Long, vs: Long,
      maxGap: Double = 2.0): Dataset[PerplexityGapScore] = {
    import docs.sparkSession.implicits._
    knTermStream(docs, bigramCounts, tt, vs)
      .select(col("doc_id"), lit(2).as("ord"), col("it"))
      .unionByName(
        kn3TermStream(docs, bigramCounts, trigramCounts, tt, vs)
          .select(col("doc_id"), lit(3).as("ord"), col("it")))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .transformWithState(new DocGapScorer(maxGap), TimeMode.None(),
        OutputMode.Append())
  }

  def streamingSpanGate(docs: DataFrame, seenSpans: DataFrame,
      spanK: Int = 8, maxDupPct: Int = 50): Dataset[SpanAudit] = {
    import docs.sparkSession.implicits._
    val spans = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .where(size(col("toks")) >= spanK)
      .select(col("doc_id"), explode(
        graft.operators.CorpusPipeline.spanStrings(col("toks"), spanK)).as("g"))
      .select(col("doc_id"),
        graft.operators.Dedup.portableHash64(col("g")).as("h"))
    val prior = seenSpans.select(col("h")).distinct()
      .withColumn("_prior", lit(true))
    spans.join(broadcast(prior), Seq("h"), "left")
      .select(col("doc_id"),
        coalesce(col("_prior"), lit(false)).as("dup"))
      .as[(Long, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new SpanGateAuditor(maxDupPct), TimeMode.None(),
        OutputMode.Append())
  }

  /** Vocabulary-coverage gate at ingest — the streaming leg of
    * [[graft.operators.TextOps.vocabCoverageWith]] over a stored
    * [[graft.operators.TextOps.saveVocabModel]] artifact: each arriving
    * document's token count, covered-token count, OOV rate against the
    * fitted vocabulary, and a keep verdict (`oov_rate <= maxOov`;
    * tokenless docs drop — no tokens, no evidence). The vocabulary is
    * topK-bounded by construction, so it rides into the stream as a
    * LITERAL array and the whole gate is a stateless row-local
    * projection — zero carried state, zero stream-side shuffle (batch
    * parity pinned in TextStreamsSpec).
    */
  def streamingOovGate(docs: DataFrame, vocab: DataFrame,
      maxOov: Double = 0.5): DataFrame = {
    val words = vocab.select(col("word")).collect()
      .map(_.getString(0)).sorted
    val toks = array_remove(split(col("text"), "\\s+"), "")
    val covered =
      if (words.isEmpty) lit(0L)
      else {
        val vlit = array(words.toSeq.map(lit(_)): _*)
        size(filter(toks, x => array_contains(vlit, x))).cast("long")
      }
    docs
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        covered.as("n_covered"))
      .where(col("n_tokens") > 0)
      .withColumn("oov_rate",
        round(lit(1.0) - col("n_covered").cast("double") / col("n_tokens"), 6))
      .withColumn("keep", col("oov_rate") <= maxOov)
  }
}
