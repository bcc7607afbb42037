package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental perceptual-hash duplicate accounting over a GROWING media
  * corpus — the streaming twin of
  * [[graft.operators.Multimodal.phashDupCounts]], built on the same
  * per-bucket-state pattern as [[DedupStreams.incrementalMinhashPairs]].
  *
  * At 100 TB the media archive is never re-decoded: new items arrive and
  * the question is "how many already-ingested items does this one
  * perceptually duplicate?". The batch operator rebuilds bucket counts
  * per run; this one keeps ONE counter per phash bucket as state. Each
  * arriving row is emitted exactly once with `n_dups` = the number of
  * PRIOR rows sharing its hash (carried state + earlier rows of its own
  * micro-batch, in arrival order) — so a bucket's LATEST emission always
  * equals the batch operator's answer for that row at that instant, and
  * over a full ingest the emitted values per bucket are exactly
  * 0,1,…,size−1 whatever the batch boundaries (parity-pinned in
  * MediaStreamsSpec).
  *
  * The hash itself is [[graft.operators.Multimodal.perceptualHash]]
  * verbatim — row-local, so it composes onto the streaming frame with no
  * extra state; the only stateful piece is the per-bucket counter (ONE
  * long per distinct hash — state tracks distinct-hash cardinality, not
  * corpus size). For endless archives `ttl` bounds even that: with it the
  * processor runs in processing-time mode and a bucket's counter expires
  * after the trailing window, giving duplicates-against-recent exactly
  * like the minhash TTL mode.
  */
object MediaStreams {

  /** One arrival: media id + its perceptual hash (the bucket key). */
  final case class PhashRow(mediaId: Long, phash: Long)

  /** One emission: how many prior arrivals shared this row's hash. */
  final case class PhashDup(mediaId: Long, phash: Long, nDups: Long)

  /** Per-bucket arrival counter. Emission order inside a micro-batch is
    * the bucket iterator's row order; the VALUE each row gets is a pure
    * function of how many rows preceded it in its bucket.
    */
  final class PhashBucketCounter(ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, PhashRow, PhashDup] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long](
        "cnt", Encoders.scalaLong,
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[PhashRow],
        timerValues: TimerValues): Iterator[PhashDup] = {
      var n = if (cnt.exists()) cnt.get() else 0L
      // materialize before updating state — the returned iterator is
      // consumed after this call, but the counter must reflect the whole
      // batch once the call ends
      val out = rows.map { r =>
        val d = PhashDup(r.mediaId, key, n)
        n += 1
        d
      }.toArray
      cnt.update(n)
      out.iterator
    }
  }

  /** Hash a (possibly streaming) media frame row-locally and run the
    * per-bucket counter. Requires the RocksDB state store provider on a
    * real stream; in single-batch mode it degenerates to the batch
    * operator's counts in arrival order.
    */
  def incrementalPhashDups(media: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[PhashDup] = {
    import media.sparkSession.implicits._
    graft.operators.Multimodal.perceptualHash(media)
      .select(col("media_id").as("mediaId"), col("phash"))
      .as[PhashRow]
      .groupByKey(_.phash)
      .transformWithState(new PhashBucketCounter(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** One fingerprint window arrival: media id + window index + its
    * energy-band hash ([[graft.operators.Multimodal.audioFingerprints]]).
    */
  final case class FpRow(mediaId: Long, winIdx: Int, fhash: Long)

  /** One emission: how many prior WINDOWS (any media row) shared this
    * window's hash — the streaming precursor of
    * [[graft.operators.Multimodal.audioDupPairs]]' bucket join.
    */
  final case class FpDup(mediaId: Long, winIdx: Int, fhash: Long, nDups: Long)

  /** Per-hash window counter — [[PhashBucketCounter]] specialized to
    * fingerprint windows so the emission keeps `winIdx` (the column the
    * banded pair-matcher needs for offset-consistent grouping).
    */
  final class FpBucketCounter(ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, FpRow, FpDup] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long](
        "cnt", Encoders.scalaLong,
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[FpRow],
        timerValues: TimerValues): Iterator[FpDup] = {
      var n = if (cnt.exists()) cnt.get() else 0L
      val out = rows.map { r =>
        val d = FpDup(r.mediaId, r.winIdx, key, n)
        n += 1
        d
      }.toArray
      cnt.update(n)
      out.iterator
    }
  }

  /** One stored fingerprint window inside a hash bucket. */
  final case class FpWin(mediaId: Long, winIdx: Int)

  /** One window-level match event: two media rows shared `fhash` at
    * windows (wa, wb). Consumers aggregate by (mediaA, mediaB, wb−wa)
    * and threshold the count — exactly the grouping
    * [[graft.operators.Multimodal.audioDupPairs]] applies to its
    * bucket join (parity-pinned in MediaStreamsSpec).
    */
  final case class WinMatch(mediaA: Long, wa: Int, mediaB: Long, wb: Int,
      fhash: Long)

  /** Per-hash-bucket matcher holding every window seen so far — the
    * audio twin of [[DedupStreams.BandBucketDedup]]: each arriving
    * window emits one match event against every stored window of a
    * DIFFERENT media row (plus earlier arrivals of its own batch), then
    * joins the state; each unordered window pair is considered exactly
    * once over the stream's lifetime, and the emission is a pure
    * function of the two windows, so the union of events over any
    * arrival order equals the batch bucket join on the union corpus.
    * Overflow MIRRORS the batch stop-hash drop (which discards overfull
    * buckets entirely): the first batch that would push a bucket past
    * `maxBucket` TOMBSTONES it — state cleared, nothing emitted from
    * that batch or after. Matches emitted in EARLIER batches stand
    * (append mode cannot retract), so union parity with batch holds
    * exactly while no bucket exceeds the cap and afterwards degrades
    * only by those already-emitted rows — never by emitting matches
    * batch would not (the [[PhashBandBucket]] rule); `ttl` bounds state
    * to the trailing window for endless archives and expires tombstones
    * with it.
    */
  final class FpBucketMatcher(maxBucket: Int,
      ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[Long, FpRow, WinMatch] {
    @transient private var seen: org.apache.spark.sql.streaming.ListState[FpWin] = _
    @transient private var dead: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getListState[FpWin](
        "seen", Encoders.product[FpWin],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
      dead = getHandle.getValueState[Boolean](
        "dead", Encoders.scalaBoolean,
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
    }

    override def handleInputRows(key: Long, rows: Iterator[FpRow],
        timerValues: TimerValues): Iterator[WinMatch] = {
      if (dead.exists()) { rows.foreach(_ => ()); return Iterator.empty }
      val prior = seen.get().toArray
      val arrived = rows.toArray
      if (prior.length + arrived.length > maxBucket) {
        seen.clear()
        dead.update(true)
        return Iterator.empty
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[WinMatch]
      val kept = scala.collection.mutable.ArrayBuffer.empty[FpWin]
      arrived.foreach { r =>
        val w = FpWin(r.mediaId, r.winIdx)
        def consider(o: FpWin): Unit = if (o.mediaId != w.mediaId) {
          val (p, q) = if (o.mediaId < w.mediaId) (o, w) else (w, o)
          out += WinMatch(p.mediaId, p.winIdx, q.mediaId, q.winIdx, key)
        }
        prior.foreach(consider)
        kept.foreach(consider)
        kept += w
      }
      kept.foreach(seen.appendValue)
      out.iterator
    }
  }

  /** Incremental audio-duplicate PAIR discovery over a growing archive —
    * the full streaming twin of
    * [[graft.operators.Multimodal.audioDupPairs]]' blocking join (where
    * [[incrementalAudioWindowDups]] only counts bucket pressure): new
    * media fingerprint row-locally, each window verifies against its
    * hash bucket's history, and every window-level match emits exactly
    * once. Downstream (or the consumer), `groupBy(mediaA, mediaB,
    * wb−wa) having count ≥ minMatch` reproduces the batch pair table on
    * the union corpus. State per bucket = its window list, the same
    * Σbucket² amortization as the streaming MinHash index.
    */
  def incrementalAudioMatches(media: DataFrame, maxBucket: Int = 1024,
      ttl: Option[java.time.Duration] = None): Dataset[WinMatch] = {
    import media.sparkSession.implicits._
    graft.operators.Multimodal.audioFingerprints(media)
      .select(col("media_id").as("mediaId"),
        col("win_idx").as("winIdx"), col("fhash"))
      .as[FpRow]
      .groupByKey(_.fhash)
      .transformWithState(new FpBucketMatcher(maxBucket, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Incremental audio-fingerprint duplicate accounting over a GROWING
    * media archive — the streaming twin of
    * [[graft.operators.Multimodal.audioDupPairs]]' blocking stage: each
    * arriving fingerprint WINDOW is emitted once with the count of prior
    * windows sharing its hash, so a downstream consumer sees exactly the
    * bucket pressure the batch matcher's self-join would (a window with
    * `nDups = 0` can never contribute a pair, and a hash bucket's latest
    * emission is its batch bucket size − 1). The fingerprinting itself
    * ([[graft.operators.Multimodal.audioFingerprints]]) is row-local, so
    * it composes onto the streaming frame with no extra state; state is
    * ONE long per distinct window hash, `ttl`-boundable for endless
    * archives like the phash and minhash twins.
    */
  def incrementalAudioWindowDups(media: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[FpDup] = {
    import media.sparkSession.implicits._
    graft.operators.Multimodal.audioFingerprints(media)
      .select(col("media_id").as("mediaId"),
        col("win_idx").as("winIdx"), col("fhash"))
      .as[FpRow]
      .groupByKey(_.fhash)
      .transformWithState(new FpBucketCounter(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Incremental VIDEO-duplicate PAIR discovery over a growing archive —
    * the streaming twin of
    * [[graft.operators.Multimodal.videoDupPairs]]' blocking join and the
    * video leg of [[incrementalAudioMatches]]: arriving media decode
    * row-locally to per-FRAME aHashes
    * ([[graft.operators.Multimodal.videoFingerprints]] — real y4m/MJPEG
    * frames, md5 stubs for undecodable payloads), each frame verifies
    * against its hash bucket's history, and every frame-level match
    * emits exactly once. Downstream, `groupBy(mediaA, mediaB, wb−wa)
    * having count ≥ minMatch` reproduces the batch pair table on the
    * union corpus — the `wa`/`wb` fields carry FRAME indices here, so
    * the consistent delta is the trim offset of a re-cut clip. State per
    * bucket = its stored frame list; overflow past `maxBucket`
    * tombstones the bucket, mirroring the batch degenerate-frame drop
    * (black frames and test cards are the video stop-words) — the
    * [[FpBucketMatcher]] rule; the same Σbucket² amortization as the
    * audio matcher; `ttl` bounds state to the trailing window for
    * endless archives.
    */
  def incrementalVideoMatches(media: DataFrame, maxBucket: Int = 1024,
      ttl: Option[java.time.Duration] = None): Dataset[WinMatch] = {
    import media.sparkSession.implicits._
    graft.operators.Multimodal.videoFingerprints(media)
      .select(col("media_id").as("mediaId"),
        col("frame_idx").as("winIdx"), col("fhash"))
      .as[FpRow]
      .groupByKey(_.fhash)
      .transformWithState(new FpBucketMatcher(maxBucket, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Incremental video frame-hash duplicate accounting over a GROWING
    * archive — [[incrementalAudioWindowDups]] verbatim on
    * (frame_idx, fhash) state: each arriving FRAME is emitted once with
    * the count of prior frames (any media row) sharing its aHash, so a
    * downstream consumer sees exactly the bucket pressure the batch
    * matcher's self-join would (a frame with `nDups = 0` can never
    * contribute a pair; a bucket's latest emission is its batch bucket
    * size − 1). The fingerprinting is row-local at the codec boundary,
    * composing onto the streaming frame with no extra state; state is
    * ONE long per distinct frame hash, `ttl`-boundable. The `winIdx`
    * field of the emission carries the frame index.
    */
  def incrementalVideoFrameDups(media: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[FpDup] = {
    import media.sparkSession.implicits._
    graft.operators.Multimodal.videoFingerprints(media)
      .select(col("media_id").as("mediaId"),
        col("frame_idx").as("winIdx"), col("fhash"))
      .as[FpRow]
      .groupByKey(_.fhash)
      .transformWithState(new FpBucketCounter(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** One stored phash-band bucket member. */
  final case class PhashMember(mediaId: Long, phash: Long)

  /** A verified image near-duplicate pair (mediaA < mediaB) at the given
    * hamming distance.
    */
  final case class PhashNearPair(mediaA: Long, mediaB: Long, hamming: Int)

  /** Per-band-bucket stateful verifier for image NEAR-dups — the media
    * twin of [[DedupStreams.BandBucketDedup]]: each arriving hash
    * verifies by integer popcount against its band bucket's history
    * (new×stored, plus earlier arrivals of its own batch), so every
    * unordered pair is considered exactly once PER BUCKET over the
    * stream's lifetime and the emission is a pure function of the two
    * hashes. A pair agreeing on several bands emits from each — the
    * same cross-band duplication the batch op's `.distinct()` collapses;
    * streaming consumers dedupe on (mediaA, mediaB) (parity-pinned in
    * MediaStreamsSpec). Overflow MIRRORS the batch drop: the batch op
    * emits ZERO pairs from a bucket over `maxBucket`, so the first
    * batch that would push a bucket past the cap TOMBSTONES it — its
    * member list is cleared (freeing exactly the hot-bucket state a
    * degenerate flat-image hash would otherwise pin forever) and the
    * overflowing batch plus everything after emit nothing from it.
    * Append mode cannot retract, so pairs emitted from the bucket in
    * EARLIER batches stand — union parity with batch holds exactly
    * while no bucket exceeds the cap, and degrades only by those
    * already-emitted rows afterwards (never by emitting pairs batch
    * would not).
    */
  final class PhashBandBucket(maxHamming: Int, maxBucket: Int,
      ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[String, PhashMember, PhashNearPair] {
    @transient private var seen: org.apache.spark.sql.streaming.ListState[PhashMember] = _
    @transient private var dead: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getListState[PhashMember](
        "seen", Encoders.product[PhashMember],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
      // the tombstone expires with the same TTL as the members it
      // replaced: in windowed mode a once-degenerate bucket key gets a
      // fresh start after the trailing window drains
      dead = getHandle.getValueState[Boolean](
        "dead", Encoders.scalaBoolean,
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))
    }

    override def handleInputRows(key: String, rows: Iterator[PhashMember],
        timerValues: TimerValues): Iterator[PhashNearPair] = {
      if (dead.exists()) { rows.foreach(_ => ()); return Iterator.empty }
      val prior = seen.get().toArray
      val arrived = rows.toArray
      if (prior.length + arrived.length > maxBucket) {
        // overfull: mirror the batch drop — zero pairs from this batch
        // on, and the stored members are released rather than pinned
        seen.clear()
        dead.update(true)
        return Iterator.empty
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[PhashNearPair]
      val kept = scala.collection.mutable.ArrayBuffer.empty[PhashMember]
      arrived.foreach { m =>
        def consider(o: PhashMember): Unit = if (o.mediaId != m.mediaId) {
          val h = java.lang.Long.bitCount(o.phash ^ m.phash)
          if (h <= maxHamming) {
            val (p, q) =
              if (o.mediaId < m.mediaId) (o, m) else (m, o)
            out += PhashNearPair(p.mediaId, q.mediaId, h)
          }
        }
        prior.foreach(consider)
        kept.foreach(consider)
        kept += m
      }
      kept.foreach(seen.appendValue)
      out.iterator
    }
  }

  /** Incremental image NEAR-dup pair discovery over a growing archive —
    * the streaming twin of
    * [[graft.operators.Multimodal.phashNearPairs]]' band join: arriving
    * media hash row-locally ([[graft.operators.Multimodal
    * .perceptualHash]] verbatim), each hash explodes into its `bands`
    * band keys, and per-bucket state verifies candidates by popcount at
    * `maxHamming` — pigeonhole-exact recall against everything already
    * ingested, for the re-encoded/resized re-uploads an exact-hash
    * screen ([[incrementalPhashDups]]) misses. State per bucket = its
    * member list, Σbucket² amortization; `ttl` bounds state to the
    * trailing window for endless archives (duplicates-against-recent).
    */
  def incrementalPhashNearPairs(media: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = 1024,
      ttl: Option[java.time.Duration] = None): Dataset[PhashNearPair] =
    bandedHashStream(
      graft.operators.Multimodal.perceptualHash(media), 16,
      maxHamming, bands, maxBucket, ttl)

  /** [[incrementalPhashNearPairs]] over the grid²-bit
    * [[graft.operators.Multimodal.perceptualHashWide]] code — the
    * ARCHIVE-SCALE streaming path (the batch
    * [[graft.operators.Multimodal.phashNearPairsWide]] twin): at 64
    * bits each band bucket's stored member list stays ~n/2¹⁶, so state
    * growth per bucket is genuinely bounded where the 16-bit code's
    * buckets grow linearly with the archive.
    */
  def incrementalPhashNearPairsWide(media: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = 1024, grid: Int = 8,
      ttl: Option[java.time.Duration] = None): Dataset[PhashNearPair] =
    bandedHashStream(
      graft.operators.Multimodal.perceptualHashWide(media, grid),
      grid * grid, maxHamming, bands, maxBucket, ttl)

  /** [[incrementalPhashNearPairsWide]] on the DCT code
    * ([[graft.operators.Multimodal.perceptualHashDct]], the batch
    * [[graft.operators.Multimodal.phashDctNearPairs]] twin) — the
    * brightness/gamma-robust streaming near-dup path. The banding
    * chain is hash-agnostic; only the row-local hash changes.
    */
  def incrementalPhashDctNearPairs(media: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = 1024, grid: Int = 32,
      ttl: Option[java.time.Duration] = None): Dataset[PhashNearPair] =
    bandedHashStream(
      graft.operators.Multimodal.perceptualHashDct(media, grid),
      64, maxHamming, bands, maxBucket, ttl)

  /** Shared band-explode + keyed-verify chain under the streaming
    * near-pair twins. `hashes` must be (media_id, phash).
    */
  private def bandedHashStream(hashes: DataFrame, nBits: Int,
      maxHamming: Int, bands: Int, maxBucket: Int,
      ttl: Option[java.time.Duration]): Dataset[PhashNearPair] = {
    require(bands > maxHamming,
      "bands must exceed maxHamming for exact recall")
    require(nBits % bands == 0, s"bands must divide the $nBits phash bits")
    import hashes.sparkSession.implicits._
    val r = nBits / bands
    val mask = if (r == 64) -1L else (1L << r) - 1
    // bucket key = "band|bits" string — the incrementalMinhashPairs
    // convention; collision-free for ANY band width (a packed long
    // would overlap its index bits once r > 32)
    val bandKeys = (0 until bands).map(j =>
      concat_ws("|", lit(j),
        shiftright(col("phash"), j * r).bitwiseAND(lit(mask))))
    hashes
      .select(col("media_id"), col("phash"),
        explode(array(bandKeys: _*)).as("key"))
      .as[(Long, Long, String)]
      .groupByKey(_._3)
      .mapValues(t => PhashMember(t._1, t._2))
      .transformWithState(new PhashBandBucket(maxHamming, maxBucket, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
