package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Incremental near-duplicate discovery over a GROWING corpus — the
  * streaming twin of [[graft.operators.Dedup.minhashPairs]].
  *
  * At 100 TB the archive is never re-shingled: new documents arrive, and
  * the question is "which already-ingested documents does this one
  * near-duplicate?". The batch operator answers it by rebuilding the
  * whole banded index per run; this operator keeps the index AS STATE.
  * Per band bucket (the LSH key), a `transformWithState` processor holds
  * every signature seen so far; each arriving document is verified
  * against its bucket's history plus its own micro-batch, emits any pair
  * at/above the Jaccard threshold exactly once per bucket, and joins the
  * state. Work per document ~ its bucket occupancy — the same Σbucket²
  * cost shape as the batch index, amortized over arrival instead of
  * repaid in full per run.
  *
  * Every number replays the batch math bit for bit: signatures come from
  * the shuffle-free [[graft.operators.Dedup.rowLocalSignatures]] (same
  * md5-affine family), the signature-agreement prefilter is the same
  * ≥ 0.6·t·numHashes floor, verification is the same exact
  * hashed-shingle Jaccard with the same HALF_UP 4dp report — so the
  * union of emitted pairs over any arrival order equals the batch
  * operator's output on the union corpus (parity-pinned in
  * DedupStreamsSpec). Cross-BAND duplicates of a pair can appear (each
  * band discovers independently, exactly like the batch candidate set
  * before its `distinct`); consumers dedupe on (a, b) — kept out of the
  * stream so a bucket emission never waits on a global exchange.
  *
  * State per bucket is the bucket's full signature history; buckets are
  * bounded by LSH dispersion the same way the batch Σbucket² is. For a
  * never-ending archive that is the one unbounded growth vector in the
  * engine, so [[incrementalMinhashPairs]] takes an optional `ttl`: with
  * it the processor runs in processing-time mode and each bucket holds
  * only the trailing window's signatures — dedup-against-recent, the
  * standard posture when the archive's old segments are already frozen
  * and deduped. Expired entries are invisible to verification the moment
  * they age out (TTL filtering on read) and are physically removed by
  * the per-batch TTL cleanup, so state size tracks arrival rate x
  * window, not corpus size (asserted via the query's `numRowsTotal`
  * state metric in DedupStreamsSpec). Parity with the batch operator
  * holds within the window; cross-window pairs are intentionally
  * forgone.
  */
object DedupStreams {

  /** One doc's dedup identity inside a bucket: minhash signature + the
    * sorted hashed-shingle set the exact verify merges against.
    */
  final case class SigRow(docId: Long, sig: Array[Long], hset: Array[Long])

  /** A verified near-duplicate pair (a < b), jaccard reported at 4dp. */
  final case class NearPair(a: Long, b: Long, jaccard: Double)

  /** Per-bucket stateful verifier. Each unordered pair is considered
    * exactly once per bucket over the stream's lifetime: when its later
    * member arrives (new×stored), or within the arrival batch (new×new,
    * j < i). Emission content is arrival-order independent — the pair
    * (min id, max id, exact jaccard) is a pure function of the two
    * documents.
    */
  final class BandBucketDedup(threshold: Double, numHashes: Int,
      ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[String, SigRow, NearPair] {
    @transient private var seen: ListState[SigRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SigRow](
        "seen", Encoders.product[SigRow],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    // merge-count over sorted distinct arrays — the processor-side twin
    // of graft.functions.SortedIntersectCount
    private def intersectCount(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }

    override def handleInputRows(key: String, rows: Iterator[SigRow],
        timerValues: TimerValues): Iterator[NearPair] = {
      val fresh = rows.toArray
      val prior = seen.get().toArray
      val minMatch = (threshold * 0.6 * numHashes).toInt
      val out = scala.collection.mutable.ArrayBuffer.empty[NearPair]
      def consider(x: SigRow, y: SigRow): Unit = if (x.docId != y.docId) {
        val (p, q) = if (x.docId < y.docId) (x, y) else (y, x)
        var eq = 0; var i = 0
        while (i < numHashes) { if (p.sig(i) == q.sig(i)) eq += 1; i += 1 }
        if (eq >= minMatch) {
          val inter = intersectCount(p.hset, q.hset)
          val denom = p.hset.length + q.hset.length - inter
          val j = if (denom == 0) 0.0 else inter.toDouble / denom
          if (j >= threshold)
            // HALF_UP at 4dp — the exact rounding Spark's round() applies
            // in the batch operator's report column
            out += NearPair(p.docId, q.docId,
              BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      var i = 0
      while (i < fresh.length) {
        prior.foreach(consider(fresh(i), _))
        var j = 0
        while (j < i) { consider(fresh(i), fresh(j)); j += 1 }
        i += 1
      }
      fresh.foreach(seen.appendValue)
      out.iterator
    }
  }

  /** Band a signature frame and run the per-bucket stateful verifier.
    * Works on a streaming `docs` frame (the intended surface — requires
    * the RocksDB state store provider) and in batch mode (single batch,
    * no carried state) — the batch run equals [[graft.operators
    * .Dedup.minhashPairs]] modulo cross-band duplicates.
    */
  def incrementalMinhashPairs(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8, k: Int = 3,
      ttl: Option[java.time.Duration] = None): Dataset[NearPair] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    import docs.sparkSession.implicits._
    val r = numHashes / bands
    val sigs = graft.operators.Dedup.rowLocalSignatures(docs, numHashes, k)
    // band key = the r signature values verbatim, same as the batch
    // banding — identical buckets, identical candidate generation
    val bandStructs = (0 until bands).map { j =>
      val cols = (j * r until (j + 1) * r).map(i => element_at(col("sig"), i + 1))
      struct(lit(j).as("band"), concat_ws(",", cols: _*).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("sig"), col("hset"),
        explode(array(bandStructs: _*)).as("e"))
      .select(
        concat_ws("|", col("e.band"), col("e.bh")).as("key"),
        col("doc_id"), col("sig"), col("hset"))
      .as[(String, Long, Array[Long], Array[Long])]
      .groupByKey(_._1)
      .mapValues(t => SigRow(t._2, t._3, t._4))
      .transformWithState(new BandBucketDedup(threshold, numHashes, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
