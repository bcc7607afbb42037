package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental Holt level+trend smoothing over streaming metric points —
  * the streaming twin of [[graft.operators.EventOps.holtSmoothOf]], on
  * the per-key-state pattern of the dedup/media/text streams.
  *
  * A metric store never refolds its history: hourly points arrive (from
  * an upstream windowed count, a metrics pipe, a CDC feed) and each
  * series' (level, trend) pair IS the state — two longs per series,
  * updated per point with the identical integer micro-unit recurrence
  * (`l ← (3·y·10⁶ + 7·(l+b)) div 10`, `b ← (2·(l'−l) + 8·b) div 10`,
  * truncating div) and emitted with the one-step forecast. After any
  * prefix of the series, state equals the batch fold over that prefix —
  * two-batch parity pinned in MetricStreamsSpec.
  *
  * Points are folded in `hb` order WITHIN each micro-batch; ACROSS
  * batches arrival order is trusted (the metrics-ingestion norm — an
  * upstream watermark owns lateness; a late point folds as of arrival,
  * the streaming-native semantics, like the attribution stream).
  */
object MetricStreams {

  /** One observed point of one series. */
  final case class MetricPoint(series: String, hbUs: Long, y: Long)

  /** Carried recurrence state per series. */
  final case class HoltState(l: Long, b: Long, n: Long)

  /** One emission per arriving point: state AFTER folding it. */
  final case class HoltUpdate(series: String, hbUs: Long, nPoints: Long,
      levelMicro: Long, trendMicro: Long, forecastNextMicro: Long)

  final class HoltProcessor
      extends StatefulProcessor[String, MetricPoint, HoltUpdate] {
    @transient private var st: ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HoltState](
        "holt", Encoders.product[HoltState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[MetricPoint],
        timerValues: TimerValues): Iterator[HoltUpdate] = {
      var s = if (st.exists()) st.get() else HoltState(0L, 0L, 0L)
      val out = rows.toArray.sortBy(_.hbUs).map { p =>
        s =
          if (s.n == 0L) HoltState(p.y * 1000000L, 0L, 1L)
          else {
            val lNew = (3L * p.y * 1000000L + 7L * (s.l + s.b)) / 10L
            HoltState(lNew, (2L * (lNew - s.l) + 8L * s.b) / 10L, s.n + 1L)
          }
        HoltUpdate(key, p.hbUs, s.n, s.l, s.b, s.l + s.b)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Fold a (possibly streaming) frame of `(series, hb, y)` points.
    * Requires the RocksDB state store provider on a real stream.
    */
  def holtStream(points: DataFrame): Dataset[HoltUpdate] = {
    import points.sparkSession.implicits._
    points
      .select(col("series").cast("string").as("series"),
        expr("unix_micros(cast(hb as timestamp))").as("hbUs"),
        col("y").cast("long").as("y"))
      .as[MetricPoint]
      .groupByKey(_.series)
      .transformWithState(new HoltProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Carried lag-autocorrelation state per series: the last `lag` values
    * (ring, oldest first — at most `lag` longs) plus exact integer
    * co-moments over all (y_t, y_{t−lag}) pairs seen. Bounded per-series
    * state, the [[HoltState]] contract.
    */
  final case class SeasonState(lastHbUs: Long, ring: Seq[Long], n: Long,
      sx: Long, sy: Long, sxy: Long, sxx: Long, syy: Long)

  /** One emission per arriving point: pair count and Pearson lag
    * autocorrelation AFTER folding it (None while variance is undefined —
    * the batch op's NaN→NULL normalization).
    */
  final case class SeasonUpdate(series: String, hbUs: Long, nPairs: Long,
      autocorr: Option[Double])

  /** Streaming twin of [[graft.operators.EventOps.seasonalityStrength]]:
    * the batch op densifies each series over its [min, max] hour span
    * (missing hours are genuine zeros for a count metric) and correlates
    * the series against itself at `lagHours`; here the DENSIFICATION IS
    * INCREMENTAL — points arrive in hour order per series, and a gap
    * between the carried last hour and an arriving point folds the
    * missing hours as zeros before the point itself, so state after any
    * prefix equals the batch fold over that prefix (two-batch parity in
    * MetricStreamsSpec, including a gap straddling the batch cut).
    *
    * Out-of-order or duplicate hours are DROPPED — an autocorrelation
    * cannot retro-fill a zero it already folded; lateness belongs to the
    * upstream watermark that produced the hourly points (same trust
    * contract as [[holtStream]], tightened because this fold is not
    * order-insensitive). Gap cost is linear in SPAN hours, the same
    * bound the batch densify pays.
    */
  final class SeasonalityProcessor(lagHours: Int)
      extends StatefulProcessor[String, MetricPoint, SeasonUpdate] {
    @transient private var st: ValueState[SeasonState] = _
    private val HourUs = 3600L * 1000000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SeasonState](
        "season", Encoders.product[SeasonState], TTLConfig.NONE)

    private def step(v: Long, s: SeasonState): SeasonState =
      if (s.ring.length == lagHours) {
        val lag = s.ring.head
        SeasonState(s.lastHbUs, s.ring.tail :+ v, s.n + 1, s.sx + v,
          s.sy + lag, s.sxy + v * lag, s.sxx + v * v, s.syy + lag * lag)
      } else s.copy(ring = s.ring :+ v)

    private def corrOf(s: SeasonState): Option[Double] =
      if (s.n == 0) None
      else {
        val n = s.n.toDouble
        val dx = n * s.sxx - s.sx.toDouble * s.sx
        val dy = n * s.syy - s.sy.toDouble * s.sy
        if (dx <= 0d || dy <= 0d) None
        else Some((n * s.sxy - s.sx.toDouble * s.sy) /
          math.sqrt(dx) / math.sqrt(dy))
      }

    override def handleInputRows(key: String, rows: Iterator[MetricPoint],
        timerValues: TimerValues): Iterator[SeasonUpdate] = {
      var s = if (st.exists()) st.get()
        else SeasonState(Long.MinValue, Vector.empty, 0L, 0L, 0L, 0L, 0L, 0L)
      val out = rows.toArray.sortBy(_.hbUs).flatMap { p =>
        if (s.lastHbUs != Long.MinValue && p.hbUs <= s.lastHbUs) None
        else {
          if (s.lastHbUs != Long.MinValue) {
            var h = s.lastHbUs + HourUs
            while (h < p.hbUs) { s = step(0L, s); h += HourUs }
          }
          s = step(p.y, s).copy(lastHbUs = p.hbUs)
          Some(SeasonUpdate(key, p.hbUs, s.n, corrOf(s)))
        }
      }
      st.update(s)
      out.iterator
    }
  }

  /** Fold a (possibly streaming) frame of `(series, hb, y)` points into
    * per-series lag autocorrelation updates. Requires the RocksDB state
    * store provider on a real stream.
    */
  def seasonalityStream(points: DataFrame, lagHours: Int = 24): Dataset[SeasonUpdate] = {
    import points.sparkSession.implicits._
    points
      .select(col("series").cast("string").as("series"),
        expr("unix_micros(cast(hb as timestamp))").as("hbUs"),
        col("y").cast("long").as("y"))
      .as[MetricPoint]
      .groupByKey(_.series)
      .transformWithState(new SeasonalityProcessor(lagHours), TimeMode.None(),
        OutputMode.Append())
  }

  /** One value routed to its histogram bucket. */
  final case class ValuePoint(bucket: Long, v: Long)

  /** A bucket's refreshed totals after folding a batch's arrivals. */
  final case class HistBucket(bucket: Long, n: Long, sumV: Long, gen: Long)

  /** Per-bucket exact accumulator for [[streamingHistogram]]: one
    * (count, sum, generation) triple of state per OCCUPIED bucket —
    * bucket arithmetic is row-local before the shard, counts and integer
    * sums merge exactly (mergeable summaries, no approximation).
    */
  final class HistogramProcessor
      extends StatefulProcessor[Long, ValuePoint, HistBucket] {
    @transient private var st: ValueState[HistBucket] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HistBucket](
        "hist", Encoders.product[HistBucket], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ValuePoint],
        timerValues: TimerValues): Iterator[HistBucket] = {
      var n = 0L
      var s = 0L
      rows.foreach { p => n += 1L; s += p.v }
      val prior = if (st.exists()) st.get() else HistBucket(key, 0L, 0L, -1L)
      val upd = HistBucket(key, prior.n + n, prior.sumV + s, prior.gen + 1L)
      st.update(upd)
      Iterator.single(upd)
    }
  }

  /** Streaming fixed-width value histogram — the ingest twin of
    * [[graft.operators.RelationalX.histogram]]'s bucket fold, over an
    * integer-scaled value column `v` (the caller scales currency to
    * cents etc., the integer micro-unit convention of every streaming
    * twin): arrivals bucket by `floor(v / width)` row-locally, shard to
    * their bucket's carried (count, sum) state, and each batch emits the
    * bucket's REFRESHED row stamped with a generation counter —
    * emissions SUPERSEDE (the [[TextStreams.streamingHeavyHitters]]
    * convention), so max-gen rows per bucket are always the exact
    * histogram of everything ingested. State is one triple per occupied
    * bucket whatever the stream length; no approximation anywhere
    * (two-batch parity vs the batch fold pinned in MetricStreamsSpec).
    */
  def streamingHistogram(values: DataFrame, width: Long): Dataset[HistBucket] = {
    require(width > 0, "width must be positive")
    import values.sparkSession.implicits._
    values
      .select(floor(col("v").cast("double") / width).cast("long").as("bucket"),
        col("v").cast("long").as("v"))
      .as[ValuePoint]
      .groupByKey(_.bucket)
      .transformWithState(new HistogramProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
