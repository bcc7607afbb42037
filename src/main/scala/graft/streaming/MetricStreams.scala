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
}
