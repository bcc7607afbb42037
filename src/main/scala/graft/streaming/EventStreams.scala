package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming operators over the `events` schema (event_id, ts,
  * user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §1.3 "no streaming"); this module
  * is north-star scope. Each transform takes a (possibly streaming)
  * DataFrame and returns the transformed frame; callers attach
  * readStream/writeStream. Watermarks bound state so the operators run
  * indefinitely at any input rate.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark for late
    * data. State per (window, type) is dropped once the watermark passes.
    */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** Streaming distinct-user sketch: maintain the per-day HLL registers
    * of `RelationalX.rollingDistinct` incrementally — `max` per (day,
    * bucket) is monotone, so complete-mode output converges to exactly
    * the batch register table (parity-pinned in StreamingSpec), and a
    * downstream consumer runs the windowed merge + estimator over the
    * tiny register sink whenever it wants the rolling numbers. This is
    * the incremental path the batch op's docstring promises: a new day
    * of events touches only that day's registers, never a window rescan.
    */
  def distinctSketchStream(events: DataFrame, p: Int = 9): DataFrame =
    graft.operators.RelationalX.dayRegisters(events, p)

  /** Sliding-window event rate. */
  def slidingCounts(events: DataFrame, window_ : String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Real file pipeline: readStream over a parquet directory → row-level
    * transforms → parquet writeStream, processing everything currently
    * available and stopping (`Trigger.AvailableNow` — incremental batch,
    * restartable from the checkpoint). The canonical
    * readStream→transform→writeStream shape; aggregations belong in the
    * windowed variants above.
    */
  def runFilePipeline(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, checkpointDir: String,
      transform: DataFrame => DataFrame): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val q = transform(spark.readStream.schema(schema).parquet(inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC apply: maintain a keyed TABLE from a stream of change
    * rows (key, op, ts, seq, payload...) by applying each micro-batch
    * through [[graft.operators.Cdc.mergeUpsert]] with `foreachBatch` —
    * the continuously-maintained variant of the batch merge (the
    * streaming half of a MERGE INTO pipeline). The running state is a
    * [[graft.sources.Versioned]] table: each batch commits a NEW snapshot
    * and atomically swaps the pointer, so a failed batch never corrupts
    * the serving table, readers pin consistent snapshots (time travel),
    * and replayed batches simply re-commit.
    *
    * Trigger.AvailableNow: processes the backlog and stops, restartable
    * from the checkpoint — incremental batch, the recommended production
    * shape for CDC apply jobs.
    */
  def cdcApply(spark: org.apache.spark.sql.SparkSession, base: DataFrame,
      changes: DataFrame, key: String, stateDir: String,
      checkpointDir: String): Unit = {
    import graft.sources.Versioned
    // seed the state table ONLY on first start: on a checkpoint restart the
    // latest snapshot already contains every applied batch, and re-committing
    // the original base would silently discard them (AvailableNow skips
    // checkpointed batches, so nothing would replay the lost merges)
    if (Versioned.latestVersion(spark, stateDir).isEmpty)
      Versioned.commit(base, stateDir)
    val q = changes.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // CAS read-merge-commit: pin the base version, merge against it,
        // and commit only if no other writer advanced the table meanwhile
        // — otherwise the concurrent writer's committed merge would be
        // silently shadowed (lost update). On conflict, re-read + re-merge.
        var done = false
        while (!done) {
          val baseV = Versioned.latestVersion(spark, stateDir).getOrElse(
            throw new IllegalStateException(s"cdcApply: state table $stateDir vanished"))
          val cur = Versioned.read(spark, stateDir, Some(baseV))
          try {
            Versioned.commit(
              graft.operators.Cdc.mergeUpsert(cur, batch.toDF(), key), stateDir,
              expectedParent = Some(baseV))
            done = true
          } catch { case _: java.util.ConcurrentModificationException => () }
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming deduplication: drop repeated event ids while their
    * watermark window is open — bounded state, the streaming twin of the
    * batch exact-dedup operator.
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the (streaming) events against a
    * static dimension table. Spark plans this as a broadcast/lookup join
    * re-resolved per micro-batch — the standard pattern for decorating an
    * event stream with slowly-changing reference data.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame = {
    // frame-qualified keys: unqualified col(k) === col(k) is ambiguous the
    // moment both sides share the key name (the common enrichment shape)
    val joined = events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")
    if (eventKey == dimKey) joined.drop(dim(dimKey)) else joined
  }

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding `interval`. Both sides carry watermarks and
    * the join condition bounds event-time distance, so Spark evicts click
    * state once it can no longer match any future purchase — state stays
    * O(interval × rate), never unbounded. The streaming twin of the batch
    * as-of/range joins in [[graft.operators.EventOps]].
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "1 hour", interval: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $interval") &&
        col("click_ts") < col("purchase_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Session windows via the built-in gap-based `session_window` — the
    * streaming twin of the batch gaps-and-islands
    * [[graft.operators.EventOps.sessionize]].
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))

  final case class SessionUpdate(userId: Long, nEvents: Long, startUs: Long,
      endUs: Long, expired: Boolean)

  /** Per-user running counter on the Spark 4 arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`).
    * Emits (user, cumulative event count, cumulative value sum) per batch.
    * Requires the RocksDB state store provider (set by
    * [[runningTotalsPerUser]]'s caller or session conf).
    */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (n0, s0) = if (state.exists()) state.get() else (0L, 0.0)
      var n = n0
      var s = s0
      rows.foreach { case (_, v) => n += 1; s += v }
      state.update((n, s))
      Iterator.single((key, n, math.rint(s * 100) / 100))
    }
  }

  /** Running per-user totals over a (streaming) events frame via
    * `transformWithState`.
    */
  def runningTotalsPerUser(events: DataFrame): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Internal per-user state for [[statefulSessions]] (public: Spark's
    * generated encoder code must reach the accessors).
    */
  final case class SessionState(nEvents: Long, startUs: Long, lastUs: Long)

  /** Custom stateful sessionization with `flatMapGroupsWithState`: closes a
    * session when the inactivity gap is exceeded (within a batch or via
    * event-time timeout across batches) — the fully-general custom-state
    * path (per-key state machine), where `session_window` covers only gap
    * semantics. Input needs `user_id` and `ts` columns; in streaming mode
    * the watermark bounds state. Also runs in batch mode (timeouts never
    * fire; open sessions stay unemitted — streaming is the real surface).
    */
  def statefulSessions(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    // cast BEFORE the watermark: projecting a cast of the watermarked
    // column afterwards would produce a fresh attribute without the
    // watermark tag, and EventTimeTimeout would reject the plan
    val typed = events
      .select(col("user_id").cast("long").as("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.nEvents, s.startUs, s.lastUs, expired = true))
          } else {
            val ts = rows.map(_._2.getTime * 1000L).toArray.sorted
            val closed = scala.collection.mutable.Buffer.empty[SessionUpdate]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                // within gap of the open session's interval — including
                // late-but-in-watermark events older than lastUs (state
                // carried from a previous batch): widen, never regress.
                // A plain `lastUs = t` here would invert the interval and
                // set a too-early event-time timeout.
                case Some(s) if t >= s.startUs - gapUs && t - s.lastUs <= gapUs =>
                  cur = Some(SessionState(s.nEvents + 1,
                    math.min(s.startUs, t), math.max(s.lastUs, t)))
                case Some(s) if t > s.lastUs =>
                  closed += SessionUpdate(userId, s.nEvents, s.startUs, s.lastUs, expired = true)
                  cur = Some(SessionState(1L, t, t))
                case Some(_) =>
                  // late event more than a gap OLDER than the open session:
                  // its own session, already closed by the time it arrived
                  closed += SessionUpdate(userId, 1L, t, t, expired = true)
                case None =>
                  cur = Some(SessionState(1L, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // batch execution has no watermark → timeouts unsupported there
              try state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes.toLong * 60L * 1000L)
              catch { case _: UnsupportedOperationException => }
            }
            closed.iterator
          }
      }
  }

  /** One attribution-relevant event for [[attributionStream]]: timestamps
    * as epoch micros, value pre-converted to exact micro units.
    */
  final case class AttrEvent(userId: Long, tsUs: Long, eventId: Long,
      eventType: String, vi: Long)

  /** A credited purchase emitted by [[attributionStream]]. */
  final case class CreditedPurchase(userId: Long, eventId: Long,
      touchType: String, vi: Long)

  /** Per-user last-touch carry: the streaming twin of
    * [[graft.operators.EventOps.attributionCredits]]'s ignoreNulls-last
    * window. State per user is ONE string (the most recent non-purchase
    * touch) — constant per key, no growth, no TTL needed; a batch's rows
    * sort by (tsUs, eventId) before the carry so within-batch order
    * replays the batch window's total order exactly.
    */
  final class LastTouchProcessor
      extends StatefulProcessor[Long, AttrEvent, CreditedPurchase] {
    @transient private var touch: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      touch = getHandle.getValueState[String](
        "touch", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[AttrEvent],
        timerValues: TimerValues): Iterator[CreditedPurchase] = {
      val sorted = rows.toArray.sortBy(e => (e.tsUs, e.eventId))
      val out = Vector.newBuilder[CreditedPurchase]
      sorted.foreach { e =>
        if (e.eventType == "purchase")
          out += CreditedPurchase(userId, e.eventId,
            Option(touch.get()).getOrElse("direct"), e.vi)
        else touch.update(e.eventType)
      }
      out.result().iterator
    }
  }

  /** Streaming last-touch attribution: each arriving purchase credits the
    * user's most recent earlier click/view, carried as per-user
    * `transformWithState` state across micro-batches — the credited
    * purchases stream out as they happen instead of waiting for a batch
    * window over the full history. Downstream, the touch-type rollup is
    * a plain streaming aggregate over this output.
    *
    * Equals the batch operator row for row when arrival respects
    * per-user event-time order across batches (the log-ingestion norm;
    * within a batch any order is fine — rows sort before the carry).
    * Cross-batch OUT-OF-ORDER arrivals credit against state as of
    * arrival — the streaming-native semantics; re-run the batch operator
    * for the retrospective answer. Parity under in-order arrival is
    * pinned in StreamingSpec.
    *
    * Scale shape: one shuffle on user_id per micro-batch; state is one
    * string per user in the state store.
    */
  def attributionStream(events: DataFrame): Dataset[CreditedPurchase] = {
    import events.sparkSession.implicits._
    events
      .where(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id").cast("long").as("userId"),
        // full microsecond precision: the batch window orders by the raw
        // timestamp, so truncating to seconds here would break tie order
        expr("unix_micros(cast(ts as timestamp))").as("tsUs"),
        col("event_id").cast("long").as("eventId"),
        col("event_type").as("eventType"),
        expr("cast(round(value * 1000000) as bigint)").as("vi"))
      .as[AttrEvent]
      .groupByKey(_.userId)
      .transformWithState(new LastTouchProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
