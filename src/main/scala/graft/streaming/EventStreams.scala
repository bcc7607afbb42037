package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Sliding-window event rate. */
  def slidingCounts(events: DataFrame, window_ : String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Stream-static enrichment: join the (streaming) events against a
    * static dimension table. Spark plans this as a broadcast/lookup join
    * re-resolved per micro-batch — the standard pattern for decorating an
    * event stream with slowly-changing reference data.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

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
                case Some(s) if t - s.lastUs <= gapUs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastUs = t))
                case Some(s) =>
                  closed += SessionUpdate(userId, s.nEvents, s.startUs, s.lastUs, expired = true)
                  cur = Some(SessionState(1L, t, t))
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
}
