package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batchEvents = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0),
    (3L, ts("2024-01-01 11:50:00"), 1L, "view", 3.0),
    (4L, ts("2024-01-01 10:30:00"), 2L, "view", 4.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionWindows (batch mode): gap-based grouping") {
    val got = EventStreams.sessionWindows(batchEvents, gap = "30 minutes")
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) === Set(2L, 1L)) // two sessions for user 1
    assert(got(2L) === Set(1L))
  }

  test("statefulSessions (batch mode): closes sessions on gap inside batch") {
    val closed = EventStreams.statefulSessions(batchEvents, gapMinutes = 30)
      .collect()
    // user 1's first session (2 events) closes when the 11:50 event arrives
    assert(closed.length === 1)
    assert(closed.head.userId === 1L)
    assert(closed.head.nEvents === 2L)
  }

  test("statefulSessions over a real stream: event-time timeout closes sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val query = EventStreams.statefulSessions(events, gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_stream_test").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      query.processAllAvailable()
      assert(spark.table("sess_stream_test").count() === 0) // session still open
      mem.addData((2L, ts("2024-01-01 12:00:00"))) // advances watermark past 10:35
      query.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 12:01:00"))) // extra batch so timeouts process
      query.processAllAvailable()
      val closed = spark.table("sess_stream_test").as[EventStreams.SessionUpdate].collect()
      assert(closed.exists(s => s.userId == 1L && s.nEvents == 2L && s.expired))
    } finally query.stop()
  }

  test("statefulSessions: a late-but-in-watermark event widens the session, never regresses it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val query = EventStreams.statefulSessions(events, gapMinutes = 30, watermark = "6 hours")
      .writeStream.format("memory").queryName("sess_late_test").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 12:00:00")), (1L, ts("2024-01-01 12:10:00")))
      query.processAllAvailable()
      // batch 2: 11:55 is LATE (older than the stored lastUs=12:10) but
      // inside the watermark and within the gap → must merge by widening
      // start, not regress lastUs; 09:00 is more than a gap older than the
      // session → its own already-closed singleton; 12:30 is 20 min after
      // the true last event and must merge (a regressed lastUs would
      // wrongly split it off)
      mem.addData((1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 11:55:00")),
        (1L, ts("2024-01-01 12:30:00")))
      query.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 14:00:00"))) // gap exceeded → closes the session
      query.processAllAvailable()
      val closed = spark.table("sess_late_test").as[EventStreams.SessionUpdate]
        .collect().sortBy(_.startUs)
      def us(s: String) = ts(s).getTime * 1000L
      assert(closed.length === 2, s"expected singleton + main session: ${closed.toSeq}")
      assert(closed(0).nEvents === 1L && closed(0).startUs === us("2024-01-01 09:00:00"))
      assert(closed(1).nEvents === 4L, "12:30 must merge with the un-regressed session")
      assert(closed(1).startUs === us("2024-01-01 11:55:00"), "late event widens start")
      assert(closed(1).endUs === us("2024-01-01 12:30:00"), "lastUs never regresses")
    } finally query.stop()
  }

  test("enrich resolves same-name keys on both sides (no ambiguous reference)") {
    val events = Seq((100L, 1L), (101L, 3L)).toDF("event_id", "user_id")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val got = EventStreams.enrich(events, dim, "user_id", "user_id")
    assert(got.columns.count(_ == "user_id") === 1, "dim's duplicate key column is dropped")
    val byId = got.select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId === Map(100L -> Some("gold"), 101L -> None))
  }

  test("file pipeline: readStream parquet → transform → writeStream parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-file").toString
    Tables.events(spark, sfDir).write.parquet(s"$base/in")
    EventStreams.runFilePipeline(spark, s"$base/in", s"$base/out", s"$base/ckpt",
      df => df.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "value"))
    val out = spark.read.parquet(s"$base/out")
    val expected = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase").count()
    assert(out.count() === expected)
    assert(out.columns.toSeq === Seq("event_id", "user_id", "value"))
  }

  test("concurrent queries share one session (multi-job admission)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(
      Future.sequence((1 to 4).map(_ => Future {
        Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
      })), 120.seconds)
    assert(counts.forall(_ == 3L))
  }

  test("transformWithState: running totals accumulate across batches (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Double)]
    val events = mem.toDF().toDF("user_id", "value")
    val query = EventStreams.runningTotalsPerUser(events)
      .toDF("user_id", "n", "total")
      .writeStream.format("memory").queryName("tws_test").outputMode("update").start()
    try {
      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      query.processAllAvailable()
      mem.addData((1L, 2.5))
      query.processAllAvailable()
      val last = spark.table("tws_test")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n").as("n"),
          org.apache.spark.sql.functions.max("total").as("total"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(last(1L) === ((3L, 17.5)))
      assert(last(2L) === ((1L, 1.0)))
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dedupStream drops repeated event ids across batches within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("event_id", "ts")
    val query = EventStreams.dedupStream(events, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream_test").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:00:30")))
      query.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:01:00")), (2L, ts("2024-01-01 10:02:00")))
      query.processAllAvailable()
      val ids = spark.table("dedup_stream_test").select("event_id")
        .as[Long].collect().toList
      assert(ids.sorted === List(1L, 2L)) // id 1 kept once despite 3 arrivals
    } finally query.stop()
  }

  test("enrich: stream-static join decorates events with dimension columns") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("event_id", "user_id")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val query = EventStreams.enrich(events, dim, "user_id", "cust_id")
      .writeStream.format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      mem.addData((100L, 1L), (101L, 3L))
      query.processAllAvailable()
      val got = spark.table("enrich_test")
        .select("event_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got(100L) === Some("gold"))
      assert(got(101L) === None) // left join keeps unmatched events
    } finally query.stop()
  }

  test("late data beyond the watermark is dropped from windowed aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    // append mode + short watermark: a window only emits once the
    // watermark passes its end, and later-than-watermark rows are dropped
    val query = EventStreams.tumblingCounts(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("late_test").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:05:00"), "click", 1.0))
      query.processAllAvailable()
      // advance event time far past the 10:00 window; watermark moves to
      // ~13:50, closing and emitting the 10:00-11:00 window
      mem.addData((2L, ts("2024-01-01 14:00:00"), "view", 1.0))
      query.processAllAvailable()
      // this row is 4 hours behind the watermark → must be ignored
      mem.addData((3L, ts("2024-01-01 10:07:00"), "click", 99.0))
      query.processAllAvailable()
      val got = spark.table("late_test")
        .select(col("window.start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(got === Set(("2024-01-01 10:00:00", "click", 1L)),
        s"late row must not reopen the closed window: $got")
    } finally query.stop()
  }

  test("stream-stream interval join matches purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.clickPurchaseJoin(
      clicks.toDF().toDF("event_id", "ts", "user_id"),
      purchases.toDF().toDF("event_id", "ts", "user_id"))
    val query = joined.writeStream.format("memory")
      .queryName("ssjoin_test").outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L), // 30 min before purchase → match
        (2L, ts("2024-01-01 08:00:00"), 1L), // 2.5 h before → outside interval
        (3L, ts("2024-01-01 10:15:00"), 2L)) // other user
      purchases.addData((10L, ts("2024-01-01 10:30:00"), 1L))
      query.processAllAvailable()
      // advance both watermarks past the join horizon so results emit
      clicks.addData((4L, ts("2024-01-01 13:00:00"), 9L))
      purchases.addData((11L, ts("2024-01-01 13:00:00"), 9L))
      query.processAllAvailable()
      val got = spark.table("ssjoin_test")
        .select("purchase_id", "user_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((10L, 1L, 1L)))
    } finally query.stop()
  }

  test("tumblingCounts over a real stream (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val query = EventStreams.tumblingCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
        (2L, ts("2024-01-01 10:55:00"), "click", 2.0),
        (3L, ts("2024-01-01 11:05:00"), "view", 3.0))
      query.processAllAvailable()
      val got = spark.table("tumbling_test")
        .select(col("window.start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(got === Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 11:00:00", "view", 1L)))
    } finally query.stop()
  }

  test("row-local corpus filters run unchanged on a document stream") {
    // quality scoring, repetition gates and mix sampling are pure row-local
    // projections/filters, so the SAME operator code runs under
    // readStream — the streaming-ingest shape of a training-data pipeline
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val gated = graft.operators.TextOps.repetitionSignals(
      graft.operators.TextOps.mixSources(docs, Map("drop" -> 0.0)))
    val query = gated.writeStream.format("memory")
      .queryName("corpus_stream_test").outputMode("append").start()
    try {
      mem.addData((1L, "a b a b a", "keep"), (2L, "x y z", "keep"),
        (3L, "a b a b a", "drop"))
      query.processAllAvailable()
      val got = spark.table("corpus_stream_test")
        .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === Map(1L -> (0.5, 0.5), 2L -> (0.0, 0.5)))
    } finally query.stop()
  }

  test("lmPerplexity scores a document stream against a static reference LM") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((10L, "a b"), (11L, "a b")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // stream-static joins against the batch LM; per-doc rollup in update mode
    val query = graft.operators.TextOps.lmPerplexity(docs, ref)
      .writeStream.format("memory").queryName("lm_stream_test")
      .outputMode("update").start()
    try {
      mem.addData((1L, "a b"), (2L, "a z"))
      query.processAllAvailable()
      val got = spark.table("lm_stream_test")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      assert(got === Map(1L -> 0.415, 2L -> 2.0))
    } finally query.stop()
  }

  // ── batch-parity harness: each streaming op runs with
  // Trigger.AvailableNow over the STATIC events fixture and must produce
  // exactly its batch twin's frame — the hard-check for ops DuckDB cannot
  // replay (watermarked streams have no SQL oracle) ──

  /** Round-trip `df` through parquet → readStream → `f` → memory sink,
    * processing everything with AvailableNow, and return the sink table.
    */
  private def streamed(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String)(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_parity_$name").toString
    df.write.parquet(s"$dir/in")
    val q = f(spark.readStream.schema(df.schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("batch parity: tumblingCounts (AvailableNow) equals hourlyRollup") {
    val got = streamed(Tables.events(spark, sfDir), "parity_tumbling", "complete")(
      EventStreams.tumblingCounts(_, "1 hour", "2 hours"))
      .select(unix_seconds(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    val want = graft.operators.EventOps.hourlyRollup(spark, sfDir)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("batch parity: sessionWindows rollup (AvailableNow) equals sessionize") {
    val perUser = streamed(Tables.events(spark, sfDir), "parity_sessions", "complete")(
      EventStreams.sessionWindows(_, gap = "30 minutes"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max("n_events").as("max_session_events"),
        sum("n_events").as("n_events_total"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.EventOps.sessionize(spark, sfDir, gapMinutes = 30)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(perUser === want)
  }

  test("batch parity: distinctSketchStream registers equal the batch registers") {
    val got = streamed(Tables.events(spark, sfDir), "parity_registers", "complete")(
      EventStreams.distinctSketchStream(_))
      .as[(Int, Long, Int)].collect().toSet
    val want = graft.operators.RelationalX.dayRegisters(Tables.events(spark, sfDir))
      .as[(Int, Long, Int)].collect().toSet
    assert(got === want)
  }

  test("batch parity: attributionStream credits equal the batch window's credits") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Tables.events(spark, sfDir)
      val got = streamed(events, "parity_attr", "append")(
        df => EventStreams.attributionStream(df).toDF())
        .as[(Long, Long, String, Long)].collect().toSet
      val want = graft.operators.EventOps.attributionCredits(events)
        .as[(Long, Long, String, Long)].collect().toSet
      assert(got === want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("attributionStream carries the last touch across micro-batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = EventStreams.attributionStream(events)
        .writeStream.format("memory").queryName("attr_stream_test")
        .outputMode("append").start()
      try {
        // batch 1: the touch only — no purchase, nothing emitted
        mem.addData((1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0))
        q.processAllAvailable()
        assert(spark.table("attr_stream_test").count() === 0)
        // batch 2: the purchase must credit batch 1's click via state
        mem.addData((2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 1.25))
        q.processAllAvailable()
        val rows = spark.table("attr_stream_test")
          .as[(Long, Long, String, Long)].collect().toSet
        assert(rows === Set((7L, 2L, "click", 1250000L)))
        // a different user's purchase with no prior touch is "direct"
        mem.addData((3L, ts("2024-01-01 10:40:00"), 8L, "purchase", 2.0))
        q.processAllAvailable()
        val all = spark.table("attr_stream_test")
          .as[(Long, Long, String, Long)].collect().toSet
        assert(all.contains((8L, 3L, "direct", 2000000L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("batch parity: dedupStream (AvailableNow) equals batch dropDuplicates") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val duplicated = events.union(events) // every id arrives twice
    val got = streamed(duplicated, "parity_dedup", "append")(
      EventStreams.dedupStream(_, watermark = "1 hour"))
      .select("event_id").as[Long].collect().sorted.toSeq
    val want = duplicated.dropDuplicates("event_id")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got === want)
  }

  test("batch parity: slidingCounts and clickPurchaseJoin match their batch execution") {
    // both functions run unchanged on batch frames; the parity check is
    // that STREAMING execution (watermarks, state store, AvailableNow)
    // emits exactly the batch result on a bounded input
    val events = Tables.events(spark, sfDir)
    val gotSliding = streamed(events, "parity_sliding", "complete")(
      EventStreams.slidingCounts(_))
      .select(unix_seconds(col("window.start")).as("ws"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val wantSliding = EventStreams.slidingCounts(events)
      .select(unix_seconds(col("window.start")).as("ws"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(gotSliding === wantSliding)

    val clicks = events.where(col("event_type") === "click")
    val purchases = events.where(col("event_type") === "purchase")
    val dir = java.nio.file.Files.createTempDirectory("graft_parity_ssj").toString
    clicks.write.parquet(s"$dir/c")
    purchases.write.parquet(s"$dir/p")
    val q = EventStreams.clickPurchaseJoin(
      spark.readStream.schema(clicks.schema).parquet(s"$dir/c"),
      spark.readStream.schema(purchases.schema).parquet(s"$dir/p"))
      .writeStream.format("memory").queryName("parity_ssj").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val gotJoin = spark.table("parity_ssj")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    val wantJoin = EventStreams.clickPurchaseJoin(clicks, purchases)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(gotJoin === wantJoin)
  }

  test("batch parity: cdcApply (AvailableNow) equals one-shot mergeUpsert") {
    val base = Tables.customer(spark, sfDir)
    val changes = graft.operators.Cdc.customerChanges(Tables.orders(spark, sfDir))
    val dir = java.nio.file.Files.createTempDirectory("graft_parity_cdc").toString
    changes.coalesce(1).write.parquet(s"$dir/changes")
    EventStreams.cdcApply(spark, base,
      spark.readStream.schema(changes.schema).parquet(s"$dir/changes"),
      "c_custkey", s"$dir/state", s"$dir/ckpt")
    val got = graft.sources.Versioned.read(spark, s"$dir/state")
    val want = graft.operators.Cdc.mergeUpsert(base, changes, "c_custkey")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming CDC apply must reproduce the batch merge exactly")
  }

  test("cdcApply maintains a keyed table from a change stream") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal")
    val mem = MemoryStream[(Long, String, Timestamp, Long, Double)]
    val t = ts("2024-01-01 00:00:00")
    mem.addData(
      (1L, "U", t, 1L, 11.0),  // update existing
      (2L, "D", t, 2L, 0.0),   // delete existing
      (3L, "U", t, 3L, 30.0))  // insert new key
    val changes = mem.toDF().toDF("key", "op", "ts", "seq", "bal")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    EventStreams.cdcApply(spark, base, changes, "id",
      s"$dir/state", s"$dir/ckpt")
    val out = graft.sources.Versioned.read(spark, s"$dir/state")
      .select("id", "bal").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 11.0), (3L, 30.0)))
    // restart with the same checkpoint: the seed commit must NOT rerun
    // (it would reset the state table and silently discard the merges;
    // AvailableNow skips the already-checkpointed batch so nothing would
    // replay them)
    EventStreams.cdcApply(spark, base, mem.toDF().toDF("key", "op", "ts", "seq", "bal"),
      "id", s"$dir/state", s"$dir/ckpt")
    val after = graft.sources.Versioned.read(spark, s"$dir/state")
      .select("id", "bal").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(after === Seq((1L, 11.0), (3L, 30.0)), "restart must preserve applied changes")
    // the base snapshot is still readable: time travel to v0
    val v0 = graft.sources.Versioned.read(spark, s"$dir/state", Some(0L))
      .select("id", "bal").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(v0 === Seq((1L, 10.0), (2L, 20.0)))
  }
}
