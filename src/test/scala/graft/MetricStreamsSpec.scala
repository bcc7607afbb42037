package graft

import graft.streaming.MetricStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MetricStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming Holt over two chronological batches equals the batch " +
    "fold on the full series") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // the fixture's real hourly count series, split chronologically
      val hourly = Tables.events(spark, sfDir)
        .groupBy(col("event_type").as("series"),
          date_trunc("hour", col("ts")).as("hb"))
        .agg(count(lit(1)).as("y"))
        .select(col("series"), expr("unix_micros(hb)").as("hbUs"), col("y"))
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val cut = hourly.map(_._2).sorted.apply(hourly.length / 2)
      val b1 = hourly.filter(_._2 < cut)
      val b2 = hourly.filter(_._2 >= cut)
      val mem = MemoryStream[(String, Long, Long)]
      val pts = mem.toDF().toDF("series", "hbUs", "y")
        .select(col("series"), expr("timestamp_micros(hbUs)").as("hb"), col("y"))
      val q = MetricStreams.holtStream(pts)
        .writeStream.format("memory").queryName("holt_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1.toSeq: _*); q.processAllAvailable()
        mem.addData(b2.toSeq: _*); q.processAllAvailable()
        val rows = spark.table("holt_parity")
          .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        assert(rows.size === hourly.length, "one emission per point")
        // final emission per series == the batch fold over the whole series
        val last = rows.groupBy(_._1).map { case (s, rs) =>
          val m = rs.maxBy(_._3) // highest nPoints = last fold
          s -> ((m._3, m._4, m._5, m._6))
        }
        val batch = graft.operators.EventOps.holtSmoothOf(Tables.events(spark, sfDir))
          .as[(String, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
        assert(last === batch)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming lag-24 autocorrelation over two batches equals the batch " +
    "seasonality screen (densified across the cut)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val hourly = Tables.events(spark, sfDir)
        .groupBy(col("event_type").as("series"),
          date_trunc("hour", col("ts")).as("hb"))
        .agg(count(lit(1)).as("y"))
        .select(col("series"), expr("unix_micros(hb)").as("hbUs"), col("y"))
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val cut = hourly.map(_._2).sorted.apply(hourly.length / 2)
      val mem = MemoryStream[(String, Long, Long)]
      val pts = mem.toDF().toDF("series", "hbUs", "y")
        .select(col("series"), expr("timestamp_micros(hbUs)").as("hb"), col("y"))
      val q = MetricStreams.seasonalityStream(pts)
        .writeStream.format("memory").queryName("season_parity")
        .outputMode("append").start()
      try {
        // the chronological cut leaves per-series gaps STRADDLING the batch
        // boundary for sparse types — the incremental densify must fold the
        // missing zeros when batch 2's first point arrives
        mem.addData(hourly.filter(_._2 < cut).toSeq: _*); q.processAllAvailable()
        mem.addData(hourly.filter(_._2 >= cut).toSeq: _*); q.processAllAvailable()
        val last = spark.table("season_parity")
          .as[(String, Long, Long, Option[Double])].collect().toSeq
          .groupBy(_._1).map { case (s, rs) =>
            val m = rs.maxBy(_._2) // latest hour = final fold
            s -> ((m._3, m._4))
          }
        val batch = graft.operators.EventOps
          .seasonalityStrength(spark, sfDir)
          .as[(String, Long, Option[Double])].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        // every type the batch screen reports must match: exact pair
        // counts; autocorr within one 4dp rounding step (the batch path
        // rounds Spark's co-moment corr, the stream computes the closed
        // form from exact integer moments)
        assert(batch.nonEmpty)
        batch.foreach { case (series, (nPairs, bCorr)) =>
          val (sn, sCorr) = last(series)
          assert(sn === nPairs, s"$series pair count")
          (bCorr, sCorr) match {
            case (None, None) => ()
            case (Some(b), Some(sc)) =>
              assert(math.abs(b - sc) <= 1.001e-4, s"$series: $b vs $sc")
            case other => fail(s"$series: null mismatch $other")
          }
        }
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming histogram over two batches: max-gen rows equal the " +
    "exact batch bucket fold on the union; emissions supersede") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // integer-cent order totals from the fixture, split in half
      val vals = Tables.orders(spark, sfDir)
        .select((col("o_totalprice") * 100).cast("long").as("v"))
        .as[Long].collect().sorted
      val (b1, b2) = vals.splitAt(vals.length / 2)
      val width = 5000000L // 50k currency units in cents
      val mem = MemoryStream[Long]
      val q = MetricStreams.streamingHistogram(
          mem.toDF().toDF("v"), width)
        .writeStream.format("memory").queryName("hist_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1.toSeq: _*); q.processAllAvailable()
        mem.addData(b2.toSeq: _*); q.processAllAvailable()
        val rows = spark.table("hist_parity")
          .as[(Long, Long, Long, Long)].collect().toSeq
        // emissions supersede: keep the max-generation row per bucket
        val last = rows.groupBy(_._1).map { case (b, rs) =>
          val m = rs.maxBy(_._4); b -> ((m._2, m._3))
        }
        val batch = vals.groupBy(_ / width)
          .map { case (b, vs) => b -> ((vs.length.toLong, vs.sum)) }
        assert(last === batch, s"stream $last vs batch $batch")
        // a bucket hit in both batches advanced its generation
        assert(rows.exists(_._4 >= 1L), "no bucket saw a second batch")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
