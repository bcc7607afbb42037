package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write a crafted events table to a temp fixture dir. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-events").toString
    Seq(
      // user 1: 3 events, 40-min gap after the second → 2 sessions
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, """{"k": 5}"""),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0, """{"k": 7}"""),
      (3L, ts("2024-01-01 10:50:00"), 1L, "view", 3.0, """{"k": 1}"""),
      // user 2: single event, next hour
      (4L, ts("2024-01-01 11:30:00"), 2L, "purchase", 10.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("sessionize splits on inactivity gap") {
    val byUser = EventOps.sessionize(spark, dir, gapMinutes = 30)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byUser(1L) === ((2L, 2L, 3L)))
    assert(byUser(2L) === ((1L, 1L, 1L)))
  }

  test("hourlyRollup buckets by hour and type") {
    val got = EventOps.hourlyRollup(spark, dir)
      .select("hour_epoch", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000
    val h11 = ts("2024-01-01 11:00:00").getTime / 1000
    assert(got === Set((h10, "click", 2L), (h10, "view", 1L), (h11, "purchase", 1L)))
  }

  test("funnel counts ordered windowed conversions per stage") {
    val d = Files.createTempDirectory("graft-funnel").toString
    Seq(
      // user 1: full ordered funnel inside the window
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE first view → stops at stage 1
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      // user 3: clicks in time, purchase outside the 24 h window
      (6L, ts("2024-01-01 10:00:00"), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-01-01 11:00:00"), 3L, "click", 1.0, "{}"),
      (8L, ts("2024-01-03 11:00:00"), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.funnel(spark, d).orderBy("stage")
      .select("stage", "n").as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 3L), (2, 2L), (3, 1L)))
  }

  test("funnel pushes the event-type filter into the parquet scan") {
    val plan = EventOps.funnel(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(event_type, [click,purchase,view])"),
      s"event_type IN filter must reach the scan:\n${plan.take(2000)}")
  }

  test("jsonExtract sums the JSON property per type") {
    val got = EventOps.jsonExtract(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("click") === ((12L, 2L)))
    assert(got("purchase") === ((2L, 1L)))
  }

  test("holtSmooth: hand-computed level/trend on a 3-point series; " +
    "declining series carries a negative trend") {
    def ev(id: Long, t: String, et: String) =
      (id, java.sql.Timestamp.valueOf(t), 1L, et, 0.0)
    // type "a": hourly counts [10, 12, 9] -> worked by hand with the
    // integer recurrence (alpha 3/10, beta 2/10, truncating div):
    //   t2: l = (3*12e6 + 7*10e6)//10 = 10.6e6, b = 120000
    //   t3: l = (27e6 + 7*10.72e6)//10 = 10204000, b = 16800
    val rows =
      (1 to 10).map(i => ev(i, "2024-01-01 00:00:01", "a")) ++
      (11 to 22).map(i => ev(i, "2024-01-01 01:00:01", "a")) ++
      (23 to 31).map(i => ev(i, "2024-01-01 02:00:01", "a")) ++
      // type "d": [5, 1] declines -> trend must go NEGATIVE and must
      // replay with truncating (not flooring) division
      (32 to 36).map(i => ev(i, "2024-01-01 00:00:01", "d")) :+
      ev(37, "2024-01-01 01:00:01", "d")
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.holtSmoothOf(df)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 3L, 10204000L, 16800L, 10220800L)))
    // d: l2 = (3*1e6 + 7*5e6)//10 = 3.8e6; b2 = (2*(3.8e6-5e6))//10 = -240000
    assert(got("d") === (("d", 2L, 3800000L, -240000L, 3560000L)))
  }

  test("seasonalityStrength: a perfect 24h cycle reads autocorr 1.0") {
    val strength = EventOps.seasonalityStrength(spark, sfDir)
      .as[(String, Long, Double)].collect()
    assert(strength.nonEmpty)
    strength.foreach { case (_, n, ac) =>
      assert(n > 0 && ac >= -1.0001 && ac <= 1.0001)
    }
    // synthetic exact daily cycle via the fixture path is impractical, so
    // exercise the math directly: densified counts repeating with period
    // 24 correlate at exactly 1 against their own lag
    val df = spark.range(0, 24L * 4).select(
      org.apache.spark.sql.functions.lit("c").as("event_type"),
      org.apache.spark.sql.functions.expr(
        "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id as int),0,0)").as("hb"),
      org.apache.spark.sql.functions.expr("1 + id % 24").as("y"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hb")
    val ac = df
      .withColumn("yl", org.apache.spark.sql.functions.lag($"y", 24).over(w))
      .where($"yl".isNotNull)
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.corr($"y", $"yl"), 4))
      .as[Double].head()
    assert(ac === 1.0)
  }

  test("ewma: first event equals its value; constant series is a fixed point") {
    val out = EventOps.ewma(spark, sfDir).cache()
    val events = Tables.events(spark, sfDir)
    assert(out.count() === events.count())
    // the FIRST event of every user has no history: ewma == value exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val firsts = events
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where($"rn" === 1)
      .select($"event_id", org.apache.spark.sql.functions.round($"value", 4).as("v"))
    val joined = out.join(firsts, "event_id")
    assert(joined.count() > 0)
    assert(joined.where($"ewma" =!= $"v").count() === 0)
    // a constant-valued series is a fixed point of any weighted average,
    // and a step series hand-checks the weights: after [10, 20] the ewma
    // is (20 + 0.5*10) / 1.5 = 16.6667
    val const = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, 5.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, 5.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, 5.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 8L, 10.0),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 8L, 20.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = EventOps.ewmaOf(const).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) === 5.0 && got(2L) === 5.0 && got(3L) === 5.0)
    assert(got(4L) === 10.0)
    assert(got(5L) === 16.6667)
    out.unpersist()
  }

  test("timeWeightedAvg: interval-weighted mean; last reading carries no weight") {
    import org.apache.spark.sql.functions.sum
    val out = EventOps.timeWeightedAvg(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
    // one interval per event except each user's last
    assert(out.agg(sum("n_intervals")).head().getLong(0) ===
      ev.count() - ev.select("user_id").distinct().count())
    // hand-check one user: value 10 held 1s, then 30 held 3s → twa = 25
    import spark.implicits._
    val tiny = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 30.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 99.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", org.apache.spark.sql.functions.lit(7L))
    val got = EventOps.timeWeightedAvgOf(tiny)
      .select("user_id", "twa", "total_ms", "n_intervals")
      .as[(Long, Double, Long, Long)].head()
    assert(got === ((7L, 25.0, 4000L, 2L)))
    out.unpersist()
  }

  test("attribution: purchases credit the latest earlier touch; orphans go direct") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: click → purchase(10), view → purchase(20); user 2: bare purchase(5)
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (2L, t("2024-01-01 00:00:10"), 1L, "purchase", 10.0),
      (3L, t("2024-01-01 00:00:20"), 1L, "view", 0.0),
      (4L, t("2024-01-01 00:00:30"), 1L, "purchase", 20.0),
      (5L, t("2024-01-01 00:00:05"), 2L, "purchase", 5.0),
      (6L, t("2024-01-01 00:00:06"), 2L, "error", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.attributionOf(ev)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "click" -> ((1L, 10.0)),
      "view" -> ((1L, 20.0)),
      "direct" -> ((1L, 5.0))))
  }

  test("timeToConvert: rates and quantiles are internally consistent") {
    val r = EventOps.timeToConvert(spark, sfDir)
      .as[(Long, Long, Double, Double, Double)].head()
    val (nSign, nConv, cvr, p50, p90) = r
    assert(nSign > 0 && nConv <= nSign)
    assert(math.abs(cvr - nConv.toDouble / nSign) < 1e-4)
    assert(p50 >= 0 && p90 >= p50, s"p50=$p50 p90=$p90")
  }

  test("pageTransitions: per-source ppm rows sum to at most one million") {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val out = EventOps.pageTransitions(spark, sfDir).cache()
    assert(out.count() > 0)
    // truncating division: Σ p_ppm per from_type ∈ (1e6 - #rows, 1e6]
    val sums = out.groupBy("from_type")
      .agg(sum("p_ppm").as("s"), count(lit(1)).as("k"), sum("n").as("n_from"))
      .collect()
    sums.foreach { r =>
      val (s, k) = (r.getLong(1), r.getLong(2))
      assert(s <= 1000000L && s > 1000000L - k, s"ppm sum $s out of range for $k rows")
    }
    // total transitions = events - one terminal step per active user
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(out.agg(sum("n")).head().getLong(0) === expected)
    out.unpersist()
  }

  test("linearAttribution: even split with recency remainder, hand-computed") {
    import org.apache.spark.sql.functions.col
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: click, view, purchase(10.0) -> 5 micros-split each, exact
    // user 2: view, view, click, purchase(1.0) -> share=333333, rem 1 to click (last)
    // user 3: purchase(2.0) with no touches -> direct
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, t("2024-01-01 10:01:00"), 1L, "view", 0.0),
      (3L, t("2024-01-01 10:02:00"), 1L, "purchase", 10.0),
      (4L, t("2024-01-01 09:00:00"), 2L, "view", 0.0),
      (5L, t("2024-01-01 09:01:00"), 2L, "view", 0.0),
      (6L, t("2024-01-01 09:02:00"), 2L, "click", 0.0),
      (7L, t("2024-01-01 09:03:00"), 2L, "purchase", 1.0),
      (8L, t("2024-01-01 08:00:00"), 3L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.linearAttributionOf(events)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // click: 5.0 (u1) + 0.333333 + rem 0.000001 (u2) = 5.333334 -> 4dp
    assert(got("click") === ((2L, 5.3333)))
    // view: 5.0 (u1) + 2*0.333333 (u2) = 5.666666 -> 4dp
    assert(got("view") === ((2L, 5.6667)))
    assert(got("direct") === ((1L, 2.0)))
    // conservation up to the 4dp report: total credited == total value
    assert(math.abs(got.values.map(_._2).sum - 13.0) < 1e-3)
    // vs last-touch on the same data: linear spreads what last-touch
    // concentrates (u1's purchase goes wholly to view there)
    val lastTouch = EventOps.attributionOf(events)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(lastTouch("view") === 10.0 && lastTouch("click") === 1.0)
  }

  test("userRfm: every user scored, quintiles balanced, monetary agrees with a window replay") {
    import org.apache.spark.sql.functions.{col, expr, row_number}
    val out = EventOps.userRfm(spark, sfDir).cache()
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(out.count() === nUsers)
    // each score in 1..5 and each quintile holds n/5 +- 1 users
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = out.groupBy(c).count().as[(Int, Long)].collect().toMap
      assert(sizes.keySet.subsetOf((1 to 5).toSet), s"$c out of range: ${sizes.keySet}")
      sizes.values.foreach(v =>
        assert(math.abs(v - nUsers / 5.0) <= 1.0, s"$c skewed: $sizes"))
    }
    // m_score matches a plain whole-table window replay (the scalable
    // prefix-sum ranks must equal the naive formulation exactly)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value_cents"), col("user_id"))
    val naive = out.select(col("user_id"), col("value_cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("m2", expr(s"cast((5 * (rn - 1)) div $nUsers + 1 as int)"))
      .select("user_id", "m2")
    val mism = out.join(naive, "user_id").where(col("m_score") =!= col("m2")).count()
    assert(mism === 0)
    out.unpersist()
  }
}
