package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-table operators: time bucketing, JSON extraction, batch
  * sessionization (gaps-and-islands). The reference has no streaming or
  * time semantics at all (SURVEY.md §1.3 "no streaming"); these are
  * north-star scope. The streaming variants live in graft.streaming.
  */
object EventOps {

  /** Tumbling-hour counts and value sums per event type. One shuffle on the
    * (hour, type) key with map-side partial agg.
    */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_seconds(date_trunc("hour", col("ts"))).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** JSON property extraction (`props` is a JSON string column): pulls the
    * numeric field `k` and aggregates per event type. `get_json_object` is
    * codegen'd — no UDF.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  /** Z-score anomalies: events whose value deviates ≥ `zMin` sample
    * standard deviations from their type's mean. Two-pass shape: tiny
    * per-type stats broadcast back onto the stream — no window over the
    * full table.
    */
  def anomalies(spark: SparkSession, dir: String, zMin: Double = 3.0): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.groupBy(col("event_type").as("t"))
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
    ev.join(broadcast(stats), col("event_type") === col("t"))
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("mu")) / col("sigma"), 4).as("z"))
      .where(abs(col("z")) >= zMin)
  }

  /** Pivot: per-user value sums spread across event-type columns. The
    * value list is pinned so the plan needs no discovery pass (and column
    * order is deterministic).
    */
  def pivotByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum("value"), 2))

  /** Batch sessionization: a session breaks after `gapMinutes` of user
    * inactivity. Classic gaps-and-islands: lag → boundary flag → prefix-sum
    * session id. One shuffle on user_id; both windows share the same
    * partitioning so Spark reuses the exchange and sort.
    * Output: per-user session count, max/total events.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull, lit(0))
          .when(unix_micros(col("ts")) - col("prev_us") > gapMicros, lit(1))
          .otherwise(lit(0)))
      .withColumn("sid", sum("new_s").over(run))
    flagged
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        sum("n_events").as("n_events_total"))
  }
}
