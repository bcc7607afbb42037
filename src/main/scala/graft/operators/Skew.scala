package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for 100 TB aggregations.
  *
  * The reference balanced load with the EM-KDE boundary-drift histogram
  * (`/root/reference/src/orthrus/histogram.hh:173-273`); on Spark, AQE's
  * skew-join handling covers joins, and hot-key *aggregation* skew is
  * handled here by salting: a deterministic salt splits each key into
  * `buckets` sub-groups for the partial aggregate, and a second (tiny)
  * aggregate merges the partials. Two narrow shuffles instead of one
  * hot-partition shuffle.
  *
  * The salt derives from the value column (not `rand()`), so results are
  * reproducible run to run.
  */
object Skew {

  private def salt(value: Column, buckets: Int): Column =
    pmod(xxhash64(value), lit(buckets.toLong))

  /** Salted equivalent of `groupBy(key).agg(count, sum(value))`. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(value, buckets).as("_salt"))
      .agg(count(lit(1)).as("_n"), sum(value).as("_s"))
      .groupBy("key")
      .agg(sum("_n").as("n"), sum("_s").as("sum_value"))

  /** Salted distinct count: phase 1 dedups (key, value) within salt
    * buckets, phase 2 counts — the classic two-level exact distinct for a
    * hot key.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"), salt(value, buckets).as("_salt"))
      .distinct()
      .groupBy("key")
      .agg(count(lit(1)).as("n_distinct"))
}
