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

  /** Salted skew join: the big (skewed) side gets a deterministic salt in
    * [0, buckets); the small side is replicated `buckets` times; the join
    * key becomes (key, salt), so one hot key spreads across `buckets`
    * tasks instead of landing in one straggler partition. Exact same rows
    * as `big.join(small, key)` — the manual fallback for when AQE's
    * runtime skew splitting can't apply (e.g. the skewed side feeds an
    * aggregation in the same stage, or a non-shuffle join input).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    // collision-checked salt column name: never shadow a user column
    val saltCol = (Iterator.single("_graft_salt") ++
      Iterator.from(1).map(i => s"_graft_salt$i"))
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    // the salt must split ROWS of a hot key, so it hashes the whole row,
    // not the join key — and mixes in a per-row id, because the common
    // skew case is a hot key whose rows are FULL duplicates (row-content
    // hash alone would send them all to one bucket again).
    // monotonically_increasing_id is not reproducible across runs, but
    // the salt only decides row PLACEMENT: the join RESULT is
    // salt-invariant, so determinism of the output is unaffected.
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*)
        + monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = small.crossJoin(
      small.sparkSession.range(buckets).select(col("id").cast("int").as(saltCol)))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

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
