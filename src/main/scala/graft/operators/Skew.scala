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

  /** Salted equivalent of `groupBy(key).agg(count, sum(value))` — the
    * explicit two-level aggregation pattern.
    *
    * Honesty note on when this pays: for ALGEBRAIC aggregates like
    * count/sum, Spark's map-side partial aggregation already collapses
    * each key to one row per partition before the shuffle, so the plain
    * groupBy has no hot-key straggler and this helper's second exchange
    * is pure overhead. Salting earns its keep when partials can't save
    * you: disabled partial aggregation, `flatMapGroups`-style typed
    * pipelines, or buffer-heavy aggregates (collect_list/set) — this
    * function is the checked template for those shapes. Caveat shared
    * with [[saltedJoin]]: the salt derives from `value`, so a hot key
    * whose rows all carry ONE value still lands in a single bucket.
    */
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
      buckets: Int = 16, rowId: Option[Column] = None): DataFrame = {
    // collision-checked salt column name: never shadow a user column
    val saltCol = (Iterator.single("_graft_salt") ++
      Iterator.from(1).map(i => s"_graft_salt$i"))
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    // The salt must be a DETERMINISTIC function of the row: it becomes part
    // of the shuffle key, and a nondeterministic component (e.g.
    // monotonically_increasing_id) re-evaluates differently when a fetch
    // failure re-runs part of the map stage — reducers would then see rows
    // migrate between (key, salt) partitions mid-job and the join could
    // drop or duplicate rows (the SPARK-23207 class of bug). Default salt =
    // hash of the whole row, which splits a hot key's DISTINCT rows; a hot
    // key whose rows are full duplicates still lands in one bucket, so
    // callers with such data should pass `rowId` — any deterministic
    // per-row column (ingest offset, primary key) — to spread them.
    val salted = big.withColumn(saltCol,
      pmod(xxhash64((big.columns.map(col) ++ rowId).toIndexedSeq: _*),
        lit(buckets.toLong)).cast("int"))
    val replicated = small.crossJoin(
      small.sparkSession.range(buckets).select(col("id").cast("int").as(saltCol)))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Two-level exact distinct count for a hot key: phase 1 dedups
    * (key, value) pairs — that shuffle hash-partitions on BOTH columns,
    * so a hot key's distinct values spread across the cluster on their
    * own (no salt column needed: a salt derived from `value` would be a
    * pure function of a column already in the shuffle key, dead weight) —
    * and phase 2 counts per key with map-side partial aggregation.
    * `count(v)` skips the NULL row each key's distinct set may carry —
    * matching `countDistinct(value)` exactly, including a 0 (not a
    * missing row, not a 1) for keys whose values are all NULL.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .distinct()
      .groupBy("key")
      .agg(count(col("v")).as("n_distinct"))
}
