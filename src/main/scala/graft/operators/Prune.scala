package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomBridge

/** Pre-shuffle pruning operators for selective joins at 100 TB.
  *
  * The reference's only join story is a hand-rolled reduce-side join
  * through its KV shuffle (`/root/reference/src/mapreduce/dht/
  * mapreduce.hh:812-823` emit + per-key reduce) — every probe row crosses
  * the network whether or not its key survives the join. At fact-table
  * scale the dominant cost of a selective join IS those doomed rows, so
  * this module builds the standard fix: a bloom filter of the build-side
  * keys evaluated against the probe side BEFORE its shuffle, dropping
  * most non-matching rows at scan site. Spark injects this automatically
  * when `spark.sql.optimizer.runtime.bloomFilter.enabled` fires, but the
  * optimizer only considers it under size/selectivity heuristics; the
  * explicit operator makes the plan shape deterministic and lets callers
  * size the filter from domain knowledge.
  */
object Prune {

  /** Inner equi-join with an explicit bloom prune on the probe side:
    * semantically identical to `probe.join(build, probeKey === buildKey)`
    * (bloom filters have no false negatives, and the exact join clears
    * the ~fpp false positives), but rows whose key cannot match are
    * dropped before the probe-side shuffle.
    *
    * Plan shape: build side is aggregated into ONE bloom binary by a
    * scalar subquery (distributed partial aggregation, no driver
    * collect); probe tasks evaluate `might_contain` inside the scan
    * stage, so the filter rides in whole-stage codegen next to the
    * pushed-down scan predicates.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val pruned = probe.where(
      BloomBridge.mightContain(build, build(buildKey), probe(probeKey),
        expectedItems, fpp))
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  /** The prune predicate alone (for composing with custom join shapes,
    * e.g. pruning both inputs of an aggregation-before-join).
    */
  def bloomMightContain(build: DataFrame, buildKey: Column, probeKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): Column =
    BloomBridge.mightContain(build, buildKey, probeKey, expectedItems, fpp)

  /** Headline query: revenue by brand for a selective part subset
    * (`p_size = 1` ≈ 2% of parts) — the shape where bloom pruning pays:
    * lineitem is the 100 TB side, and ~98% of its rows drop before the
    * join shuffle.
    */
  def bloomJoinQuery(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val smallParts = part.where(col("p_size") === 1)
      .select("p_partkey", "p_brand")
    bloomPrunedJoin(lineitem, smallParts, "l_partkey", "p_partkey",
      expectedItems = 100000L)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }
}
