package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the canonical LLM training-data pipeline as
  * ONE declarative plan — normalize → quality gate → language gate → exact
  * dedup → near-dup resolution → deterministic split assignment. Each stage
  * exists standalone elsewhere (TextOps / Dedup); the point of this module
  * is that they compose into a single Catalyst plan, so filters stay pushed
  * against the scan, each gate shrinks the data BEFORE the expensive
  * near-dup stage, and the whole pipeline is reproducible end-to-end (every
  * stage is a pure function of document content — md5-derived, no rand()).
  *
  * 100 TB posture: the scalar gates (normalize/quality/language) are
  * shuffle-free map work; exact dedup shuffles a 32-byte hash + id per doc;
  * the near-dup stage runs on the (much smaller) gated survivor set, blocked
  * by `source` with the shingle-count-ratio prefilter; cluster resolution
  * iterates on the edge-endpoint subgraph only. Nothing in the pipeline is
  * quadratic in the corpus — only within blocking buckets.
  */
object CorpusPipeline {

  /** Curate a raw `documents` table into (doc_id, n_tokens, split) for the
    * surviving training documents.
    *
    * Cache contract: the RESULT is returned persisted and already
    * materialized; every intermediate cache the pipeline created
    * (gated-survivor set, cluster labels) is released before returning, so
    * repeated invocations in a long-lived session pin exactly one frame
    * each — the result — which the caller may `.unpersist()` when done
    * (or leave to LRU eviction).
    */
  def curate(docs: DataFrame, minTokens: Int = 5, keepLang: String = "en",
      jaccard: Double = 0.8): DataFrame = {
    // 1. normalize: lowercase, strip non-alphanumerics, collapse whitespace
    //    (same transform as TextOps.normalizeText, kept inline so the
    //    downstream stages read one column named `text`)
    val norm = docs.select(col("doc_id"), col("source"),
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9]+", " "),
        "\\s+", " ")).as("text"))
    // 2. quality gate: minimum token count on the normalized text
    val qual = norm
      .withColumn("n_tokens", size(split(col("text"), "\\s+")))
      .where(col("n_tokens") >= minTokens)
    // 3. language gate: marker-scored prediction must match keepLang
    val langed = qual.where(
      TextOps.predLangExpr(array_distinct(split(col("text"), "\\s+"))) === keepLang)
    // 4. exact dedup: keep the smallest doc_id per normalized-content hash
    //    (one shuffle of hash + id width). The result is persisted +
    //    counted: the near-dup self-join below references it from BOTH
    //    sides and the survivor join a third time — without a
    //    materialization barrier each branch would re-run the whole gated
    //    prefix (measured 2.6x slower end-to-end at sf0.1). persist, not
    //    localCheckpoint, for the same AQE reason as
    //    Dedup.resolveClusters; blocks stay subject to LRU eviction.
    val exactKeep = langed
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy(md5(col("text")))))
      .where(col("doc_id") === col("keep_id"))
      .drop("keep_id")
      .persist()
    exactKeep.count()
    // 5. near-dup resolution on the gated survivors: blocked n-gram
    //    jaccard candidates → connected components → keep the cluster min
    val pairs = Dedup.ngramJaccardPairs(exactKeep, jaccard)
    val (resolved, releaseLabels) =
      Dedup.resolveClustersReleasable(exactKeep.select("doc_id"), pairs)
    val survivors = exactKeep.join(
      resolved.where(col("keep")).select(col("doc_id").as("rd")),
      col("doc_id") === col("rd")).drop("rd")
    // 6. deterministic content-hash split assignment (stable under
    //    repartitioning, reproducible on any engine with md5)
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val out = survivors.select(col("doc_id"), col("n_tokens"),
      when(h < "c", "train").when(h < "e", "val").otherwise("test").as("split"))
      .persist()
    out.count()
    // result is materialized — drop the intermediate caches (lineage stays
    // intact, so an evicted result recomputes slowly but correctly)
    exactKeep.unpersist(blocking = false)
    releaseLabels()
    out
  }
}
