package graft.operators

import org.apache.spark.sql.DataFrame
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
  * the near-dup stage runs MinHash-LSH on the (much smaller) gated
  * survivor set — banded buckets, sum(bucket²) not n², signature-agreement
  * prefilter before the exact verify; cluster resolution is adaptive
  * (driver union-find on tiny pair sets, edge-subgraph iteration above the
  * threshold). Nothing in the pipeline is quadratic in the corpus — only
  * within LSH buckets.
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
    // 2+3. quality gate (min token count) and language gate (marker-scored
    //    prediction) over ONE tokenization — the split regex runs once per
    //    row, not once per gate
    val toked = norm.withColumn("toks", split(col("text"), "\\s+"))
    val qual = toked
      .withColumn("n_tokens", size(col("toks")))
      .where(col("n_tokens") >= minTokens)
    val langed = qual
      .where(TextOps.predLangExpr(array_distinct(col("toks"))) === keepLang)
      .drop("toks")
    // 4. exact dedup: keep the smallest doc_id per normalized-content
    //    hash, as a min_by hash-aggregation — duplicates collapse in the
    //    map-side partial aggregate BEFORE the exchange (the dirtier the
    //    corpus, the less it shuffles), and unlike the window formulation
    //    there is no per-partition sort. The result is persisted +
    //    counted: the near-dup self-join below references it from BOTH
    //    sides and the survivor join a third time — without a
    //    materialization barrier each branch would re-run the whole gated
    //    prefix (measured 2.6x slower end-to-end at sf0.1). persist, not
    //    localCheckpoint, for the same AQE reason as
    //    Dedup.resolveClusters; blocks stay subject to LRU eviction.
    val exactKeep = langed
      .groupBy(md5(col("text")).as("_h"))
      .agg(min_by(struct(langed.columns.map(col).toIndexedSeq: _*), col("doc_id")).as("_r"))
      .select(col("_r.*"))
      .persist()
    exactKeep.count()
    // 5. near-dup resolution on the gated survivors: MinHash-LSH banded
    //    candidates (the UNBLOCKED scale path — sum(bucket²), not
    //    sum(block²); catches cross-source duplicates a blocking key
    //    would miss) → exact-jaccard verify → connected components →
    //    keep the cluster min. Deterministic end-to-end: signatures use
    //    the portable md5 hash, so any engine replays the same pairs.
    val pairs = Dedup.minhashPairs(exactKeep, jaccard)
    val (resolved, releaseLabels) =
      Dedup.resolveClustersReleasable(exactKeep.select("doc_id"), pairs)
    // anti-join the LOSERS (keep=false), not inner-join the keepers: the
    // loser set is bounded by the near-dup pair endpoints — pair-scale,
    // not corpus-scale — so at 100 TB this is a broadcast-able filter of
    // the corpus instead of a corpus x corpus shuffle join (AQE picks
    // broadcast from the runtime size; no hint so a pathological
    // everything-is-duplicate corpus still degrades to SMJ, not OOM)
    val survivors = exactKeep.join(
      resolved.where(!col("keep")).select(col("doc_id").as("rd")),
      col("doc_id") === col("rd"), "left_anti")
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
