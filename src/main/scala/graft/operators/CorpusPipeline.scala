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
  /** Stages 1-3 (normalize → quality gate → language gate) as one
    * shuffle-free projection chain — shared by [[curate]] and the
    * incremental path, which runs it on the appended slice only.
    * Normalization matches TextOps.normalizeText, inlined so downstream
    * stages read one column named `text`; one tokenization feeds both
    * gates (the split regex runs once per row, not once per gate).
    */
  private[operators] def gated(docs: DataFrame, minTokens: Int,
      keepLang: String): DataFrame = {
    val norm = docs.select(col("doc_id"), col("source"),
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9]+", " "),
        "\\s+", " ")).as("text"))
    val toked = norm.withColumn("toks", split(col("text"), "\\s+"))
    toked
      .withColumn("n_tokens", size(col("toks")))
      .where(col("n_tokens") >= minTokens)
      .where(TextOps.predLangExpr(array_distinct(col("toks"))) === keepLang)
      .drop("toks")
  }

  /** Deterministic content-hash split assignment (stable under
    * repartitioning, reproducible on any engine with md5).
    */
  private def withSplit(survivors: DataFrame): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    survivors.select(col("doc_id"), col("n_tokens"),
      when(h < "c", "train").when(h < "e", "val").otherwise("test").as("split"))
  }

  def curate(docs: DataFrame, minTokens: Int = 5, keepLang: String = "en",
      jaccard: Double = 0.8): DataFrame = {
    val langed = gated(docs, minTokens, keepLang)
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
    // 6. deterministic split assignment
    val out = withSplit(survivors).persist()
    out.count()
    // result is materialized — drop the intermediate caches (lineage stays
    // intact, so an evicted result recomputes slowly but correctly)
    exactKeep.unpersist(blocking = false)
    releaseLabels()
    out
  }

  /** Incremental curation through the [[graft.plans.Materializer]] — the
    * reference Icache's "skip the map phase on re-run" trait
    * (`/root/reference/src/file_distributor/fileserver.hh:374-585`) applied
    * to the flagship pipeline. Three regimes, keyed on the input snapshot:
    *
    *  - unchanged input → pure cache read, zero compute;
    *  - appended input (append-only contract: previously seen docs are
    *    immutable, new doc_ids are fresh and larger) → the gates run on
    *    the appended slice ONLY; new docs are exact-dedup'd against the
    *    retained survivor hashes and near-dup-resolved against the
    *    survivor set, and the previous result is extended — previously
    *    released docs are never revoked (a deliberate training-corpus
    *    stability property: a new doc that transitively links two old
    *    survivors is itself dropped, but cannot retroactively drop them);
    *  - no usable previous state → full [[curate]], then seed the cache.
    *
    * Alongside each result the cache stores a `_seen` sidecar (every
    * doc_id considered, survivors AND losers) so the appended slice is an
    * anti-join away; a per-params pointer file links the latest snapshot.
    * At 100 TB this turns re-curation of a growing corpus from
    * O(corpus) into O(append + survivors).
    */
  def curateIncremental(spark: org.apache.spark.sql.SparkSession,
      docsDir: String, cacheDir: String, minTokens: Int = 5,
      keepLang: String = "en", jaccard: Double = 0.8): DataFrame = {
    import graft.plans.Materializer
    import org.apache.hadoop.fs.Path
    val params = Map("minTokens" -> minTokens.toString,
      "keepLang" -> keepLang, "jaccard" -> jaccard.toString)
    val fp = Materializer.fingerprint(
      spark, Materializer.CacheKey("corpus_curate", params, Seq(docsDir)))
    val fs = new Path(cacheDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def complete(dir: String) = fs.exists(new Path(dir, "_SUCCESS"))
    val target = s"$cacheDir/$fp"
    // the pointer is keyed by params AND code version: without the
    // version an upgraded library would find the old pointer, see an
    // empty appended slice, and re-commit the OLD code's output under a
    // new-code fingerprint — exactly the stale-replay the Materializer's
    // versioned keys exist to prevent
    val paramsTag = java.security.MessageDigest.getInstance("MD5")
      .digest((Materializer.codeVersion +: params.toSeq.sorted.map(_.toString))
        .mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val pointer = new Path(cacheDir, s"_curate_latest_$paramsTag")

    def readPointer(): Option[String] =
      if (!fs.exists(pointer)) None
      else {
        val in = fs.open(pointer)
        try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
      }
    def commitState(result: DataFrame, allIds: DataFrame): DataFrame = {
      result.write.mode("overwrite").parquet(target)
      allIds.select("doc_id").write.mode("overwrite").parquet(s"${target}_seen")
      val out = fs.create(pointer, true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
      spark.read.parquet(target)
    }

    if (complete(target)) return spark.read.parquet(target) // unchanged input

    val docs = spark.read.parquet(docsDir)
    readPointer().filter(prev =>
      complete(s"$cacheDir/$prev") && complete(s"$cacheDir/${prev}_seen")) match {
      case Some(prevFp) =>
        val prev = spark.read.parquet(s"$cacheDir/$prevFp")
        val seen = spark.read.parquet(s"$cacheDir/${prevFp}_seen")
        val appended = docs.join(seen, Seq("doc_id"), "left_anti")
        // gates touch ONLY the appended slice; survivor texts re-derive
        // from the current input (immutable under the append-only contract)
        val gatedNew = gated(appended, minTokens, keepLang)
        val prevGated = gated(
          docs.join(prev.select("doc_id"), Seq("doc_id"), "left_semi"),
          minTokens, keepLang).persist()
        prevGated.count()
        // exact dedup: smallest new id per hash, then drop anything whose
        // hash is already retained
        val newHashed = gatedNew.withColumn("_h", md5(col("text")))
        val newExact = newHashed
          .groupBy(col("_h"))
          .agg(min_by(struct(newHashed.columns.map(col).toIndexedSeq: _*),
            col("doc_id")).as("_r"))
          .select(col("_r.*"))
          .join(prevGated.select(md5(col("text")).as("_h")), Seq("_h"), "left_anti")
          .drop("_h")
          .persist()
        newExact.count()
        // near-dup: pairs over survivors ∪ fresh docs; cluster-min keep
        // (new ids are larger, so any new doc linked to a survivor loses)
        val union = prevGated.select("doc_id", "text")
          .unionByName(newExact.select("doc_id", "text"))
        val pairs = Dedup.minhashPairs(union, jaccard)
        val (resolved, releaseLabels) =
          Dedup.resolveClustersReleasable(union.select("doc_id"), pairs)
        val newSurvivors = newExact.join(
          resolved.where(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
        val result = prev.unionByName(withSplit(newSurvivors))
        val served = commitState(result, docs.select("doc_id"))
        prevGated.unpersist(blocking = false)
        newExact.unpersist(blocking = false)
        releaseLabels()
        served
      case None =>
        val full = curate(docs, minTokens, keepLang, jaccard)
        val served = commitState(full, docs.select("doc_id"))
        full.unpersist(blocking = false)
        served
    }
  }
}
