package graft

import graft.operators.{CorpusPipeline, Dedup, TextOps}
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val curated = CorpusPipeline.curate(docs).cache()

  test("survivors exist, carry valid splits and meet the quality gate") {
    val rows = curated.as[(Long, Int, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 5), "quality gate: every survivor has >= 5 tokens")
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // split is the deterministic md5 rule, reproducible row by row
    rows.foreach { case (id, _, split) =>
      val c = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
      val expect = if (c < 'c') "train" else if (c < 'e') "val" else "test"
      assert(split === expect)
    }
  }

  test("exact dedup keeps exactly one row per content hash, even for duplicated doc_ids") {
    // a corpus re-ingesting doc_id 1 twice (identical text): the grouped
    // min_by dedup — and the oracle's GROUP BY md5(t) formulation — must
    // both emit ONE survivor, not one per tied input row
    val dup = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "a"),
      (1L, "the quick brown fox jumps over the lazy dog again", "b"),
      (2L, "an entirely different document with many unique tokens here", "a"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline.curate(dup, minTokens = 3)
    assert(out.count() === 2)
    assert(out.where(col("doc_id") === 1L).count() === 1)
  }

  test("no two survivors share identical normalized text") {
    val norm = TextOps.normalizeText(docs)
    val dup = curated.join(norm, "doc_id")
      .groupBy("norm_text").count().where(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("no near-dup pair survives within a source block") {
    val norm = TextOps.normalizeText(docs)
    val survivorDocs = curated.select("doc_id")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .join(norm, "doc_id")
      .select(col("doc_id"), col("source"), col("norm_text").as("text"))
    assert(Dedup.ngramJaccardPairs(survivorDocs).count() === 0L)
  }

  test("curateIncremental: cache hit on unchanged input, append-only recompute") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc_curate").toString
    val docsDir = s"$base/docs"
    val cacheDir = s"$base/cache"
    // seed corpus: write a deterministic slice of the fixture docs
    val seed = docs.where(col("doc_id") < 400)
    seed.write.parquet(docsDir)

    // first run = full curate, seeds the cache
    val first = CorpusPipeline.curateIncremental(spark, docsDir, cacheDir)
    val direct = CorpusPipeline.curate(spark.read.parquet(docsDir))
    assert(first.exceptAll(direct).isEmpty && direct.exceptAll(first).isEmpty,
      "seeding run must equal the one-shot pipeline")
    direct.unpersist()

    // second run over unchanged input: pure cache read — the cache dir's
    // file listing must be byte-identical before and after
    def listing() = {
      val fs = new org.apache.hadoop.fs.Path(cacheDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(cacheDir), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        buf += s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
      }
      buf.sorted.toSeq
    }
    val before = listing()
    val second = CorpusPipeline.curateIncremental(spark, docsDir, cacheDir)
    assert(listing() === before, "unchanged input must not write anything")
    assert(second.exceptAll(first).isEmpty && first.exceptAll(second).isEmpty)

    // append: one exact duplicate of a survivor (must be dropped) and one
    // genuinely new doc (must be admitted); old results must be unchanged
    val survivorId = first.select("doc_id").as[Long].collect().min
    val survivorText = seed.where(col("doc_id") === survivorId)
      .select("text").as[String].head()
    Seq(
      (9001L, survivorText, "append"),
      (9002L, "completely fresh appended document with the usual english the and of tokens", "append"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(docsDir)
    val third = CorpusPipeline.curateIncremental(spark, docsDir, cacheDir)
    val thirdRows = third.select("doc_id").as[Long].collect().toSet
    val firstRows = first.select("doc_id").as[Long].collect().toSet
    assert(firstRows.subsetOf(thirdRows), "previously released docs are never revoked")
    assert(!thirdRows.contains(9001L), "appended exact duplicate must be dropped")
    assert(thirdRows.contains(9002L), "appended novel doc must be admitted")
  }

  test("curateIncremental: an exact copy of a previously DROPPED doc is not readmitted") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc_seenh").toString
    val (docsDir, cacheDir) = (s"$base/docs", s"$base/cache")
    // transitive near-dup chain at threshold 0.5: jaccard(s,b)=0.6,
    // jaccard(b,a)=0.78, jaccard(s,a)=0.45 → one cluster {1,2,3}, min id 1
    // survives; doc 3 is dropped while NOT being within threshold of the
    // surviving doc
    val s = "the cat sat on a mat of red and blue"
    val b = "sat on a mat of red and blue is nice"
    val a = "on a mat of red and blue is nice wow"
    Seq((1L, s, "x"), (2L, b, "x"), (3L, a, "x"))
      .toDF("doc_id", "text", "source").write.parquet(docsDir)
    val first = CorpusPipeline.curateIncremental(
      spark, docsDir, cacheDir, minTokens = 3, jaccard = 0.5)
    assert(first.select("doc_id").as[Long].collect().toSet === Set(1L))
    // append an exact copy of dropped doc 3: it is 0.45 < 0.5 from the
    // survivor, so the near-dup check alone would readmit it — the
    // seen-hash sidecar must recognize the content as already considered
    Seq((10L, a, "x")).toDF("doc_id", "text", "source")
      .write.mode("append").parquet(docsDir)
    val second = CorpusPipeline.curateIncremental(
      spark, docsDir, cacheDir, minTokens = 3, jaccard = 0.5)
    assert(second.select("doc_id").as[Long].collect().toSet === Set(1L),
      "an exact copy of a previously dropped doc must not re-enter the corpus")
    // incremental equals a full re-curation of the appended corpus
    val full = CorpusPipeline.curate(
      spark.read.parquet(docsDir), minTokens = 3, jaccard = 0.5)
    assert(full.select("doc_id").as[Long].collect().toSet === Set(1L))
    full.unpersist()
  }

  test("substring gate: over-duplicated survivor dropped in full curate, " +
    "and an appended span-plagiarist equals full recompute via the sidecar") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc_span").toString
    val (docsDir, cacheDir) = (s"$base/docs", s"$base/cache")
    // doc 1: the span source. doc 2: >50% of its 8-spans copy doc 1
    // (distinct text, so exact/near-dup gates pass at jaccard 0.9) ->
    // the substring gate must drop it even in the FULL pipeline
    val src = "the quick brown fox jumps over one lazy dog and then runs far away home"
    val plag = "totally original opener before the quick brown fox jumps over one lazy dog and then runs far"
    val clean = "a completely different essay about the sea and ships and the wind and stars of night skies"
    Seq((1L, src, "x"), (2L, plag, "x"), (3L, clean, "x"))
      .toDF("doc_id", "text", "source").write.parquet(docsDir)
    val first = CorpusPipeline.curateIncremental(
      spark, docsDir, cacheDir, minTokens = 3, jaccard = 0.9)
    val firstIds = first.select("doc_id").as[Long].collect().toSet
    assert(firstIds === Set(1L, 3L),
      s"span plagiarist must fall to the substring gate: $firstIds")
    // append another plagiarist copying doc 1's spans: its spans are in
    // the _seensp sidecar, so the INCREMENTAL gate must drop it exactly
    // like a full recompute would
    // 4 fresh tokens + 13 copied -> 6 of 10 spans duplicated (60% > 50%)
    val plag2 = "fresh words lead in the quick brown fox jumps over one lazy dog and then runs far"
    Seq((10L, plag2, "x"), (11L, "short unrelated new text entirely its own words here", "x"))
      .toDF("doc_id", "text", "source").write.mode("append").parquet(docsDir)
    val second = CorpusPipeline.curateIncremental(
      spark, docsDir, cacheDir, minTokens = 3, jaccard = 0.9)
    val secondIds = second.select("doc_id").as[Long].collect().toSet
    val full = CorpusPipeline.curate(
      spark.read.parquet(docsDir), minTokens = 3, jaccard = 0.9)
    val fullIds = full.select("doc_id").as[Long].collect().toSet
    full.unpersist()
    assert(secondIds === fullIds,
      s"append must equal full recompute through the gate: inc $secondIds vs full $fullIds")
    assert(!secondIds.contains(10L) && secondIds.contains(11L))
  }

  test("curateIncremental: two corpora sharing one cacheDir stay isolated") {
    val base = java.nio.file.Files.createTempDirectory("graft_inc_iso").toString
    val cacheDir = s"$base/cache"
    val (aDir, bDir) = (s"$base/a", s"$base/b")
    docs.where(col("doc_id") < 150).write.parquet(aDir)
    docs.where(col("doc_id") >= 150 && col("doc_id") < 300).write.parquet(bDir)
    CorpusPipeline.curateIncremental(spark, aDir, cacheDir)
    // corpus B must be curated from scratch — a pointer not keyed by the
    // corpus dir would treat B as an append to A and serve A's curation
    val rb = CorpusPipeline.curateIncremental(spark, bDir, cacheDir)
    val directB = CorpusPipeline.curate(spark.read.parquet(bDir))
    assert(rb.exceptAll(directB).isEmpty && directB.exceptAll(rb).isEmpty,
      "two corpora sharing a cacheDir must not cross-contaminate")
    directB.unpersist()
  }

  test("curateIncremental: rewritten-but-identical input re-serves the previous result") {
    // same rows, new file mtimes: the snapshot fingerprint changes, so the
    // exact-hit path misses — the incremental branch must then find an
    // EMPTY appended slice and re-commit the previous result unchanged
    val base = java.nio.file.Files.createTempDirectory("graft_inc_rewrite").toString
    val docsDir = s"$base/docs"
    val cacheDir = s"$base/cache"
    val seed = docs.where(col("doc_id") < 200)
    seed.write.parquet(docsDir)
    val first = CorpusPipeline.curateIncremental(spark, docsDir, cacheDir)
      .collect().toSet
    seed.write.mode("overwrite").parquet(docsDir) // identical rows, fresh files
    val second = CorpusPipeline.curateIncremental(spark, docsDir, cacheDir)
      .collect().toSet
    assert(second === first)
  }

  test("stages only shrink the survivor set") {
    val total = docs.count()
    assert(curated.count() <= total)
    // language gate really fires: survivors are marker-scored 'en'
    val langs = curated.join(docs, "doc_id")
      .select(TextOps.predLangExpr(
        array_distinct(split(
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), "\\s+", " ")),
          "\\s+"))).as("pred"))
      .distinct().as[String].collect().toSet
    assert(langs === Set("en"))
  }
}
