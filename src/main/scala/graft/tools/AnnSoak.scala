package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** 10× ANN soak — the retrieval twin of [[GraphSoak]]: replicate the
  * sf0.1 embeddings `copies` times under disjoint vec_id offsets with a
  * DETERMINISTIC per-element jitter (portable md5 of "copy:vec:dim",
  * ±5e-4 — copies are near- but not exact duplicates, the web-crawl
  * shape, and every cross-copy pair of one original is a known
  * ground-truth near pair), write to parquet, and measure the retrieval
  * family against the brute-force oracle:
  *
  *  - `cosine_bf`: exact top-k baseline (one corpus scan per query set);
  *  - `ivf nProbe=1/2/4/8/16` at nList=64: wall must scale with the
  *    probed fraction (candidates ∝ nProbe/nList) and recall@k must
  *    rise monotonically toward 1 — the probe-count scaling contract;
  *  - `ivf_append`: an index trained WITHOUT the last copy absorbs it
  *    via [[Similarity.ivfAppend]] (existing cells, no retrain); its
  *    indexed recall must stay within a declared gap
  *    (SPARK_GRAFT_ANN_APPEND_GAP, default 0.05) of a full rebuild, and
  *    the cell-drift staleness table is reported;
  *  - `pq` (full-scan ADC) vs `ivf_pq` (cell-pruned ADC): the pruned
  *    composition must cost less than the full ADC scan;
  *  - `lsh_pairs`: all-pairs mining at minSim=0.99, recall measured
  *    against the CONSTRUCTED ground truth (same-original cross-copy
  *    pairs — no n² verification pass needed).
  *
  * Regression guard: the run `require`s the IVF recall@10 at nProbe=4
  * and the LSH same-original recall stay above declared floors
  * (override via SPARK_GRAFT_ANN_RECALL_FLOOR / _LSH_FLOOR) — a probe
  * or bucketing regression fails the soak loudly instead of shipping a
  * fast-but-blind index. Results belong in tools/PLANS.md.
  *
  * Usage: `[SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
  * [SPARK_GRAFT_SOAK_COPIES=10] sbt "runMain graft.tools.AnnSoak"`.
  */
object AnnSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    // floors sit under the round-12 measured values (ivf nProbe=4
    // recall@10 = 0.933; lsh same-original recall = 1.000 at 10×) with
    // headroom for fixture-vintage drift, not for regressions
    val ivfFloor = sys.env.getOrElse("SPARK_GRAFT_ANN_RECALL_FLOOR", "0.8").toDouble
    val lshFloor = sys.env.getOrElse("SPARK_GRAFT_ANN_LSH_FLOOR", "0.95").toDouble
    val spark = graft.GraftSession.local("graft-ann-soak")
    import spark.implicits._

    val taskMs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.add(t.taskMetrics.executorRunTime)
    })

    val off = 100000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-soak").toString
    graft.Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(copies).toDF("c"))
      .select(
        (col("vec_id") + col("c") * off).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, d) => x + (pmod(Dedup.portableHash64(concat_ws(":",
            col("c"), col("vec_id"), d)), lit(1001L)) - 500L).cast("double") / 1e6)
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings")
    val corpus = spark.read.parquet(s"$tmp/embeddings")
    println(s"SOAK|vectors=${corpus.count()}|copies=$copies")
    val queries = corpus.where(col("vec_id") < 100)

    def timed(name: String)(f: => DataFrame): (Double, DataFrame) = {
      taskMs.reset()
      val t0 = System.nanoTime()
      val out = f.persist()
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.plans.ReleaseRegistry.drain()
      println(f"SOAK|$name|rows=$n|wall=$wall%.2f s|task=${taskMs.sum() / 1000.0}%.1f s")
      (wall, out)
    }

    // untimed warmup: JIT + codegen for the dot-product/window path
    Similarity.cosineTopK(corpus, queries.limit(4), k = 5).count()

    val (bfWall, exact) = timed("cosine_bf_top10")(
      Similarity.cosineTopK(corpus, queries, k = 10))
    val exactIds = exact.select(col("query_id"), col("nbr_id"))

    // recall@10 of an approximate result against the exact baseline
    def recallOf(approx: DataFrame): Double = {
      val j = exactIds.join(
        approx.select(col("query_id"), col("nbr_id"), lit(1L).as("hit")),
        Seq("query_id", "nbr_id"), "left")
      val r = j.agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
        count(lit(1))).as("r")).as[Double].head()
      r
    }

    var recall4 = 0.0
    for (nProbe <- Seq(1, 2, 4, 8, 16)) {
      val (w, approx) = timed(s"ivf_nlist64_nprobe$nProbe")(
        Similarity.ivfTopK(corpus, queries, nList = 64, nProbe = nProbe, k = 10))
      val r = recallOf(approx)
      if (nProbe == 4) recall4 = r
      println(f"SOAK|ivf_recall|nprobe=$nProbe|recall@10=$r%.4f|wall/bf=${w / bfWall}%.2f")
      approx.unpersist(blocking = false)
    }

    // Incremental append leg: an index trained on copies 0..(n-2) absorbs
    // the final copy via ivfAppend (assignment to EXISTING cells, no
    // centroid retrain); its indexed recall must stay within the declared
    // gap of a same-corpus full rebuild, else appends are silently
    // blinding the probes and the staleness metric lies
    val appendGap = sys.env.getOrElse("SPARK_GRAFT_ANN_APPEND_GAP", "0.05").toDouble
    val idxFull = s"$tmp/ivf_full"
    val idxApp = s"$tmp/ivf_app"
    Similarity.buildIvfIndex(corpus, idxFull, nList = 64)
    Similarity.buildIvfIndex(
      corpus.where(col("vec_id") < (copies - 1).toLong * off), idxApp, nList = 64)
    val drift = Similarity.ivfAppend(spark, idxApp,
      corpus.where(col("vec_id") >= (copies - 1).toLong * off))
    val driftRow = drift.agg(max("drift_micro"), avg("drift_micro"))
      .as[(Long, Double)].head()
    println(f"SOAK|ivf_append_drift|max=${driftRow._1}|mean=${driftRow._2}%.1f micro")
    val (fullW, fullRes) = timed("ivf_indexed_full_rebuild")(
      Similarity.ivfTopKIndexed(spark, idxFull, queries, nProbe = 4, k = 10))
    val recallFull = recallOf(fullRes)
    fullRes.unpersist(blocking = false)
    val (appW, appRes) = timed("ivf_indexed_appended")(
      Similarity.ivfTopKIndexed(spark, idxApp, queries, nProbe = 4, k = 10))
    val recallApp = recallOf(appRes)
    appRes.unpersist(blocking = false)
    println(f"SOAK|ivf_append_recall|full=$recallFull%.4f|appended=$recallApp%.4f" +
      f"|wall append/full=${appW / fullW}%.2f")
    require(recallApp >= recallFull - appendGap,
      f"IVF APPEND REGRESSION: appended-index recall $recallApp%.4f more than " +
        f"$appendGap below full-rebuild recall $recallFull%.4f")

    val (pqWall, pqRes) = timed("pq_fullscan_top10")(
      Similarity.pqTopK(corpus, queries, k = 10))
    println(f"SOAK|pq_recall|recall@10=${recallOf(pqRes)}%.4f")
    pqRes.unpersist(blocking = false)
    val (ivfPqWall, ivfPqRes) = timed("ivf_pq_nprobe4_top10")(
      Similarity.ivfPqTopK(corpus, queries, nList = 64, nProbe = 4, k = 10))
    println(f"SOAK|ivf_pq_recall|recall@10=${recallOf(ivfPqRes)}%.4f" +
      f"|pruned/fullscan=${ivfPqWall / pqWall}%.2f (must be < 1)")
    ivfPqRes.unpersist(blocking = false)
    exact.unpersist(blocking = false)

    // LSH all-pairs mining: ground truth is constructed — every cross-copy
    // pair of one original is a near pair (jitter keeps cosine ≈ 1)
    val (_, lsh) = timed("lsh_pairs_minsim0.99")(
      Similarity.lshNearPairs(corpus, dims = 64, minSim = 0.99))
    val nOrig = corpus.select((col("vec_id") % off).as("o")).distinct().count()
    val expected = nOrig * copies.toLong * (copies - 1) / 2
    val foundTrue = lsh
      .where(col("a") % off === col("b") % off).count()
    val lshRecall = foundTrue.toDouble / expected
    println(f"SOAK|lsh_recall|same_original_pairs=$foundTrue/$expected|recall=$lshRecall%.4f")
    lsh.unpersist(blocking = false)

    require(recall4 >= ivfFloor,
      f"ANN RECALL REGRESSION: ivf nProbe=4 recall@10 $recall4%.4f < floor $ivfFloor")
    require(lshRecall >= lshFloor,
      f"ANN RECALL REGRESSION: lsh same-original recall $lshRecall%.4f < floor $lshFloor")
    println("SOAK|recall_floors|ok")
    spark.stop()
    TmpDirs.deleteRecursively(tmp)
  }
}
