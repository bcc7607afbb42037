package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** 10× dedup soak: replicate the sf0.1 documents table `copies` times
  * under disjoint doc_id offsets with IDENTICAL text (~50k docs, 90%
  * duplication at 10 copies) — the worst realistic shape for a dedup
  * pass, exactly what web-crawl snapshots look like — and run the dedup
  * family once from parquet:
  *
  *  - every clone group collides in every MinHash band, so the banded
  *    pair count is the full C(copies, 2) per original plus the
  *    fixture's own near-dups × copies² — the Σbucket² guards and the
  *    sorted-merge verify run against real pressure, not fixture noise;
  *  - the pair volume pushes `resolveClusters` far past its ≤200k-edge
  *    driver union-find gate, forcing the DISTRIBUTED min-label fixpoint
  *    path (the one that must hold at 100 TB);
  *  - `segmentDedup` rewrites the corpus with ~90% of segments dropped —
  *    the C4-style pass at its intended dup rate.
  *
  * Wall vs summed executor task-time is printed per stage (the
  * [[GraphSoak]] methodology: wall ≫ task/parallelism = driver-bound,
  * the failure the lineage/persist discipline exists to prevent).
  *
  * Usage: `[SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
  * [SPARK_GRAFT_SOAK_COPIES=10] sbt "runMain graft.tools.DedupSoak"`.
  * Results belong in tools/PLANS.md.
  */
object DedupSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    val spark = graft.GraftSession.local("graft-dedup-soak")

    val taskMs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.add(t.taskMetrics.executorRunTime)
    })

    val off = 100000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-soak").toString
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .crossJoin(spark.range(copies).toDF("c"))
      .select((col("doc_id") + col("c") * off).as("doc_id"),
        col("source"), col("text"))
      .write.mode("overwrite").parquet(s"$tmp/documents")
    val docs = spark.read.parquet(s"$tmp/documents")
    println(s"SOAK|docs=${docs.count()}|copies=$copies")

    def timed(name: String)(f: => DataFrame): Unit = {
      taskMs.reset()
      val t0 = System.nanoTime()
      val n = f.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.plans.ReleaseRegistry.drain()
      println(f"SOAK|$name|rows=$n|wall=$wall%.2f s|task=${taskMs.sum() / 1000.0}%.1f s")
    }

    // untimed warmup on the 1× fixture: JIT + codegen for the shingle
    // and band paths, so the first 10× number is the operator, not the JVM
    timed("warmup_1x_pairs")(
      Dedup.minhashPairs(graft.Tables.documents(spark, sfDir)))

    timed("minhash_sigs")(Dedup.minhashSignatures(docs))
    timed("minhash_pairs")(Dedup.minhashPairs(docs))
    // the pair frame feeds the component resolution; at this dup rate it
    // is far beyond the 200k-edge driver gate -> distributed fixpoint
    timed("resolve_clusters")(
      Dedup.resolveClusters(docs, Dedup.minhashPairs(docs)))
    timed("segment_dedup")(TextOps.segmentDedup(docs))
    timed("simhash_pairs")(Dedup.simhashPairs(docs))
    // exact-substring dedup growth check: sorted-suffix blocking touches
    // each suffix's two sort neighbors only, so cost must scale ~linearly
    // in corpus size even at 90% duplication (every suffix ×copies) —
    // a quadratic all-pairs regression would show as wall_10x/wall_1x ≈
    // copies² instead of ≈ copies
    timed("dup_substrings_1x")(
      TextOps.dupSubstrings(graft.Tables.documents(spark, sfDir)))
    timed("dup_substrings_10x")(TextOps.dupSubstrings(docs))
    spark.stop()
    TmpDirs.deleteRecursively(tmp)
  }
}
