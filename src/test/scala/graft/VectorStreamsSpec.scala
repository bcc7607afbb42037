package graft

import graft.operators.Similarity
import graft.streaming.VectorStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class VectorStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streamingKmeansAssign: stored-centroid scoring at ingest is " +
    "bit-identical to the batch scorer, zero carried state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val e = Tables.embeddings(spark, sfDir)
      val dir = java.nio.file.Files.createTempDirectory("kmstream").toString
      Similarity.saveKmeansModel(e, dir, kClusters = 4, iters = 1)
      val (cents, _, _) = Similarity.loadKmeansModel(spark, dir)
      val rows = e.select(col("vec_id"),
        col("embedding").cast("array<float>"))
        .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1).take(40)
      val want = Similarity.kmeansAssignWith(
        rows.toDF("vec_id", "embedding"), cents)
        .as[(Long, Long, Double)].collect().toSet
      val mem = MemoryStream[(Long, Array[Float])]
      val q = VectorStreams.streamingKmeansAssign(
          mem.toDF().toDF("vec_id", "embedding"), cents)
        .writeStream.format("memory").queryName("km_stream")
        .outputMode("append").start()
      try {
        mem.addData(rows.take(20): _*); q.processAllAvailable()
        mem.addData(rows.drop(20): _*); q.processAllAvailable()
        val got = spark.table("km_stream")
          .as[(Long, Long, Double)].collect().toSet
        graft.plans.ReleaseRegistry.drain()
        assert(got === want, s"stream diff: ${got.diff(want)} / ${want.diff(got)}")
      } finally q.stop()
    }
  }

  test("streamingSemDedup: id-ordered two-batch ingest reproduces the " +
    "batch semDedupWith keep flags, cross-batch state carried") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // four base directions in 4-d space plus NEAR-duplicates (small
      // perturbation, cosine >> 0.9) and a far vector per direction
      def vec(dir: Int, eps: Float): Array[Float] = {
        val v = Array.fill(4)(eps)
        v(dir) = 1.0f
        v
      }
      val rows = Seq(
        (1L, vec(0, 0f)), (2L, vec(1, 0f)),
        (3L, vec(0, 0.02f)), // near-dup of 1
        (4L, vec(2, 0f)),
        (5L, vec(1, 0.03f)), // near-dup of 2
        (6L, vec(0, 0.01f))) // near-dup of 1 (and 3)
      val train = rows.toDF("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("sdstream").toString
      Similarity.saveKmeansModel(train, dir, kClusters = 2, iters = 1)
      val (cents, _, _) = Similarity.loadKmeansModel(spark, dir)
      val want = Similarity.semDedupWith(train, cents, minSim = 0.9)
        .as[(Long, Long, Boolean)].collect()
        .map { case (id, cid, dropped) => (id, cid, !dropped) }.toSet
      graft.plans.ReleaseRegistry.drain()
      val mem = MemoryStream[(Long, Array[Float])]
      val q = VectorStreams.streamingSemDedup(
          mem.toDF().toDF("vec_id", "embedding"), cents, minSim = 0.9)
        .writeStream.format("memory").queryName("semdedup_stream")
        .outputMode("append").start()
      try {
        // id-ordered arrivals split across batches: 6 must drop against
        // batch-1 STATE (its dup 1 arrived two batches earlier)
        mem.addData(rows.take(2): _*); q.processAllAvailable()
        mem.addData(rows.slice(2, 4): _*); q.processAllAvailable()
        mem.addData(rows.drop(4): _*); q.processAllAvailable()
        val verdicts = spark.table("semdedup_stream")
          .as[(Long, Long, Long, Double, Boolean)].collect()
        val got = verdicts.map(v => (v._1, v._2, v._5)).toSet
        assert(got === want, s"stream $got vs batch $want")
        val byId = verdicts.map(v => v._1 -> v).toMap
        assert(!byId(3L)._5 && byId(3L)._3 === 1L,
          s"3 is a near-dup of the batch-1 original: ${byId(3L)}")
        assert(!byId(6L)._5 && byId(6L)._3 === 1L,
          s"6 must point at the SMALLEST matching id: ${byId(6L)}")
        assert(byId(6L)._4 >= 0.9)
        assert(byId(1L)._5 && byId(2L)._5 && byId(4L)._5,
          "originals keep")
      } finally q.stop()
    }
  }

  test("streamingIvfTopK: ANN probes at ingest are row-identical to the " +
    "batch indexed search, zero carried state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val e = Tables.embeddings(spark, sfDir)
      val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
      Similarity.buildIvfIndex(e, dir, nList = 8)
      val qrows = e.select(col("vec_id"),
        col("embedding").cast("array<float>"))
        .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1).take(30)
      val want = Similarity.ivfTopKIndexed(spark, dir,
        qrows.toDF("vec_id", "embedding"), nProbe = 3, k = 4)
        .select(col("query_id"), col("nbr_id"), col("sim"), col("rnk"))
        .as[(Long, Long, Double, Int)].collect().toSet
      val mem = MemoryStream[(Long, Array[Float])]
      val q = VectorStreams.streamingIvfTopK(
          mem.toDF().toDF("vec_id", "embedding"), spark, dir,
          nProbe = 3, k = 4)
        .writeStream.format("memory").queryName("ivf_stream")
        .outputMode("append").start()
      try {
        mem.addData(qrows.take(15): _*); q.processAllAvailable()
        mem.addData(qrows.drop(15): _*); q.processAllAvailable()
        val got = spark.table("ivf_stream")
          .as[(Long, Long, Double, Int)].collect().toSet
        assert(got === want,
          s"diff stream-only=${got.diff(want).take(5)} batch-only=${want.diff(got).take(5)}")
        assert(got.nonEmpty && got.exists(_._4 === 4))
      } finally q.stop()
    }
  }

  test("streamingSemDedup bucket cap: past maxBucket, arrivals are still " +
    "gated against the stored prefix but add no state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      def vec(dir: Int, eps: Float): Array[Float] = {
        val v = Array.fill(4)(eps)
        v(dir) = 1.0f
        v
      }
      val train = Seq((1L, vec(0, 0f)), (2L, vec(1, 0f)))
        .toDF("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("sdcap").toString
      Similarity.saveKmeansModel(train, dir, kClusters = 1, iters = 0)
      val (cents, _, _) = Similarity.loadKmeansModel(spark, dir)
      val mem = MemoryStream[(Long, Array[Float])]
      val q = VectorStreams.streamingSemDedup(
          mem.toDF().toDF("vec_id", "embedding"), cents, minSim = 0.9,
          maxBucket = 1)
        .writeStream.format("memory").queryName("semdedup_cap")
        .outputMode("append").start()
      try {
        // 1 stores (cap reached); 10 is orthogonal -> keeps but is NOT
        // stored; 11 duplicates 1 (still gated by the stored prefix);
        // 12 duplicates 10 but 10 was never stored -> keeps (the
        // declared cap divergence)
        mem.addData((1L, vec(0, 0f))); q.processAllAvailable()
        mem.addData((10L, vec(1, 0f))); q.processAllAvailable()
        mem.addData((11L, vec(0, 0.01f))); q.processAllAvailable()
        mem.addData((12L, vec(1, 0.01f))); q.processAllAvailable()
        val keep = spark.table("semdedup_cap")
          .as[(Long, Long, Long, Double, Boolean)].collect()
          .map(v => v._1 -> v._5).toMap
        assert(keep === Map(1L -> true, 10L -> true, 11L -> false, 12L -> true))
      } finally q.stop()
    }
  }
}
