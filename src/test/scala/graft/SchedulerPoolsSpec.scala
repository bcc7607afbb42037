package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskStart}

/** The reference master admits up to `max_job` concurrent jobs FIFO
  * (`/root/reference/src/master/dht/master.cc:343-366`); the engine maps
  * that surface to Spark FAIR scheduling ([[GraftSession.builder]] sets
  * `spark.scheduler.mode=FAIR`; [[GraftSession.writePoolFile]] pins pool
  * weights). This spec proves the property that matters: two actions
  * submitted from two threads into two pools INTERLEAVE — the second
  * job's tasks run while the first still has tasks pending — instead of
  * the strict job-at-a-time serialization a FIFO queue would give on a
  * saturated cluster.
  */
class SchedulerPoolsSpec extends SparkSpec {

  test("writePoolFile emits a valid allocation XML with the given pools") {
    val path = java.nio.file.Files.createTempDirectory("graft-pools")
      .resolve("fairscheduler.xml").toString
    GraftSession.writePoolFile(path, Seq(
      GraftSession.PoolSpec("interactive", weight = 4, minShare = 2),
      GraftSession.PoolSpec("batch", weight = 1, minShare = 0, mode = "FIFO")))
    val xml = scala.xml.XML.loadFile(path)
    val pools = (xml \ "pool").map(p => ((p \ "@name").text,
      (p \ "schedulingMode").text, (p \ "weight").text, (p \ "minShare").text))
    assert(pools === Seq(("interactive", "FAIR", "4", "2"),
      ("batch", "FIFO", "1", "0")))
    assertThrows[IllegalArgumentException] {
      GraftSession.writePoolFile(path, Seq(GraftSession.PoolSpec("x", mode = "LIFO")))
    }
    assertThrows[IllegalArgumentException] {
      GraftSession.writePoolFile(path,
        Seq(GraftSession.PoolSpec("bad name\"/><x")))
    }
  }

  test("two pools on a saturated session interleave instead of serializing") {
    val sc = spark.sparkContext
    // (pool, stageIds) from job starts; task launch times per stage
    val jobPools = new ConcurrentLinkedQueue[(String, Seq[Int])]()
    val taskStarts = new ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val pool = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.scheduler.pool")))
          .getOrElse("default")
        if (pool == "sp_a" || pool == "sp_b")
          jobPools.add((pool, js.stageIds.map(_.toInt)))
      }
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        taskStarts.add((ts.stageId, ts.taskInfo.launchTime))
    }
    sc.addSparkListener(listener)
    try {
      // each job: 8 tasks x 300ms on a local[4] session — job A saturates
      // all cores; B submits only after A's first task is observed running
      def slowJob(): Unit =
        spark.range(0, 8, 1, 8).rdd
          .foreachPartition(_ => Thread.sleep(300))
      val aStarted = new java.util.concurrent.CountDownLatch(1)
      val probe = new SparkListener {
        override def onTaskStart(ts: SparkListenerTaskStart): Unit =
          aStarted.countDown()
      }
      sc.addSparkListener(probe)
      val ta = new Thread(() => GraftSession.inPool(spark, "sp_a")(slowJob()))
      val tb = new Thread(() => {
        aStarted.await()
        GraftSession.inPool(spark, "sp_b")(slowJob())
      })
      ta.start(); tb.start(); ta.join(); tb.join()
      sc.removeSparkListener(probe)
      import scala.jdk.CollectionConverters._
      // settle the (async) listener bus: both jobs are done, so their
      // events are in flight at worst — poll until all 16 task starts of
      // the two tracked pools have landed
      val deadline = System.nanoTime + 10000000000L
      def tracked(): Int = {
        val stages = jobPools.asScala.flatMap(_._2).toSet
        taskStarts.asScala.count(t => stages(t._1))
      }
      while ((jobPools.size < 2 || tracked() < 16) && System.nanoTime < deadline)
        Thread.sleep(50)
      val pools = jobPools.asScala.toMap
      assert(pools.keySet === Set("sp_a", "sp_b"))
      val starts = taskStarts.asScala.toSeq
      def startsOf(pool: String): Seq[Long] = {
        val stages = pools(pool).toSet
        starts.collect { case (s, t) if stages(s) => t }.sorted
      }
      val a = startsOf("sp_a")
      val b = startsOf("sp_b")
      assert(a.size === 8 && b.size === 8)
      // INTERLEAVE: pool-b work begins while pool-a still has tasks that
      // have not even STARTED — impossible under job-at-a-time FIFO on a
      // saturated scheduler, guaranteed under FAIR's per-pool shares
      assert(b.head < a.last,
        s"pool b first start ${b.head} must precede pool a last start ${a.last}")
    } finally sc.removeSparkListener(listener)
  }
}
