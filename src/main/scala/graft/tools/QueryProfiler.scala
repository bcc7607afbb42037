package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Perf-diagnosis harness: run one registered query repeatedly in a single
  * session and decompose each run's wall time into executor CPU vs task
  * wall (the gap = scheduling/IO waits) vs GC vs hypervisor steal, with a
  * per-stage CPU breakdown and the JVM's JIT/codegen counters.
  *
  * This is the tool that root-caused the round-7 bench variance: identical
  * 32-task stages flipping between ~30 and ~1700 CPU-seconds, with
  * `janinoCompiles` incrementing on the slow runs — codegen-cache eviction
  * recompiling the generated class, which then re-enters the JIT cold and
  * runs the quadratic verify loop at interpreter speed.
  *
  * Usage: `SPARK_GRAFT_PROFILE_QUERY=<name> [SPARK_GRAFT_PROFILE_RUNS=6]
  * [SPARK_GRAFT_SF_DIR=...] sbt "runMain graft.tools.QueryProfiler"`.
  */
object QueryProfiler {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_PROFILE_QUERY", "dedup_resolve")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "6").toInt
    // SPARK_GRAFT_PROFILE_BENCH_CONF=1 reproduces graft.Bench's EXACT
    // session conf instead of GraftSession's richer one — the two plan
    // differently (broadcast threshold, runtime bloom filter, Kryo), and a
    // profile of the wrong session diagnoses the wrong plan: link_pred
    // measured 80-130 s wall / ~660 task-CPU-s under GraftSession.local()
    // vs ~10 s under the bench conf on the same fixture.
    val spark =
      if (sys.env.get("SPARK_GRAFT_PROFILE_BENCH_CONF").contains("1")) {
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
        org.apache.spark.sql.SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          // SPARK_GRAFT_PROFILE_AQE=0 profiles with AQE off (A/B for the
          // iterative loops' per-round planning cost); default matches
          // the bench conf (on)
          .config("spark.sql.adaptive.enabled",
            (!sys.env.get("SPARK_GRAFT_PROFILE_AQE").contains("0")).toString)
          .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
          .config("spark.sql.adaptive.skewJoin.enabled", "true")
          .config("spark.sql.codegen.cache.maxEntries", "2000")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
      } else graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val taskTime = new LongAdder; val gcTime = new LongAdder
    val cpuTime = new LongAdder; val taskCount = new LongAdder
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (LongAdder, LongAdder)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTime.add(m.executorRunTime); gcTime.add(m.jvmGCTime)
          cpuTime.add(m.executorCpuTime)
          val s = perStage.computeIfAbsent(t.stageId, _ => (new LongAdder, new LongAdder))
          s._1.add(m.executorCpuTime); s._2.add(1)
        }
        taskCount.add(1)
      }
    })
    // steal jiffies (10 ms each) from the host: CPU the hypervisor took
    // back — separates "the VM was starved" from "the code burned cycles"
    def steal: Long = {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next().split("\\s+")
      if (l.length > 8) l(8).toLong else 0L
    }
    def driverGcMs: Long = {
      var s = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .forEach(b => s += math.max(0, b.getCollectionTime))
      s
    }

    (1 to runs).foreach { i =>
      taskTime.reset(); gcTime.reset(); cpuTime.reset(); taskCount.reset()
      val g0 = driverGcMs; val s0 = steal
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(qname)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      graft.plans.ReleaseRegistry.drain()
      val wall = (System.nanoTime() - t0) / 1e9
      val g1 = driverGcMs; val s1 = steal
      println(f"RUN $i%d wall=$wall%.2fs taskWall=${taskTime.sum / 1e3}%.2fs " +
        f"taskCpu=${cpuTime.sum / 1e9}%.2fs taskGc=${gcTime.sum / 1e3}%.2fs " +
        f"driverGc=${(g1 - g0) / 1e3}%.2fs steal=${(s1 - s0) / 100.0}%.2fs tasks=${taskCount.sum}%d")
      import scala.jdk.CollectionConverters._
      val top = perStage.asScala.toSeq
        .map { case (id, (c, n)) => (id, c.sum / 1e9, n.sum) }
        .sortBy(-_._2).take(4)
      println("  stages(cpu): " + top.map { case (id, c, n) => f"s$id%d=$c%.1fs/$n%dt" }.mkString(" "))
      perStage.clear()
      import java.lang.management.{ManagementFactory => MF}
      val jit = MF.getCompilationMXBean.getTotalCompilationTime / 1e3
      val codeHeap = MF.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => f"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=" +
          f"${p.getUsage.getUsed / 1024 / 1024}%dMB").mkString(" ")
      println(f"  jitTotal=$jit%.1fs janinoCompiles=" +
        f"${org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount}%d " +
        codeHeap)
    }
    spark.stop()
  }
}
