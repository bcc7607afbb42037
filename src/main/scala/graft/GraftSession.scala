package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Replaces the reference's hand-rolled cluster bootstrap (master/slave/
  * cacheserver daemons, `/root/reference/src/master/dht/master.cc:64`,
  * `src/slave/dht/slave.cc:38`, `src/orthrus/cacheserver.cc:42`) with a
  * single Spark session. Scheduling knobs the reference exposes via EM-KDE
  * (`src/orthrus/histogram.hh:173-273`) map to AQE: skew-join handling and
  * partition coalescing are enabled by default so runtime re-planning takes
  * the role of the decaying-histogram load balancer.
  *
  * Scale posture: shuffle partitions default to the local core count for
  * tests; on a real cluster callers pass `shufflePartitions` sized to
  * executors * cores * 2-3 (or rely on AQE coalescing from a high initial
  * count).
  */
object GraftSession {
  def builder(
      appName: String = "graft",
      cores: Int = 32,
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // default 100 entries evicts constantly on a many-query session;
      // every eviction is a Janino recompile AND a fresh class the JIT
      // must re-warm — measured 10-50x CPU inflation on the quadratic
      // dedup-verify stage whenever its generated class came back cold
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // runtime bloom-filter pushdown: joins inject a key filter into the
      // probe-side scan, cutting shuffled bytes on selective joins — the
      // kind of win that only shows at 100 TB fact-table scale
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // zstd: ~30% smaller than snappy at comparable scan speed — at 100 TB
      // the storage/IO saving dominates the marginal encode cost
      .config("spark.sql.parquet.compression.codec", "zstd")
      // FAIR scheduling so concurrent queries on one session share executors
      // (the reference admits up to max_job=1024 concurrent jobs,
      // /root/reference/build/etc/eclipse.json)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")

  /** One named scheduler pool for [[writePoolFile]]: `weight` is the
    * pool's share of executors relative to its siblings, `minShare` a
    * guaranteed core count served before any weight math, `mode` the
    * INTERNAL ordering among the pool's own jobs (`FAIR` or `FIFO`).
    */
  final case class PoolSpec(name: String, weight: Int = 1, minShare: Int = 0,
      mode: String = "FAIR")

  /** Write a Spark fair-scheduler allocation file and return its path —
    * the declarative replacement for the reference master's connection
    * admission loop (`/root/reference/src/master/dht/master.cc:343-366`:
    * at `max_job` concurrent jobs new arrivals get `nospace` and are
    * dropped). Spark's model is strictly better at 100 TB: instead of
    * rejecting job `max_job+1`, FAIR pools keep every submitted query
    * running at a weighted share of the cluster, and a `minShare` floor
    * plays the role of an admission guarantee for the interactive pool.
    * Wire it in with
    * `.config("spark.scheduler.allocation.file", path)` on [[builder]]
    * (read once at SparkContext creation), then route each request's
    * thread through [[inPool]]. Note: under `spark.scheduler.mode=FAIR`
    * an allocation file is OPTIONAL — pools named at runtime auto-create
    * with weight 1 — so the file exists to pin weights/floors, not to
    * enable fairness.
    */
  def writePoolFile(path: String, pools: Seq[PoolSpec]): String = {
    val xml = pools.map { p =>
      require(p.mode == "FAIR" || p.mode == "FIFO", s"bad mode: ${p.mode}")
      require(p.name.matches("[A-Za-z0-9_.-]+"), s"bad pool name: ${p.name}")
      s"""  <pool name="${p.name}">
         |    <schedulingMode>${p.mode}</schedulingMode>
         |    <weight>${p.weight}</weight>
         |    <minShare>${p.minShare}</minShare>
         |  </pool>""".stripMargin
    }.mkString("<?xml version=\"1.0\"?>\n<allocations>\n", "\n", "\n</allocations>\n")
    val target = java.nio.file.Paths.get(path)
    if (target.getParent != null) java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.write(target, xml.getBytes("UTF-8"))
    path
  }

  /** Run `body` with every Spark job the CURRENT THREAD submits assigned
    * to scheduler pool `pool` (a thread-local Spark property — concurrent
    * request threads each pin their own pool and share executors at the
    * pool weights; previous assignment restored on exit, so nesting and
    * thread reuse are safe). Pools not in the allocation file auto-create
    * with default weight under FAIR mode.
    */
  def inPool[T](spark: SparkSession, pool: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try body finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }

  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = builder(appName, cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Drain the session's queued operator release hooks — the first-class
    * materialize-then-release point for long-lived sessions. Call at
    * request/batch boundaries AFTER the batch's results are materialized
    * (written to a sink, collected, or persisted by the caller): iterative
    * operators (PageRank, cluster resolution, k-means, sketch builders)
    * pin state behind the plans they return and queue its release here.
    * `full = true` (default) also frees checkpoint blocks — afterwards,
    * previously returned frames must not be re-read (re-invoke the
    * builder); `full = false` trims only safely-recomputable caches.
    * Returns the number of hooks run.
    */
  def release(full: Boolean = true): Int =
    graft.plans.ReleaseRegistry.drain(full)
}
