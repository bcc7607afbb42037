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
