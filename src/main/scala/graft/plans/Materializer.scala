package graft.plans

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed materialization manager — the Spark-side equivalent of
  * the reference's cross-job intermediate-result cache ("Icache"), which
  * replays a map task's cached output keyed by `appname_inputfile`
  * (`/root/reference/src/file_distributor/fileserver.hh:374-585`, opt-in at
  * `src/mapreduce/dht/mapreduce.hh:1102-1105`).
  *
  * The reference's key is unsound under changed inputs (SURVEY.md §7.4): it
  * never looks at input *content*. Here the cache key fingerprints the
  * code version ([[codeVersion]]), the operator name, its normalized
  * parameters, AND an input snapshot (path, length, modification time of
  * every input file), so a changed input — or an upgraded library — is a
  * miss, never a stale replay.
  *
  * Storage is parquet under `cacheDir/<fingerprint>` — works on any Hadoop
  * filesystem (local, HDFS, S3A), so the cache is shared across sessions
  * and jobs like the reference's distributed cache, but with Spark's
  * columnar format + predicate pushdown on re-read.
  */
object Materializer {

  final case class CacheKey(op: String, params: Map[String, String], inputPaths: Seq[String])

  /** Fingerprint of the CODE that computes operators, mixed into every
    * cache key: SURVEY.md §7.4 requires the Icache key to capture "app
    * version + input content", and without it upgrading the library would
    * silently serve results materialized by an operator whose semantics
    * have since changed. Derived from the classpath entry this class was
    * loaded from — a rebuilt jar (name, length, mtime) or recompiled
    * classes directory (file count + newest class mtime) is a different
    * version. Deployments with a real release stamp can override via the
    * `graft.cache.version` system property (re-read on every call, so a
    * long-lived session can be repointed).
    */
  def codeVersion: String =
    sys.props.getOrElse("graft.cache.version", buildFingerprint)

  private lazy val buildFingerprint: String = {
    val src = getClass.getProtectionDomain.getCodeSource
    if (src == null || src.getLocation == null) "unversioned"
    else {
      val f = new java.io.File(src.getLocation.toURI)
      if (f.isFile) s"${f.getName}|${f.length}|${f.lastModified}"
      else if (f.isDirectory) {
        // dev classes dir: newest class-file mtime + count — one walk,
        // cached for the JVM lifetime (a recompile means a new JVM)
        val walk = java.nio.file.Files.walk(f.toPath)
        try {
          var n = 0L
          var newest = 0L
          walk.forEach { p =>
            if (java.nio.file.Files.isRegularFile(p)) {
              n += 1
              newest = math.max(newest, p.toFile.lastModified)
            }
          }
          s"${f.getName}|$n|$newest"
        } finally walk.close()
      } else "unversioned"
    }
  }

  /** Stable hex fingerprint of (code version, op, params, input snapshot). */
  def fingerprint(spark: SparkSession, key: CacheKey): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val snapshot = key.inputPaths.sorted.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) {
        // recursive walk: every file's (path, len, mtime) participates, so a
        // changed file inside a nested/partitioned directory is a cache miss
        // (directory mtimes alone don't change on in-place file writes)
        val it = fs.listFiles(path, true)
        val files = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          files += s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
        }
        files.sorted.toSeq
      } else Seq(s"$p|missing")
    }
    // length-prefix every component so the encoding is injective: without
    // it a param VALUE containing "\n" or "=" could collide with a
    // differently-shaped key and serve the wrong materialization
    def enc(s: String) = s"${s.length}:$s"
    val material =
      (Seq(enc(s"code=$codeVersion"), enc(key.op)) ++
        key.params.toSeq.sorted.map { case (k, v) => enc(k) + "=" + enc(v) } ++
        snapshot.map(enc))
        .mkString("\n")
    MessageDigest.getInstance("MD5").digest(material.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def successMarker(dir: String): Path = new Path(dir, "_SUCCESS")

  /** Atomic exclusive claim (same scheme split as
    * [[graft.sources.Versioned]]: Hadoop's local ChecksumFileSystem
    * implements create(overwrite=false) as a non-atomic exists-then-open,
    * so the `file` scheme claims through NIO O_EXCL). Returns false when
    * another writer already holds the claim.
    */
  private[graft] def tryClaim(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    try {
      if (fs.getScheme == "file") {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local)
        true
      } else { fs.create(p, false).close(); true }
    } catch {
      case e: java.io.IOException => if (fs.exists(p)) false else throw e
    }

  /** Serve from cache when the fingerprint matches a completed
    * materialization; otherwise compute, persist, and serve the persisted
    * copy (so downstream reads get parquet scans with pruning, not the
    * original plan). Incomplete writes (no _SUCCESS) are recomputed.
    *
    * Concurrency (the reference's `is_being_written` guard,
    * `fileserver.hh:473-538`, without its check-then-act race): the writer
    * for a fingerprint is elected by an atomic exclusive claim file, so
    * two sessions sharing `cacheDir` can never interleave writes into the
    * same target. A loser waits up to `waitMs` for the winner's marker
    * and serves the cached copy; on timeout it serves its own computed
    * frame UNCACHED — duplicated work is the worst case, never a
    * corrupted or torn read. The timed-out loser removes the winner's
    * claim ONLY when the claim is older than `staleClaimMs` (a crashed
    * writer's leftover): a claim younger than that may belong to a
    * slow-but-live writer, and deleting it would let a third caller
    * elect itself and overwrite the same target mid-write — and would
    * let [[sweep]] misclassify the in-flight directory as torn.
    */
  def lookupOrCompute(spark: SparkSession, cacheDir: String, key: CacheKey,
      waitMs: Long = 300000L, staleClaimMs: Long = 3600000L)(compute: => DataFrame): DataFrame = {
    val fp = fingerprint(spark, key)
    val target = s"$cacheDir/$fp"
    val path = new Path(target)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committed = fs.exists(successMarker(target))
    if (committed) return spark.read.parquet(target)
    val claim = new Path(s"$cacheDir/$fp._claim")
    if (tryClaim(fs, claim)) {
      try {
        // re-check under the claim: a racing writer may have committed
        // between our probe and the claim; a torn leftover (crashed
        // writer, no marker) is cleared and rewritten
        if (!committed) {
          if (fs.exists(path)) fs.delete(path, true)
          compute.write.mode("overwrite").parquet(target)
        }
      } finally fs.delete(claim, false)
      spark.read.parquet(target)
    } else {
      val deadline = System.nanoTime + waitMs * 1000000L
      while (!committed && System.nanoTime < deadline) Thread.sleep(100)
      if (committed) spark.read.parquet(target)
      else {
        // don't strand future callers behind a crashed writer's claim —
        // but a YOUNG claim is a live slow writer: leave it in place.
        // exists/getFileStatus/delete is check-then-act against other
        // timed-out losers cleaning the same stale claim: losing that
        // race is fine (the claim is gone either way), so a vanished
        // file must not fail a caller whose frame is already computed
        try {
          if (fs.exists(claim) &&
              System.currentTimeMillis - fs.getFileStatus(claim).getModificationTime > staleClaimMs)
            fs.delete(claim, false)
        } catch { case _: java.io.FileNotFoundException => () }
        compute
      }
    }
  }

  /** What one [[sweep]] pass did: entries examined, entries deleted,
    * bytes reclaimed, and entries left alone because a writer's claim was
    * live (the reference cache's `is_locked()` skip).
    */
  final case class SweepStats(scanned: Int, deleted: Int, bytesFreed: Long,
      skippedClaimed: Int)

  /** Bounded-cache eviction sweep — the Spark-side twin of the reference
    * cache's capacity fit (`/root/reference/src/orthrus/cache.hh:88-128`:
    * `update_size` walks total size and `try_fit_size` deletes from the
    * LRU tail, skipping locked entries, until under capacity). Here the
    * recency signal is each entry's `_SUCCESS` mtime (set once at commit —
    * insertion order, the cheap monotone approximation of LRU that needs
    * no per-read metadata write) and
    * the lock is the writer claim file, so the sweep composes with
    * [[lookupOrCompute]]'s protocol instead of racing it:
    *
    *  - an entry with a live `<fp>._claim` (younger than `staleClaimMs`)
    *    is IN FLIGHT — never touched, whatever its size or age (deleting
    *    under a writer would tear the write it is about to commit); an
    *    OLDER claim is a crashed writer's leftover and is reclaimed along
    *    with its torn directory. Every deletion first takes the entry's
    *    own claim through the writers' election protocol, so a writer
    *    arriving between the scan and the delete wins and the sweep
    *    skips — no check-then-act window;
    *  - torn leftovers (directory, no `_SUCCESS`, no claim — a crashed
    *    writer) are reclaimed once older than `staleClaimMs`; younger
    *    ones are left alone, because a slow-but-live writer whose claim
    *    a timed-out reader raced could otherwise be torn mid-write;
    *  - completed entries age out past `maxAgeMs`, then the OLDEST
    *    completed entries go first until the namespace fits `maxBytes`.
    *
    * Deletion drops the `_SUCCESS` marker before the data so a
    * concurrently-arriving reader observes a miss (and recomputes through
    * the normal claim path) rather than a half-deleted parquet directory.
    * A reader that already resolved its plan against the entry keeps
    * whatever blocks it opened — run sweeps at job boundaries on shared
    * caches. Listing and deletion are driver-side metadata calls bounded
    * by entry COUNT (not data volume): `getContentSummary` is one
    * namespace call per entry, so a 100 TB cache with thousands of
    * entries sweeps in seconds.
    */
  def sweep(spark: SparkSession, cacheDir: String,
      maxBytes: Long = Long.MaxValue, maxAgeMs: Long = Long.MaxValue,
      staleClaimMs: Long = 3600000L): SweepStats = {
    val root = new Path(cacheDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return SweepStats(0, 0, 0L, 0)
    val now = System.currentTimeMillis
    final case class Entry(path: Path, bytes: Long, mtime: Long, complete: Boolean)
    def claimPath(name: String) = new Path(root, name + "._claim")
    // a claim older than staleClaimMs is a crashed writer's leftover
    // (lookupOrCompute writers finish or time out long before this):
    // reclaim it here, or the torn multi-GB directory behind it would
    // stay unreclaimable FOREVER for a content-addressed key nobody
    // requests again — defeating the one tool meant to bound the cache
    def claimIsLive(name: String): Boolean = {
      val p = claimPath(name)
      if (!fs.exists(p)) false
      else if (now - fs.getFileStatus(p).getModificationTime <= staleClaimMs) true
      else { fs.delete(p, false); false }
    }
    val dirs = fs.listStatus(root).filter(_.isDirectory)
    var skippedClaimed = 0
    val entries = dirs.toSeq.flatMap { st =>
      if (claimIsLive(st.getPath.getName)) { skippedClaimed += 1; None }
      else {
        val marker = successMarker(st.getPath.toString)
        val complete = fs.exists(marker)
        val mtime =
          if (complete) fs.getFileStatus(marker).getModificationTime
          else st.getModificationTime
        Some(Entry(st.getPath, fs.getContentSummary(st.getPath).getLength,
          mtime, complete))
      }
    }
    var deleted = 0
    var freed = 0L
    // deletion takes the entry's OWN claim first (the writers' election
    // protocol): a writer that claimed between the scan above and this
    // delete keeps its claim, we lose the race and skip — without it the
    // scan-time check is TOCTOU and a fresh write could be torn mid-flight.
    // Returns whether the entry was actually deleted, so the capacity
    // accounting below never credits a skipped or failed drop.
    def drop(e: Entry): Boolean =
      if (tryClaim(fs, claimPath(e.path.getName))) {
        try {
          val marker = successMarker(e.path.toString)
          if (fs.exists(marker)) fs.delete(marker, false)
          fs.delete(e.path, true)
          deleted += 1
          freed += e.bytes
          true
        } finally fs.delete(claimPath(e.path.getName), false)
      } else { skippedClaimed += 1; false }
    val (torn, complete) = entries.partition(!_.complete)
    // a claimless incomplete dir younger than staleClaimMs may be a live
    // writer whose claim a timed-out loser once raced (or whose claim is
    // about to appear): only dirs old enough that any legitimate writer
    // would have committed or left a reclaimable claim are torn junk
    torn.filter(e => now - e.mtime > staleClaimMs).foreach(drop)
    val (aged, fresh) = complete.partition(e => now - e.mtime > maxAgeMs)
    aged.foreach(drop)
    var live = fresh.map(_.bytes).sum
    for (e <- fresh.sortBy(_.mtime) if live > maxBytes) {
      if (drop(e)) live -= e.bytes
    }
    SweepStats(dirs.length, deleted, freed, skippedClaimed)
  }

  /** Drop one materialization (or the whole cache namespace with `op=None`). */
  def invalidate(spark: SparkSession, cacheDir: String, key: Option[CacheKey] = None): Unit = {
    val dir = key match {
      case Some(k) => s"$cacheDir/${fingerprint(spark, k)}"
      case None => cacheDir
    }
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
  }
}
