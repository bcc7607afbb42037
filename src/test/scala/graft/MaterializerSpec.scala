package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.plans.Materializer
import graft.plans.Materializer.CacheKey

class MaterializerSpec extends SparkSpec {
  import spark.implicits._

  test("lookupOrCompute computes once, serves from cache after") {
    val cacheDir = Files.createTempDirectory("graft-mat").toString
    val computeCount = new AtomicInteger(0)
    val key = CacheKey("wc", Map("p" -> "1"), Seq(s"$sfDir/documents.parquet"))
    def run() = Materializer.lookupOrCompute(spark, cacheDir, key) {
      computeCount.incrementAndGet()
      Seq((1L, "x")).toDF("id", "v")
    }
    val first = run().count()
    val second = run().count()
    assert(first === 1L && second === 1L)
    assert(computeCount.get() === 1)
  }

  test("fingerprint changes with params and with input snapshot") {
    val base = CacheKey("op", Map("a" -> "1"), Seq(s"$sfDir/region.parquet"))
    val fp1 = Materializer.fingerprint(spark, base)
    val fp2 = Materializer.fingerprint(spark, base.copy(params = Map("a" -> "2")))
    val fp3 = Materializer.fingerprint(spark,
      base.copy(inputPaths = Seq(s"$sfDir/nation.parquet")))
    assert(fp1 !== fp2)
    assert(fp1 !== fp3)
    assert(fp1 === Materializer.fingerprint(spark, base)) // stable
  }

  test("a code-version bump misses the old cache entry") {
    val cacheDir = Files.createTempDirectory("graft-mat-ver").toString
    val computeCount = new AtomicInteger(0)
    val key = CacheKey("op", Map(), Seq(s"$sfDir/region.parquet"))
    def run() = Materializer.lookupOrCompute(spark, cacheDir, key) {
      computeCount.incrementAndGet()
      Seq(1).toDF("x")
    }
    sys.props("graft.cache.version") = "release-1"
    try {
      val fp1 = Materializer.fingerprint(spark, key)
      run(); run()
      assert(computeCount.get() === 1) // same version → hit
      sys.props("graft.cache.version") = "release-2"
      assert(Materializer.fingerprint(spark, key) !== fp1)
      run()
      assert(computeCount.get() === 2) // upgraded code → miss, recompute
    } finally sys.props -= "graft.cache.version"
  }

  test("fingerprint is injective for newline/equals-shaped params") {
    // without length-prefixed encoding these two keys serialize to the
    // same material and silently share one cache slot
    val tricky = CacheKey("op", Map("a" -> "1\n1:b=1:2"), Seq.empty)
    val plain = CacheKey("op", Map("a" -> "1", "b" -> "2"), Seq.empty)
    assert(Materializer.fingerprint(spark, tricky)
      !== Materializer.fingerprint(spark, plain))
  }

  test("concurrent lookupOrCompute: the claim elects exactly one writer") {
    val cacheDir = Files.createTempDirectory("graft-mat-conc").toString
    val computeCount = new AtomicInteger(0)
    val key = CacheKey("conc", Map(), Seq(s"$sfDir/region.parquet"))
    def run() = Materializer.lookupOrCompute(spark, cacheDir, key) {
      computeCount.incrementAndGet()
      Thread.sleep(500) // hold the claim so the loser takes the wait path
      Seq((1, "x"), (2, "y")).toDF("id", "v")
    }
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val threads = (1 to 2).map(_ => new Thread(() => counts.add(run().count())))
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(counts.asScala.toSeq.map(_.toLong) === Seq(2L, 2L),
      "both callers must see the complete materialization")
    assert(computeCount.get() === 1,
      "the loser must wait for the winner's marker, not double-write the target")
  }

  test("sweep: over-budget cache shrinks oldest-first, claimed entry " +
    "survives, swept lookup recomputes") {
    val cacheDir = Files.createTempDirectory("graft-mat-sweep").toString
    val computeCount = new AtomicInteger(0)
    def keyFor(i: Int) = CacheKey("sw", Map("i" -> i.toString), Seq.empty)
    def run(i: Int) = Materializer.lookupOrCompute(spark, cacheDir, keyFor(i)) {
      computeCount.incrementAndGet()
      Seq.tabulate(200)(j => (j.toLong, s"payload-$i-$j")).toDF("id", "v")
    }
    // three completed entries with strictly increasing _SUCCESS mtimes
    (1 to 3).foreach { i =>
      run(i).count()
      val marker = java.nio.file.Paths.get(cacheDir,
        Materializer.fingerprint(spark, keyFor(i)), "_SUCCESS")
      java.nio.file.Files.setLastModifiedTime(marker,
        java.nio.file.attribute.FileTime.fromMillis(1000000L * i))
    }
    assert(computeCount.get() === 3)
    // a fourth entry is mid-write: claim file present, no _SUCCESS
    val claimed = java.nio.file.Paths.get(cacheDir, "deadbeef")
    java.nio.file.Files.createDirectories(claimed)
    java.nio.file.Files.write(claimed.resolve("part-0"), Array.fill(4096)(1: Byte))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(cacheDir, "deadbeef._claim"))
    def dirBytes(p: java.nio.file.Path): Long = {
      val w = java.nio.file.Files.walk(p)
      try w.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally w.close()
    }
    val completeBytes = (1 to 3).map(i => dirBytes(java.nio.file.Paths.get(
      cacheDir, Materializer.fingerprint(spark, keyFor(i))))).toSeq
    // budget fits the two newest completed entries but not all three
    val budget = completeBytes.tail.sum + completeBytes.head / 2
    val stats = Materializer.sweep(spark, cacheDir, maxBytes = budget)
    assert(stats.skippedClaimed === 1, "in-flight claim must be untouched")
    assert(stats.deleted === 1, "exactly the oldest completed entry goes")
    assert(java.nio.file.Files.exists(claimed.resolve("part-0")),
      "claimed entry's data must survive the sweep")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(cacheDir,
      Materializer.fingerprint(spark, keyFor(1)))))
    // swept entry recomputes; surviving entries still serve from cache
    run(1).count(); run(2).count(); run(3).count()
    assert(computeCount.get() === 4)
  }

  test("sweep: a crashed writer's stale claim is reclaimed with its torn " +
    "directory; a fresh claim still protects") {
    val cacheDir = Files.createTempDirectory("graft-mat-stale").toString
    def plant(name: String, ageMs: Long): Unit = {
      val d = java.nio.file.Paths.get(cacheDir, name)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("part-0"), Array[Byte](1, 2, 3))
      val claim = java.nio.file.Paths.get(cacheDir, name + "._claim")
      java.nio.file.Files.createFile(claim)
      // a writer that crashed ageMs ago left BOTH its claim and its torn
      // directory at that age — backdate both, as sweep ages both
      val t = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - ageMs)
      java.nio.file.Files.setLastModifiedTime(claim, t)
      java.nio.file.Files.setLastModifiedTime(d, t)
    }
    plant("aaaa0000", ageMs = 2 * 3600 * 1000L) // crashed: 2h-old claim+dir
    plant("bbbb1111", ageMs = 0L)               // live writer
    val stats = Materializer.sweep(spark, cacheDir)
    assert(stats.deleted === 1 && stats.skippedClaimed === 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cacheDir, "aaaa0000")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cacheDir, "aaaa0000._claim")),
      "the stale claim itself must be reclaimed")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cacheDir, "bbbb1111", "part-0")))
  }

  test("sweep: maxAge evicts stale completed entries and torn leftovers") {
    val cacheDir = Files.createTempDirectory("graft-mat-age").toString
    val key = CacheKey("age", Map(), Seq.empty)
    Materializer.lookupOrCompute(spark, cacheDir, key) {
      Seq(1).toDF("x")
    }.count()
    val marker = java.nio.file.Paths.get(cacheDir,
      Materializer.fingerprint(spark, key), "_SUCCESS")
    java.nio.file.Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.fromMillis(1000L)) // ancient
    // torn leftover: OLD directory without _SUCCESS or claim (crashed
    // writer, long gone) — reclaimable
    val torn = java.nio.file.Paths.get(cacheDir, "0123456789abcdef")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-0"), Array[Byte](1, 2, 3))
    java.nio.file.Files.setLastModifiedTime(torn,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    // a FRESH claimless incomplete dir may be a live writer mid-write
    // whose claim a timed-out loser raced — sweep must leave it alone
    val freshTorn = java.nio.file.Paths.get(cacheDir, "feedfacefeedface")
    java.nio.file.Files.createDirectories(freshTorn)
    java.nio.file.Files.write(freshTorn.resolve("part-0"), Array[Byte](7))
    val stats = Materializer.sweep(spark, cacheDir,
      maxAgeMs = 24L * 3600 * 1000)
    assert(stats.deleted === 2)
    assert(!java.nio.file.Files.exists(torn))
    assert(!java.nio.file.Files.exists(marker.getParent))
    assert(java.nio.file.Files.exists(freshTorn.resolve("part-0")),
      "a fresh claimless incomplete dir (possible live writer) must survive")
  }

  test("cross-process race: sweep and readers against a live writer in " +
    "another JVM") {
    import scala.jdk.CollectionConverters._
    val cacheDir = Files.createTempDirectory("graft-mat-race").toString
    val key = CacheKey("race", Map("x" -> "1"), Seq.empty)
    val fp = Materializer.fingerprint(spark, key)
    val claim = java.nio.file.Paths.get(cacheDir, s"$fp._claim")
    // spawn the writer child with this JVM's flags + classpath (it needs
    // the add-opens set and the test classes); it claims, holds the write
    // for 20 s, commits, exits 0
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val pb = new ProcessBuilder((Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.MaterializerRaceChild", cacheDir, "20000")).asJava)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val child = pb.start()
    try {
      // wait for the child's claim — the in-flight window opens
      val deadline = System.nanoTime + 90L * 1000000000L
      while (!java.nio.file.Files.exists(claim) && System.nanoTime < deadline)
        Thread.sleep(100)
      assert(java.nio.file.Files.exists(claim), "child never claimed")

      // 1. an aggressive sweep (everything over budget and over age) must
      // leave the in-flight entry alone: the claim is young
      val s1 = Materializer.sweep(spark, cacheDir, maxBytes = 0L, maxAgeMs = 0L)
      assert(java.nio.file.Files.exists(claim),
        "sweep must not reclaim a live writer's young claim")
      assert(s1.deleted === 0, s"sweep deleted a live writer's state: $s1")

      // 2. a short-wait reader loses the election, times out, and serves
      // its OWN computed frame uncached — and must NOT delete the young
      // claim on its way out (a third caller would otherwise double-write)
      val computed = new AtomicInteger(0)
      val loser = Materializer.lookupOrCompute(spark, cacheDir, key,
        waitMs = 1000L) {
        computed.incrementAndGet()
        Seq((1L, "loser")).toDF("id", "v")
      }
      assert(computed.get() === 1 &&
        loser.select("v").head().getString(0) === "loser")
      assert(java.nio.file.Files.exists(claim),
        "timed-out loser must leave a young (live) claim in place")

      // 3. a patient reader blocks until the child commits and serves the
      // WINNER's bytes — never a torn read, never a duplicate compute
      val waited = Materializer.lookupOrCompute(spark, cacheDir, key,
        waitMs = 120000L) {
        computed.incrementAndGet()
        Seq((1L, "should-not-run")).toDF("id", "v")
      }
      assert(waited.select("v").head().getString(0) === "winner")
      assert(computed.get() === 1, "patient reader must not recompute")
      assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) &&
        child.exitValue() === 0)
      assert(!java.nio.file.Files.exists(claim), "winner must release its claim")

      // 4. once committed and unclaimed, an age-out sweep reclaims it
      val s2 = Materializer.sweep(spark, cacheDir, maxAgeMs = 0L)
      assert(s2.deleted === 1)
    } finally child.destroyForcibly()
  }

  test("invalidate forces recompute") {
    val cacheDir = Files.createTempDirectory("graft-mat2").toString
    val computeCount = new AtomicInteger(0)
    val key = CacheKey("op2", Map(), Seq(s"$sfDir/region.parquet"))
    def run() = Materializer.lookupOrCompute(spark, cacheDir, key) {
      computeCount.incrementAndGet()
      Seq(1).toDF("x")
    }
    run(); run()
    assert(computeCount.get() === 1)
    Materializer.invalidate(spark, cacheDir, Some(key))
    run()
    assert(computeCount.get() === 2)
  }
}
