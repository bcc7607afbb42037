package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.plans.CacheRegistry

/** The named raw-input cache (SURVEY §2 C1): read-through persist on
  * first use, by-name lookup, bulk invalidation, and — the hairy part —
  * the racing-thunk path, where two threads populate the same name
  * concurrently and the loser's persist must be rolled back instead of
  * leaking an unreleasable CacheManager entry for the session lifetime.
  */
class CacheRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def freshName(tag: String) =
    s"spec-$tag-${java.util.UUID.randomUUID().toString.take(8)}"

  private def isPersisted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel.useMemory || df.storageLevel.useDisk

  test("read-through: first call persists and registers, second serves the same frame") {
    val name = freshName("rt")
    val built = new AtomicInteger(0)
    def make() = { built.incrementAndGet(); (1L to 10L).toDF("v") }
    val first = CacheRegistry.cache(name, make())
    assert(first.as[Long].collect().length === 10)
    assert(isPersisted(first), "cached frame must be persisted")
    assert(CacheRegistry.lookup(name).exists(_ eq first))
    assert(CacheRegistry.cachedNames.contains(name))
    val second = CacheRegistry.cache(name, make())
    assert(second eq first, "second call must serve the registered frame")
    assert(built.get === 1, "thunk must not re-evaluate on a hit")
    CacheRegistry.uncache(name)
  }

  test("uncache releases the persist and drops the name; clear empties") {
    val name = freshName("un")
    val df = CacheRegistry.cache(name, (1L to 5L).toDF("v"))
    df.count()
    assert(isPersisted(df))
    CacheRegistry.uncache(name)
    assert(CacheRegistry.lookup(name).isEmpty)
    assert(!isPersisted(df), "uncache must unpersist the frame")
    CacheRegistry.uncache(name) // absent name: no-op, no throw

    val a = freshName("clr-a")
    val b = freshName("clr-b")
    CacheRegistry.cache(a, (1L to 3L).toDF("v"))
    CacheRegistry.cache(b, (1L to 3L).toDF("v"))
    CacheRegistry.clear()
    assert(CacheRegistry.lookup(a).isEmpty && CacheRegistry.lookup(b).isEmpty)
  }

  test("racing threads: thunk runs once, both callers get the one frame, no cache leak") {
    // computeIfAbsent semantics: under a race the thunk evaluates exactly
    // once. (The evaluate-both-discard-loser alternative is wrong here:
    // Spark's CacheManager keys on the LOGICAL PLAN, and racing
    // read-through callers build the same plan — the loser's rollback
    // unpersist would evict the winner's cache entry.) After uncache the
    // session's cached-plan count must return to baseline.
    def cachedPlans: Int = spark.sparkContext.getPersistentRDDs.size
    def awaitBaseline(baseline: Int, what: String): Unit = {
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (cachedPlans > baseline && System.nanoTime < deadline)
        Thread.sleep(50)
      assert(cachedPlans <= baseline, s"$what leaked a cached plan")
    }
    val baseline = cachedPlans
    (1 to 5).foreach { round =>
      val name = freshName(s"race$round")
      val built = new AtomicInteger(0)
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      try {
        val futures = (1 to 2).map { _ =>
          pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
            def call() = {
              start.await()
              CacheRegistry.cache(name, {
                built.incrementAndGet(); (1L to 20L).toDF("v")
              })
            }
          })
        }
        start.countDown()
        val results = futures.map(_.get(60, TimeUnit.SECONDS))
        assert(built.get === 1,
          s"round $round: thunk evaluated ${built.get}x under the race")
        val winner = CacheRegistry.lookup(name).get
        results.foreach(r => assert(r eq winner,
          "every racing caller must receive the registered winner"))
        assert(winner.as[Long].collect().length === 20)
        assert(isPersisted(winner))
      } finally {
        pool.shutdownNow()
        CacheRegistry.uncache(name)
      }
      awaitBaseline(baseline, s"race round $round")
    }
  }
}
