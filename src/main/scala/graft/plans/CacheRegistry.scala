package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Named in-session cache registry — the Spark-side equivalent of the
  * reference's raw-input semantic cache (Orthrus: LRU block cache of file
  * contents, 1 GB/node, `/root/reference/src/orthrus/cache.hh:45-128`,
  * read-through populate `src/file_distributor/fileserver.hh:371-554`).
  *
  * Spark's unified memory manager + `CacheManager` plan-fragment reuse
  * already provide the mechanism (LRU block eviction, MEMORY_AND_DISK
  * spill, automatic reuse of any cached plan subtree); this registry just
  * adds the reference's by-name lookup surface and bulk invalidation.
  */
object CacheRegistry {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  /** Read-through: persist and register on first use, serve the cached
    * frame afterwards.
    *
    * Population is ATOMIC per name (`computeIfAbsent`): under a race the
    * thunk evaluates in exactly one thread and the others block for its
    * result. The evaluate-both-discard-loser alternative
    * (`putIfAbsent`) is subtly wrong here because Spark's `CacheManager`
    * keys entries by LOGICAL PLAN, not by Dataset identity — racing
    * read-through callers build the *same* plan, so the loser's rollback
    * `unpersist` would evict the winner's just-registered cache entry
    * (correctness survives via lineage, but the cache silently never
    * takes). The per-name lock costs nothing: `persist` is lazy
    * registration, no job runs inside the critical section.
    */
  def cache(name: String, df: => DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    registry.computeIfAbsent(name, _ => df.persist(level))

  def lookup(name: String): Option[DataFrame] = Option(registry.get(name))

  def uncache(name: String): Unit =
    Option(registry.remove(name)).foreach(_.unpersist())

  def clear(): Unit = {
    import scala.jdk.CollectionConverters._
    registry.keySet.asScala.toSeq.foreach(uncache)
  }

  def cachedNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet.asScala.toSeq.sorted
  }
}
