package graft.plans

import scala.collection.concurrent.TrieMap

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
  private val registry = TrieMap.empty[String, DataFrame]

  /** Read-through: persist and register on first use, serve the cached
    * frame afterwards.
    */
  def cache(name: String, df: => DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    registry.get(name) match {
      case Some(cached) => cached
      case None =>
        // no getOrElseUpdate: TrieMap evaluates the thunk in BOTH racing
        // threads and discards the loser's value — the loser's persist()
        // would stay registered in Spark's CacheManager with no registry
        // entry, unreleasable by uncache/clear for the session lifetime
        val fresh = df.persist(level)
        registry.putIfAbsent(name, fresh) match {
          case Some(winner) => fresh.unpersist(blocking = false); winner
          case None => fresh
        }
    }

  def lookup(name: String): Option[DataFrame] = registry.get(name)

  def uncache(name: String): Unit =
    registry.remove(name).foreach(_.unpersist())

  def clear(): Unit = {
    registry.keys.foreach(uncache)
  }

  def cachedNames: Seq[String] = registry.keys.toSeq.sorted
}
