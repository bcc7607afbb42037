package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned parquet table with concurrent-writer-safe commits:
  * every write lands in a fresh `v=N` snapshot directory that the writer
  * first CLAIMS via create-fails-if-exists (colliding writers bump to the
  * next free version and retry), and the snapshot becomes visible only
  * when a `_COMMITTED` marker lands inside it after all data files are
  * closed. Readers resolve "latest" by scanning for the highest marked
  * directory — there is no shared mutable pointer at all, so there is no
  * pointer-swap gap to race through and no way for a slow writer to
  * regress the table: each writer touches only its own claimed directory.
  * Old snapshots stay readable (time travel) until vacuumed.
  *
  * This is the smallest useful slice of a transactional table format,
  * built on nothing but a Hadoop `FileSystem`: the reference's
  * append-only multi-writer output files
  * (`/root/reference/src/file_distributor/fileserver.hh:3057-3086`) give
  * no atomicity or history at all; a 100 TB pipeline needs both (a failed
  * CDC apply must not corrupt the serving table, and training runs need
  * to pin the exact snapshot they read). At cluster scale the same
  * protocol holds on any FS with atomic exclusive-create; on object
  * stores swap the claim for a conditional put. Resolving latest is one
  * directory listing plus one marker probe per snapshot — bounded
  * metadata, kept small by [[vacuum]].
  *
  * Layout: `<root>/v=<N>/{_CLAIM,_COMMITTED,...parquet}`. A directory
  * with a claim but no marker is a writer's in-flight (or abandoned)
  * snapshot — invisible to readers.
  */
object Versioned {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def claimPath(root: String, v: Long) = new Path(root, s"v=$v/_CLAIM")

  private def markerPath(root: String, v: Long) = new Path(root, s"v=$v/_COMMITTED")

  /** Current committed version, if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** All committed snapshot versions on disk, ascending — a snapshot is
    * committed iff its `_COMMITTED` marker exists, so readers enumerating
    * versions for time travel never see a torn snapshot.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val r = new Path(root)
    if (!fs.exists(r)) Seq.empty
    else
      fs.listStatus(r).toSeq
        .map(_.getPath.getName)
        // strict v=<digits> match: a stray foreign entry like `v=3.bak`
        // must not brick every read/commit with NumberFormatException
        .collect { case n if n.matches("v=\\d+") => n.stripPrefix("v=").toLong }
        .filter(v => fs.exists(markerPath(root, v)))
        .sorted
  }

  /** Atomic exclusive claim. HDFS/object-store `create(overwrite=false)`
    * is atomic, but Hadoop's local ChecksumFileSystem implements it as a
    * non-atomic exists-then-open — so on the `file` scheme the claim goes
    * through NIO `Files.createFile`, which is O_EXCL at the OS level.
    * Throws (a subclass of) IOException when the claim is already held.
    */
  private def claimExclusive(fs: org.apache.hadoop.fs.FileSystem, p: Path): Unit =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      java.nio.file.Files.createFile(local)
      ()
    } else fs.create(p, false).close()

  /** Commit `df` as the next snapshot and return its version number.
    * Concurrency: the claim file is created via [[claimExclusive]] —
    * atomic exclusive-create on every supported scheme — so exactly one
    * writer owns each version number; losers bump and retry on the next
    * number. Data is written into the claimed directory (append mode, so
    * the claim survives) and the `_COMMITTED` marker goes last, making
    * the snapshot visible only once complete. Two concurrent committers
    * both succeed with distinct, monotonically increasing versions and
    * neither's data is orphaned.
    *
    * `expectedParent` turns the commit into a compare-and-swap for
    * read-merge-commit cycles: the commit succeeds only if the version it
    * claims is exactly `expectedParent + 1` — i.e. no other writer
    * committed (or is mid-commit on a claimed number) since the caller
    * read its base snapshot. On conflict the claim is released and
    * `ConcurrentModificationException` is thrown; the caller re-reads
    * latest, re-merges, and retries. Without it, two concurrent
    * read-merge-commit writers are last-writer-wins: both snapshots stay
    * on disk, but the earlier writer's merged changes silently vanish
    * from "latest" (a classic lost update).
    */
  def commit(df: DataFrame, root: String, expectedParent: Option[Long] = None): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    var next = latestVersion(spark, root).getOrElse(-1L) + 1L
    var attempts = 0
    var claimed = false
    while (!claimed) {
      try {
        claimExclusive(fs, claimPath(root, next))
        claimed = true
      } catch {
        case e: java.io.IOException =>
          // lost the claim race (or a crashed writer holds this number):
          // move to the next free version; anything else is a real error
          attempts += 1
          if (!fs.exists(claimPath(root, next)) || attempts > 10000) throw e
          next += 1
      }
    }
    expectedParent.foreach { p =>
      if (next != p + 1L) {
        // another writer claimed/committed since our base read; release
        // our claim (we own the directory, nothing visible references it)
        fs.delete(new Path(root, s"v=$next"), true)
        throw new java.util.ConcurrentModificationException(
          s"commit to $root expected parent v=$p but claimed v=$next; re-read and retry")
      }
    }
    df.write.mode("append").parquet(s"$root/v=$next")
    fs.create(markerPath(root, next), true).close()
    next
  }

  /** Read the latest snapshot, or a pinned `version` for time travel.
    * Pinned reads require a committed snapshot — a claimed-but-unmarked
    * directory is in-flight and must not be readable.
    */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed version under $root"))
    if (!fsOf(spark, root).exists(markerPath(root, v)))
      throw new java.util.NoSuchElementException(s"version $v not committed under $root")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop all committed snapshots older than `keep` versions behind
    * latest. Returns the removed versions. Claimed-but-unmarked
    * directories are deliberately left alone — a low-numbered claim may
    * belong to a slow writer still mid-write, and deleting under it would
    * tear its eventual commit; abandoned claims cost only their partial
    * bytes and are safe to remove manually once provably dead.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val fs = fsOf(spark, root)
    val latest = latestVersion(spark, root).getOrElse(return Seq.empty)
    val dead = versions(spark, root).filter(_ <= latest - keep)
    dead.foreach(v => fs.delete(new Path(root, s"v=$v"), true))
    dead
  }
}
