package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned parquet table: every write lands in a fresh
  * `v=N` snapshot directory and becomes visible only when a one-line
  * pointer file is atomically renamed into place — readers either see the
  * previous complete snapshot or the new complete snapshot, never a
  * half-written directory. Old snapshots stay readable (time travel)
  * until vacuumed.
  *
  * This is the smallest useful slice of a transactional table format,
  * built on nothing but a Hadoop `FileSystem`: the reference's
  * append-only multi-writer output files
  * (`/root/reference/src/file_distributor/fileserver.hh:3057-3086`) give
  * no atomicity or history at all; a 100 TB pipeline needs both (a failed
  * CDC apply must not corrupt the serving table, and training runs need
  * to pin the exact snapshot they read). At cluster scale the same
  * protocol holds on any FS with atomic rename; on object stores swap the
  * pointer rename for a conditional put.
  *
  * Layout: `<root>/v=<N>/...parquet`, `<root>/_latest` containing `N`.
  */
object Versioned {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "_latest")

  /** Current committed version, if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val p = pointer(root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** All committed snapshot versions on disk, ascending. Directories above
    * the committed pointer are a writer's in-flight (or abandoned) data —
    * invisible until its pointer swap — so they are excluded: readers
    * enumerating versions for time travel must never see a torn snapshot.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val r = new Path(root)
    if (!fs.exists(r)) Seq.empty
    else {
      val committed = latestVersion(spark, root).getOrElse(-1L)
      fs.listStatus(r).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .filter(_ <= committed)
        .sorted
    }
  }

  /** Commit `df` as the next snapshot and return its version number.
    * Write order guarantees atomic visibility: data first (invisible —
    * no pointer references it), then the pointer via write-temp +
    * atomic rename.
    */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    val next = latestVersion(spark, root).getOrElse(-1L) + 1L
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    val tmp = new Path(root, s"_latest.tmp.$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    // rename onto the pointer (delete-then-rename: HDFS rename won't
    // overwrite; the delete+rename pair is the standard pointer swap and
    // readers retry through the sub-millisecond gap)
    fs.delete(pointer(root), false)
    if (!fs.rename(tmp, pointer(root)))
      throw new java.io.IOException(s"pointer swap failed for $root v=$next")
    next
  }

  /** Read the latest snapshot, or a pinned `version` for time travel. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed version under $root"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop all snapshots older than `keep` versions behind latest.
    * Returns the removed versions.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val fs = fsOf(spark, root)
    val latest = latestVersion(spark, root).getOrElse(return Seq.empty)
    val dead = versions(spark, root).filter(_ <= latest - keep)
    dead.foreach(v => fs.delete(new Path(root, s"v=$v"), true))
    dead
  }
}
