package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

/** Source/sink + catalog surface.
  *
  * Covers the reference's scan/ingest/catalog operators (SURVEY.md §2.1
  * S1-S5): newline-text scan (`/root/reference/src/common/
  * fileclient.hh:271-344` + `src/file_distributor/fileserver.hh:344-741`),
  * `mrput` ingest (`src/bin/mrput:1-49`, placement `src/file_distributor/
  * fd_core.cc:30-53`) and the `mrls`/`mrcat`/`mrrm` catalog CLIs
  * (`src/bin/mrls:1-36`, `src/file_distributor/mrcat_core.cc:11-40`).
  *
  * The DHT placement (`h(name) % N`) is intentionally NOT reimplemented:
  * file placement belongs to the filesystem (HDFS/S3/local), and Spark's
  * locality-aware scheduling replaces hash-owner routing. These helpers are
  * thin Hadoop-FS wrappers so the same API works on any storage the cluster
  * mounts — plus the typed columnar readers that are the engine's native
  * surface.
  */
object Sources {

  // ── scans (S1-S3): newline text for parity, columnar for native use ──

  def readText(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** Multi-input bag union: the reference unions every `add_inputpath` call
    * into one map stage (`/root/reference/src/mapreduce/dht/
    * mapreduce.hh:760-774`). Spark's text source takes the paths natively —
    * one scan node, no union operator in the plan.
    */
  def readText(spark: SparkSession, first: String, second: String, rest: String*): Dataset[String] =
    spark.read.textFile(first +: second +: rest: _*)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ── sinks (R2): append-only text / columnar ──

  def writeText(ds: Dataset[String], path: String, mode: SaveMode = SaveMode.Append): Unit =
    ds.write.mode(mode).text(path)

  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed + sorted managed table: rows are hash-bucketed on the join
    * key at write time, so equi-joins between tables bucketed the same way
    * read co-located buckets and skip the shuffle (and with `sortBy`, the
    * sort) entirely — the Spark-native form of the reference's
    * "shuffle-skipping" map-side placement (`/root/reference/src/
    * file_distributor/idistributor.hh:77-127`: pairs pushed at map time to
    * `h(key)%N` so reducers read locally).
    */
  def writeBucketedTable(df: DataFrame, table: String, numBuckets: Int,
      bucketCol: String, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetMB`-sized files. The operational companion to append-heavy
    * sinks (the reference's append-only Owrite model and any streaming
    * sink both fragment over time; scan cost at 100 TB is dominated by
    * file count if left unchecked).
    */
  def compact(spark: SparkSession, dir: String, targetMB: Int = 128): Long =
    compactWithHook(spark, dir, targetMB, () => ())

  /** [[compact]] with a test seam invoked after the rewrite, before the
    * swap — lets specs inject a concurrent append into the window the
    * rewrite leaves open.
    */
  private[graft] def compactWithHook(spark: SparkSession, dir: String,
      targetMB: Int, afterRewrite: () => Unit): Long = {
    val path = new Path(dir)
    val fileSys = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def isData(name: String) = !name.startsWith("_") && !name.startsWith(".")
    // snapshot the EXACT data files being compacted: anything a concurrent
    // writer appends after this listing is outside the rewrite and must
    // survive the swap (recovered below), never silently deleted with the
    // originals. (Reading the directory instead of the list would race the
    // same way — the scan's file listing is captured at DataFrame creation.)
    val snapshot = fileSys.listStatus(path).filter(_.isFile)
      .filter(s => isData(s.getPath.getName))
    if (snapshot.isEmpty) return 0L
    val bytes = snapshot.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMB.toLong << 20)).toInt)
    val tmp = new Path(dir + "._compact_tmp")
    spark.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    afterRewrite()
    // swap via rename-aside so a crash between steps never loses the data:
    // dir -> dir._old, tmp -> dir, then drop dir._old; on any failed rename
    // restore the original and abort. (Plain delete-then-rename would leave
    // a window with no data at `dir`, and rename is non-atomic on e.g. S3A.)
    val old = new Path(dir + "._compact_old")
    if (fileSys.exists(old)) fileSys.delete(old, true)
    if (!fileSys.rename(path, old)) {
      fileSys.delete(tmp, true)
      throw new java.io.IOException(s"compact: could not move $dir aside")
    }
    if (!fileSys.rename(tmp, path)) {
      fileSys.rename(old, path) // restore
      fileSys.delete(tmp, true)
      throw new java.io.IOException(s"compact: could not move compacted data into $dir")
    }
    // recover concurrent appends: data files that landed after the snapshot
    // listing were moved aside with the originals — carry them into the
    // compacted directory instead of deleting them with `old`
    val snapNames = snapshot.map(_.getPath.getName).toSet
    fileSys.listStatus(old).filter(_.isFile).foreach { s =>
      val n = s.getPath.getName
      if (isData(n) && !snapNames.contains(n)) fileSys.rename(s.getPath, new Path(path, n))
    }
    fileSys.delete(old, true)
    nFiles.toLong
  }

  // ── catalog ops (S4-S5): put / ls / cat / rm on any Hadoop FS ──

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `mrput` parity: copy a local file into engine storage. */
  def put(spark: SparkSession, localFile: String, destDir: String): Unit = {
    val dst = new Path(destDir, new Path(localFile).getName)
    fs(spark, destDir).copyFromLocalFile(new Path(localFile), dst)
  }

  /** `mrls` parity: list files under a storage path. */
  def ls(spark: SparkSession, dir: String): Seq[FileStatus] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (f.exists(p)) f.listStatus(p).toSeq.sortBy(_.getPath.toString) else Nil
  }

  /** `mrcat` parity: stream a text file's lines (driver-side utility; use
    * [[readText]] for distributed reads).
    */
  def cat(spark: SparkSession, path: String): Iterator[String] = {
    val src = scala.io.Source.fromInputStream(
      fs(spark, path).open(new Path(path)), "UTF-8")
    val lines = src.getLines()
    // close the underlying stream on exhaustion — getLines alone leaks the
    // FS handle even when the caller drains the iterator
    new Iterator[String] {
      def hasNext: Boolean = {
        val h = lines.hasNext
        if (!h) src.close()
        h
      }
      def next(): String = lines.next()
    }
  }

  /** `mrrm` parity: delete a file or directory tree. */
  def rm(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)

  /** `mrget` parity (`/root/reference/src/bin/mrget`): copy a file from
    * engine storage to the local filesystem. Returns the local path.
    */
  def get(spark: SparkSession, remotePath: String, localDir: String): String = {
    val dst = new Path(localDir, new Path(remotePath).getName)
    fs(spark, remotePath).copyToLocalFile(new Path(remotePath), dst)
    dst.toString
  }

  /** `mrclear` parity (`/root/reference/src/bin/mrclear_core`): delete every
    * entry under a storage namespace, keeping the namespace directory
    * itself. Returns the number of entries removed.
    */
  def clear(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) 0
    else {
      val children = f.listStatus(p)
      children.foreach(c => f.delete(c.getPath, true))
      children.length
    }
  }
}
