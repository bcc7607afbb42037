package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * The reference places whole FILES by name hash (`h(filename) % N`,
  * `/root/reference/src/file_distributor/fd_core.cc:41-48`) — content
  * never influences placement, so every query scans everything. At 100 TB
  * the win is the opposite policy: cluster rows so each file covers a
  * small rectangle of the predicate space, and parquet min/max stats
  * (row-group and file level) let selective scans skip most of the data.
  *
  * Single-column clustering is just `repartitionByRange + sortWithin
  * Partitions`; for predicates over TWO dimensions a linear sort ruins
  * the second column's locality, so the standard answer is a Z-order
  * (Morton) curve: interleave the bits of both keys and range-partition
  * on the interleaved value. Every z-contiguous file then spans a bounded
  * box in (x, y), and both `x`-only and `y`-only predicates prune.
  *
  * The z-value is a pure column expression (a fold of shifts and ORs —
  * whole-stage codegen, no UDF), and md5-free: bit interleaving is
  * trivially replayable in any engine with integer bit ops.
  */
object Layout {

  /** Morton z-value of two non-negative ints using `bits` bits each:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    *
    * Bits above `bits` are DISCARDED — values ≥ 2^bits alias onto the low
    * range and the bounded-box clustering contract silently degrades, so
    * pick `bits` ≥ log2(max value) (e.g. 21 covers 2M part keys; the
    * default 16 covers 65k). Capped at 31 so the top interleaved bit
    * (2·30+1 = 61) stays clear of the long sign bit.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zValue bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as ANSI SQL (for oracles / other engines). The
    * 64-bit cast mirrors [[zValue]]'s `cast("long")`: without it a 32-bit
    * column overflows the high shifts (DuckDB raises, Spark wraps).
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"zValueSql bits must be in [1, 31], got $bits")
    val (xl, yl) = (s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")
    (0 until bits).flatMap { i =>
      Seq(s"((($xl >> $i) & 1) << ${2 * i})", s"((($yl >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
  }

  /** Rewrite `df` clustered on the z-order of (xCol, yCol): range-
    * partition on the z-value (each output file owns a contiguous z
    * range = a bounded (x,y) box), sort within partitions so row groups
    * nest the same way, and drop the helper column before writing.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int = 16, bits: Int = 16): Unit = {
    // collision-checked helper name: withColumn REPLACES an existing
    // column, so a fixed "_z" would silently destroy a user column
    val zCol = (Iterator.single("_z") ++ Iterator.from(1).map(i => s"_z$i"))
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zCol, zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file zone map: min/max of each listed column for every file of a
    * parquet dataset — the file-skipping index that makes clustering pay.
    * One scan computes all stats; persist the result as a table and
    * refresh on write. (Parquet keeps row-group stats internally, but
    * those only prune AFTER a task opens the footer; a zone-map table
    * prunes the FILE LIST at plan time, which at 100 TB is the difference
    * between launching 10 tasks and 100,000.)
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    df.select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read only the files whose zone-map interval for `c` intersects
    * [lo, hi], with the exact predicate re-applied on the survivors.
    * The driver materializes just the surviving FILE LIST (bounded by
    * file count — the same metadata any planner holds), never data rows.
    */
  def readPruned(spark: org.apache.spark.sql.SparkSession, path: String,
      stats: DataFrame, c: String, lo: Long, hi: Long): DataFrame = {
    val files = stats
      .where(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select("file").collect().map(_.getString(0))
    val full = spark.read.parquet(path)
    if (files.isEmpty) full.where(lit(false))
    else spark.read.schema(full.schema).parquet(files.toIndexedSeq: _*)
      .where(col(c).between(lo, hi))
  }

  /** Headline query: per-supplier totals of lineitem rows inside a
    * (partkey, suppkey) box, keyed by the z-value so the clustering
    * column itself is oracle-checked. Engine-side this is the predicate
    * shape a z-ordered table would serve from a handful of files.
    */
  def zBoxQuery(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_partkey").between(100, 2000) &&
        col("l_suppkey").between(2, 8))
      .select(col("l_suppkey"),
        zValue(col("l_partkey"), col("l_suppkey")).as("z"),
        col("l_quantity"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"),
        min("z").as("z_min"),
        max("z").as("z_max"),
        round(sum("l_quantity"), 2).as("sum_qty"))
}
