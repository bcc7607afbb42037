package graft

import java.nio.file.Files

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def mortonRef(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches a reference interleave for assorted points") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (7L, 3L), (12345L, 54321L),
      (65535L, 65535L), (40000L, 1L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y), s"z($x,$y)")
    }
  }

  test("zValueSql replays zValue through the SQL engine") {
    val df = Tables.lineitem(spark, sfDir).limit(200)
      .select($"l_partkey", $"l_suppkey",
        Layout.zValue($"l_partkey", $"l_suppkey").as("z_col"))
      .withColumn("z_sql", expr(Layout.zValueSql("l_partkey", "l_suppkey")))
    assert(df.where($"z_col" =!= $"z_sql").count() === 0)
  }

  test("zorderWrite clusters: files own disjoint z-ranges, content round-trips") {
    val dir = Files.createTempDirectory("graft_zorder").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", dir, numFiles = 8)
    val back = spark.read.parquet(dir)
    // content identical
    assert(back.count() === li.count())
    assert(back.exceptAll(li).count() === 0)
    // each file's z-range must not overlap any other file's (range
    // partitioning on z guarantees it; this is the pruning precondition)
    val ranges = back
      .withColumn("f", input_file_name())
      .withColumn("z", Layout.zValue($"l_partkey", $"l_suppkey"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "file z-ranges overlap")
      case _ =>
    }
    assert(ranges.length > 1, "expected multiple files")
  }

  test("zorderWrite never clobbers a user column named _z") {
    val dir = Files.createTempDirectory("graft_zorder_zcol").toString + "/t"
    val df = Seq((1L, 2L, "keep"), (3L, 4L, "also")).toDF("x", "y", "_z")
    Layout.zorderWrite(df, "x", "y", dir, numFiles = 1)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet === Set("x", "y", "_z"))
    assert(back.select("_z").as[String].collect().toSet === Set("keep", "also"))
  }

  test("zValue rejects bit widths that reach the long sign bit") {
    intercept[IllegalArgumentException] { Layout.zValue(lit(1L), lit(1L), 32) }
    intercept[IllegalArgumentException] { Layout.zValueSql("x", "y", 0) }
  }

  test("zBoxQuery plan: box predicate and column pruning reach the parquet scan") {
    val plan = Layout.zBoxQuery(Tables.lineitem(spark, sfDir))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_partkey,100"),
      s"box filter not pushed to scan:\n$plan")
    assert(!plan.contains("l_orderkey"), "unused columns should be pruned")
  }

  test("zone-map pruned read skips files and matches the full-scan result") {
    val dir = Files.createTempDirectory("graft_zonemap").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    // cluster on partkey so partkey zone maps are tight
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", dir, numFiles = 8)
    val stats = Layout.fileStats(spark, dir, Seq("l_partkey", "l_suppkey"))
    val nFiles = stats.count()
    assert(nFiles > 1)
    val (lo, hi) = (100L, 500L)
    val survivors = stats
      .where($"l_partkey_max" >= lo && $"l_partkey_min" <= hi).count()
    assert(survivors < nFiles, "selective predicate must skip some files")
    val pruned = Layout.readPruned(spark, dir, stats, "l_partkey", lo, hi)
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().sorted.toSeq
    val full = spark.read.parquet(dir)
      .where($"l_partkey".between(lo, hi))
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(pruned === full)
    assert(pruned.nonEmpty)
  }
}
