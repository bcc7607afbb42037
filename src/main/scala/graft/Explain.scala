package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of the named queries
  * (all queries when none given) against a fixture dir. Used to audit that
  * filters/projections reach the scans, dims broadcast, and shuffles are
  * where we expect — `runMain graft.Explain <sfDir> [q1,q2,...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      // building a query can register release hooks (persisted frames,
      // checkpoints); drain per query like Verify does, or a long explain
      // session accumulates pinned state across hundreds of plans
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      finally plans.ReleaseRegistry.drain()
    }
    spark.stop()
  }
}
