package graft
import org.apache.spark.sql.SparkSession
/** One-off diagnostic: per query, does the FINAL adaptive plan scan the
  * same input path more than once without any exchange/stage reuse? */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        try df.collect()
        // drain operator-pinned state per query (same contract as
        // Verify/Bench) — the audit collects every query in one JVM
        finally plans.ReleaseRegistry.drain()
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        val paths = "InMemoryFileIndex\\(\\d+ paths\\)\\[([^\\]]+)\\]".r
          .findAllMatchIn(plan).map(_.group(1)).toSeq
        val dupPaths = paths.groupBy(identity).filter(_._2.length > 1)
        val reused = "ReusedExchange".r.findAllIn(plan).length +
          "ReusedQueryStage".r.findAllIn(plan).length
        if (dupPaths.nonEmpty && reused == 0)
          println(s"AUDIT|$name|dup=${dupPaths.map { case (p, v) =>
            p.split('/').last + "x" + v.length }.mkString(",")}")
        // checkpoint-backed queries (iterative loops) execute their source
        // scans eagerly at plan-BUILD time; the final plan reads only
        // checkpoint/cached blocks, so the path extraction above
        // under-reports which tables they touch — flag, don't mislead
        if (plan.contains("ExistingRDD"))
          println(s"AUDIT|$name|note=checkpoint-backed, scan paths under-reported")
      } catch { case e: Throwable => println(s"AUDIT|$name|ERR ${e.getClass.getSimpleName}") }
    }
    println("AUDIT|done")
    spark.stop()
  }
}
