package graft

import graft.plans.Materializer
import graft.plans.Materializer.CacheKey

/** Child process for MaterializerSpec's cross-process race test: elects
  * itself writer for a shared cache key, HOLDS the claim for `holdMs`
  * mid-compute (the in-flight window the parent races a sweep and two
  * readers into), then commits and exits 0. Run with the test classpath:
  * `java -cp <cp> graft.MaterializerRaceChild <cacheDir> <holdMs>`.
  */
object MaterializerRaceChild {
  def main(args: Array[String]): Unit = {
    val cacheDir = args(0)
    val holdMs = args(1).toLong
    val spark = GraftSession.local("graft-race-child", cores = 2)
    import spark.implicits._
    try {
      Materializer.lookupOrCompute(spark, cacheDir,
        CacheKey("race", Map("x" -> "1"), Seq.empty)) {
        Thread.sleep(holdMs)
        Seq((1L, "winner")).toDF("id", "v")
      }.count()
    } finally spark.stop()
  }
}
