package graft.tools

import graft.plans.Materializer

/** Operational entry point for the materialization-cache eviction sweep —
  * the cron/ops twin of the reference cacheserver's in-process capacity
  * fit (`/root/reference/src/orthrus/cache.hh:88-128`), which a shared
  * parquet cache needs as an explicit job because no single long-lived
  * process owns the directory.
  *
  * Usage: `runMain graft.tools.CacheSweep <cacheDir> [maxBytes] [maxAgeDays]`
  * — omitted bounds mean unbounded on that axis. Prints one JSON line for
  * log scraping. Safe against live writers (claim files are skipped) and
  * bounded by entry count, not data volume.
  */
object CacheSweep {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CacheSweep <cacheDir> [maxBytes] [maxAgeDays]")
    val cacheDir = args(0)
    val maxBytes = if (args.length > 1) args(1).toLong else Long.MaxValue
    val maxAgeMs =
      if (args.length > 2) args(2).toLong * 24L * 3600 * 1000 else Long.MaxValue
    val spark = graft.GraftSession.local("graft-cache-sweep", cores = 1)
    try {
      val s = Materializer.sweep(spark, cacheDir, maxBytes, maxAgeMs)
      // JSON-escape the user-supplied path so a quote/backslash/control
      // char can't emit an invalid line for the log scrapers this targets
      val dirJson = cacheDir.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }
      println(s"""{"cache_dir":"$dirJson","scanned":${s.scanned},""" +
        s""""deleted":${s.deleted},"bytes_freed":${s.bytesFreed},""" +
        s""""skipped_claimed":${s.skippedClaimed}}""")
    } finally spark.stop()
  }
}
