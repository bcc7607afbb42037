package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for interpreted / decode-heavy row-local stages.
  *
  * A local parquet read often arrives as a handful of splits (the bench
  * fixtures are ONE file per table), so a `mapPartitions` codec pass or an
  * interpreted higher-order transform placed directly on the scan runs on
  * one or two cores while the other thirty idle — the "input skew / one
  * unsplittable file" failure mode (optimization guide §2.5). The fix is
  * the guide's: repartition immediately after the read, but ONLY when the
  * input is narrower than the session's parallelism — a many-split cluster
  * input is already distributed and keeps its layout (forcing it to
  * exactly defaultParallelism would shuffle the whole corpus and could
  * SHRINK its parallelism at 100 TB).
  */
private[graft] object Spread {

  /** Spread an interpreted per-row transform across cores WITHOUT ever
    * coalescing a wider input: repartition up to defaultParallelism only
    * when the incoming frame has FEWER partitions.
    */
  def narrow(df: DataFrame): DataFrame = {
    // streaming frames pass through untouched: the partition probe below
    // (`df.rdd`) is a batch-only action — it throws AnalysisException on a
    // streaming source — and a micro-batch's parallelism is the source's
    // rate/partitioning concern, not a scan-split repair. (Caught by the
    // DCT stream-twin parity spec when the width-gated decode spread first
    // landed on the shared batch/stream decode path.)
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    // probe the partition count ONLY for scan-shaped plans: `df.rdd` on a
    // plan containing exchanges would, under AQE, execute those shuffle
    // stages at probe time just to read getNumPartitions — and they run
    // AGAIN at the real action (no cross-query stage reuse). A frame that
    // already shuffled is already spread at shuffle-partition width, so
    // it passes through untouched without any probe.
    import org.apache.spark.sql.catalyst.plans.{logical => lp}
    val shuffled = df.queryExecution.analyzed.collectFirst {
      case _: lp.Join | _: lp.Aggregate | _: lp.Window | _: lp.Distinct |
           _: lp.Deduplicate | _: lp.RepartitionOperation | _: lp.Sort => true
    }.nonEmpty
    if (shuffled) df
    else if (df.rdd.getNumPartitions < par) df.repartition(par)
    else df
  }
}
