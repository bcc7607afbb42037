package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ⇄ catalyst Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala); extension libraries shim them from inside the
  * sql package — this object is that shim, and the only code in this repo
  * living outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Handle to the persisted RDD behind an (eager) `localCheckpoint()`ed
  * Dataset, so iterative algorithms can release superseded checkpoints by
  * their own handle instead of diffing the global `sc.getPersistentRDDs`
  * registry (which races against concurrent jobs persisting RDDs of their
  * own). `LogicalRDD` is `private[sql]`, hence this lives in the shim.
  */
object CheckpointHandle {
  /** The checkpointed RDD backing `df`, if `df` is the direct result of an
    * eager `localCheckpoint()`/`checkpoint()` call.
    */
  def rddOf(df: DataFrame): Option[RDD[_]] = df.queryExecution.analyzed match {
    case l: LogicalRDD => Some(l.rdd)
    case _ => None
  }

  /** Unpersist the checkpoint backing `df` (no-op for non-checkpoint plans). */
  def release(df: DataFrame): Unit =
    rddOf(df).foreach(_.unpersist(blocking = false))
}
