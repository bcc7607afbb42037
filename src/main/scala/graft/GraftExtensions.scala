package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BottomK, DotProduct, EqCount, FrequentItems, LshBuckets, Md5Hash64, VectorSum}

/** Spark extension entry point: registers the engine's native functions at
  * session build time —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — so SQL users get
  * them without any imperative registration call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vec_sum"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorSum(exprs.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LshBuckets(exprs.head, exprs(1),
          exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FrequentItems].getName, "graft_freq_items"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FrequentItems(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_bottom_k"),
      new ExpressionInfo(classOf[BottomK].getName, "graft_bottom_k"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BottomK(exprs.head, exprs(1),
          exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_eq_count"),
      new ExpressionInfo(classOf[EqCount].getName, "graft_eq_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        EqCount(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "graft_hash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Hash64(exprs.head)))
    ext.injectResolutionRule(session => graft.plans.ReuseMaterializedRule(session))
  }
}
