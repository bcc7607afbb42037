package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Arity, BottomK, DotProduct, EqCount, FrequentItems, LshBuckets, Md5Hash64, VectorSum}

/** Spark extension entry point: registers the engine's native functions at
  * session build time —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — so SQL users get
  * them without any imperative registration call. Every builder
  * arity-checks through [[graft.functions.Arity]] before indexing into
  * its arguments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_dot", "graft_dot(array, array)", 2)(exprs)
        DotProduct(a.head, a(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vec_sum"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_vec_sum", "graft_vec_sum(array)", 1)(exprs)
        VectorSum(a.head).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_lsh_buckets",
          "graft_lsh_buckets(array, planes, nBits)", 3)(exprs)
        LshBuckets(a.head, a(1), Arity.literalInt("graft_lsh_buckets",
          "graft_lsh_buckets(array, planes, nBits)", a(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FrequentItems].getName, "graft_freq_items"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_freq_items", "graft_freq_items(col, k)", 2)(exprs)
        FrequentItems(a.head, Arity.literalInt("graft_freq_items",
          "graft_freq_items(col, k)", a(1))).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bottom_k"),
      new ExpressionInfo(classOf[BottomK].getName, "graft_bottom_k"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_bottom_k", "graft_bottom_k(hash, payload, k)", 3)(exprs)
        BottomK(a.head, a(1), Arity.literalInt("graft_bottom_k",
          "graft_bottom_k(hash, payload, k)", a(2))).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_eq_count"),
      new ExpressionInfo(classOf[EqCount].getName, "graft_eq_count"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_eq_count", "graft_eq_count(array, array)", 2)(exprs)
        EqCount(a.head, a(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(
        classOf[graft.functions.SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_sorted_intersect_count",
          "graft_sorted_intersect_count(sorted_array, sorted_array)", 2)(exprs)
        graft.functions.SortedIntersectCount(a.head, a(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "graft_hash64"),
      (exprs: Seq[Expression]) => {
        val a = Arity.check("graft_hash64", "graft_hash64(string)", 1)(exprs)
        Md5Hash64(a.head)
      }))
    ext.injectResolutionRule(session => graft.plans.ReuseMaterializedRule(session))
  }
}
