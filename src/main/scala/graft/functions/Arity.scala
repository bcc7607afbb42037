package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared arity validation for SQL function builders — both the
  * extension-injected ([[graft.GraftExtensions]]) and imperatively
  * registered (`register(spark)`) paths run every call through this, so a
  * SQL call with the wrong argument count gets a proper AnalysisException
  * naming the expected signature instead of an opaque
  * IndexOutOfBoundsException from `exprs(1)`.
  */
object Arity {
  def check(name: String, signature: String, n: Int)(
      exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> s"expected $signature"))
    exprs
  }
}
