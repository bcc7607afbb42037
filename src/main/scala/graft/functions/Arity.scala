package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared argument validation for SQL function builders — both the
  * extension-injected ([[graft.GraftExtensions]]) and imperatively
  * registered (`register(spark)`) paths run every call through this, so a
  * SQL call with the wrong argument count or a non-literal scalar gets a
  * proper exception naming the expected signature instead of an opaque
  * IndexOutOfBoundsException / NullPointerException from `exprs(1)` or
  * `eval()`.
  */
object Arity {
  def check(name: String, signature: String, n: Int)(
      exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          // the signature rides with the function name so the rendered
          // message shows it as a hint; docroot stays a real docs root
          // (the template splices it into a documentation URL)
          "functionName" -> s"`$name` (expected $signature)",
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    exprs
  }

  /** Extract a scalar argument that must be a foldable, non-null integer
    * (k, nBits, ...). A column reference or NULL literal here would make a
    * bare `eval()` throw an unbound-attribute error or NPE at plan time —
    * this names the function and expected signature instead.
    */
  def literalInt(name: String, signature: String, e: Expression): Int =
    (if (e.foldable) e.eval() else null) match {
      case n: Number => n.intValue()
      case _ => throw new IllegalArgumentException(
        s"$name: scalar argument must be a non-null integer literal — expected $signature")
    }
}
