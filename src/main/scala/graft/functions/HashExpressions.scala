package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static digest helper shared by interpreted eval and generated code.
  * A standalone object (no companion class) so Scala emits a plain class
  * with static forwarders that generated Java can call directly.
  */
object PortableMd5 {
  private val md = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** The 60-bit extraction from a raw md5 digest — the first 15 hex chars
    * are the first 7.5 digest bytes, i.e. the big-endian first-8-byte
    * word shifted right by one nibble. Exposed for callers that build the
    * digest incrementally (e.g. shared-prefix hashing).
    */
  def fromDigest(dig: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** First 60 bits of md5(bytes) as a non-negative long — bit-identical
    * to `conv(substr(md5(s), 1, 15), 16, 10)`.
    */
  def hash64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    fromDigest(d.digest(bytes))
  }
}

/** Native engine-portable 60-bit md5 hash of a string — the hot path of
  * every hash-dependent operator (minhash signatures evaluate it
  * #hashes × #shingles times per document). Produces exactly the value of
  * the composed formulation `conv(substring(md5(s), 1, 15), 16, 10)
  * .cast(long)` but goes digest-bytes → long directly, skipping the
  * 32-char hex string materialization, the substring copy and the
  * base-16 string parse (three string allocations per hash).
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_64"

  override def nullSafeEval(input: Any): Any =
    PortableMd5.hash64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableMd5.hash64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(new Md5Hash64(ColumnBridge.expression(c)))
}
