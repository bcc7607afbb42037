package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token count: the number of symbols left after applying the
  * merge table (in rank order) to a word's character symbolization —
  * semantically identical to [[graft.operators.TextOps]]'s flush-append
  * list fold (last symbol == lhs and current == rhs → merge), but one
  * JVM method call per word instead of `nMerges` nested interpreted
  * higher-order folds with per-element string churn. The merge table is
  * tokenizer-sized configuration and rides the expression as a literal
  * (like [[FrequentItems]]' k), not a per-row input.
  *
  * Evaluation is `CodegenFallback` — the loop is data-dependent string
  * work that generated code wouldn't improve, and the expression runs on
  * the vocabulary-bounded distinct-word table, never the raw corpus.
  * Code points are handled as full units (the HOF path's `substr`
  * semantics), so supplementary-plane characters symbolize identically.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // initial symbolization: one symbol per code point
    var syms = new Array[String](s.codePointCount(0, s.length))
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = s.substring(i, i + w)
      n += 1
      i += w
    }
    var len = n
    merges.foreach { case (l, r) =>
      // canonical greedy left-to-right pass: merge whenever the previous
      // surviving symbol is l and the current one is r (a just-merged
      // l+r can never equal l again, so one pass is exact)
      var out = 0
      var k = 0
      while (k < len) {
        if (out > 0 && syms(out - 1) == l && syms(k) == r)
          syms(out - 1) = l + r
        else {
          syms(out) = syms(k)
          out += 1
        }
        k += 1
      }
      len = out
    }
    len.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** BPE token count of `word` under `merges` (rank order) — see
    * [[BpeTokenCount]].
    */
  def bpeTokenCount(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(word), merges))
}
