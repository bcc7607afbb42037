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

/** Native unigram-LM Viterbi segmentation (Kudo 2018, the SentencePiece
  * unigram default): split a word into the vocabulary pieces maximizing
  * the summed piece log-probabilities, with log-probs quantized to
  * integer MICRO-NATS (`round(ln(p)·10⁶)`) so the argmax — and therefore
  * the whole EM trainer built on it — replays exactly in an external SQL
  * engine. Ties on total score break toward the LONGER piece at each DP
  * cell (the same `ORDER BY score DESC, length(piece) DESC` rule the
  * oracle's unrolled DP uses), which makes the segmentation a pure
  * function of (word, vocab) with no float comparisons anywhere.
  *
  * The vocab rides the expression as tokenizer-sized literal
  * configuration (like [[BpeTokenCount]]'s merge table) and evaluation
  * is `CodegenFallback` over the vocabulary-bounded distinct-word table
  * — one JVM DP per unique word, never per corpus token. Code points
  * are full units, so piece lengths agree with SQL `length()`.
  *
  * A single character absent from the vocab (impossible when the vocab
  * was seeded from this corpus — seeding keeps every observed char)
  * falls back to a large penalty rather than failing, so the DP is
  * total on any input.
  */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
    maxPieceLen: Int) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  private val UnkLp = -100000000L // unreachable-char safety net

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code-point boundaries: offs(k) = char offset of the k-th code point
    val n = s.codePointCount(0, s.length)
    val offs = new Array[Int](n + 1)
    var i = 0
    var k = 0
    while (i < s.length) {
      offs(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    offs(n) = s.length
    val best = Array.fill(n + 1)(Long.MinValue)
    best(0) = 0L
    val from = new Array[Int](n + 1)
    val pieceAt = new Array[String](n + 1)
    var j = 1
    while (j <= n) {
      // longest candidate first + strictly-greater update == the
      // score-then-length tie-break
      var l = math.min(maxPieceLen, j)
      while (l >= 1) {
        val i0 = j - l
        if (best(i0) != Long.MinValue) {
          val piece = s.substring(offs(i0), offs(j))
          val lp = scores.get(piece)
          val cand =
            if (lp != null) best(i0) + lp.longValue()
            else if (l == 1) best(i0) + UnkLp
            else Long.MinValue
          if (cand != Long.MinValue && cand > best(j)) {
            best(j) = cand
            from(j) = i0
            pieceAt(j) = piece
          }
        }
        l -= 1
      }
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var p = n
    while (p > 0) {
      out += UTF8String.fromString(pieceAt(p))
      p = from(p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.reverseIterator.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native greedy longest-match-first segmentation (the WordPiece
  * inference rule — Devlin et al. 2019, the tokenizer shape
  * BERT/T5-lineage pipelines run at encode time): at each position take
  * the LONGEST vocabulary piece that prefixes the remainder; if no piece
  * (not even a single character) matches, the WHOLE word collapses to
  * one `[UNK]` token — canonical WordPiece failure semantics. No scores
  * anywhere, so the segmentation is a pure function of (word, vocab
  * set) and an external SQL engine replays it with an unrolled
  * advance-by-longest-match chain (at most one step per character).
  *
  * Contrast with [[UnigramSegment]]: same vocab, different rule —
  * greedy local longest-match vs global Viterbi argmax. Both ride the
  * vocabulary-bounded distinct-word table as `CodegenFallback`
  * expressions with the vocab as tokenizer-sized literal configuration.
  * Code points are full units, so piece lengths agree with SQL
  * `length()`.
  */
case class WordPieceSegment(child: Expression, vocab: Seq[String],
    maxPieceLen: Int) extends UnaryExpression with CodegenFallback {

  // fail LOUD on vocab pieces the matcher could never reach: the greedy
  // longest-match scan caps candidate length at maxPieceLen, so a longer
  // piece would silently never match here while an external replay that
  // joins on pieces of any length WOULD — a latent cross-engine
  // divergence if the public API is ever fed an external vocab (the
  // unigram-trained vocab caps pieces at UniPieceLen, well under).
  require(vocab.forall(v => v.codePointCount(0, v.length) <= maxPieceLen),
    s"WordPieceSegment: vocab contains pieces longer than maxPieceLen=" +
      s"$maxPieceLen code points, which the greedy matcher can never " +
      "match — raise maxPieceLen or filter the vocab explicitly")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_segment"

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code-point boundaries, as in [[UnigramSegment]]
    val n = s.codePointCount(0, s.length)
    val offs = new Array[Int](n + 1)
    var i = 0
    var k = 0
    while (i < s.length) {
      offs(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    offs(n) = s.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var p = 0
    while (p < n) {
      var l = math.min(maxPieceLen, n - p)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = s.substring(offs(p), offs(p + l))
        if (pieces.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null)
        // canonical WordPiece: any unmatched position voids the whole
        // word — one [UNK], never a partial segmentation
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](UTF8String.fromString(WordPieceSegment.Unk)))
      out += UTF8String.fromString(hit)
      p += l
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceSegment {
  val Unk = "[UNK]"
}

object TextFunctions {
  /** BPE token count of `word` under `merges` (rank order) — see
    * [[BpeTokenCount]].
    */
  def bpeTokenCount(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(word), merges))

  /** Viterbi unigram segmentation of `word` under an integer micro-nat
    * piece-score table — see [[UnigramSegment]].
    */
  def unigramSegment(word: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int = 4): Column =
    ColumnBridge.column(
      UnigramSegment(ColumnBridge.expression(word), vocab, maxPieceLen))

  /** Greedy longest-match-first (WordPiece-rule) segmentation of `word`
    * under a vocabulary set — see [[WordPieceSegment]].
    */
  def wordpieceSegment(word: Column, vocab: Seq[String],
      maxPieceLen: Int = 4): Column =
    ColumnBridge.column(
      WordPieceSegment(ColumnBridge.expression(word), vocab, maxPieceLen))
}
