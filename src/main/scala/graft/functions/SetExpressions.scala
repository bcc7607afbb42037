package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native intersection-size over two SORTED, DISTINCT arrays — the hot
  * inner loop of every exact near-dup verify step (n-gram Jaccard,
  * containment, MinHash verification).
  *
  * `size(array_intersect(a, b))` builds a hash set PER ROW PAIR: for a
  * blocked all-pairs verify that is O(pairs · |set|) allocations, and the
  * allocation churn both dominates steady-state CPU and stretches JIT
  * warmup (the generated hash probe is a big, branchy method). With both
  * sides sorted ascending (one `array_sort` per DOC, amortized over every
  * pair the doc appears in), the intersection size is a single
  * allocation-free merge scan — the classic sort-merge trade, applied at
  * the expression level.
  *
  * Preconditions (documented, not checked — checking would cost the scan
  * being saved): both arrays sorted ascending with distinct elements, as
  * produced by `array_sort(array_distinct(...))` or
  * `array_sort(collect_set(...))`. String ordering is Spark's
  * `UTF8String.compareTo` (unsigned byte-wise), i.e. exactly what
  * `array_sort` uses, so sorting and merging agree on supplementary-plane
  * characters. Null elements (array_sort places them last) terminate the
  * scan: they never match and nothing after them can, so the count
  * equals `array_intersect`'s over the non-null prefix.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> or two array<string> " +
            s"inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sorted_intersect_count"

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    if (isLong) {
      while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u == v) { c += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val body = if (isLong) {
        s"""
           |  final long u = $a.getLong($i);
           |  final long v = $b.getLong($j);
           |  if (u == v) { $c++; $i++; $j++; }
           |  else if (u < v) { $i++; } else { $j++; }
         """.stripMargin
      } else {
        s"""
           |  final int cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if (cmp == 0) { $c++; $i++; $j++; }
           |  else if (cmp < 0) { $i++; } else { $j++; }
         """.stripMargin
      }
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |$body
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection ELEMENTS of two SORTED, DISTINCT `array<bigint>` inputs —
  * [[SortedIntersectCount]]'s sibling for the callers that need the matched
  * values themselves (e.g. the triangle closure crediting each wedge's far
  * endpoint), with the same allocation discipline: one merge scan, one
  * primitive `long[]` sized to the smaller input, no per-element boxing or
  * hash set (`array_intersect` builds a hash set per ROW PAIR).
  *
  * Same precondition contract as the count variant: both sides sorted
  * ascending with distinct elements (`array_sort(collect_list(...))` over
  * unique rows / `array_sort(array_distinct(...))`). Long arrays only —
  * the graph pipelines that need elements key everything by packed BIGINT.
  * Output is ascending and distinct by construction.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, " +
            s"got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    val out = new Array[Long](math.min(nx, ny))
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { out(c) = u; c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val buf = ctx.freshName("buf")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final long[] $buf = new long[$nx < $ny ? $nx : $ny];
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  final long u = $a.getLong($i);
         |  final long v = $b.getLong($j);
         |  if (u == v) { $buf[$c++] = u; $i++; $j++; }
         |  else if (u < v) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  /** Intersection size of two sorted distinct arrays (see
    * [[SortedIntersectCount]] for the precondition contract).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection elements of two sorted distinct `array<bigint>` columns
    * (see [[SortedIntersect]] for the precondition contract).
    */
  def sortedIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersect(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
