package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the vector dot product — the hot inner
  * loop of every similarity operator.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0, _+_)`)
  * uses higher-order functions, which Spark evaluates interpreted (lambda
  * variables block whole-stage codegen). This expression generates a tight
  * primitive loop instead, preference order (b) from the build brief:
  * custom `Expression` with `doGenCode` > UDF.
  *
  * Fold order is ascending-index, identical to the HOF version and to a
  * sequential SQL sum — results are bit-identical across engines.
  * Null array elements are not expected (inputs come from casts of
  * non-null float arrays); a null element contributes the slot's raw 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native positional equality count over two `array<bigint>` columns: how
  * many indices hold the same value (up to the shorter length). The hot
  * predicate of MinHash candidate pre-filtering — matching-signature
  * fraction estimates Jaccard — where the HOF formulation
  * (`aggregate(zip_with(...))`) evaluates interpreted per candidate pair.
  */
case class EqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane LSH bucketing: projects an `array<double>`
  * vector onto every plane of a (broadcast-literal) `array<array<double>>`
  * plane matrix and packs the projection sign bits into one bucket key per
  * table — plane i sets bit (i % bitsPerTable) of key (i / bitsPerTable).
  *
  * This replaces the composed-Column formulation whose expression tree grew
  * as nPlanes × dims arithmetic nodes (≈9k nodes at real embedding dims —
  * enough to push Janino into interpreted fallback). Here the plane matrix
  * is ONE literal child and the work is a tight generated loop, so the
  * expression is a single node at any dimensionality.
  *
  * Fold order per plane is ascending-index — bit-identical to a sequential
  * SQL `list_dot_product`, so engines replaying the same (hash-derived)
  * plane weights reproduce the buckets exactly.
  */
case class LshBuckets(left: Expression, right: Expression, bitsPerTable: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if bitsPerTable < 1 || bitsPerTable > 63 =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName bitsPerTable must be in [1, 63], got $bitsPerTable")
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> and array<array<double>>, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val planes = b.asInstanceOf[ArrayData]
    val nPlanes = planes.numElements()
    val out = new Array[Long]((nPlanes + bitsPerTable - 1) / bitsPerTable)
    var i = 0
    while (i < nPlanes) {
      val plane = planes.getArray(i)
      val n = math.min(v.numElements(), plane.numElements())
      var s = 0.0
      var d = 0
      while (d < n) { s += v.getDouble(d) * plane.getDouble(d); d += 1 }
      if (s >= 0) out(i / bitsPerTable) |= 1L << (i % bitsPerTable)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val np = ctx.freshName("nPlanes")
      val plane = ctx.freshName("plane")
      val out = ctx.freshName("out")
      s"""
         |final int $np = $b.numElements();
         |final long[] $out = new long[($np + $bitsPerTable - 1) / $bitsPerTable];
         |for (int $i = 0; $i < $np; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $plane = $b.getArray($i);
         |  final int $n = java.lang.Math.min($a.numElements(), $plane.numElements());
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += $a.getDouble($d) * $plane.getDouble($d);
         |  }
         |  if ($s >= 0) $out[$i / $bitsPerTable] |= 1L << ($i % $bitsPerTable);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native element-wise vector-sum aggregate: sums `array<double>` rows into
  * one array, with proper partial aggregation (update per-partition, merge
  * across partitions). The composable alternative — `posexplode` to
  * (pos, value) rows then a per-(key, pos) aggregate — multiplies the
  * shuffle row count by the vector dimensionality; this aggregate moves one
  * array per group per partition instead. The buffer grows to the longest
  * input seen, so ragged inputs are tolerated (shorter rows contribute
  * zeros to the tail).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], get: Int => Double, n: Int): Array[Double] = {
    val out = if (n > buf.length) java.util.Arrays.copyOf(buf, n) else buf
    var i = 0
    while (i < n) { out(i) += get(i); i += 1 }
    out
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      add(buf, arr.getDouble, arr.numElements())
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    add(buf, other(_), other.length)

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/** Column-level entry points + SQL registration for the native vector
  * expressions.
  */
object VectorFunctions {

  /** Codegen'd dot product of two `array<double>` columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Element-wise sum aggregate over an `array<double>` column. */
  def vecSum(c: Column): Column =
    ColumnBridge.column(
      VectorSum(ColumnBridge.expression(c)).toAggregateExpression())

  /** Codegen'd positional-equality count of two `array<bigint>` columns. */
  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      EqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd multi-table LSH bucket keys for an `array<double>` vector
    * against an `array<array<double>>` plane matrix.
    */
  def lshBuckets(v: Column, planes: Column, bitsPerTable: Int): Column =
    ColumnBridge.column(
      LshBuckets(ColumnBridge.expression(v), ColumnBridge.expression(planes), bitsPerTable))

  /** Register the native functions for SQL callers on this session —
    * the imperative path for sessions built WITHOUT
    * `spark.sql.extensions=graft.GraftExtensions`. On extension-built
    * sessions this merely shadows the injected built-ins with identical
    * builders (a harmless "replaced a previously registered function"
    * log line); keep the two lists in sync when adding a function.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => {
        val a = Arity.check("graft_dot", "graft_dot(array, array)", 2)(exprs)
        DotProduct(a.head, a(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum", exprs => {
        val a = Arity.check("graft_vec_sum", "graft_vec_sum(array)", 1)(exprs)
        VectorSum(a.head).toAggregateExpression()
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_eq_count", exprs => {
        val a = Arity.check("graft_eq_count", "graft_eq_count(array, array)", 2)(exprs)
        EqCount(a.head, a(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_buckets", exprs => {
        val a = Arity.check("graft_lsh_buckets",
          "graft_lsh_buckets(array, planes, nBits)", 3)(exprs)
        LshBuckets(a.head, a(1), Arity.literalInt("graft_lsh_buckets",
          "graft_lsh_buckets(array, planes, nBits)", a(2)))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count", exprs => {
        val a = Arity.check("graft_sorted_intersect_count",
          "graft_sorted_intersect_count(sorted_array, sorted_array)", 2)(exprs)
        SortedIntersectCount(a.head, a(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash64", exprs => {
        val a = Arity.check("graft_hash64", "graft_hash64(string)", 1)(exprs)
        Md5Hash64(a.head)
      }, "built-in")
  }
}
