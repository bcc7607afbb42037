package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded bottom-k aggregate: keeps the k (key, id) pairs with the
  * smallest (key, id) ordering per group, whatever the input size.
  *
  * This is the consistent-sampling primitive (bottom-k sketch): with
  * `key = hash(id)` the selection is a pure function of the ids, so
  * re-runs, engine ports and differently-sharded corpora pick the same
  * sample, and samples MERGE — bottom-k of a union is the bottom-k of
  * the shards' bottom-k's. That merge property is what makes it a real
  * aggregate: map-side partial aggregation trims every partition to k
  * pairs before the shuffle, so shuffle width per (partition, group) is
  * O(k), not O(rows). The window-function alternative
  * (`row_number() OVER (PARTITION BY g ORDER BY hash)`) shuffles every
  * row; this shuffles at most k per partition per group.
  *
  * Buffer: a size-bounded max-heap — push, then drop the largest when
  * over k. Update and merge are both O(log k) per element.
  *
  * Output: array<struct<key bigint, id bigint>> sorted ascending by
  * (key, id) — deterministic for the DuckDB oracle replay.
  */
case class BottomK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1, got $k")
    } else if (left.dataType != LongType || right.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint key, bigint id), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    } else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k"

  // max-heap on (key, id): the head is the WORST retained pair, evicted
  // first when a smaller one arrives
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def push(buf: mutable.PriorityQueue[(Long, Long)], key: Long, id: Long): Unit = {
    if (buf.size < k) {
      buf.enqueue((key, id))
    } else if (Ordering[(Long, Long)].lt((key, id), buf.head)) {
      buf.dequeue()
      buf.enqueue((key, id))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)], input: InternalRow)
      : mutable.PriorityQueue[(Long, Long)] = {
    val kv = left.eval(input)
    val iv = right.eval(input)
    if (kv != null && iv != null) {
      push(buf, kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (key, id) => push(buf, key, id) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val rows = buf.toArray.sorted.map { case (key, id) => InternalRow(key, id) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, id) => out.writeLong(key); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomK =
    copy(left = newLeft, right = newRight)
}

object BottomK {
  /** Column-level entry point: k smallest (key, id) pairs per group. */
  def bottomK(key: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BottomK(ColumnBridge.expression(key), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Register `graft_bottom_k(key, id, k)` for SQL callers. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottom_k",
      exprs => {
        val a = Arity.check("graft_bottom_k", "graft_bottom_k(key, id, k)", 3)(exprs)
        BottomK(a.head, a(1), Arity.literalInt("graft_bottom_k",
          "graft_bottom_k(key, id, k)", a(2))).toAggregateExpression()
      },
      "built-in")
}
