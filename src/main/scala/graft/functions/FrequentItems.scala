package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory frequent-items aggregate (Misra-Gries summary): tracks at
  * most `k` counters per group, whatever the input cardinality. Guarantees
  * after any update/merge order:
  *  - every item with true frequency > n/k is present in the result;
  *  - each reported count is an UNDER-estimate by at most n/k
  *    (`true - n/k <= reported <= true`);
  *  - if the group's distinct-item count never exceeds `k`, counts are
  *    exact.
  *
  * This is the sketch complement to an exact `groupBy(word).count()`:
  * vocabulary-scale inputs (token streams at 100 TB) can't shuffle one row
  * per distinct item, but k counters per partition merge associatively into
  * k counters total. Update is per-partition, merge is the standard
  * summary-sum + (k+1)-th-largest subtraction (Agarwal et al.'s mergeable
  * summaries result).
  *
  * Output: array<struct<item string, est bigint>> sorted by est desc then
  * item, truncated to the surviving counters.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1, got $k")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Standard MG step: count if tracked or under capacity, else decrement
    * every counter (dropping zeros) — the classic "cancel one occurrence of
    * each tracked item against this untracked one".
    */
  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1
          if (c == 0) dead += key else buf.update(key, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summaries merge: sum counters, then subtract the (k+1)-th
    * largest count from every counter so at most k survive.
    */
  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) => buf.update(item, buf.getOrElse(item, 0L) + c) }
    FrequentItems.capacityFit(buf, k)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF throws for items whose
  // encoding exceeds 64 KB, which a pathological corpus token can hit
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}

object FrequentItems {

  /** The mergeable-summaries capacity fit — sum counters first, then this
    * subtracts the (k+1)-th largest count from every counter so at most k
    * survive. ONE implementation shared by the batch aggregate's merge
    * and the streaming shard processor
    * ([[graft.streaming.TextStreams.ShardHeavyHitters]]), so the
    * presence/deficit guarantees the streaming doc transfers from the
    * batch op cannot drift between two copies of the fold.
    */
  private[graft] def capacityFit(buf: mutable.HashMap[String, Long],
      k: Int): Unit =
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }

  /** Column-level entry point: MG frequent-items summary of a string
    * column, at most `k` counters.
    */
  def freqItems(c: Column, k: Int): Column =
    ColumnBridge.column(
      FrequentItems(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Register `graft_freq_items(col, k)` for SQL callers. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_freq_items",
      exprs => {
        val a = Arity.check("graft_freq_items", "graft_freq_items(col, k)", 2)(exprs)
        FrequentItems(a.head, Arity.literalInt("graft_freq_items",
          "graft_freq_items(col, k)", a(1))).toAggregateExpression()
      },
      "built-in")
}
