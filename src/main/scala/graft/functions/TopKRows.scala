package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a native TypedImperativeAggregate with a
  * k-BOUNDED buffer — the scale replacement for the rank-window
  * idiom (`row_number().over(Window.partitionBy(key).orderBy(...))
  * .filter(rk <= k)`), which must SORT every group's full row set.
  * Here each map-side partial keeps at most 2k (score, id) pairs,
  * partials merge associatively, and only k-row states cross the
  * shuffle — per-group network cost is O(k x partitions), not
  * O(group size), and there is no sort of the full data at all.
  *
  * Ordering contract: score DESC, id ASC on ties (matching
  * `ORDER BY score DESC, id` — deterministic cross-engine). NULL
  * scores or ids are skipped, like SQL aggregates. Result: an
  * array<struct<score double, id bigint>> of length <= k, sorted.
  */
case class TopKRows(
    left: Expression,   // score
    right: Expression,  // id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  // (score desc, id asc): a sorts before b
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sort + truncate to k. Run when a buffer exceeds 2k, so the
    * amortized update cost is O(log k) comparisons per row and the
    * buffer never holds more than 2k entries. */
  private def compact(buf: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    val arr = buf.sortWith(before)
    arr.takeInPlace(k)
    arr
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow)
      : ArrayBuffer[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length > 2 * k) compact(buf) else buf
    } else buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length > 2 * k) compact(buf) else buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(compact(buf).map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val c = compact(buf) // ship at most k entries per partial
    val bb = ByteBuffer.allocate(4 + 16 * c.length)
    bb.putInt(c.length)
    c.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKRows =
    copy(left = newLeft, right = newRight)
}

object TopKRows {
  /** `topK($"score", $"id", 5)`: array of the k largest (score, id)
    * pairs, score desc / id asc, nulls skipped. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftExprBridge.column(
      TopKRows(GraftExprBridge.expression(score.cast("double")),
        GraftExprBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
