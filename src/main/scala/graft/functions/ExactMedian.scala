package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact (interpolating) median as a native Catalyst
  * TypedImperativeAggregate — SURVEY §7.3's "one likely custom
  * expression" (W1 exact sliding median). Semantics match DuckDB's
  * MEDIAN over doubles: odd count -> middle element, even count ->
  * mean of the two middle elements, empty -> null.
  *
  * Compared with the built-in `percentile` it keeps a plain growable
  * double buffer (no per-value OpenHashMap counting), which is the
  * right shape for the k=15 row frames of the median filter: tiny
  * buffers, rebuilt per frame by the window operator.
  */
case class ExactMedian(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]]
  with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "exact_median"

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    ArrayBuffer.empty[Double]

  override def update(buf: ArrayBuffer[Double], input: InternalRow)
      : ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double]
    buf
  }

  override def merge(buf: ArrayBuffer[Double], other: ArrayBuffer[Double])
      : ArrayBuffer[Double] = buf ++= other

  override def eval(buf: ArrayBuffer[Double]): Any =
    if (buf.isEmpty) null
    else {
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val n = arr.length
      if (n % 2 == 1) arr(n / 2)
      else (arr(n / 2 - 1) + arr(n / 2)) / 2.0
    }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactMedian =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactMedian =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactMedian =
    copy(child = newChild)
}

object ExactMedian {
  /** Column-API entry point: `exactMedian($"value")`. Input cast to
    * double (the aggregate itself is monomorphic). */
  def exactMedian(c: Column): Column =
    GraftExprBridge.column(
      ExactMedian(GraftExprBridge.expression(c.cast("double")))
        .toAggregateExpression())
}
