package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Single-pass vector moments + gram matrix over an `array<double>`
  * column: one corpus scan accumulates row count, per-dimension entry
  * counts and sums, and the d x d outer-product sum in a flat buffer
  * — the input PCA/covariance needs, without the exploded self-join
  * that materializes dims² rows per document through a shuffle (a 64x
  * row blowup at dims=64; the 100 TB liability this replaces).
  *
  * Buffer/result layout (flat array<double>, length 1 + 2d + d²):
  * `[0]` = TOTAL input row count (null/ragged rows included — the
  * `df.count()` the covariance normalizes by), `[1..d]` = per-dim
  * entry counts, `[1+d..2d]` = per-dim sums, `[1+2d + i*d + j]` =
  * sum over rows of x_i * x_j. Null rows contribute only to `[0]`;
  * rows of a different length contribute the entries they actually
  * have (capped at `dims`) — exactly the contract of the relational
  * posexplode form this replaces, where explode yields each row's
  * actual entries while `df.count()` counts every row, and what the
  * q82 DuckDB oracle computes (AVG over present entries; COUNT(*)
  * over all rows). Only the upper gram triangle is accumulated per
  * row (j >= i); eval mirrors it down before returning. Partial
  * buffers merge element-wise, so the plan is the same partial+final
  * two-phase aggregation as any built-in sum — map-side combined, one
  * d²-sized record per partition crossing the wire.
  */
case class VectorMomentGram(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  require(dims > 0, s"dims must be positive, got $dims")

  private val len = 1 + 2 * dims + dims * dims

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_moment_gram"

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow)
      : Array[Double] = {
    buf(0) += 1.0
    val v = child.eval(input)
    if (v != null) {
      // element-wise ArrayData access, NOT toDoubleArray(): that
      // would silently turn NULL elements into 0.0 entries, where the
      // relational form (and the q82 oracle's AVG/SUM) skips them
      val ad = v.asInstanceOf[ArrayData]
      val d = math.min(ad.numElements(), dims)
      var i = 0
      while (i < d) {
        if (!ad.isNullAt(i)) {
          val xi = ad.getDouble(i)
          buf(1 + i) += 1.0
          buf(1 + dims + i) += xi
          var j = i
          val row = 1 + 2 * dims + i * dims
          while (j < d) {
            if (!ad.isNullAt(j)) buf(row + j) += xi * ad.getDouble(j)
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double])
      : Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    // mirror the upper triangle down; the buffer is ours at eval time
    var i = 1
    while (i < dims) {
      var j = 0
      while (j < i) {
        buf(1 + 2 * dims + i * dims + j) = buf(1 + 2 * dims + j * dims + i)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    var i = 0
    while (i < len) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](len)
    var i = 0
    while (i < len) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMomentGram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMomentGram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : VectorMomentGram = copy(child = newChild)
}

object VectorMomentGram {
  /** Column-API entry point: one aggregated row
    * `[n_rows, cnt_1..cnt_d, sum_1..sum_d, gram_11..gram_dd]`
    * (flat, length 1+2d+d²). */
  def momentGram(c: Column, dims: Int): Column =
    GraftExprBridge.column(
      VectorMomentGram(
        GraftExprBridge.expression(c.cast("array<double>")), dims)
        .toAggregateExpression())
}
