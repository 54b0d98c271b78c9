package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 32 bits of MD5 as an unsigned long — the native replacement
  * for the `conv(substring(md5(s), 1, 8), 16, 10).cast("long")` idiom
  * behind every deterministic-hash decision in the engine
  * ([[graft.operators.CurationOps.md5Hash32]]: sampling gates, salted
  * partitioning, bootstrap weights, negative sampling, random walks).
  *
  * Bit-identical to the composed form: the first 8 hex chars of the
  * digest ARE its first 4 bytes big-endian, and conv-base-16 of 8 hex
  * digits parses to exactly that unsigned 32-bit value. The composed
  * pipeline allocates a 32-char hex string, substrings it, and runs a
  * general radix parse per row; this is one digest call plus 4 byte
  * shifts (measured ~2x on the q280 9.6M-hash bootstrap explode).
  *
  * Input contract matches `md5()`: BinaryType with the same implicit
  * string-to-UTF8-binary cast; null in, null out.
  */
case class Md5Hash32(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"md5_hash32 requires string or binary, got $other")
    }

  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString)
      Md5Hash32.compute(input.asInstanceOf[UTF8String].getBytes)
    else Md5Hash32.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (isString)
        s"${ev.value} = graft.functions.Md5Hash32.compute($c.getBytes());"
      else s"${ev.value} = graft.functions.Md5Hash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object Md5Hash32 {
  // MessageDigest is stateful and not thread-safe; one per task thread,
  // reset()-before-use so a prior exception can't leave residue.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
