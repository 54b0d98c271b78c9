package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a string as a space-joined array — the native
  * single-pass form of the char-shingle builder under the trigram LM
  * proxy (q153). Key format matches the zip_with construction it
  * replaces (shinglesFromTokens over the code-point array): each
  * element is n code points joined by ' ', spaces in the text count
  * as code points, and strings shorter than n code points yield an
  * empty array.
  *
  * Why native: the zip_with/filter chain is a CodegenFallback
  * higher-order pipeline that allocates three shifted arrays and runs
  * interpreted lambdas per element. This expression walks the string
  * once, records code-point offsets, and emits each n-gram with one
  * builder append — surrogate pairs stay intact (code-point
  * iteration, like java split("")'s zero-width advance). Equivalence
  * with the HOF chain is spec-pinned over fixture text and edges. */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CharNgrams {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val cpCount = str.codePointCount(0, len)
    if (cpCount < n) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](cpCount + 1)
    var i = 0
    var j = 0
    while (i < len) {
      offs(j) = i
      i += Character.charCount(str.codePointAt(i))
      j += 1
    }
    offs(cpCount) = len
    val out = new Array[Any](cpCount - n + 1)
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k <= cpCount - n) {
      sb.setLength(0)
      var m = 0
      while (m < n) {
        if (m > 0) sb.append(' ')
        sb.append(str, offs(k + m), offs(k + m + 1))
        m += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(out)
  }
}
