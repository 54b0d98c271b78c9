package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass ASCII character-class statistics — the native
  * replacement for the `length(x) - length(regexp_replace(x, cls,
  * ''))` counting idiom used by the readability / quality-rater /
  * Gaussian-NB feature family (q279/q285/q292/q301/q302). One byte
  * scan, zero string allocation, full whole-stage codegen via a
  * static call (regexp_replace allocates a rewritten copy of the
  * document per class — three copies per doc in q285).
  *
  * All classes are pure-ASCII, so byte tests are exact even mid-UTF-8
  * (continuation bytes are >= 0x80 and never match), and group
  * counting agrees with the regexp `[cls]+` form: a multi-byte char
  * between two matches breaks the group in both representations.
  *
  * Modes: 0 = count digits [0-9]; 1 = count spaces ' '; 2 = count
  * space runs ' +'; 3 = count sentence punct [.!?]; 4 = count vowel
  * runs [aeiouyAEIOUY]+ (the case-insensitive syllable proxy).
  */
case class CharClassCount(child: Expression, mode: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "char_class_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && mode >= 0 && mode <= 4)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_class_count requires (string, mode 0..4), got " +
          s"(${child.dataType}, $mode)")
  }

  override def nullSafeEval(input: Any): Any =
    CharClassCount.compute(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharClassCount.compute($c, $mode);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CharClassCount {
  final val Digits = 0
  final val Spaces = 1
  final val SpaceRuns = 2
  final val SentencePunct = 3
  final val VowelRuns = 4

  private def matches(b: Byte, mode: Int): Boolean = (mode: @annotation.switch) match {
    case 0 => b >= '0' && b <= '9'
    case 1 => b == ' '
    case 2 => b == ' '
    case 3 => b == '.' || b == '!' || b == '?'
    case 4 => b == 'a' || b == 'e' || b == 'i' || b == 'o' ||
      b == 'u' || b == 'y' || b == 'A' || b == 'E' || b == 'I' ||
      b == 'O' || b == 'U' || b == 'Y'
    case _ => false
  }

  private def isRunMode(mode: Int): Boolean = mode == 2 || mode == 4

  def compute(s: UTF8String, mode: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val runs = isRunMode(mode)
    var count = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val m = matches(bytes(i), mode)
      if (m && !(runs && inRun)) count += 1
      inRun = m
      i += 1
    }
    count
  }
}
