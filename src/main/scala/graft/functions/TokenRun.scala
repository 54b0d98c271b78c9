package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest run of a repeated whitespace-delimited token — the native
  * single-pass form of the degenerate-repetition screen
  * (TextOps.maxTokenRun). The input contract is the PREPARED string
  * (callers pass lower(trim(text)) — both codegen'd builtins), so
  * this expression only tokenizes and compares.
  *
  * Why native instead of the aggregate() HOF fold: Catalyst's
  * higher-order functions are CodegenFallback — every row pays
  * interpreted-lambda dispatch and a materialized token array. This
  * expression scans the UTF8String's bytes once: separator detection
  * is byte-exact (the java-regex \s class members are all ASCII, and
  * ASCII bytes never appear inside multi-byte UTF-8 sequences), token
  * equality is a byte-range compare, and nothing allocates beyond the
  * byte array view.
  *
  * Tokenization contract = split(input, "\\s+", -1) exactly: maximal
  * separator runs delimit tokens, a leading run yields a leading
  * empty token, a trailing run a trailing empty token, and the empty
  * string is one empty token (run 1) — equivalence with the HOF fold
  * is spec-pinned over fixture text and crafted edges.
  */
case class MaxTokenRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "max_token_run"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"max_token_run requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    MaxTokenRun.compute(input.asInstanceOf[UTF8String])

  // static-call codegen: stays inside whole-stage codegen (no
  // CodegenFallback row boxing), the loop lives in one JIT-friendly
  // method instead of being re-emitted into every generated class
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaxTokenRun.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MaxTokenRun {
  /** The java-regex \s members — all ASCII, so a byte test is exact
    * even mid-UTF-8 (continuation bytes are >= 0x80). */
  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var mx = 0L
    var cur = 0L
    var pStart = -1
    var pEnd = -1
    var pos = 0
    var done = false
    while (!done) {
      var end = pos
      while (end < n && !isSep(bytes(end))) end += 1
      // token = [pos, end)
      val equalPrev = pStart >= 0 && (end - pos) == (pEnd - pStart) && {
        var i = 0
        val len = end - pos
        var same = true
        while (same && i < len) {
          if (bytes(pos + i) != bytes(pStart + i)) same = false
          i += 1
        }
        same
      }
      cur = if (equalPrev) cur + 1 else 1
      if (cur > mx) mx = cur
      pStart = pos; pEnd = end
      if (end == n) done = true
      else {
        var q = end
        while (q < n && isSep(bytes(q))) q += 1
        if (q == n) {
          // trailing separator run -> one trailing empty token
          val emptyEqual = pEnd == pStart
          cur = if (emptyEqual) cur + 1 else 1
          if (cur > mx) mx = cur
          done = true
        } else pos = q
      }
    }
    mx
  }
}
