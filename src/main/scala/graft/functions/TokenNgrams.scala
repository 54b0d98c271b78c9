package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array — the native single-pass
  * form of TextOps.shinglesFromTokens' zip_with chain, which backs
  * the whole minhash/LSH/Jaccard dedup family. Output contract
  * identical: ["t1 .. tn", "t2 .. tn+1", ...], empty when fewer than
  * n tokens; elements join with ' ' via UTF8String.concatWs (the
  * concat_ws the chain used, nulls skipped the same way).
  *
  * Why native: the (n-1)-level zip_with chain is CodegenFallback —
  * interpreted lambdas and n-1 shifted array allocations per row.
  * This expression reads the ArrayData once and emits each shingle
  * with one byte-level concat; it stays inside whole-stage codegen
  * via a static-call doGenCode. Equivalence with the chain is
  * spec-pinned over fixture tokens and crafted edges. */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "token_ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_ngrams requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object TokenNgrams {
  private val Sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](sz - n + 1)
    val window = new Array[UTF8String](n)
    var k = 0
    while (k <= sz - n) {
      var m = 0
      while (m < n) { window(m) = toks(k + m); m += 1 }
      out(k) = UTF8String.concatWs(Sep, window: _*)
      k += 1
    }
    new GenericArrayData(out)
  }
}
