package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity over the strings' UTF-8 BYTES — the
  * record-linkage / fuzzy-name-match scorer Spark lacks natively
  * (builtin `levenshtein` is the only string-distance primitive).
  *
  * Semantics are pinned to the rapidfuzz formulation that DuckDB's
  * `jaro_winkler_similarity` exposes, empirically probed and
  * spec-pinned (JaroWinklerSpec) so the DuckDB oracle replays it
  * term for term:
  *  - operates on BYTES, not code points ('éx' vs 'éy' = 7/9 — the
  *    two-byte é counts as two matches);
  *  - either side empty (including BOTH empty) scores 0.0;
  *  - match window = max(len)/2 - 1, floored at 0 (so "ab" vs "ba"
  *    scores 0 — no same-position match, window 0);
  *  - greedy left-to-right matching; transpositions = FLOOR of half
  *    the matched-sequence mismatch count (rapidfuzz integer
  *    division), jaro = (m/l1 + m/l2 + (m - floor(t/2))/m) / 3;
  *  - Winkler prefix boost (common BYTE prefix capped at 4, weight
  *    0.1) applied only when jaro > 0.7.
  *
  * Native expression (not a UDF): stays inside whole-stage codegen
  * via a static-call doGenCode; the O(len·window) loop runs on the
  * raw byte arrays with two boolean scratch arrays and zero string
  * allocation. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two string arguments, got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String].getBytes,
      r.asInstanceOf[UTF8String].getBytes)

  // static-call codegen: no CodegenFallback row boxing; the loop
  // lives in one JIT-friendly method (the MaxTokenRun precedent)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Plain Jaro over byte arrays (no prefix boost). */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var looking = true
      while (looking && j <= hi) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true
          m2(j) = true
          m += 1
          looking = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in match order. The
    // rapidfuzz (= DuckDB) formulation FLOORS the halved mismatch
    // count (integer division) — an odd mismatch count (a 3-cycle
    // permutation of the matched chars, e.g. Customer#000000014 vs
    // Customer#000001040) loses the half, scoring HIGHER than the
    // classic t/2.0; parity demands the floor.
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / l1 + md / l2 + (md - trans / 2) / md) / 3.0
  }

  /** Jaro-Winkler: prefix boost (cap 4 bytes, weight 0.1) above the
    * conventional 0.7 threshold. */
  def similarity(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j > 0.7) {
      val cap = math.min(4, math.min(a.length, b.length))
      var p = 0
      while (p < cap && a(p) == b(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}
