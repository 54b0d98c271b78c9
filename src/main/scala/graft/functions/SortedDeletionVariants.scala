package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All DISTINCT sorted-byte-multiset deletion variants of a string,
  * at every deletion depth 0..maxDel — the blocking signature behind
  * the adaptive exact Jaro-Winkler top-match
  * ([[graft.operators.TextOps.jaroWinklerTopMatch]]).
  *
  * Why this key is lossless for JW-threshold candidate generation:
  * Jaro matched-character count m is bounded by the BYTE-multiset
  * intersection of the two strings (JW here is the byte-semantics
  * [[JaroWinkler]]), and jw >= theta forces m >= o(la, lb, theta)
  * (derivation in the TextOps scaladoc). Two strings whose multisets
  * share a sub-multiset of size >= s both emit that sub-multiset as a
  * variant whenever their deletion depths reach (len - s), so an
  * equi-join on the variant string surfaces every pair that can beat
  * theta. Deeper deletion = looser threshold; depth is the caller's
  * per-row knob (tight per-id thresholds probe, the block-floor
  * threshold indexes).
  *
  * The variant strings are raw sorted byte runs (not necessarily
  * valid UTF-8); they are join keys only, and UTF8String
  * equality/hashing is byte-exact, so that is sound. Output is
  * lexicographically sorted for deterministic plans. Depth is clamped
  * to [0, 8] — the caller routes anything deeper to its all-pairs
  * fallback, so a hostile depth column cannot mint a combinatorial
  * array. null string or null depth yields null. */
case class SortedDeletionVariants(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "sorted_deletion_variants"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_deletion_variants requires (string, int), got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(s: Any, d: Any): Any =
    SortedDeletionVariants.compute(s.asInstanceOf[UTF8String],
      d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d) =>
      s"${ev.value} = graft.functions.SortedDeletionVariants" +
        s".compute($s, $d);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedDeletionVariants {
  /** BFS over deletion depths; duplicate bytes generate identical
    * variants, so each level skips a deletion position whose byte
    * equals its left neighbor (the SymSpell distinct-variant trick,
    * see DedupOps.symspellPairs' deletion neighborhood). */
  def compute(s: UTF8String, maxDelRaw: Int): ArrayData = {
    val maxDel = math.max(0, math.min(8, maxDelRaw))
    val bytes = s.getBytes.clone()
    java.util.Arrays.sort(bytes)
    val root = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val all = new java.util.HashSet[String]()
    all.add(root)
    var frontier: java.util.HashSet[String] = new java.util.HashSet[String]()
    frontier.add(root)
    var depth = 0
    while (depth < maxDel && !frontier.isEmpty) {
      val next = new java.util.HashSet[String]()
      val it = frontier.iterator()
      while (it.hasNext) {
        val v = it.next()
        val n = v.length
        var i = 0
        while (i < n) {
          if (i == 0 || v.charAt(i) != v.charAt(i - 1)) {
            val sb = new java.lang.StringBuilder(n - 1)
            sb.append(v, 0, i).append(v, i + 1, n)
            next.add(sb.toString)
          }
          i += 1
        }
      }
      all.addAll(next)
      frontier = next
      depth += 1
    }
    val arr = all.toArray(new Array[String](all.size))
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]])
    val out = new Array[Any](arr.length)
    var k = 0
    while (k < arr.length) {
      out(k) = UTF8String.fromBytes(
        arr(k).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      k += 1
    }
    new GenericArrayData(out)
  }
}
