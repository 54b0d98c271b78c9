package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's character distribution —
  * native single-pass form of the gibberish/boilerplate screen.
  * H = ln n − (Σ c·ln c)/n over code-point frequencies; the empty
  * string scores 0 (defined, matching the HOF fold formulation whose
  * equivalence is spec-asserted).
  *
  * A native expression instead of the split("")/array_sort/aggregate
  * HOF chain: code points land in one int[] that is sorted and
  * run-length folded — no per-character String allocation, no
  * interpreted lambda machinery, codegen'd (janino-safe: primitive
  * arrays + Arrays.sort only, no generics). Sorting code POINTS keeps
  * supplementary-plane characters intact, like Java's code-point-aware
  * split("") in the fold form. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) 0.0
    else {
      val cps = new Array[Int](n)
      var i = 0
      var j = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        cps(j) = cp
        j += 1
        i += Character.charCount(cp)
      }
      java.util.Arrays.sort(cps)
      var acc = 0.0
      var run = 1L
      var k = 1
      while (k <= n) {
        if (k < n && cps(k) == cps(k - 1)) run += 1
        else { acc += run.toDouble * math.log(run.toDouble); run = 1L }
        k += 1
      }
      math.log(n.toDouble) - acc / n
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val cps = ctx.freshName("cps")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      val run = ctx.freshName("run")
      val k = ctx.freshName("k")
      s"""
         |String $s = $c.toString();
         |int $n = $s.codePointCount(0, $s.length());
         |if ($n == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  int[] $cps = new int[$n];
         |  int $i = 0;
         |  int $j = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $cps[$j] = $cp;
         |    $j += 1;
         |    $i += Character.charCount($cp);
         |  }
         |  java.util.Arrays.sort($cps);
         |  double $acc = 0.0;
         |  long $run = 1L;
         |  int $k = 1;
         |  while ($k <= $n) {
         |    if ($k < $n && $cps[$k] == $cps[$k - 1]) {
         |      $run += 1L;
         |    } else {
         |      $acc += ((double) $run) * Math.log((double) $run);
         |      $run = 1L;
         |    }
         |    $k += 1;
         |  }
         |  ${ev.value} = Math.log((double) $n) - $acc / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CharEntropy = copy(child = newChild)
}
