package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ScaleOps, StatsOps}

/** Hand-traced specs for binary-classifier evaluation and incremental
  * aggregate-state maintenance (round-6 third-session additions). */
class EvalMergeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("binaryEval: hand-traced confusion + metrics") {
    // pred/truth: TT TT TF FT FF FF -> tp=2 fp=1 fn=1 tn=2
    val df = Seq((true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false)).toDF("p", "t")
    val r = StatsOps.binaryEval(df, col("p"), col("t")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getLong(2) == 1L && r.getLong(3) == 2L)
    assert(math.abs(r.getDouble(4) - 4.0 / 6.0) < 1e-12)   // accuracy
    assert(math.abs(r.getDouble(5) - 2.0 / 3.0) < 1e-12)   // precision
    assert(math.abs(r.getDouble(6) - 2.0 / 3.0) < 1e-12)   // recall
    assert(math.abs(r.getDouble(7) - 2.0 / 3.0) < 1e-12)   // f1 (p==r)
    // mcc = (2*2 - 1*1) / sqrt(3*3*3*3) = 3/9
    assert(math.abs(r.getDouble(8) - 1.0 / 3.0) < 1e-12)
  }

  test("binaryEval: degenerate denominators yield 0, not NaN") {
    // all predicted negative: precision/f1 undefined -> 0; tn-only MCC -> 0
    val df = Seq((false, true), (false, false)).toDF("p", "t")
    val r = StatsOps.binaryEval(df, col("p"), col("t")).collect()(0)
    assert(r.getDouble(5) == 0.0 && r.getDouble(7) == 0.0 &&
      r.getDouble(8) == 0.0)
    assert(math.abs(r.getDouble(6) - 0.0) < 1e-12) // recall 0/1
  }

  test("mergeAggStates: merged slice states == full recompute, " +
      "including keys present in only one slice") {
    val full = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L),
      ("c", 100L)).toDF("k", "v")
    val s1 = ScaleOps.partialAggState(
      full.filter(col("v") < 10L), Seq("k"), col("v"))
    val s2 = ScaleOps.partialAggState(
      full.filter(col("v") >= 10L), Seq("k"), col("v"))
    val merged = ScaleOps.mergeAggStates(Seq(s1, s2), Seq("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val direct = ScaleOps.partialAggState(full, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged == direct)
    assert(merged("c") == ((1L, 100L, 100L, 100L))) // only in s2
    assert(merged("a") == ((2L, 30L, 10L, 20L)))
  }

  test("mergeAggStates is grouping-invariant: ((s1+s2)+s3) == (s1+(s2+s3))") {
    val full = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("x", 4L),
      ("y", 5L), ("y", 6L)).toDF("k", "v")
    val slices = (0 until 3).map(i =>
      ScaleOps.partialAggState(
        full.filter(col("v") % 3 === i.toLong), Seq("k"), col("v")))
    val a = ScaleOps.mergeAggStates(
      Seq(ScaleOps.mergeAggStates(slices.take(2), Seq("k")), slices(2)),
      Seq("k")).collect().map(_.toSeq).toSet
    val b = ScaleOps.mergeAggStates(
      Seq(slices(0), ScaleOps.mergeAggStates(slices.drop(1), Seq("k"))),
      Seq("k")).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
