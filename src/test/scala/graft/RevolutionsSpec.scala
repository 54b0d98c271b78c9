package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SpecialFns, WindowOps}

/** The Corner-test "Completed Revolutions" metric (ORC Result
  * Summary.pdf): yaw-unwrap revolution counting over wrapped heading
  * series, and a Welch reproduction of the published t-test. The
  * reference never computes this in main.py (it was tallied from
  * field data), so the pin is the published summary itself: enabled
  * avg/min/max = 30.9 / 15.3 / 55.0, disabled = 5.5 / 4.75 / 6.0
  * (5 runs each), one-sided p = 0.01659042943. The run populations
  * below are reconstructed to satisfy EVERY published number
  * simultaneously (means, mins, maxes, and the exact p — solved
  * against the same Welch/student-t formulation OfflineAnalytics
  * uses), then fed through the operator as synthetic wrapped traces.
  */
class RevolutionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Reconstructed per-run revolution counts. Enabled middles solved
  // (bisection over the max-variance family) so the Welch one-sided
  // p lands on the published 0.01659042943 with means/extremes fixed.
  private val enabledRevs = Seq(
    15.3, 19.69571245870319, 19.69571245870319, 44.80857508259362, 55.0)
  private val disabledRevs = Seq(4.75, 4.75, 6.0, 6.0, 6.0)

  /** A wrapped (-180, 180] heading trace sweeping exactly `revs`
    * revolutions in 36-degree steps (sign = direction). */
  private def trace(arm: String, run: Int, revs: Double, sign: Int)
      : Seq[(String, Int, Int, Double)] = {
    val total = revs * 360.0
    val full = math.floor(total / 36.0).toInt
    val thetas = (0 to full).map(_ * 36.0) ++
      (if (total > full * 36.0) Seq(total) else Nil)
    thetas.zipWithIndex.map { case (th, i) =>
      val signed = sign * th
      val wrapped = signed - 360.0 * math.round(signed / 360.0)
      (arm, run, i, wrapped)
    }
  }

  test("yawRevolutions recovers the reconstructed populations from " +
      "wrapped traces and replays the published Corner t-test") {
    val rows =
      enabledRevs.zipWithIndex.flatMap { case (r, i) =>
        trace("enabled", i, r, 1)
      } ++
      disabledRevs.zipWithIndex.flatMap { case (r, i) =>
        trace("disabled", i, r, -1) // opposite direction: |net| counts
      }
    val df = rows.toDF("arm", "run", "idx", "yaw")
    val revs = WindowOps.yawRevolutions(df, Seq("arm", "run"), "idx", "yaw")
      .collect()
      .map(r => (r.getAs[String]("arm"), r.getAs[Int]("run")) ->
        r.getAs[Double]("revolutions")).toMap

    def pop(arm: String, want: Seq[Double]): Seq[Double] = {
      val got = want.indices.map(i => revs((arm, i)))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"$arm rev: got $g want $w")
      }
      got
    }
    val a = pop("enabled", enabledRevs)
    val b = pop("disabled", disabledRevs)

    // published summary-table stats
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    assert(math.abs(mean(a) - 30.9) < 1e-9)
    assert(math.abs(mean(b) - 5.5) < 1e-9)
    assert(math.abs(a.min - 15.3) < 1e-9 && math.abs(a.max - 55.0) < 1e-9)
    assert(math.abs(b.min - 4.75) < 1e-9 && math.abs(b.max - 6.0) < 1e-9)

    // Welch one-sided (enabled greater), same formulation as
    // OfflineAnalytics.welchTests
    def varS(xs: Seq[Double]) = {
      val m = mean(xs)
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val (m1, v1, n1) = (mean(a), varS(a), a.size.toDouble)
    val (m2, v2, n2) = (mean(b), varS(b), b.size.toDouble)
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val dfree = se2 * se2 /
      (v1 * v1 / (n1 * n1 * (n1 - 1)) + v2 * v2 / (n2 * n2 * (n2 - 1)))
    val p = 1.0 - SpecialFns.studentTCdf(t, dfree)
    assert(math.abs(p - 0.01659042943) < 1e-9,
      s"published Corner completed-revolutions p: got $p")
  }

  test("unwrap is exact across the +/-180 seam and for sub-revolution " +
      "sweeps") {
    val df = (trace("x", 0, 0.25, 1) ++ trace("x", 1, 1.0, -1) ++
      Seq(("x", 2, 0, 179.0), ("x", 2, 1, -179.0), ("x", 2, 2, 178.0)))
      .toDF("arm", "run", "idx", "yaw")
    val got = WindowOps.yawRevolutions(df, Seq("arm", "run"), "idx", "yaw")
      .collect().map(r => r.getAs[Int]("run") ->
        (r.getAs[Double]("net_deg"), r.getAs[Double]("revolutions"))).toMap
    assert(math.abs(got(0)._2 - 0.25) < 1e-12)
    assert(math.abs(got(1)._2 - 1.0) < 1e-12)
    // 179 -> -179 is +2 deg across the seam; -179 -> 178 is -3 deg
    assert(math.abs(got(2)._1 - (-1.0)) < 1e-12)
  }
}
