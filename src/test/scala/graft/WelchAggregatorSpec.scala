package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Moments, SpecialFns, WelchTTest}

/** Distributed one-pass Welch t-test: partition-invariance of the
  * Welford merge and agreement with the direct moment formulas. */
class WelchAggregatorSpec extends AnyFunSuite with SparkTestBase {

  test("moments merge is associative and matches direct computation") {
    val xs = (1 to 1000).map(i => math.sin(i * 0.37) * 10 + i % 7)
    val direct = xs.foldLeft(Moments.empty)(_ add _)
    // merge in arbitrary chunks
    val chunked = xs.grouped(37)
      .map(g => g.foldLeft(Moments.empty)(_ add _))
      .foldLeft(Moments.empty)(_ merge _)
    assert(math.abs(direct.mean - chunked.mean) < 1e-10)
    assert(math.abs(direct.varSamp - chunked.varSamp) < 1e-8)
    // against naive two-pass variance
    val m = xs.sum / xs.size
    val v = xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    assert(math.abs(direct.varSamp - v) < 1e-8)
  }

  test("aggregator result is invariant to partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(i =>
      (i % 3 == 0, rnd.nextGaussian() + (if (i % 3 == 0) 0.2 else 0.0)))
    val agg = new WelchTTest("less").toColumn
    val r1 = spark.createDataset(rows).repartition(1).select(agg).head()
    val r13 = spark.createDataset(rows).repartition(13).select(agg).head()
    assert(math.abs(r1.t - r13.t) < 1e-9)
    assert(math.abs(r1.df - r13.df) < 1e-9)
    assert(math.abs(r1.p - r13.p) < 1e-12)
    assert(r1.nA == r13.nA && r1.nB == r13.nB)
  }

  test("aggregator agrees with the moment-based pipeline path") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0)
    val ds = spark.createDataset(
      a.map(x => (true, x)) ++ b.map(x => (false, x)))
    val r = ds.select(new WelchTTest("two-sided").toColumn).head()
    // pinned from the independent python/mpmath computation in
    // SpecialFnsSpec: t = -1.8973666, p = 0.107531194930627
    assert(math.abs(r.t - (-1.8973665961010275)) < 1e-12)
    assert(math.abs(r.p - 0.107531194930627) < 1e-9)
    assert(math.abs(r.df - 5.882352941176471) < 1e-12)
  }
}
