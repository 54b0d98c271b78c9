package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationOps, ScaleOps, StatsOps}

/** Hand-traced specs for the snapshot-diff / change-point /
  * distribution-fit / experiment-eval additions (q205–q211). */
class DiffStatsEvalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("snapshotDiff: added/removed/changed/unchanged classified by " +
      "fingerprint full-outer join") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "body")
    val neu = Seq((2L, "y"), (3L, "zz"), (4L, "w")).toDF("id", "body")
    val got = ScaleOps.snapshotDiff(old, neu, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("cusumChangepoint: exact-integer argmax lands on the last " +
      "pre-shift point; ties break earliest") {
    // [1,1,1,5,5]: S=13, n=5; scaled = 5*prefix - i*13 =
    // [-8,-16,-24,-12,0] -> peak |.| at i=3, cusum = -24/5
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("a", 4L, 5L), ("a", 5L, 5L)).toDF("k", "h", "n")
    val r = StatsOps.cusumChangepoint(df, "k", "h", "n").collect().head
    assert(r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - (-4.8)) < 1e-12)
    assert(r.getLong(3) == 5L)
    // symmetric series [2,0,2]: scaled = [2,-2,0] -> |2| tie at
    // h=1 and h=2, earliest wins
    val tie = Seq(("b", 1L, 2L), ("b", 2L, 0L), ("b", 3L, 2L))
      .toDF("k", "h", "n")
    val rt = StatsOps.cusumChangepoint(tie, "k", "h", "n").collect().head
    assert(rt.getLong(1) == 1L)
  }

  test("benfordFirstDigit: digit extraction with power-of-ten guard, " +
      "shares and chi2 against log10(1+1/d)") {
    val df = Seq(1.0, 19.5, 2.3, 950.0, 0.5, 123.0, 10.0, 1000.0)
      .toDF("v")
    // v >= 1: [1, 19.5, 2.3, 950, 123, 10, 1000] -> digits
    // [1,1,2,9,1,1,1] -> d1:5, d2:1, d9:1 of 7
    val got = StatsOps.benfordFirstDigit(df, col("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 9L))
    val (n1, obs1, exp1, chi1) = got(1L)
    assert(n1 == 5L)
    assert(math.abs(obs1 - 5.0 / 7.0) < 1e-12)
    assert(math.abs(exp1 - math.log10(2.0)) < 1e-12)
    val expN = math.log10(2.0) * 7.0
    assert(math.abs(chi1 - (5.0 - expN) * (5.0 - expN) / expN) < 1e-9)
    assert(got(2L)._1 == 1L && got(9L)._1 == 1L)
  }

  test("exponentialFitKs: MLE rate from exact gap sums and the " +
      "two-sided KS distance, hand-traced") {
    // ts(ns) [0, 1e9, 3e9] -> gaps [1s, 2s]; lambda = 2/3 Hz
    val df = Seq(("a", 0L, 1L), ("a", 1000000000L, 2L),
      ("a", 3000000000L, 3L)).toDF("k", "ts", "id")
    val r = StatsOps.exponentialFitKs(df, "k", "ts", "id").collect().head
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-12)
    val lam = 2.0 * 1e9 / 3.0e9
    assert(math.abs(r.getDouble(3) - lam) < 1e-12)
    val f1 = 1.0 - math.exp(-lam * 1.0)
    val f2 = 1.0 - math.exp(-lam * 2.0)
    val ks = math.max(math.max(0.5 - f1, f1 - 0.0),
      math.max(1.0 - f2, f2 - 0.5))
    assert(math.abs(r.getDouble(4) - ks) < 1e-12)
  }

  test("cuped: pooled theta, per-arm adjusted variance and reduction, " +
      "hand-traced") {
    // arm 0: (1,2),(2,4); arm 1: (3,5),(4,8)
    // mpre=2.5 mpost=4.75 mpre2=7.5 mprepost=14.25
    // theta = (14.25-11.875)/(7.5-6.25) = 2.375/1.25 = 1.9
    val df = Seq((0L, 1.0, 2.0), (0L, 2.0, 4.0), (1L, 3.0, 5.0),
      (1L, 4.0, 8.0)).toDF("arm", "pre", "post")
    val got = StatsOps.cuped(df, "arm", "pre", "post")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (n0, m0, vp0, va0, red0) = got(0L)
    // arm 0 adj: 2-1.9*(1-2.5)=4.85, 4-1.9*(2-2.5)=4.95
    assert(n0 == 2L && math.abs(m0 - 3.0) < 1e-12)
    assert(math.abs(vp0 - 1.0) < 1e-12)
    assert(math.abs(va0 - 0.0025) < 1e-9)
    assert(math.abs(red0 - (1.0 - 0.0025)) < 1e-9)
    val (n1, m1, vp1, va1, red1) = got(1L)
    // arm 1 adj: 5-1.9*0.5=4.05, 8-1.9*1.5=5.15
    assert(n1 == 2L && math.abs(m1 - 6.5) < 1e-12)
    assert(math.abs(vp1 - 2.25) < 1e-12)
    assert(math.abs(va1 - 0.3025) < 1e-9)
    assert(math.abs(red1 - (1.0 - 0.3025 / 2.25)) < 1e-9)
  }

  test("weightedVocabJaccard: sum-min over shared terms, max via the " +
      "tot_a + tot_b - inter identity; disjoint pair keeps a zero row") {
    val df = Seq(("a", "x x y"), ("b", "x y y z"), ("c", "q"))
      .toDF("g", "body")
    val got = CurationOps.weightedVocabJaccard(df, "g", "body")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet ==
      Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (iAb, ta, tb, wAb) = got(("a", "b"))
    // a: x2 y1 (tot 3); b: x1 y2 z1 (tot 4); min-sum 1+1=2 -> 2/5
    assert(iAb == 2L && ta == 3L && tb == 4L)
    assert(math.abs(wAb - 0.4) < 1e-12)
    assert(got(("a", "c"))._1 == 0L && got(("a", "c"))._4 == 0.0)
  }

  test("retrievalNdcg: score order vs gain order, hand-traced on a " +
      "corpus where the long high-tf doc ranks below the short one") {
    val docs = Seq(
      (1L, "data"),
      (2L, ("data data " + Seq.fill(48)("x").mkString(" "))),
      (3L, "x")).toDF("id", "body")
    val r = CurationOps.retrievalNdcg(docs, "id", "body",
      Seq("data"), kTop = 2).collect().head
    assert(r.getString(0) == "data" && r.getLong(1) == 2L)
    // mirror the operator arithmetic
    val avgdl = 52.0 / 3.0
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def score(tf: Double, dl: Double): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    // d1 (tf1, dl1) outranks d2 (tf2, dl50) on score; gains favor d2
    assert(score(1.0, 1.0) > score(2.0, 50.0))
    val ln2 = math.log(2.0)
    val dcg = 1.0 / (math.log(2.0) / ln2) + 2.0 / (math.log(3.0) / ln2)
    val idcg = 2.0 / (math.log(2.0) / ln2) + 1.0 / (math.log(3.0) / ln2)
    assert(math.abs(r.getDouble(2) - dcg) < 1e-12)
    assert(math.abs(r.getDouble(3) - idcg) < 1e-12)
    assert(math.abs(r.getDouble(4) - dcg / idcg) < 1e-12)
  }
}
