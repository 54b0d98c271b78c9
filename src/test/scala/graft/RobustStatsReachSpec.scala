package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, GraphOps, StatsOps}

/** Hand-traced specs for the round-6 additions: median/MAD robust
  * outliers, two-hop reach, and MinHash estimator calibration. */
class RobustStatsReachSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("madOutliers: hand-traced median/MAD flags only the wild value; " +
      "zero-MAD group falls back to not-equal-median") {
    // group a: [1,2,3,4,100] -> med 3; devs [2,1,0,1,97] -> MAD 1
    //   cutoff 3*1.4826*1 = 4.4478 -> only 97 exceeds -> 1 outlier
    // group b: [5,5,5,9] -> med (type-7 at h=1.5) = 5; devs
    //   [0,0,0,4] -> MAD (h=1.5 over [0,0,0,4]) = 0 -> degenerate
    //   rule: outlier iff value != median -> the single 9
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0))
      .toDF("g", "v")
    val got = StatsOps.madOutliers(df, "g", col("v"), cutoff = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5)))).toMap
    val (na, medA, madA, outA, fracA) = got("a")
    assert(na == 5L && medA == 3.0 && madA == 1.0 && outA == 1L)
    assert(math.abs(fracA - 0.2) < 1e-12)
    val (nb, medB, madB, outB, fracB) = got("b")
    assert(nb == 4L && medB == 5.0 && madB == 0.0 && outB == 1L)
    assert(math.abs(fracB - 0.25) < 1e-12)
    // nulls are dropped before the quantiles
    val withNull = df.unionByName(
      Seq(("a", Option.empty[Double])).toDF("g", "v"))
    val got2 = StatsOps.madOutliers(withNull, "g", col("v"))
      .filter(col("group") === "a").collect().head
    assert(got2.getLong(1) == 5L)
  }

  test("twoHopReach: directed blast radius excludes self, dedups " +
      "overlapping 1- and 2-hop targets") {
    // 1->2, 2->3, 1->3, 3->1:
    //   node 1: 1-hop {2,3}; 2-hop via 2 {3}, via 3 {1=self drop}
    //           -> reach {2,3} = 2, deg 2
    //   node 2: 1-hop {3}; 2-hop via 3 {1} -> reach {1,3} = 2, deg 1
    //   node 3: 1-hop {1}; 2-hop via 1 {2, 3=self drop}
    //           -> reach {1,2} = 2, deg 1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L),
      (1L, 2L) /* dup edge must not double-count */)
      .toDF("s", "d")
    val got = GraphOps.twoHopReach(e, "s", "d").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 2L)))
    assert(got(2L) == ((1L, 2L)))
    assert(got(3L) == ((1L, 2L)))
  }

  test("minhashCalibration: identical docs give est = jaccard = 1 " +
      "-> zero MAE and bias; estimates bounded in [0,1]") {
    val df = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val row = DedupOps.minhashCalibration(df, "doc_id", "text")
      .collect().head
    assert(row.getLong(0) >= 1L, "identical docs must be candidates")
    assert(row.getDouble(1) == 0.0 && row.getDouble(2) == 0.0)
    // a near-dup pair: estimate stays a valid probability and the
    // single-row rollup still materializes
    val near = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text")
    val r2 = DedupOps.minhashCalibration(near, "doc_id", "text")
      .collect().head
    if (r2.getLong(0) > 0) {
      // |bias| <= mae <= 1 always; est,jaccard in [0,1]
      assert(r2.getDouble(1) >= 0.0 && r2.getDouble(1) <= 1.0)
      assert(math.abs(r2.getDouble(2)) <= r2.getDouble(1) + 1e-12)
    }
  }
}
