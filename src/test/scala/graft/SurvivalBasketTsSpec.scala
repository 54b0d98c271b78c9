package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ScaleOps, StatsOps}

/** Hand-traced specs for the round-6 second-session additions:
  * Kaplan-Meier survival, market-basket lift, autocorrelation,
  * stratified IPW, Holt forecasting, and the compaction planner. */
class SurvivalBasketTsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("kaplanMeier: textbook trace — censoring thins the risk set " +
      "without a survival step; event rows only") {
    // durations: 1e, 2e, 2e, 3c, 4e, 5c (e=event, c=censored)
    //   t=1: n=6, d=1 -> S = 5/6
    //   t=2: n=5, d=2 -> S = 5/6 * 3/5 = 1/2
    //   t=3: censor only (dropped from output)
    //   t=4: n=2, d=1 -> S = 1/4
    //   t=5: censor only
    val df = Seq((1L, true), (2L, true), (2L, true), (3L, false),
      (4L, true), (5L, false)).toDF("dur", "ev")
    val got = StatsOps.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L)._1 == 6L && got(1L)._2 == 1L && got(1L)._3 == 0L)
    assert(math.abs(got(1L)._4 - 5.0 / 6.0) < 1e-12)
    assert(got(2L) == ((5L, 2L, 0L, 0.5)))
    assert(got(4L)._1 == 2L && math.abs(got(4L)._4 - 0.25) < 1e-12)
  }

  test("kaplanMeier: terminal d = n_risk emits surv exactly 0, " +
      "not via ln(0)") {
    val df = Seq((1L, true), (2L, true)).toDF("dur", "ev")
    val got = StatsOps.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(got(1L) - 0.5) < 1e-12)
    assert(got(2L) == 0.0)
  }

  test("pairLift: in-basket duplicates collapse; support / " +
      "confidence / lift hand trace") {
    // b1:{x,x,y} b2:{x,y} b3:{x,z} b4:{y} -> n_baskets=4,
    // n_x=3 n_y=3 n_z=1; pairs (x,y):2 (x,z):1
    val df = Seq(("b1", "x"), ("b1", "x"), ("b1", "y"), ("b2", "x"),
      ("b2", "y"), ("b3", "x"), ("b3", "z"), ("b4", "y"))
      .toDF("b", "i")
    val got = StatsOps.pairLift(df, "b", "i").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    assert(got.size == 2)
    val (pn, na, nb, nk, sup, conf, lift) = got(("x", "y"))
    assert(pn == 2L && na == 3L && nb == 3L && nk == 4L)
    assert(math.abs(sup - 0.5) < 1e-12)
    assert(math.abs(conf - 2.0 / 3.0) < 1e-12)
    assert(math.abs(lift - 8.0 / 9.0) < 1e-12)
    val xz = got(("x", "z"))
    assert(xz._1 == 1L && math.abs(xz._7 - 4.0 / 3.0) < 1e-12)
    // minPairs floor prunes the singleton pair
    assert(StatsOps.pairLift(df, "b", "i", minPairs = 2L).count() == 1L)
  }

  test("acfByLag: linear ramp [1,2,3,4] — acf(1)=0.25, acf(2)=-0.3, " +
      "acf(3)=-0.45 with full-series denominator 5") {
    val df = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0), (3L, 4.0))
      .toDF("t", "x")
    val got = StatsOps.acfByLag(df, "t", "x", maxLag = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - 0.25) < 1e-12)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 + 0.30) < 1e-12)
    assert(got(3L)._1 == 1L && math.abs(got(3L)._2 + 0.45) < 1e-12)
  }

  test("ipwEstimate: hand-traced Hajek means; degenerate stratum " +
      "excluded and counted") {
    // s1: (1,10),(0,2)  e=0.5 | s2: (1,6),(1,8),(0,4),(0,0) e=0.5
    // s3: (1,100) e=1 -> excluded
    // mean_t = (20+12+16)/6 = 8 ; mean_c = (4+8+0)/6 = 2 ; ate 6
    val df = Seq((1, "s1", 10.0), (0, "s1", 2.0), (1, "s2", 6.0),
      (1, "s2", 8.0), (0, "s2", 4.0), (0, "s2", 0.0),
      (1, "s3", 100.0)).toDF("t", "s", "y")
    val r = StatsOps.ipwEstimate(df, col("t") === 1, col("s"), col("y"))
      .collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - 8.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(5) - 6.0) < 1e-12)
  }

  test("holtForecast: [10,12,11] with a=0.5 g=0.25 — state (12.5, " +
      "1.625), linear forecasts") {
    // init (l,b) = (12, 2); x=11: l' = 0.5*11+0.5*14 = 12.5,
    // b' = 0.25*0.5 + 0.75*2 = 1.625
    val df = Seq((0L, 10.0), (1L, 12.0), (2L, 11.0)).toDF("t", "x")
    val got = StatsOps.holtForecast(df, "t", "x", alpha = 0.5,
        gamma = 0.25, hMax = 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got(1L) == ((12.5, 1.625, 14.125)))
    assert(got(2L) == ((12.5, 1.625, 15.75)))
  }

  test("holtForecast: two-point series folds nothing — state is the " +
      "init (x1, x1-x0)") {
    val df = Seq((0L, 3.0), (1L, 7.0)).toDF("t", "x")
    val got = StatsOps.holtForecast(df, "t", "x", 0.5, 0.25, 1)
      .collect().head
    assert(got.getDouble(1) == 7.0 && got.getDouble(2) == 4.0 &&
      got.getDouble(3) == 11.0)
  }

  test("compactionPlan: running-size-before packing — sizes " +
      "[5,5,5,5] at target 8 split 2|2; independent per source") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L),
      ("a", 4L, 5L), ("z", 9L, 100L)).toDF("src", "id", "sz")
    val got = ScaleOps.compactionPlan(df, "src", "id", col("sz"), 8L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got(("a", 0L)) == ((2L, 10L, 1L, 2L, 1.25)))
    assert(got(("a", 1L)) == ((2L, 10L, 3L, 4L, 1.25)))
    // the oversized lone file still lands in shard 0 of its source
    assert(got(("z", 0L))._2 == 100L)
    assert(got.size == 3)
  }
}
