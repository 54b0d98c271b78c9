package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.OfflineAnalytics
import graft.sources.SessionizedCsvReader

/** Golden replay of the reference pipeline's terminal PLOT stage
  * (Python Plotting/main.py:106,135) as a tidy artifact table over the
  * checked-in Vibration-HS CSV: the plotted third-run series, the
  * run-stat populations, the stats-box arm averages, and the Welch
  * t/p values must all be internally consistent and match the
  * already-pinned analysis numbers. */
class PlotArtifactSpec extends AnyFunSuite with SparkTestBase {

  private lazy val samples =
    SessionizedCsvReader.read(spark, SessionizedCsvReader.GoldenCsv).cache()

  test("plot artifact over the golden CSV: series = each arm's third " +
      "run, stats rows replay the analysis bit-for-bit") {
    val art = OfflineAnalytics.plotArtifact(samples, "acceleration_g")
      .cache()
    val (rs, summary, welch) =
      OfflineAnalytics.analyze(samples, "acceleration_g")

    // one plotted line per arm, and it is the arm's 3rd run in file
    // order (main.py:106 first_3_count == 2)
    val series = art.filter(col("element") === "series")
    val perArm = series.groupBy(col("arm"))
      .agg(countDistinct(col("run_id")).as("n_runs"),
        min(col("run_id")).as("rid"),
        count(lit(1)).as("n"),
        min(col("time_s")).as("t0"),
        sqrt(avg(col("value") * col("value"))).as("series_rms"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(perArm.size == 2)
    val rsRows = rs.collect().map(r => (r.getAs[String]("arm"),
      r.getAs[Long]("run_id"), r.getAs[Long]("n"),
      r.getAs[Double]("rms")))
    for ((arm, (nRuns, rid, n, t0, seriesRms)) <- perArm) {
      assert(nRuns == 1L, s"$arm plots exactly one run")
      // third run in file order for this arm
      val armRuns = rsRows.filter(_._1 == arm).map(_._2).sorted
      assert(rid == armRuns(2), s"$arm plotted run is the 3rd")
      val (_, _, wantN, wantRms) =
        rsRows.find(r => r._1 == arm && r._2 == rid).get
      assert(n == wantN, s"$arm series length = run sample count")
      assert(t0 == 0.0, s"$arm time axis starts at 0")
      // the series IS the filtered signal the stats were taken from
      assert(math.abs(seriesRms - wantRms) <=
        1e-12 * math.max(1.0, math.abs(wantRms)),
        s"$arm series rms $seriesRms vs run_stat $wantRms")
    }

    // run_stat rows = runStats unpivoted (exact)
    val runStatRms = art.filter(col("element") === "run_stat" &&
        col("stat") === "rms")
      .select(col("arm"), col("run_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(runStatRms.size == 10)
    rsRows.foreach { case (arm, rid, _, rms) =>
      assert(runStatRms((arm, rid)) == rms)
    }

    // arm_avg rows = the stats-box averages (exact)
    val armAvg = art.filter(col("element") === "arm_avg" &&
        col("stat") === "rms")
      .collect().map(r => r.getAs[String]("arm") ->
        r.getAs[Double]("value")).toMap
    summary.collect().foreach { r =>
      assert(armAvg(r.getAs[String]("arm")) == r.getAs[Double]("avg_rms"))
    }

    // t_test rows = the pinned Welch results (exact)
    val tRows = art.filter(col("element") === "t_test")
      .collect().map(r => r.getAs[String]("stat") ->
        r.getAs[Double]("value")).toMap
    assert(tRows.size == 6)
    welch.foreach { wr =>
      assert(tRows(s"${wr.stat}_t") == wr.t)
      assert(tRows(s"${wr.stat}_p") == wr.p)
    }
    art.unpersist()
    ()
  }

  test("jerk channel artifact: derivative series consistent with its " +
      "run stats") {
    val art = OfflineAnalytics.plotArtifact(samples, "acceleration_g",
      derivative = true)
    val rs = OfflineAnalytics.runStats(samples, "acceleration_g",
      derivative = true)
    val got = art.filter(col("element") === "series")
      .groupBy(col("arm"), col("run_id"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = rs.collect().map(r => (r.getAs[String]("arm"),
      r.getAs[Long]("run_id")) ->
      (r.getAs[Long]("n"), r.getAs[Double]("max"))).toMap
    got.foreach { case (k, (n, mx)) =>
      assert(want(k)._1 == n && want(k)._2 == mx, s"run $k")
    }
  }
}
