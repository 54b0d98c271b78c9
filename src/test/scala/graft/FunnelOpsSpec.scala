package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FunnelOps

class FunnelOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (user, type, time, tie)
  private def ev(rows: (Long, String, Long, Long)*) =
    rows.toDF("user_id", "event_type", "t", "eid")

  test("funnelStageTimes: ordered matching, out-of-order events " +
      "don't count, equal timestamps satisfy at-or-after") {
    val events = ev(
      // u1 completes all three in order
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "c", 30L, 3L),
      // u2: b BEFORE a — b must not match; a matches, funnel stalls
      (2L, "b", 5L, 4L), (2L, "a", 9L, 5L),
      // u3: b at the SAME time as a — allowed (at-or-after)
      (3L, "a", 7L, 6L), (3L, "b", 7L, 7L),
      // u4: never does a — all stages null
      (4L, "b", 1L, 8L), (4L, "c", 2L, 9L),
      // u5: second a earlier than first-matched b? t0 keeps the MIN a
      (5L, "a", 50L, 10L), (5L, "a", 10L, 11L), (5L, "b", 40L, 12L))
    val got = FunnelOps
      .funnelStageTimes(events, "user_id", "event_type", "t", "eid",
        Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getLong(0),
        (0 to 2).map(i => if (r.isNullAt(i + 1)) -1L else r.getLong(i + 1))))
      .toMap
    assert(got(1L) == Seq(10L, 20L, 30L))
    assert(got(2L) == Seq(9L, -1L, -1L))
    assert(got(3L) == Seq(7L, 7L, -1L))
    assert(got(4L) == Seq(-1L, -1L, -1L))
    assert(got(5L) == Seq(10L, 40L, -1L))
  }

  test("funnelConversion: counts + e6 ratios from one aggregate row") {
    val events = ev(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L),
      (2L, "a", 1L, 3L),
      (3L, "b", 1L, 4L)) // b-only: reaches no stage (a first)
    val conv = FunnelOps.funnelConversion(
        FunnelOps.funnelStageTimes(events, "user_id", "event_type", "t",
          "eid", Seq("a", "b")), Seq("a", "b"))
      .orderBy("stage_idx")
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(conv.toSeq == Seq((0, "a", 2L, 1000000L), (1, "b", 1L, 500000L)))
  }

  test("funnel plan: every stage shares ONE entity shuffle + sort") {
    val events = ev((1L, "a", 1L, 1L))
    val staged = FunnelOps.funnelStageTimes(events, "user_id",
      "event_type", "t", "eid", Seq("a", "b", "c", "d"))
    val p = staged.queryExecution.executedPlan.toString
    // one hash exchange for the window stage + one for the final
    // per-entity rollup's partial->final agg; 4 stages must NOT add
    // exchanges or sorts beyond the single window sort.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"funnel stages re-shuffled:\n$p")
    assert("Sort ".r.findAllIn(p).size <= 1, s"extra sorts:\n$p")
  }

  test("cohortRetention: hand-computed daily matrix") {
    // width 10: u1 first bucket 0, active 0 and 2; u2 first bucket 2,
    // active 2 only; duplicate activity in one bucket counts once.
    val events = ev(
      (1L, "x", 3L, 1L), (1L, "x", 7L, 2L), (1L, "x", 25L, 3L),
      (2L, "x", 21L, 4L), (2L, "x", 29L, 5L))
    val got = FunnelOps.cohortRetention(events, "user_id", "t", 10L)
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }

  test("funnelStageTimes rejects stage-column collisions and dups") {
    val events = ev((1L, "a", 1L, 1L)).withColumn("t0", lit(0L))
    intercept[IllegalArgumentException] {
      FunnelOps.funnelStageTimes(events, "user_id", "event_type", "t",
        "eid", Seq("a"))
    }
    intercept[IllegalArgumentException] {
      FunnelOps.funnelStageTimes(ev((1L, "a", 1L, 1L)), "user_id",
        "event_type", "t", "eid", Seq("a", "a"))
    }
  }
}
