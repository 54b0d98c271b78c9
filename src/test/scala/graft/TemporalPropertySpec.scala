package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FunnelOps, TemporalJoinOps}

/** Randomized brute-force cross-checks for the temporal family: the
  * distributed as-of join and funnel must agree with a direct
  * per-entity Scala evaluation of their declared semantics on random
  * inputs — heavy timestamp ties, null timestamps, and entities with
  * missing sides included. Five seeded datasets each (Spark job per
  * dataset, so the suite stays fast). */
class TemporalPropertySpec extends AnyFunSuite with SparkTestBase {

  test("asofJoinLast matches brute force on random tied/null data") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // small ts domain (0..19) forces many exact ties
      val lefts = (0 until 150).map { i =>
        (s"k${rnd.nextInt(4)}",
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(20).toLong),
          i.toLong)
      }
      val rights = (0 until 120).map { i =>
        (s"k${rnd.nextInt(5)}", // k4 exists only on the right
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(20).toLong),
          (1000 + i).toLong, rnd.nextInt(100).toDouble)
      }
      val expected = lefts.map { case (k, ts, ord) =>
        val m = ts.flatMap { t =>
          rights.filter(r => r._1 == k && r._2.exists(_ <= t))
            .sortBy(r => (r._2.get, r._3)).lastOption.map(_._4)
        }
        (k, ord, m)
      }.toSet
      val got = TemporalJoinOps.asofJoinLast(
          lefts.toDF("k", "ts", "ord"), rights.toDF("k", "ts", "ord", "v"),
          Seq("k"), "ts", "ord", "v")
        .select(col("k"), col("ord"), col("asof_v"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("asofJoinNext matches brute force on random tied/null data") {
    import spark.implicits._
    for (seed <- 6 to 10) {
      val rnd = new scala.util.Random(seed)
      val lefts = (0 until 150).map { i =>
        (s"k${rnd.nextInt(4)}",
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(20).toLong),
          i.toLong)
      }
      val rights = (0 until 120).map { i =>
        (s"k${rnd.nextInt(5)}",
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(20).toLong),
          (1000 + i).toLong, rnd.nextInt(100).toDouble)
      }
      val expected = lefts.map { case (k, ts, ord) =>
        val m = ts.flatMap { t =>
          rights.filter(r => r._1 == k && r._2.exists(_ >= t))
            .sortBy(r => (r._2.get, r._3)).headOption.map(_._4)
        }
        (k, ord, m)
      }.toSet
      val got = TemporalJoinOps.asofJoinNext(
          lefts.toDF("k", "ts", "ord"), rights.toDF("k", "ts", "ord", "v"),
          Seq("k"), "ts", "ord", "v")
        .select(col("k"), col("ord"), col("asof_v"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("rangeSelfPairs matches brute force incl. bucket boundaries") {
    import spark.implicits._
    for (seed <- 16 to 20) {
      val rnd = new scala.util.Random(seed)
      val tol = 10L
      // ts values cluster near multiples of tol to stress the
      // bucket-boundary expansion
      val rows = (0 until 120).map { i =>
        (s"k${rnd.nextInt(3)}",
          rnd.nextInt(8) * tol + rnd.nextInt(3) - 1L, i.toLong)
      }
      val expected = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._3 < b._3 && math.abs(a._2 - b._2) <= tol
      } yield {
        val (i, j) = (math.min(a._3, b._3), math.max(a._3, b._3))
        (a._1, i, j, math.abs(a._2 - b._2))
      }).toSet
      val got = TemporalJoinOps.rangeSelfPairs(
          rows.toDF("k", "tn", "id"), "k", "tn", "id", tol)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("funnelStageTimes matches the sequential automaton on random logs") {
    import spark.implicits._
    val stages = Seq("a", "b", "c")
    for (seed <- 11 to 15) {
      val rnd = new scala.util.Random(seed)
      val types = stages ++ Seq("x", "y") // noise types too
      val events = (0 until 250).map { i =>
        (rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)),
          rnd.nextInt(25).toLong, i.toLong)
      }
      // brute force: per entity fold (ts, tie)-sorted events through
      // the stage automaton (next unmatched stage matches iff its
      // predecessor is matched — at-or-after holds by sort order)
      val expected = events.groupBy(_._1).map { case (u, evs) =>
        var times = List.empty[Long]
        evs.sortBy(e => (e._3, e._4)).foreach { e =>
          val j = stages.indexOf(e._2)
          if (j == times.length) times = times :+ e._3
        }
        u -> times
      }
      val got = FunnelOps.funnelStageTimes(
          events.toDF("u", "et", "t", "tie"), "u", "et", "t", "tie", stages)
        .collect().map { r =>
          r.getLong(0) -> stages.indices.toList
            .takeWhile(i => !r.isNullAt(i + 1)).map(i => r.getLong(i + 1))
        }.toMap
      assert(got == expected, s"seed $seed")
    }
  }
}
