package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Hand-traced specs for BFS distances and degree assortativity. */
class GraphExtrasSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bfsDistances: multi-source min-hop with a hop bound; " +
      "unreachable and beyond-bound nodes absent") {
    // chain 1->2->3->4->5 plus island 6->7
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("s", "d")
    val got = GraphOps.bfsDistances(e, "s", "d", Seq(1L, 6L), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      6L -> 0L, 7L -> 1L)) // 5 is 4 hops out -> absent
  }

  test("bfsDistances: settled nodes keep their first (minimal) " +
      "distance on cyclic graphs; early-exit terminates before maxHops") {
    // triangle 1->2->3->1: all settled by hop 2, loop must stop early
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = GraphOps.bfsDistances(e, "s", "d", Seq(1L), maxHops = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("degreeAssortativity: star graph is perfectly disassortative") {
    val dir = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val sym = dir.union(dir.select(col("d"), col("s")))
    val r = GraphOps.degreeAssortativity(sym, "s", "d").collect()(0)
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-12)
  }

  test("degreeAssortativity: regular graph has undefined corr (NaN/null)") {
    // 4-cycle symmetrized: every degree 2 -> zero variance
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val sym = dir.union(dir.select(col("d"), col("s")))
    val r = GraphOps.degreeAssortativity(sym, "s", "d").collect()(0)
    assert(r.getLong(0) == 8L)
    assert(r.isNullAt(1) || r.getDouble(1).isNaN)
  }
}
