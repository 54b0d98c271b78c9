package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SequenceOps

/** Pins the SequenceOps semantics the r7 ADVICE flagged: trigram
  * support is normalized by the TOTAL observed grid (not the
  * minCount-surviving subset), and dwellToNext runs one scan,
  * emits one row per requested target (n = 0 when a target never
  * follows a source), and rejects an empty target list. */
class SequenceOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // entity e1: A A A B ; entity e2: A A B  (ts, id give total order)
  private lazy val ev = Seq(
    ("e1", "A", 1L, 1L), ("e1", "A", 2L, 2L), ("e1", "A", 3L, 3L),
    ("e1", "B", 4L, 4L),
    ("e2", "A", 5L, 5L), ("e2", "A", 6L, 6L), ("e2", "B", 7L, 7L)
  ).toDF("ent", "typ", "tus", "eid")

  test("markovTransitions: pair counts, row totals, probabilities") {
    // e1 pairs: A->A, A->A, A->B ; e2: A->A, A->B
    val m = SequenceOps.markovTransitions(ev, "ent", "typ",
      Seq(col("tus"), col("eid")))
      .select("from_state", "to_state", "n", "n_from")
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(m.toSeq === Seq(("A", "A", 3L, 5L), ("A", "B", 2L, 5L)))
  }

  test("episodeTrigrams: support normalized by the PRE-filter total") {
    // trigrams: e1 -> (A,A,A), (A,A,B); e2 -> (A,A,B). Grid:
    // (A,A,B) n=2, (A,A,A) n=1, total observed = 3.
    val t2 = SequenceOps.episodeTrigrams(ev, "ent", "typ",
      Seq(col("tus"), col("eid")), minCount = 2L)
      .select("t1", "t2", "t3", "n", "total", "support")
      .as[(String, String, String, Long, Long, Double)].collect()
    assert(t2.length === 1)
    val row = t2.head
    assert((row._1, row._2, row._3, row._4) === ("A", "A", "B", 2L))
    assert(row._5 === 3L, "total must count the filtered-out trigram too")
    assert(math.abs(row._6 - 2.0 / 3.0) < 1e-12)
  }

  test("dwellToNext: one row per target, n=0 spine row, single scan") {
    // source A; targets B (follows in both entities) and C (never
    // occurs). e1: A@1->B@4 (3), A@2->B@4 (2), A@3->B@4 (1);
    // e2: A@5->B@7 (2), A@6->B@7 (1).
    val d = SequenceOps.dwellToNext(ev, "ent", "typ", col("tus"),
      Seq(col("tus"), col("eid")), "A", Seq("B", "C"))
    val rows = d.select("target", "n", "sum_us", "max_us")
      .as[(String, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      ("B", 5L, Some(9L), Some(3L)),
      ("C", 0L, None, None)))
    // single events scan: the unpivoted plan reads the source once
    val scans = d.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("LocalTableScan"))
    assert(scans <= 2, "per-target re-scan crept back in")
  }

  test("dwellToNext: empty targetTypes is rejected") {
    intercept[IllegalArgumentException] {
      SequenceOps.dwellToNext(ev, "ent", "typ", col("tus"),
        Seq(col("tus"), col("eid")), "A", Seq.empty)
    }
  }
}
