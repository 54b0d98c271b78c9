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

  test("markovLogLik: add-one smoothing over the vocab bracket") {
    // trigram grid: (A,A,A) n=1, (A,A,B) n=2; context (A,A) n12=3;
    // vocab = {A, B} so V = 2. p(AAA) = (1+1)/(3+2) = 0.4,
    // p(AAB) = (2+1)/(3+2) = 0.6; ll = n * ln p.
    val m = SequenceOps.markovLogLik(ev, "ent", "typ",
      Seq(col("tus"), col("eid")), alpha = 1.0)
      .select("t1", "t2", "t3", "n", "n12", "v", "p", "ll")
      .as[(String, String, String, Long, Long, Long, Double, Double)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    assert(m.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSeq ===
      Seq(("A", "A", "A", 1L, 3L, 2L), ("A", "A", "B", 2L, 3L, 2L)))
    assert(math.abs(m(0)._7 - 0.4) < 1e-12)
    assert(math.abs(m(1)._7 - 0.6) < 1e-12)
    assert(math.abs(m(0)._8 - 1.0 * math.log(0.4)) < 1e-12)
    assert(math.abs(m(1)._8 - 2.0 * math.log(0.6)) < 1e-12)
  }

  test("gapConstrainedTrigrams: both gaps must fit the budget") {
    // e1 tus 1,2,3,4 (gaps 1); e2 tus 5,6,7 (gaps 1). maxGap 1 keeps
    // all 3 trigrams; maxGap 0 keeps none.
    val tight = SequenceOps.gapConstrainedTrigrams(ev, "ent", "typ",
      col("tus"), Seq(col("tus"), col("eid")), maxGapUs = 1L)
      .select("t1", "t2", "t3", "n", "n_fast")
      .as[(String, String, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(tight.map(r => (r._4, r._5)).toSeq === Seq((1L, 1L), (2L, 2L)))
    val zero = SequenceOps.gapConstrainedTrigrams(ev, "ent", "typ",
      col("tus"), Seq(col("tus"), col("eid")), maxGapUs = 0L)
      .select("n_fast").as[Long].collect()
    assert(zero.sum === 0L)
  }

  test("pairNgramRouge: precision vs id2, recall vs id1, F1") {
    // ref (id1=1): "a b a"; cand (id2=2): "a a a a". Unigrams:
    // ref {a:2, b:1} total1=3; cand {a:4} total2=4; clipped =
    // min(4,2)=2. precision=2/4, recall=2/3.
    val docs = Seq((1L, "a b a"), (2L, "a a a a")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val r = graft.operators.TextOps.pairNgramRouge(docs, "doc_id",
      "text", pairs, n = 1)
      .select("total1", "total2", "clipped", "precision", "recall", "f1")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(r.length === 1)
    val row = r.head
    assert((row._1, row._2, row._3) === (3L, 4L, 2L))
    assert(math.abs(row._4 - 0.5) < 1e-12)
    assert(math.abs(row._5 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(row._6 - 2.0 * 0.5 * (2.0 / 3.0) /
      (0.5 + 2.0 / 3.0)) < 1e-12)
  }
}
