package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** Hand-computable pins for the round-9 vector selectors: greedy
  * k-center (Gonzalez) selection order/radii and the TwoNN
  * intrinsic-dimension estimator (incl. the duplicate-vector
  * exclusion rule). */
class CoresetTwoNNSpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("kCenterCoreset: greedy selection order and radii on a line") {
    // points 0, 10, 4, 7 on a line; seed = min id (id 1 at 0).
    // iter2: farthest is id2 at 10 (d=10); iter3: id3 at 4
    // (min(4, 6) = 4); iter4: id4 at 7 (min(7, 3) = 3).
    val df = vecs(1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 0.0),
      3L -> Seq(4.0, 0.0), 4L -> Seq(7.0, 0.0))
    val out = SimilarityOps.kCenterCoreset(df, "vec_id", "embedding", 4)
      .orderBy("iter")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, 1L, 0.0), (2, 2L, 10.0), (3, 3L, 4.0),
      (4, 4L, 3.0)))
  }

  test("kCenterCoreset: equidistant tie picks the smaller id") {
    // seed id1 at 0; ids 2 and 3 both at distance 5 -> id 2 chosen.
    val df = vecs(1L -> Seq(0.0, 0.0), 2L -> Seq(5.0, 0.0),
      3L -> Seq(0.0, 5.0))
    val out = SimilarityOps.kCenterCoreset(df, "vec_id", "embedding", 2)
      .orderBy("iter").collect()
    assert(out(1).getLong(1) == 2L && out(1).getDouble(2) == 5.0)
  }

  test("kCenterCoreset: k larger than the point count degrades to " +
      "the |points|-sized coreset instead of NPE-ing") {
    val df = vecs(1L -> Seq(0.0), 2L -> Seq(3.0))
    val out = SimilarityOps.kCenterCoreset(df, "vec_id", "embedding", 5)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, 1L, 0.0), (2, 2L, 3.0)))
  }

  test("kCenterCoreset: empty input fails with a clear message") {
    val df = vecs().filter(lit(false))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.kCenterCoreset(df, "vec_id", "embedding", 3)
    }
    assert(e.getMessage.contains("no rows"))
  }

  test("twoNN: single query on a line gives ID = 1 / ln(d2/d1)") {
    // query id 10 at 0; neighbors at 1 and 3 -> mu = 3, one query.
    val corpus = vecs(10L -> Seq(0.0), 11L -> Seq(1.0), 12L -> Seq(3.0))
    val out = SimilarityOps.twoNNIntrinsicDim(
        corpus.filter(col("vec_id") === 10L), corpus,
        "vec_id", "embedding")
      .collect().head
    assert(out.getLong(0) == 1L)
    assert(math.abs(out.getDouble(1) - 1.0 / math.log(3.0)) < 1e-12)
  }

  test("twoNN: verbatim-duplicate vectors (d1 = 0) are excluded") {
    val corpus = vecs(10L -> Seq(0.0), 11L -> Seq(0.0), 12L -> Seq(2.0),
      20L -> Seq(9.0), 21L -> Seq(10.0), 22L -> Seq(12.0))
    // query 10 has a duplicate (11) -> d1 = 0, dropped; query 20 has
    // d1 = 1 (21), d2 = 3 (22) -> the only contributor.
    val out = SimilarityOps.twoNNIntrinsicDim(
        corpus.filter(col("vec_id").isin(10L, 20L)), corpus,
        "vec_id", "embedding")
      .collect().head
    assert(out.getLong(0) == 1L)
    assert(math.abs(out.getDouble(1) - 1.0 / math.log(3.0)) < 1e-12)
  }
}
