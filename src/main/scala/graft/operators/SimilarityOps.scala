package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (Array[Float]). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k with the (small) query set
  *    broadcast against the corpus — the corpus is scanned once with no
  *    corpus-side shuffle of vectors; only (query, candidate, score)
  *    tuples shuffle for the final top-k, so it scales linearly in
  *    corpus size. The right baseline, and correct at any scale where
  *    |queries| is modest.
  *  - [[lshTopK]]: sign-of-projection (hyperplane) LSH bucketing with
  *    deterministic pseudo-planes, re-ranked exactly within buckets —
  *    the 100 TB path when the query set is itself huge (bucket join
  *    replaces the broadcast).
  *
  * All vector math is column expressions (zip_with/aggregate), kept in
  * double precision.
  */
object SimilarityOps {

  /** Dot product via the codegen'd [[graft.functions.VectorDot]]
    * expression (same left-to-right summation order as the
    * higher-order-function form, so oracle parity is unaffected). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.vectorDot(
      a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension i): a fixed hash mapped to [-0.5, 0.5). No RNG at
    * runtime — the "planes" are a pure function of (p, i), so any
    * executor regenerates them identically. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(concat(lit(s"plane-$p-"), i.cast("string"))), lit(100000L))
      .cast("double") / 100000.0) - 0.5

  /** Sign bit of the projection of `v` onto pseudo-plane p. */
  private def planeSign(v: Column, p: Int): Column = {
    val proj = aggregate(
      zip_with(v.cast("array<double>"),
        sequence(lit(0), size(v) - 1),
        (x, i) => x * planeComponent(p, i)),
      lit(0.0d), (acc, x) => acc + x)
    when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
  }

  /** LSH bucket id: `planes` sign bits packed into a long. */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    (0 until planes).map(p => planeSign(v, p)).reduce(_ bitwiseOR _)

  /** Project (id, vector) with the vector cast to double and its norm
    * precomputed once — pairwise scoring then needs only the dot
    * product (1 array fold per pair instead of 3). */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
                       idAs: String, vecAs: String, normAs: String)
      : DataFrame =
    df.select(col(idCol).as(idAs),
        col(vecCol).cast("array<double>").as(vecAs))
      .withColumn(normAs, norm(col(vecAs)))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-matches excluded). Output: qid, nid, cos. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "nid", "cv", "cn")
    val q = withNorm(queries, idCol, vecCol, "qid", "qv", "qn")
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }

  /** IVF-style ANN top-k: a deterministic coarse quantizer (the
    * `nCentroids` corpus vectors with smallest xxhash64(id) — a
    * random-but-reproducible sample) partitions the corpus into cells;
    * each query probes its `nProbes` nearest cells and re-ranks
    * exactly inside them. The corpus-side assignment is one broadcast
    * pass (corpus x nCentroids dot products, no shuffle of vectors);
    * the probe join shuffles only on the small cell id. Recall rises
    * with nProbes at linear extra cost — the standard IVF trade. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbes: Int = 4): DataFrame = {
    val cents = withNorm(corpus, idCol, vecCol, "cent_id", "centv", "centn")
      .withColumn("h", xxhash64(col("cent_id")))
      .orderBy(col("h"))
      .limit(nCentroids)
      .drop("h")
    def assign(side: DataFrame, id: String, v: String, n: String,
               probes: Int): DataFrame = {
      val scored = side.crossJoin(broadcast(cents))
        .withColumn("centcos",
          dot(col(v), col("centv")) / (col(n) * col("centn")))
      val w = Window.partitionBy(col(id))
        .orderBy(col("centcos").desc, col("cent_id"))
      scored.withColumn("crk", row_number().over(w))
        .filter(col("crk") <= probes)
        .select(col(id), col(v), col(n), col("cent_id"))
    }
    val c = assign(withNorm(corpus, idCol, vecCol, "nid", "cv", "cn"),
      "nid", "cv", "cn", probes = 1)
    val q = assign(withNorm(queries, idCol, vecCol, "qid", "qv", "qn"),
      "qid", "qv", "qn", probes = nProbes)
    val scored = c.join(q, Seq("cent_id"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }

  /** LSH-bucketed ANN top-k: candidates share a hyperplane bucket, then
    * exact cosine re-rank within the bucket. Recall depends on `planes`
    * (fewer planes = bigger buckets = higher recall + more work). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 8): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "nid", "cv", "cn")
      .withColumn("bucket", hyperplaneBucket(col("cv"), planes))
    val q = withNorm(queries, idCol, vecCol, "qid", "qv", "qn")
      .withColumn("bucket", hyperplaneBucket(col("qv"), planes))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }
}
