package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * (hash-based) sampling and TF-IDF term scoring. Both are pure
  * scan-shaped or single-shuffle plans — no driver-side state, no RNG —
  * so a re-run over 100 TB selects the same rows, which is what makes
  * hash sampling the standard for reproducible dataset releases.
  */
object CurationOps {

  /** First 8 hex digits of md5 of the input string, as a 32-bit value
    * in a long — THE cross-engine hash idiom of this library (mirrored
    * by the DuckDB oracle generator's sqlHex32). Every consumer of a
    * deterministic uniform hash must go through this one definition so
    * the Spark and oracle sides cannot drift apart. */
  def md5Hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Deterministic inclusion predicate: keep a row iff
    * md5Hash32(salt + ":" + id) falls below rate * 2^32. Cross-engine
    * reproducible (md5 + integer compare — no engine RNG involved) and
    * stable under repartitioning, re-runs, and scale changes. */
  def hashKeep(id: Column, rate: Double, salt: String): Column = {
    val threshold = math.floor(rate * 4294967296.0).toLong
    md5Hash32(concat(lit(s"$salt:"), id.cast("string"))) < lit(threshold)
  }

  /** Stratified deterministic sample: per-stratum rates, one scan, no
    * shuffle (the sample is a filter, so it composes with pushdown —
    * at 100 TB the sample runs at scan speed). Strata absent from
    * `rates` get `defaultRate`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, r).otherwise(acc)
    }
    // rate is data-dependent, so inline the threshold comparison
    val hash32 =
      md5Hash32(concat(lit(s"$salt:"), col(idCol).cast("string")))
    df.filter(hash32 < floor(rate * 4294967296.0).cast("long"))
  }

  /** Deterministic train/val/test split assignment: the md5-hash
    * fraction of each id picks the split whose cumulative weight range
    * contains it. Reproducible across engines/runs/repartitioning and
    * disjoint by construction — the standard way to pin dataset splits
    * for a 100 TB corpus without a shuffle (it is a pure projection).
    * `weights` need not sum to 1; they are normalized. */
  def assignSplit(id: Column, weights: Seq[(String, Double)],
                  salt: String): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, s"bad weights $weights")
    val total = weights.map(_._2).sum
    val h = md5Hash32(concat(lit(s"$salt:"), id.cast("string")))
    // cumulative integer thresholds over the 32-bit hash space
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map(c => math.floor(c / total * 4294967296.0).toLong)
    weights.map(_._1).zip(cuts).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, (name, cut)) =>
        when(h < cut, name).otherwise(acc)
      }
  }

  /** Per-document TF-IDF top terms: tf = term count / doc tokens,
    * idf = ln((N + 1) / (df + 1)) + 1 (smoothed, never negative),
    * ranked per doc by (tfidf desc, term asc). Two shuffles: term
    * frequencies (doc_id, term) and document frequencies (term) — both
    * partial-aggregated map-side; N is a scalar broadcast. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("doc_len", sum(col("cnt"))
        .over(Window.partitionBy(col("doc_id"))))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = df.count()
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf",
        (col("cnt").cast("double") / col("doc_len")) *
          (log((lit(n.toDouble) + 1.0) / (col("df") + 1.0)) + 1.0))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("term"), col("rk"), col("tfidf"))
  }
}
