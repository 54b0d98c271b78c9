package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, TextOps}

/** Persistable term-sharded inverted index — the lexical-retrieval
  * counterpart of [[IvfVectorStore]]: at 100 TB you cannot re-tokenize
  * the corpus per keyword query, and a monolithic postings table makes
  * every query a full postings scan. Layout under `path`:
  *
  *  - `postings/`: (t, doc_id, tf) written `partitionBy("shard")`
  *    with shard = md5Hash32(term) mod nShards — one directory per
  *    term shard, so a |Q|-term query is a PARTITION-PRUNED scan
  *    reading at most |Q| of nShards directories.
  *  - `doclens/`: (doc_id, dl) — the BM25 length-normalization side.
  *  - `stats/`: (n_docs, total_tokens, n_shards) rows, one per
  *    ingest, folded by SUM at read time — counters are mergeable,
  *    so [[append]] never rewrites old statistics (the CMS-store
  *    fold contract).
  *
  * [[append]] tokenizes ONLY the delta and appends shard-directory
  * files + a stats row; old postings are never read or rewritten
  * (re-ingesting an id is the caller's contract to avoid, as in
  * [[IvfVectorStore]]).
  *
  * [[searchBm25]] reproduces `CurationOps.bm25Scores` op for op
  * (identical idf / tf / length-normalization expression tree), with
  * corpus statistics folded from the store: a store built+appended
  * over a corpus scores every query like the one-shot scan
  * computation up to per-doc SUM fold order (last-ulp — identical
  * after the e6 pin, which is what the q193 oracle hashes on; the
  * store spec bounds the raw delta at 1e-12). avgdl equivalence IS
  * exact: doc lengths are integers, so the scan path's AVG (a double
  * sum of integer-valued doubles, exact below 2^53) equals
  * total_tokens / n_docs.
  */
object InvertedIndexStore {

  /** Driver-side twin of `CurationOps.md5Hash32` (first 8 md5 hex
    * digits as a long) — shard ids for literal query terms without a
    * Spark job. */
  private[sources] def md5Hash32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def shardOf(term: Column, nShards: Int): Column =
    pmod(CurationOps.md5Hash32(term), lit(nShards.toLong))

  private def tokenized(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))

  private def writeParts(spark: SparkSession, toks: DataFrame,
                         nShards: Int, path: String,
                         mode: String): Unit = {
    val lens = toks.select(col("doc_id"), size(col("toks")).as("dl"))
      .localCheckpoint(false)
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      .withColumn("shard", shardOf(col("t"), nShards))
    // lens feeds the doclens AND stats writers below — materialize
    // before the fork (StoreCompaction.inParallel's contract), then
    // overlap the three independent subdir writes (guide §2.6)
    lens.count()
    StoreCompaction.inParallel(
      // cluster rows by shard before the dynamic-partition write (the
      // IvfVectorStore discipline): one file per shard per ingest, not
      // tasks x shards
      () => tf.repartition(col("shard"))
        .write.mode(mode).partitionBy("shard")
        .parquet(s"$path/postings"),
      () => lens.write.mode(mode).parquet(s"$path/doclens"),
      () => lens.agg(count(lit(1)).as("n_docs"),
          sum(col("dl").cast("long")).as("total_tokens"),
          lit(nShards.toLong).as("n_shards"))
        .coalesce(1).write.mode(mode).parquet(s"$path/stats"))
  }

  /** Build the index from scratch: one corpus scan. */
  def write(spark: SparkSession, corpus: DataFrame, idCol: String,
            textCol: String, nShards: Int, path: String): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    writeParts(spark, tokenized(corpus, idCol, textCol), nShards,
      path, "overwrite")
  }

  /** Delta ingest: tokenize and shard ONLY the new docs, append
    * files + a mergeable stats row. Old postings stay untouched. */
  def append(spark: SparkSession, delta: DataFrame, idCol: String,
             textCol: String, path: String): Unit = {
    val nShards = foldedStats(spark, path)._3
    writeParts(spark, tokenized(delta, idCol, textCol), nShards,
      path, "append")
  }

  /** Small-file compaction: rewrite the per-ingest delta files into
    * one file per shard directory (postings keep the term-pruning
    * layout), `nFiles` doclens files, and ONE pre-folded stats row —
    * equivalent under the read-time SUM/MAX fold, so the mergeable-
    * counters contract survives and later appends keep working.
    * Pure physical reorganization (round-trip spec pins searchBm25
    * equality before/after plus the file-count drop). */
  def compact(spark: SparkSession, path: String, nFiles: Int = 1)
      : Unit =
    // independent per-directory rewrites — overlapped (guide §2.6)
    StoreCompaction.inParallel(
      () => StoreCompaction.rewrite(spark, s"$path/postings") { tmp =>
        spark.read.parquet(s"$path/postings")
          .repartition(col("shard"))
          .write.mode("overwrite").partitionBy("shard").parquet(tmp)
      },
      () => StoreCompaction.rewrite(spark, s"$path/doclens") { tmp =>
        spark.read.parquet(s"$path/doclens").repartition(nFiles)
          .write.mode("overwrite").parquet(tmp)
      },
      () => StoreCompaction.rewrite(spark, s"$path/stats") { tmp =>
        spark.read.parquet(s"$path/stats")
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_tokens")).as("total_tokens"),
            max(col("n_shards")).as("n_shards"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
      })

  /** (n_docs, total_tokens, n_shards) folded across ingests. */
  private def foldedStats(spark: SparkSession, path: String)
      : (Long, Long, Int) = {
    val r = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")), sum(col("total_tokens")),
        max(col("n_shards")))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2).toInt)
  }

  /** BM25 top-k over the persisted index: the postings scan carries a
    * partition filter on the query terms' shard set (asserted in the
    * store spec) plus a term filter, df/idf derive from the pruned
    * postings, and the doc-length join touches only candidate docs.
    * Identical scoring expression tree to `bm25Scores`; ties break
    * doc_id asc. Output: (doc_id, bm25), top `k` by score. */
  def searchBm25(spark: SparkSession, path: String,
                 queryTerms: Seq[String], k: Int, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1,
      s"need query terms and k >= 1, got $k")
    val (nDocsL, totalTokens, nShards) = foldedStats(spark, path)
    val nDocs = nDocsL.toDouble
    val avgdl = if (nDocsL == 0) 1.0 else totalTokens.toDouble / nDocs
    val terms = queryTerms.map(_.toLowerCase).distinct
    val shards = terms.map(t => md5Hash32Local(t) % nShards).distinct
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("shard").isin(shards: _*) &&
        col("t").isin(terms: _*))
      .select(col("doc_id"), col("t"), col("tf").cast("double").as("tf"))
    val idf = tf.groupBy(col("t"))
      .agg(count(lit(1)).cast("double").as("nd"))
      .select(col("t"),
        log(lit(1.0) + (lit(nDocs) - col("nd") + 0.5) /
          (col("nd") + 0.5)).as("idf"))
    val lens = spark.read.parquet(s"$path/doclens")
      .select(col("doc_id"), col("dl").cast("double").as("dl"))
    tf.join(broadcast(idf), "t")
      .join(lens, "doc_id")
      .select(col("doc_id"),
        (col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
          .as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
