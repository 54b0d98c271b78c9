package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.operators.SimilarityOps.Centroid

/** Persistable IVF vector index — the incremental-ANN counterpart of
  * the minhash signature store (`DedupOps.minhashSignatureTable`): at
  * 100 TB you cannot re-derive cell assignments (a full-corpus scan)
  * every time a delta batch of embeddings lands.
  *
  * Layout under `path`:
  *  - `centroids/`: the coarse quantizer as DATA (cent_id, cv, cn) —
  *    derived once from the corpus the index was BUILT on (the
  *    deterministic md5-sample idiom) and FROZEN: delta appends
  *    assign against these, so old assignments stay valid and old
  *    vectors are never rescanned.
  *  - `vectors/`: (id, v, nm) written `partitionBy("cell")` — one
  *    directory per coarse cell, so a search that probes p of k
  *    cells is a PARTITION-PRUNED scan reading p/k of the corpus
  *    bytes from disk, not a full scan with a filter.
  *
  * [[append]] tokenizes/assigns ONLY the delta (a pure projection
  * against the stored centroid literals) and appends new files into
  * the existing cell directories. Re-ingesting an id already in the
  * store is the caller's contract to avoid (dedup the delta first —
  * appended files cannot cheaply rewrite old partitions).
  *
  * [[searchTopK]] reproduces `SimilarityOps.ivfTopK` semantics
  * exactly (same argmin/probe/rerank contracts), with centroids read
  * from the store — so the search over a built+appended index equals
  * the one-shot computation with the same frozen quantizer, which is
  * what the q102 oracle checks end to end.
  */
object IvfVectorStore {

  private def centroidRows(spark: SparkSession, cents: Array[Centroid])
      : DataFrame = {
    import spark.implicits._
    cents.toSeq.map(c => (c.id, c.v.toSeq, c.n)).toDF("cent_id", "cv", "cn")
  }

  private def readCentroids(spark: SparkSession, path: String)
      : Array[Centroid] =
    spark.read.parquet(s"$path/centroids")
      .select(col("cent_id"), col("cv"), col("cn"))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2)))

  /** (id, v, nm, cell) for `df` against the FROZEN centroid set —
    * a pure projection (centroid literals inlined below the plan-size
    * budget; a one-row broadcast relation above it), zero shuffle. */
  private def assigned(df: DataFrame, idCol: String, vecCol: String,
                       cents: Array[Centroid]): DataFrame =
    SimilarityOps.withCellScores(
        df.select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("v"))
          .withColumn("nm", sqrt(SimilarityOps.dot(col("v"), col("v")))),
        cents, "v", "nm", "__sc")
      .withColumn("cell", array_min(col("__sc")).getField("cent_id"))
      .drop("__sc")

  /** Cluster rows by their cell before the dynamic-partition write:
    * without this every input task appends a file into every cell
    * directory (tasks x cells files per write — the many-small-files
    * cliff at 1000 executors); after it each cell's rows sit in
    * exactly one task, so each write lands one file per cell. Hash
    * collisions merely co-locate two cells in one task — the dynamic
    * writer still splits them into their own directories. */
  private def clusteredByCell(df: DataFrame): DataFrame =
    df.repartition(col("cell"))

  /** Build the index from scratch: derive + persist the quantizer,
    * write the corpus cell-partitioned. One corpus scan. */
  def write(spark: SparkSession, corpus: DataFrame,
            idCol: String, vecCol: String, nCentroids: Int,
            path: String): Unit = {
    val cents = SimilarityOps.coarseCentroids(corpus, idCol, vecCol,
      nCentroids)
    centroidRows(spark, cents).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    clusteredByCell(assigned(corpus, idCol, vecCol, cents))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/vectors")
  }

  /** Delta ingest: assign ONLY the new vectors against the stored
    * quantizer and append into the cell directories. The old corpus
    * is not read, not rescanned, not re-assigned. */
  def append(spark: SparkSession, delta: DataFrame,
             idCol: String, vecCol: String, path: String): Unit = {
    val cents = readCentroids(spark, path)
    clusteredByCell(assigned(delta, idCol, vecCol, cents))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/vectors")
  }

  /** IVF top-k over the persisted index: per query, probe the
    * `nProbes` nearest stored cells; the scan of `vectors/` carries a
    * partition filter on the probed cell set, so only those
    * directories are read. Probe-cell collection is bounded by
    * nCentroids. Output: (qid, nid, cos) — `ivfTopK` contracts. */
  def searchTopK(spark: SparkSession, path: String, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 nProbes: Int): DataFrame = {
    val cents = readCentroids(spark, path)
    val q = SimilarityOps.withCellScores(
        queries
          .select(col(idCol).cast("long").as("qid"),
            col(vecCol).cast("array<double>").as("qv"))
          .withColumn("qn", sqrt(SimilarityOps.dot(col("qv"), col("qv")))),
        cents, "qv", "qn", "__sc")
      .withColumn("probe",
        explode(slice(sort_array(col("__sc")), 1, nProbes)))
      .select(col("qid"), col("qv"), col("qn"),
        col("probe.cent_id").as("cell"))
    val probedCells = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    val c = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("id").as("nid"), col("v").as("cv"),
        col("nm").as("cn"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        SimilarityOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }
}
