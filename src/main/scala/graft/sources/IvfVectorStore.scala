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
  *  - `cellstats/`: (cell, rmax) angular cell radii, one row set per
  *    ingest, folded by MAX at read time (mergeable, append-only) —
  *    the triangle-inequality input [[searchTopKExact]]'s ring bound
  *    needs to prune cells PROVABLY.
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

  /** (id, v, nm, cell, __ccos) for `df` against the FROZEN centroid
    * set — a pure projection (centroid literals inlined below the
    * plan-size budget; a one-row broadcast relation above it), zero
    * shuffle. `__ccos` is the cosine to the ASSIGNED centroid — the
    * input to the per-cell angular radius `cellstats/` maintains. */
  private def assigned(df: DataFrame, idCol: String, vecCol: String,
                       cents: Array[Centroid]): DataFrame =
    SimilarityOps.withCellScores(
        df.select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("v"))
          .withColumn("nm", sqrt(SimilarityOps.dot(col("v"), col("v")))),
        cents, "v", "nm", "__sc")
      .withColumn("cell", array_min(col("__sc")).getField("cent_id"))
      .withColumn("__ccos", -array_min(col("__sc")).getField("negcos"))
      .drop("__sc")

  /** Per-cell ANGULAR radius rows for one ingest: rmax = the max
    * normalized-Euclidean distance ||v^ - c^|| = sqrt(2 - 2 cos) from
    * a member to its assigned centroid. Mergeable by MAX at read time
    * (the stats-fold contract), so appends only add rows. This is
    * what makes [[searchTopKExact]]'s ring bound sound: for any query
    * q^ and any member of the cell, d(q^, v^) >= d(q^, c^) - rmax. */
  private def cellStats(adf: DataFrame): DataFrame =
    adf.groupBy(col("cell"))
      .agg(max(sqrt(greatest(lit(0.0),
        lit(2.0) - lit(2.0) * col("__ccos")))).as("rmax"))

  /** Cluster rows by their cell before the dynamic-partition write:
    * without this every input task appends a file into every cell
    * directory (tasks x cells files per write — the many-small-files
    * cliff at 1000 executors); after it each cell's rows sit in
    * exactly one task, so each write lands one file per cell. Hash
    * collisions merely co-locate two cells in one task — the dynamic
    * writer still splits them into their own directories. */
  private def clusteredByCell(df: DataFrame): DataFrame =
    df.repartition(col("cell"))

  /** Order-independent corpus+params fingerprint: row count plus a
    * commutative SUM of per-row crc32(id:vector-literal) — one
    * projection scan ([[NearDupGraphStore]]'s fingerprint contract
    * for the vector corpus). */
  private def fingerprint(corpus: DataFrame, idCol: String,
                          vecCol: String, nCentroids: Int): String = {
    val r = corpus.agg(count(lit(1)),
      sum(crc32(concat_ws(":", col(idCol).cast("string"),
        concat_ws(",", col(vecCol).cast("array<string>")))))).head()
    val h = if (r.isNullAt(1)) 0L else r.getLong(1)
    s"ivf1:k=$nCentroids:cnt=${r.getLong(0)}:h=$h"
  }

  /** Build-once shared index with the [[VersionedStore]]
    * cross-process commit protocol (the r11 NearDupGraphStore
    * design, symmetric for the vector store): each distinct
    * corpus+params fingerprint builds into a unique scratch dir and
    * commits by ONE atomic rename to `<path>/v=<fpHash>/` — two
    * driver JVMs sharing an index path can never interleave
    * overwrites the in-place [[write]] layout allows, and readers
    * only ever observe fully-built versions. Returns the resolved
    * index directory (what [[searchTopK]]/[[searchTopKExact]]
    * consume). Old versions persist for concurrent readers until
    * [[prune]] collects them. */
  def ensure(spark: SparkSession, corpus: DataFrame, idCol: String,
             vecCol: String, nCentroids: Int, path: String): String = {
    val fp = fingerprint(corpus, idCol, vecCol, nCentroids)
    VersionedStore.ensure(spark, path, fp) { scratch =>
      write(spark, corpus, idCol, vecCol, nCentroids, scratch)
      spark.range(1).select(lit(fp).as("fp")).coalesce(1)
        .write.mode("overwrite").parquet(s"$scratch/fp")
    }
  }

  /** Retention GC over the versioned index root —
    * [[VersionedStore.prune]] semantics (keep latest K + protected
    * dirs, sweep abandoned scratch); returns the deleted dirs. */
  def prune(spark: SparkSession, path: String, keepLatest: Int,
            protect: Seq[String] = Seq.empty): Seq[String] =
    VersionedStore.prune(spark, path, keepLatest, protect)

  /** Build the index from scratch: derive + persist the quantizer,
    * write the corpus cell-partitioned. One corpus scan. */
  def write(spark: SparkSession, corpus: DataFrame,
            idCol: String, vecCol: String, nCentroids: Int,
            path: String): Unit = {
    val cents = SimilarityOps.coarseCentroids(corpus, idCol, vecCol,
      nCentroids)
    centroidRows(spark, cents).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val adf = assigned(corpus, idCol, vecCol, cents)
      .localCheckpoint(false)
    // adf feeds both writers — materialize before the fork
    // (StoreCompaction.inParallel's contract), then overlap them
    adf.count()
    StoreCompaction.inParallel(
      () => clusteredByCell(adf.drop("__ccos"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$path/vectors"),
      () => cellStats(adf).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/cellstats"))
  }

  /** Delta ingest: assign ONLY the new vectors against the stored
    * quantizer and append into the cell directories (+ a mergeable
    * cellstats row set). The old corpus is not read, not rescanned,
    * not re-assigned. */
  def append(spark: SparkSession, delta: DataFrame,
             idCol: String, vecCol: String, path: String): Unit = {
    val cents = readCentroids(spark, path)
    val adf = assigned(delta, idCol, vecCol, cents)
      .localCheckpoint(false)
    adf.count()
    StoreCompaction.inParallel(
      () => clusteredByCell(adf.drop("__ccos"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$path/vectors"),
      () => cellStats(adf).coalesce(1)
        .write.mode("append").parquet(s"$path/cellstats"))
  }

  /** Small-file compaction — the [[NearDupGraphStore.compact]] /
    * [[InvertedIndexStore.compact]] contract for the third store:
    * every delta [[append]] lands one file set per cell directory
    * plus one cellstats row set, so N ingests accumulate N files per
    * partition AND N rows per cell in the radii table every exact
    * search reads. Compaction rewrites `vectors/` to one file per
    * cell directory (pruning layout preserved) and PRE-FOLDS
    * `cellstats/` to its one MAX row per cell — a pure physical
    * reorganization: the read-time MAX fold is associative, so
    * searchTopK/searchTopKExact return identically before and after
    * (round-trip spec), and later appends keep landing (append-only
    * contract preserved). `centroids/` is frozen write-once single
    * file — nothing to compact. Crash-safe via
    * [[StoreCompaction.rewrite]]'s rename-first swap. */
  def compact(spark: SparkSession, path: String): Unit =
    // independent per-directory rewrites — overlapped (guide §2.6)
    StoreCompaction.inParallel(
      () => StoreCompaction.rewrite(spark, s"$path/vectors") { tmp =>
        clusteredByCell(spark.read.parquet(s"$path/vectors"))
          .write.mode("overwrite").partitionBy("cell").parquet(tmp)
      },
      () => StoreCompaction.rewrite(spark, s"$path/cellstats") { tmp =>
        spark.read.parquet(s"$path/cellstats")
          .groupBy(col("cell")).agg(max(col("rmax")).as("rmax"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
      })

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

  /** PROVABLY EXACT top-k through the store, still partition-pruned
    * — the linear exact path for ground-truth evals with large probe
    * sets (the brute-force alternative reads the whole corpus per
    * query batch):
    *
    *  1. probe pass: the plain [[searchTopK]] heuristic over the
    *     `nProbes` nearest cells gives each query a candidate kth-best
    *     cosine;
    *  2. ring bound: for every UNPROBED cell, the triangle inequality
    *     on normalized vectors (cos = 1 - d^2/2 for unit vectors,
    *     d(q^,v^) >= d(q^,c^) - rmax with rmax the stored angular cell
    *     radius) upper-bounds the best cosine any member can reach;
    *     only cells whose bound beats the kth-best (minus `eps` float
    *     slack, and all cells when fewer than k candidates were found)
    *     are read in a second partition-pruned scan;
    *  3. exact rerank over the union.
    *
    * Queries with >= k in-cell near neighbors prune almost every
    * extra cell; adversarial queries degrade to reading more cells —
    * never to a wrong answer. Query side is the bounded probe-set
    * contract (it is scored once and localCheckpointed). Output and
    * ordering contracts match [[searchTopK]]. */
  def searchTopKExact(spark: SparkSession, path: String,
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int, nProbes: Int, eps: Double = 1e-9)
      : DataFrame = {
    val cents = readCentroids(spark, path)
    val q0 = SimilarityOps.withCellScores(
        queries
          .select(col(idCol).cast("long").as("qid"),
            col(vecCol).cast("array<double>").as("qv"))
          .withColumn("qn", sqrt(SimilarityOps.dot(col("qv"), col("qv")))),
        cents, "qv", "qn", "__sc")
      .localCheckpoint(false)
    def scoredIn(qcells: DataFrame): DataFrame = {
      val cellsList = qcells.select(col("cell")).distinct()
        .collect().map(_.getLong(0))
      spark.read.parquet(s"$path/vectors")
        .filter(col("cell").isin(cellsList: _*))
        .select(col("id").as("nid"), col("v").as("cv"),
          col("nm").as("cn"), col("cell"))
        .join(broadcast(qcells), Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("cos",
          SimilarityOps.dot(col("qv"), col("cv")) /
            (col("qn") * col("cn")))
        .select(col("qid"), col("nid"), col("cos"))
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    // pass 1 — the searchTopK probe set, scored from q0
    val probes1 = q0.withColumn("probe",
        explode(slice(sort_array(col("__sc")), 1, nProbes)))
      .select(col("qid"), col("qv"), col("qn"),
        col("probe.cent_id").as("cell"))
    val first = scoredIn(probes1)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
      .localCheckpoint(false)
    val kth = first.groupBy(col("qid"))
      .agg(count(lit(1)).as("nres"), min(col("cos")).as("kthcos"))
    // pass 2 — ring-bound-eligible unprobed cells only
    val radii = spark.read.parquet(s"$path/cellstats")
      .groupBy(col("cell")).agg(max(col("rmax")).as("rmax"))
    val allCells = q0
      .select(col("qid"),
        posexplode(sort_array(col("__sc"))).as(Seq("pr", "s")))
      .select(col("qid"), (col("pr") + 1).as("prank"),
        col("s").getField("cent_id").as("cell"),
        (-col("s").getField("negcos")).as("qccos"))
    val extraQCells = allCells.filter(col("prank") > nProbes)
      .join(broadcast(radii), Seq("cell"))
      .join(broadcast(kth), Seq("qid"), "left")
      .withColumn("dqc",
        sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) * col("qccos"))))
      .withColumn("ub", lit(1.0) -
        pow(greatest(lit(0.0), col("dqc") - col("rmax")), 2) / lit(2.0))
      .filter(col("kthcos").isNull || col("nres") < k ||
        col("ub") >= col("kthcos") - eps)
      .join(q0.select(col("qid"), col("qv"), col("qn")), Seq("qid"))
      .select(col("qid"), col("qv"), col("qn"), col("cell"))
      .localCheckpoint(false)
    val extra =
      if (extraQCells.isEmpty) first.limit(0)
      else scoredIn(extraQCells)
    first.unionByName(extra)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }
}
