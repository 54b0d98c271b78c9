package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Persisted, incrementally-maintained near-duplicate PAIR-GRAPH store
  * — the curation counterpart of [[InvertedIndexStore]]: at 100 TB
  * nobody re-derives the Jaccard pair graph from raw text for every
  * dedup audit (threshold sweeps, transitivity gaps, keep-policy
  * sensitivity all consume the SAME graph); the graph is computed
  * once, kept verbatim-collapsed (group-level — the C(g,2)
  * duplicate-group blowup never touches disk), and audit queries read
  * it back with partition pruning. Layout under `path`:
  *
  *  - `groups/`: (rep_id, h [md5 text hash], len, n_shingles) — one
  *    row per DISTINCT text, append-only. `h` is what lets a later
  *    ingest recognize a verbatim duplicate of an old text without
  *    reading the text itself.
  *  - `members/`: (rep_id, doc_id) — one row per ingested doc,
  *    append-only. Group sizes are derived by COUNT at read time, so
  *    a group growing across ingests never rewrites old rows (the
  *    mergeable-counters contract of the CMS/stats stores).
  *  - `repsets/`: (rep_id, sh [distinct xxhash64'd shingle array —
  *    8-byte longs, the [[DedupOps.hashedSets]] reduction, so the
  *    delta prefix-join and verify shuffle narrow keys]) —
  *    append-only; the delta path shingles ONLY new distinct texts
  *    and joins against these stored arrays, never re-tokenizing old
  *    docs.
  *  - `pairs/`: (rid1 < rid2, jaccard) CROSS-group rows, written
  *    `partitionBy("jband")` with jband = min(floor(jaccard·10), 9) —
  *    an audit at threshold t scans only the jband >= floor(t·10)
  *    directories (PartitionFilters, asserted in PlanShapeSpec).
  *    Append-only: a delta ingest contributes exactly the
  *    (new×old) ∪ (new×new) rows, disjoint from the stored old×old.
  *  - `components/`: (rep_id, cluster_id, g) per named threshold,
  *    `partitionBy("t_e2")` — the ONE non-append-only subdir: labels
  *    are a global property, recomputed after each ingest FROM THE
  *    STORED GRAPH (groups + pairs — linear in graph size, zero text
  *    rescans) and rewritten.
  *  - `meta/`: (n, base_t_e2) per ingest — the shingle width and the
  *    base threshold every reader inherits (append must match).
  *
  * Jaccard values are text-pair properties, independent of corpus
  * composition and of the df-ordering the prefix filter uses — so the
  * pair set after any write+append sequence equals a one-shot full
  * rebuild, which is exactly what the store-backed queries' oracles
  * (plain exact derivations over the full corpus) pin.
  */
object NearDupGraphStore {

  private def jband(j: org.apache.spark.sql.Column) =
    least(floor(j * 10.0).cast("int"), lit(9)).as("jband")

  // overlapped independent writes — [[StoreCompaction.inParallel]]
  // (shared with IvfVectorStore); see its scaladoc for the
  // shared-checkpoint pre-materialization contract
  private def inParallel(tasks: (() => Unit)*): Unit =
    StoreCompaction.inParallel(tasks: _*)

  // pairs/ and components/ are dynamic-partition layouts, and a
  // VALID store can have zero rows in either (a corpus with no pair
  // >= baseT writes no partition dirs at all — normal at any scale).
  // Parquet cannot infer a schema from a fileless directory, so every
  // read declares it explicitly (also skips inference I/O on the
  // 100 TB path).
  private val pairsSchema =
    "rid1 BIGINT, rid2 BIGINT, jaccard DOUBLE, jband INT"
  private val componentsSchema =
    "rep_id BIGINT, cluster_id BIGINT, g BIGINT, t_e2 BIGINT"

  private def readPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pairsSchema).parquet(s"$path/pairs")

  // components/ may not exist at all on a label-free store (empty
  // componentThresholds — the continuous-ingest cadence policy), so
  // a missing directory reads as a typed empty frame, not an error.
  private def readComponents(spark: SparkSession, path: String)
      : DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/components")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(componentsSchema))
    } else {
      spark.read.schema(componentsSchema).parquet(s"$path/components")
    }
  }

  /** Order-independent corpus+params fingerprint: row count plus a
    * SUM of per-doc crc32(id:md5(text)) — one projection scan, no
    * pair join. Param changes and any doc add/remove/edit change it;
    * the SUM is commutative so partitioning/order can't. */
  private def fingerprint(docs: DataFrame, idCol: String,
                          textCol: String, n: Int, baseT: Double,
                          thresholds: Seq[Double]): String = {
    val r = docs.agg(count(lit(1)),
      sum(crc32(concat_ws(":", col(idCol).cast("string"),
        md5(col(textCol)))))).head()
    val h = if (r.isNullAt(1)) 0L else r.getLong(1)
    // v2: repsets/ carries hashed (long) shingle sets — a v1 store of
    // the same corpus must not be adopted by ensure, so the format
    // generation lives in the fingerprint
    s"v2:n=$n:t=${math.round(baseT * 100)}:" +
      s"cts=${thresholds.map(t => math.round(t * 100)).mkString("_")}:" +
      s"cnt=${r.getLong(0)}:h=$h"
  }

  /** Build-once shared store with a CROSS-PROCESS commit protocol:
    * each distinct corpus+params fingerprint builds into a unique
    * scratch dir under `path` and is COMMITTED by one atomic
    * directory rename to `<path>/v=<fpHash>/` — the versioned dir IS
    * the pointer (readers receive the resolved dir as the return
    * value and only ever see fully-built versions; the commit rename
    * happens after every subdir, fp record included, is on disk).
    * Two builders racing on the same path are benign even across
    * separate driver JVMs: the same fingerprint implies the same
    * content, whoever commits first wins, and the loser discards its
    * scratch dir ([[commitVersion]]) — there is no window in which a
    * reader can observe a partially-overwritten store, which the old
    * in-place `write.mode("overwrite")` layout could not guarantee.
    * The per-path JVM lock remains as a fast path so 16 in-process
    * Verify threads don't build 16 identical scratch copies.
    * Freshness is a directory-existence probe (plus the one
    * projection scan computing the fingerprint — no pair join). A
    * corpus/params change lands a NEW version dir; old versions are
    * left in place (a reader in another JVM may still hold one) until
    * [[prune]] collects them.
    * Returns the resolved store directory. */
  def ensure(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String, n: Int, baseT: Double,
             componentThresholds: Seq[Double], path: String): String =
    VersionedStore.lockFor(path).synchronized {
      val fpNow = fingerprint(docs, idCol, textCol, n, baseT,
        componentThresholds)
      val versioned = versionDir(path, fpNow)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(versioned)
        .getFileSystem(conf)
      if (!fs.exists(new org.apache.hadoop.fs.Path(versioned))) {
        val scratch = buildVersion(spark, docs, idCol, textCol, n,
          baseT, componentThresholds, path, fpNow)
        commitVersion(spark, scratch, versioned)
      }
      versioned
    }

  /** The version dir a given fingerprint commits to. */
  private[graft] def versionDir(path: String, fp: String): String =
    VersionedStore.versionDir(path, fp)

  /** Build a full store (fp record last) into a unique scratch dir
    * under `path`; returns the scratch dir. Separated from
    * [[commitVersion]] so the cross-process race is testable. */
  private[graft] def buildVersion(spark: SparkSession, docs: DataFrame,
                                  idCol: String, textCol: String,
                                  n: Int, baseT: Double,
                                  componentThresholds: Seq[Double],
                                  path: String, fp: String): String = {
    val scratch = VersionedStore.scratchDir(path, fp)
    write(spark, docs, idCol, textCol, n, baseT,
      componentThresholds, scratch)
    spark.range(1).select(lit(fp).as("fp")).coalesce(1)
      .write.mode("overwrite").parquet(s"$scratch/fp")
    scratch
  }

  /** Atomic commit — [[VersionedStore.commit]] (TOCTOU-verified
    * rename; racing losers discard their scratch). */
  private[graft] def commitVersion(spark: SparkSession, scratch: String,
                                   versioned: String): String =
    VersionedStore.commit(spark, scratch, versioned)

  /** Retention GC over the versioned store root — keep the
    * `keepLatest` most recently committed versions plus any
    * `protect` dirs (versions live readers hold), delete the rest,
    * sweep abandoned scratch. [[VersionedStore.prune]] semantics;
    * returns the deleted version dirs. A pruned corpus's next
    * `ensure` simply rebuilds it. */
  def prune(spark: SparkSession, path: String, keepLatest: Int,
            protect: Seq[String] = Seq.empty): Seq[String] =
    VersionedStore.prune(spark, path, keepLatest, protect)

  /** Build the store from scratch: one corpus scan (collapse +
    * shingle + prefix-filtered pair join), then the partitioned
    * layout above. `componentThresholds` names the thresholds whose
    * component labels are materialized (each must be >= baseT).
    * EMPTY thresholds skip the component rebuild entirely — the
    * continuous-ingest cadence policy: labels are a global property
    * recomputed from the stored graph, so a streaming caller ingests
    * every micro-batch label-free and runs one rebuild per
    * cadence tick instead of one iterative-CC pass per batch
    * (components() on a label-free store reads empty by the declared
    * schema, never errors). */
  def write(spark: SparkSession, docs: DataFrame, idCol: String,
            textCol: String, n: Int, baseT: Double,
            componentThresholds: Seq[Double], path: String): Unit = {
    require(componentThresholds.forall(_ >= baseT),
      s"component thresholds must be >= base $baseT")
    val (reps, members) = DedupOps.collapseVerbatimTexts(
      docs, idCol, textCol)
    val sets = DedupOps.hashedSets(
        DedupOps.stagedShingles(reps, "doc_id", "text", n))
      .localCheckpoint(false)
    // sets (and, upstream, the collapse checkpoint reps derives from)
    // feeds the groups/repsets/pairs writers below — materialize once
    // BEFORE the fork (see inParallel's contract)
    sets.count()
    // the four subdir writes are mutually independent — overlap them
    // so one writer's task tail back-fills with the next's tasks
    inParallel(
      () => reps.select(col("doc_id").as("rep_id"),
          md5(col("text")).as("h"),
          length(col("text")).cast("long").as("len"))
        .join(sets.select(col("doc_id").as("rep_id"),
          size(col("sh")).cast("long").as("n_shingles")), "rep_id")
        .write.mode("overwrite").parquet(s"$path/groups"),
      () => members.write.mode("overwrite").parquet(s"$path/members"),
      () => sets.select(col("doc_id").as("rep_id"), col("sh"))
        .write.mode("overwrite").parquet(s"$path/repsets"),
      () => DedupOps.prefixFilteredJaccardCrossPairsFromSets(sets, baseT)
        .select(col("id1").as("rid1"), col("id2").as("rid2"),
          col("jaccard"), jband(col("jaccard")))
        .repartition(col("jband"))
        .write.mode("overwrite").partitionBy("jband")
        .parquet(s"$path/pairs"))
    spark.range(1).select(lit(n).as("n"),
        lit(math.round(baseT * 100)).as("base_t_e2"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    if (componentThresholds.nonEmpty) {
      rebuildComponents(spark, path, componentThresholds)
    }
  }

  /** Incremental ingest: verbatim duplicates of stored texts append
    * members rows under the OLD rep (recognized by hash, text never
    * re-read); genuinely new texts shingle once and prefix-join
    * against the STORED shingle arrays — the already-persisted
    * old×old pairs are never re-verified (the kernel's newFlag
    * candidate gate). Doc ids must be globally unique across ingests
    * (the [[IvfVectorStore]] contract). Components are recomputed
    * from the stored graph and rewritten. */
  def append(spark: SparkSession, delta: DataFrame, idCol: String,
             textCol: String,
             componentThresholds: Seq[Double], path: String): Unit = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val n = meta.getAs[Int]("n")
    val baseT = meta.getAs[Long]("base_t_e2").toDouble / 100.0
    val old = spark.read.parquet(s"$path/groups")
      .select(col("rep_id").as("old_rep"), col("h"))
    val (dreps, dmembers) = DedupOps.collapseVerbatimTexts(
      delta, idCol, textCol)
    val drepsH = dreps.select(col("doc_id").as("d_rep"), col("text"),
        md5(col("text")).as("h"))
      .join(old, Seq("h"), "left")
      .localCheckpoint(false)
    val fresh = drepsH.filter(col("old_rep").isNull)
      .select(col("d_rep").as("doc_id"), col("text"))
    val freshSets = DedupOps.hashedSets(
        DedupOps.stagedShingles(fresh, "doc_id", "text", n))
      .localCheckpoint(false)
    // delta pairs input: stored sets are old, fresh sets are new —
    // the kernel enumerates only candidates touching >= 1 new row.
    // The stored-side scan is PINNED to the pre-append file set (a
    // parquet read lists its files at read() time and never sees
    // later-appended ones), so the fresh rows appended below can't
    // double-read and no anti-join is needed — which is also what
    // lets the repsets append and the pair kernel run concurrently.
    val unionSets = spark.read.parquet(s"$path/repsets")
      .select(col("rep_id").as("doc_id"), col("sh"),
        lit(false).as("isnew"))
      .unionByName(freshSets.select(col("doc_id"), col("sh"),
        lit(true).as("isnew")))
    // freshSets.count() cascades the drepsH materialization — both
    // checkpoints are shared across the forked writers (inParallel's
    // pre-materialization contract)
    freshSets.count()
    inParallel(
      // members: delta docs of a known text ride the old rep id
      () => dmembers.join(drepsH.select(col("d_rep").as("rep_id"),
          col("old_rep")), "rep_id")
        .select(coalesce(col("old_rep"), col("rep_id")).as("rep_id"),
          col("doc_id"))
        .write.mode("append").parquet(s"$path/members"),
      () => fresh.select(col("doc_id").as("rep_id"),
          md5(col("text")).as("h"),
          length(col("text")).cast("long").as("len"))
        .join(freshSets.select(col("doc_id").as("rep_id"),
          size(col("sh")).cast("long").as("n_shingles")), "rep_id")
        .write.mode("append").parquet(s"$path/groups"),
      () => freshSets.select(col("doc_id").as("rep_id"), col("sh"))
        .write.mode("append").parquet(s"$path/repsets"),
      () => DedupOps.prefixFilteredJaccardCrossPairsFromSets(
          unionSets, baseT, newFlag = Some("isnew"))
        .select(col("id1").as("rid1"), col("id2").as("rid2"),
          col("jaccard"), jband(col("jaccard")))
        .repartition(col("jband"))
        .write.mode("append").partitionBy("jband")
        .parquet(s"$path/pairs"))
    spark.range(1).select(lit(n).as("n"),
        lit(math.round(baseT * 100)).as("base_t_e2"))
      .coalesce(1).write.mode("append").parquet(s"$path/meta")
    if (componentThresholds.nonEmpty) {
      rebuildComponents(spark, path, componentThresholds)
    }
  }

  /** [[append]] re-expressed for [[EpochCommitLog]]'s stage phase:
    * identical delta derivation (verbatim-hash collapse against the
    * stored groups, fresh texts shingled once and prefix-joined
    * against the STORED shingle arrays), but every output lands in
    * `stagePath` mirroring the live layout instead of appending in
    * place — the commit log then moves the staged files into the
    * live dirs file-atomically with replay idempotence. Reads come
    * from `livePath`, which under the single-writer epoch contract
    * holds only fully committed epochs (so unlike [[append]] no
    * self-anti-join of the fresh sets is needed). Components are NOT
    * staged: labels are a global derived cache, rebuilt from the
    * live graph post-commit on the caller's cadence
    * ([[rebuildComponents]]). */
  private[graft] def appendStaged(spark: SparkSession, delta: DataFrame,
                                  idCol: String, textCol: String,
                                  livePath: String,
                                  stagePath: String): Unit = {
    val meta = spark.read.parquet(s"$livePath/meta").head()
    val n = meta.getAs[Int]("n")
    val baseT = meta.getAs[Long]("base_t_e2").toDouble / 100.0
    val old = spark.read.parquet(s"$livePath/groups")
      .select(col("rep_id").as("old_rep"), col("h"))
    val (dreps, dmembers) = DedupOps.collapseVerbatimTexts(
      delta, idCol, textCol)
    val drepsH = dreps.select(col("doc_id").as("d_rep"), col("text"),
        md5(col("text")).as("h"))
      .join(old, Seq("h"), "left")
      .localCheckpoint(false)
    val fresh = drepsH.filter(col("old_rep").isNull)
      .select(col("d_rep").as("doc_id"), col("text"))
    val freshSets = DedupOps.hashedSets(
        DedupOps.stagedShingles(fresh, "doc_id", "text", n))
      .localCheckpoint(false)
    val unionSets = spark.read.parquet(s"$livePath/repsets")
      .select(col("rep_id").as("doc_id"), col("sh"),
        lit(false).as("isnew"))
      .unionByName(freshSets.select(col("doc_id"), col("sh"),
        lit(true).as("isnew")))
    // shared-checkpoint pre-materialization + overlapped independent
    // stage writes — same shape as [[append]]
    freshSets.count()
    inParallel(
      () => dmembers.join(drepsH.select(col("d_rep").as("rep_id"),
          col("old_rep")), "rep_id")
        .select(coalesce(col("old_rep"), col("rep_id")).as("rep_id"),
          col("doc_id"))
        .write.mode("overwrite").parquet(s"$stagePath/members"),
      () => fresh.select(col("doc_id").as("rep_id"),
          md5(col("text")).as("h"),
          length(col("text")).cast("long").as("len"))
        .join(freshSets.select(col("doc_id").as("rep_id"),
          size(col("sh")).cast("long").as("n_shingles")), "rep_id")
        .write.mode("overwrite").parquet(s"$stagePath/groups"),
      () => freshSets.select(col("doc_id").as("rep_id"), col("sh"))
        .write.mode("overwrite").parquet(s"$stagePath/repsets"),
      () => DedupOps.prefixFilteredJaccardCrossPairsFromSets(
          unionSets, baseT, newFlag = Some("isnew"))
        .select(col("id1").as("rid1"), col("id2").as("rid2"),
          col("jaccard"), jband(col("jaccard")))
        .repartition(col("jband"))
        .write.mode("overwrite").partitionBy("jband")
        .parquet(s"$stagePath/pairs"))
    spark.range(1).select(lit(n).as("n"),
        lit(math.round(baseT * 100)).as("base_t_e2"))
      .coalesce(1).write.mode("overwrite").parquet(s"$stagePath/meta")
  }

  /** Recompute component labels for each threshold from the STORED
    * graph (group sizes + pruned pair partitions — no text, linear in
    * graph size) and rewrite `components/`. Public so a continuous
    * ingest (empty-threshold appends) can rebuild on its own cadence. */
  def rebuildComponents(spark: SparkSession, path: String,
                        thresholds: Seq[Double]): Unit = {
    require(thresholds.nonEmpty, "need at least one component threshold")
    val perT = thresholds.map { t =>
      DedupOps.groupComponents(groupPairs(spark, path, t))
        .withColumn("t_e2", lit(math.round(t * 100)))
    }
    perT.reduce(_ unionByName _)
      .repartition(col("t_e2"))
      .write.mode("overwrite").partitionBy("t_e2")
      .parquet(s"$path/components")
  }

  /** Small-file compaction: rewrite each subdirectory's accumulated
    * per-ingest delta files into one file per partition directory
    * (pairs/components keep their pruning layout; groups/members/
    * repsets become `nFiles` files; meta collapses to its ONE
    * distinct row — every ingest writes the same (n, base_t_e2) by
    * the append contract). Pure physical reorganization: groupPairs/
    * components/membersTable read identically before and after
    * (round-trip spec), and later appends keep working — compaction
    * preserves the append-only contract, it just resets the file
    * count. Run it after every ~N delta ingests at scale.
    * `nFiles = 1` suits local stores; a 100 TB caller sizes it to
    * ~128 MB output files. */
  def compact(spark: SparkSession, path: String, nFiles: Int = 1)
      : Unit = {
    // each subdir rewrite is an independent read->tmp->swap on its own
    // directory (StoreCompaction's tmp/old names are per-dest), so the
    // six rewrites overlap (guide §2.6) instead of serializing six
    // job tails
    val subs = Seq[() => Unit](
      () => StoreCompaction.rewrite(spark, s"$path/pairs") { tmp =>
        readPairs(spark, path)
          .repartition(col("jband"))
          .write.mode("overwrite").partitionBy("jband").parquet(tmp)
      },
      () => StoreCompaction.rewrite(spark, s"$path/meta") { tmp =>
        spark.read.parquet(s"$path/meta").distinct().coalesce(1)
          .write.mode("overwrite").parquet(tmp)
      }) ++
      Seq("groups", "members", "repsets").map { sub =>
        () => StoreCompaction.rewrite(spark, s"$path/$sub") { tmp =>
          spark.read.parquet(s"$path/$sub").repartition(nFiles)
            .write.mode("overwrite").parquet(tmp)
        }
      } ++ {
        val compP = new org.apache.hadoop.fs.Path(s"$path/components")
        val compFs = compP.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (compFs.exists(compP)) Seq[() => Unit](
          () => StoreCompaction.rewrite(spark, s"$path/components") {
            tmp =>
              readComponents(spark, path)
                .repartition(col("t_e2"))
                .write.mode("overwrite").partitionBy("t_e2").parquet(tmp)
          })
        else Seq.empty
      }
    inParallel(subs: _*)
  }

  /** Derived group sizes: one COUNT over the append-only membership. */
  def groupSizes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/members")
      .groupBy(col("rep_id")).agg(count(lit(1)).as("g"))

  /** The group-level pair graph at threshold `t` (>= the store's base)
    * — same shape and contract as
    * [[DedupOps.prefixFilteredJaccardGroupPairs]]: cross rows from the
    * jband-PRUNED pair partitions with derived sizes attached, plus
    * the self rows (g >= 2, shingled) reconstructed from groups —
    * so every group-level audit runs unchanged against the store. */
  def groupPairs(spark: SparkSession, path: String, t: Double)
      : DataFrame = {
    val sizes = groupSizes(spark, path).localCheckpoint(false)
    val cross = readPairs(spark, path)
      .filter(col("jband") >= math.floor(t * 10).toInt &&
        col("jaccard") >= t)
      .join(sizes.select(col("rep_id").as("rid1"), col("g").as("g1")),
        "rid1")
      .join(sizes.select(col("rep_id").as("rid2"), col("g").as("g2")),
        "rid2")
      .select(col("rid1"), col("rid2"), col("jaccard"), col("g1"),
        col("g2"))
    val self = spark.read.parquet(s"$path/groups")
      .filter(col("n_shingles") >= 1L)
      .join(sizes.filter(col("g") >= 2L), "rep_id")
      .select(col("rep_id").as("rid1"), col("rep_id").as("rid2"),
        lit(1.0).as("jaccard"), col("g").as("g1"), col("g").as("g2"))
    cross.unionByName(self)
  }

  /** Stored component labels at a materialized threshold: (rep_id,
    * cluster_id, g), read from the single t_e2 partition. */
  def components(spark: SparkSession, path: String, t: Double)
      : DataFrame =
    readComponents(spark, path)
      .filter(col("t_e2") === math.round(t * 100))
      .select(col("rep_id"), col("cluster_id"), col("g"))

  /** The append-only membership table: (rep_id, doc_id). */
  def membersTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/members")
}
