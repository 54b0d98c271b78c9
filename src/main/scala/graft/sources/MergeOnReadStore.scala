package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read upsert store — the lakehouse update pattern for
  * append-only storage: a large immutable `base/` plus small versioned
  * `delta/` batches of upserts and key-only delete tombstones, merged
  * lazily at read time (latest version wins per key, tombstones
  * filtered after the merge). Updating one row in 100 TB never
  * rewrites the base; the write cost is O(delta), the read cost is one
  * key-partitioned window over base ∪ deltas.
  *
  * Layout under `path`:
  *  - `base/`  : full rows as written (implicit version 0, live).
  *  - `delta/` : rows + `__ver` (monotonic batch number from the
  *    store's `_ver` marker files) + `__deleted`; tombstones carry the
  *    key with null payload columns.
  *
  * Scale notes: [[read]]'s single Exchange is on the merge key — with
  * the base written bucketed by the same key (ScaleOps.writeBucketed)
  * the window degenerates to a per-bucket sort-merge with no base
  * shuffle. [[compact]] folds the current merged view into a fresh
  * base and clears the deltas, restoring O(base-scan) reads; run it
  * when |deltas| approaches the merge-window cost. Version numbers
  * come from driver-side marker files, not a `MAX(__ver)` data scan,
  * so appends stay O(delta) even with thousands of batches.
  */
object MergeOnReadStore {

  private def dir(path: String, part: String) = new java.io.File(path, part)

  // Two-phase version protocol: a batch CLAIMS its version number
  // before writing data and COMMITS it after. nextVer scans both
  // prefixes, so a crash between write and commit can never hand the
  // next batch an already-used version (which would mix two batches'
  // rows under one __ver); read() keeps only committed versions, so
  // the crashed batch's orphan rows are invisible.
  private def verNums(path: String, prefix: String): Array[Int] = {
    val d = dir(path, "ver")
    Option(d.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toInt).toOption)
  }

  private def nextVer(path: String): Int = {
    dir(path, "ver").mkdirs()
    val cur = verNums(path, "_ver_") ++ verNums(path, "_claim_")
    (if (cur.isEmpty) 0 else cur.max) + 1
  }

  private def claimVer(path: String, v: Int): Unit =
    new java.io.File(dir(path, "ver"), s"_claim_$v").createNewFile()

  private def markVer(path: String, v: Int): Unit =
    new java.io.File(dir(path, "ver"), s"_ver_$v").createNewFile()

  /** Writes a fresh base (version 0), clearing any existing store. */
  def writeBase(df: DataFrame, path: String): Unit = {
    val root = new java.io.File(path)
    if (root.exists()) delete(root)
    df.write.mode("overwrite").parquet(dir(path, "base").getPath)
    dir(path, "ver").mkdirs()
  }

  /** Appends one delta batch: `upserts` replace the latest row per
    * key; `deleteKeys` (key column only) tombstone theirs. Both get
    * the same new version — within a batch a delete beats an upsert
    * of the same key, matching SQL MERGE's delete-wins arbitration.
    * Also matching SQL MERGE: duplicate keys WITHIN one upsert batch
    * are rejected (asserted here), because "which duplicate survives"
    * has no deterministic answer under latest-version-wins. Duplicate
    * deleteKeys are harmless (identical tombstones). */
  def appendDelta(upserts: DataFrame, deleteKeys: DataFrame,
                  keyCol: String, path: String): Unit = {
    val dup = upserts.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"appendDelta: duplicate $keyCol=${dup.head.get(0)} in one upsert " +
        "batch — latest-wins arbitration is undefined within a batch " +
        "(SQL MERGE rejects this too); dedup upstream")
    val v = nextVer(path)
    claimVer(path, v)
    val rows = upserts
      .withColumn("__deleted", lit(false))
      .unionByName(deleteKeys.select(col(keyCol))
        .withColumn("__deleted", lit(true)), allowMissingColumns = true)
      .withColumn("__ver", lit(v))
    rows.write.mode("append").parquet(dir(path, "delta").getPath)
    markVer(path, v)
  }

  /** The merged current view: base ∪ deltas, row_number over
    * (version desc, deleted desc) per key — exactly one survivor per
    * key, tombstoned keys dropped. Payload schema = the base schema. */
  def read(spark: SparkSession, keyCol: String, path: String): DataFrame = {
    // self-heal: a crash between compact()'s two renames leaves the
    // previous base staged as base_old (with deltas still intact) —
    // that pair is exactly the consistent pre-compact view.
    val baseDir =
      if (dir(path, "base").exists()) dir(path, "base")
      else dir(path, "base_old")
    val base = spark.read.parquet(baseDir.getPath)
      .withColumn("__ver", lit(0)).withColumn("__deleted", lit(false))
    val deltaDir = dir(path, "delta")
    val committed = verNums(path, "_ver_")
    val all =
      if (deltaDir.exists())
        base.unionByName(spark.read.parquet(deltaDir.getPath)
            // only committed versions: a batch that crashed between
            // its parquet write and its commit marker is invisible
            .filter(col("__ver").isInCollection(
              committed.toSeq.map(Integer.valueOf))),
          allowMissingColumns = true)
      else base
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ver").desc, col("__deleted").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__deleted"))
      .drop("__rn", "__ver", "__deleted")
  }

  /** Folds the merged view into a fresh base and clears the deltas —
    * the read-amplification reset. Crash-safe ordering: the new base
    * is fully written as base_next, the old base is STAGED ASIDE as
    * base_old (not deleted), base_next is renamed into place, and
    * only then are base_old/delta/ver removed. Every rename's result
    * is checked; a failure restores the old base and throws, and a
    * crash in the window leaves base_old + deltas — which [[read]]
    * self-heals from. */
  def compact(spark: SparkSession, keyCol: String, path: String): Unit = {
    val baseDir = dir(path, "base")
    val next = dir(path, "base_next")
    val old = dir(path, "base_old")
    if (next.exists()) delete(next) // leftovers from a crashed attempt
    if (old.exists() && baseDir.exists()) delete(old)
    read(spark, keyCol, path).write.mode("overwrite").parquet(next.getPath)
    if (baseDir.exists() && !baseDir.renameTo(old))
      throw new IllegalStateException(
        s"compact: could not stage $baseDir aside as $old")
    if (!next.renameTo(baseDir)) {
      old.renameTo(baseDir) // restore; store stays readable
      throw new IllegalStateException(
        s"compact: could not move $next into place as $baseDir")
    }
    delete(old)
    delete(dir(path, "delta"))
    delete(dir(path, "ver"))
    dir(path, "ver").mkdirs()
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
