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

  private def nextVer(path: String): Int = {
    val d = dir(path, "ver")
    d.mkdirs()
    val cur = Option(d.list()).getOrElse(Array.empty[String])
      .flatMap(n => scala.util.Try(n.stripPrefix("_ver_").toInt).toOption)
    (if (cur.isEmpty) 0 else cur.max) + 1
  }

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
    * of the same key, matching SQL MERGE's delete-wins arbitration. */
  def appendDelta(upserts: DataFrame, deleteKeys: DataFrame,
                  keyCol: String, path: String): Unit = {
    val v = nextVer(path)
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
    val base = spark.read.parquet(dir(path, "base").getPath)
      .withColumn("__ver", lit(0)).withColumn("__deleted", lit(false))
    val deltaDir = dir(path, "delta")
    val all =
      if (deltaDir.exists())
        base.unionByName(spark.read.parquet(deltaDir.getPath),
          allowMissingColumns = true)
      else base
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ver").desc, col("__deleted").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__deleted"))
      .drop("__rn", "__ver", "__deleted")
  }

  /** Folds the merged view into a fresh base and clears the deltas —
    * the read-amplification reset. Materializes to a sibling temp dir
    * first so a crash mid-compact leaves the old store readable. */
  def compact(spark: SparkSession, keyCol: String, path: String): Unit = {
    val tmp = dir(path, "base_next")
    read(spark, keyCol, path).write.mode("overwrite").parquet(tmp.getPath)
    delete(dir(path, "base"))
    delete(dir(path, "delta"))
    delete(dir(path, "ver"))
    tmp.renameTo(dir(path, "base"))
    dir(path, "ver").mkdirs()
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
