package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared rewrite-and-swap plumbing for the append-only stores'
  * `compact()` operations: daily delta ingests at scale accumulate
  * one file set per ingest per partition directory (the classic
  * small-files swamp), and compaction rewrites a store subdirectory
  * into `<dir>__compacting` BEFORE the old files are removed — the
  * source is fully materialized by the write action, so a crash
  * mid-compaction leaves either the old layout or the old layout
  * plus an ignorable tmp dir, never a half-deleted store. */
private[graft] object StoreCompaction {

  /** Rewrite `dest` via `write(tmpDir)` then atomically swap the tmp
    * directory in. `write` must be a full materializing action. */
  def rewrite(spark: SparkSession, dest: String)
             (write: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val destP = new Path(dest)
    val fs = destP.getFileSystem(conf)
    val tmp = dest + "__compacting"
    val tmpP = new Path(tmp)
    fs.delete(tmpP, true)
    write(tmp)
    fs.delete(destP, true)
    require(fs.rename(tmpP, destP),
      s"compaction rename failed: $tmp -> $dest")
  }

  /** Count parquet data files under `dir` recursively — the
    * file-count assertion the compaction round-trip specs make. */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
