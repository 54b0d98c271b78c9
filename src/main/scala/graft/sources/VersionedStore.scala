package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared cross-process versioned-commit protocol for the persisted
  * stores ([[NearDupGraphStore]], [[IvfVectorStore]]): each distinct
  * corpus+params fingerprint builds into a unique scratch dir under
  * the store root and is COMMITTED by ONE atomic directory rename to
  * `<root>/v=<fpHash>/`. The versioned dir IS the pointer — readers
  * receive the resolved dir and only ever observe fully-built
  * versions; racing builders (even in separate driver JVMs) are
  * benign because the same fingerprint implies the same content:
  * whoever renames first wins and the loser discards its scratch.
  *
  * Retention: committed versions accumulate (a reader in another JVM
  * may still hold an old one, so commit never deletes), and on a
  * continuously-changing 100 TB corpus every ingest epoch would
  * otherwise strand a full dead store version forever — [[prune]] is
  * the GC: keep the `keepLatest` most recently committed versions
  * plus any explicitly protected dirs (the versions live readers
  * hold), delete the rest, and sweep abandoned scratch dirs older
  * than a grace window (an ACTIVE cross-process builder's scratch is
  * younger than the grace by construction — directory mtimes advance
  * while it writes).
  */
private[graft] object VersionedStore {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-root JVM lock — the fast path keeping N in-process threads
    * from building N identical scratch copies (cross-process safety
    * comes from the commit rename, not this). */
  def lockFor(root: String): Object =
    locks.computeIfAbsent(root, _ => new Object)

  def fpHash(fp: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(fp.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

  /** The version dir a given fingerprint commits to. */
  def versionDir(root: String, fp: String): String =
    s"$root/v=${fpHash(fp)}"

  /** A unique scratch dir for one build attempt of `fp`. */
  def scratchDir(root: String, fp: String): String =
    s"$root/__build-${fpHash(fp)}-" +
      java.util.UUID.randomUUID.toString.take(8)

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve-or-build: returns the committed version dir for `fp`,
    * building it via `build(scratchDir)` + [[commit]] when absent.
    * `build` must fully materialize the store layout into the scratch
    * dir (fingerprint record last) before returning. */
  def ensure(spark: SparkSession, root: String, fp: String)
            (build: String => Unit): String =
    lockFor(root).synchronized {
      val versioned = versionDir(root, fp)
      val fs = fileSystem(spark, versioned)
      if (!fs.exists(new Path(versioned))) {
        val scratch = scratchDir(root, fp)
        build(scratch)
        commit(spark, scratch, versioned)
      }
      versioned
    }

  /** Atomic commit: rename the complete scratch dir to `versioned`.
    * If another builder already committed (exists-probe or rename
    * failure), the scratch dir is discarded — same fingerprint, same
    * content, so losing the race is benign. The rename is also
    * re-verified AFTER a "successful" return: Hadoop rename with an
    * existing destination DIRECTORY moves the source INSIDE it and
    * returns true (the exists-probe TOCTOU window when a racing
    * process commits between probe and rename), which would leave a
    * permanent nested `__build-*` dir — reads would still work, but
    * the no-scratch-leftovers invariant and disk audits would not.
    * Detected by probing for the nested scratch name and deleting it.
    * `onProbe` is a test-only seam firing between the exists-probe
    * and the rename — the TOCTOU window a spec fills with a racing
    * commit. */
  def commit(spark: SparkSession, scratch: String,
             versioned: String, onProbe: () => Unit = () => ())
      : String = {
    val vp = new Path(versioned)
    val sp = new Path(scratch)
    val fs = vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(vp) || { onProbe(); !fs.rename(sp, vp) }) {
      require(fs.exists(vp),
        s"store commit failed and no committed version found: " +
          s"$scratch -> $versioned")
      fs.delete(sp, true)
    } else {
      val nested = new Path(vp, sp.getName)
      if (fs.exists(nested)) fs.delete(nested, true)
    }
    versioned
  }

  /** Committed version dirs under `root`, most recently modified
    * first (modification time is the commit-order proxy — renames
    * land whole dirs, so mtime orders commits on one filesystem). */
  def listVersions(spark: SparkSession, root: String)
      : Seq[(String, Long)] = {
    val fs = fileSystem(spark, root)
    val rp = new Path(root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime))
      .sortBy(-_._2)
  }

  /** Retention GC: delete committed versions beyond the `keepLatest`
    * most recent, never touching `protect` dirs (the versions live
    * readers currently hold — pass the dir [[ensure]] resolved).
    * Also sweeps `__build-*` scratch dirs older than
    * `scratchGraceMs` (abandoned losers; an active builder's scratch
    * keeps a fresh mtime). Runs under the per-root lock so an
    * in-process `ensure` can't race the sweep; a pruned version is
    * simply rebuilt by the next `ensure` of its corpus. Returns the
    * deleted version dirs. */
  def prune(spark: SparkSession, root: String, keepLatest: Int,
            protect: Seq[String] = Seq.empty,
            scratchGraceMs: Long = 60L * 60L * 1000L): Seq[String] =
    lockFor(root).synchronized {
      require(keepLatest >= 1, s"keepLatest must be >= 1: $keepLatest")
      val fs = fileSystem(spark, root)
      val prot = protect.map(p =>
        new Path(p).toUri.getPath.stripSuffix("/")).toSet
      val versions = listVersions(spark, root)
      val doomed = versions.drop(keepLatest)
        .map(_._1)
        .filterNot(d => prot.contains(d.stripSuffix("/")))
      doomed.foreach(d => fs.delete(new Path(d), true))
      val rp = new Path(root)
      if (fs.exists(rp)) {
        val now = System.currentTimeMillis()
        fs.listStatus(rp).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("__build-") &&
            now - st.getModificationTime > scratchGraceMs)
          .foreach(st => fs.delete(st.getPath, true))
      }
      doomed
    }
}
