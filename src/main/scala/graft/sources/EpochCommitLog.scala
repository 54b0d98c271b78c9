package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe EXACTLY-ONCE append protocol for per-epoch (micro-batch)
  * delta ingest into an append-only store layout — the transactional
  * layer [[graft.streaming.NearDupStreamIngest]] runs each foreachBatch
  * epoch through.
  *
  * Why it exists: a bare `mode("append")` ingest is not replay-safe.
  * foreachBatch delivery is at-least-once — a crash mid-append leaves
  * SOME subdirectories written (e.g. members/) and others not (e.g.
  * pairs/), and any replay heuristic keyed on data that landed first
  * either silently skips the lost subdirs (dropped pairs forever) or
  * re-appends ones that did land (duplicated rows). Neither is
  * detectable after the fact.
  *
  * Protocol per epoch, against store root `path`:
  *
  *   1. STAGE — the caller's `stage(scratchDir)` materializes the
  *      epoch's complete delta file set under
  *      `<path>/__epoch-<epoch>/` mirroring the live layout
  *      (relative paths, partition dirs included). Nothing live is
  *      touched. A crash here leaves only scratch; the replay wipes
  *      and re-stages (the delta is recomputed against the UNCHANGED
  *      live store, so the re-derivation is equivalent).
  *   2. MANIFEST — the staged files' relative paths are written to
  *      `journal/e=<epoch>.manifest` (tmp + rename, so a manifest is
  *      complete iff present). The manifest existing means staging
  *      finished; from here the epoch only ever rolls FORWARD.
  *   3. MOVE — each manifest entry renames scratch → live, skipping
  *      entries whose destination already exists (the replay-after-
  *      partial-move case: staged part files carry unique job UUIDs,
  *      so an existing destination can only be this epoch's own
  *      earlier move). A crash at any point resumes idempotently.
  *   4. MARK — `commits/e=<epoch>` is created LAST; it is the only
  *      record replay trusts ("seen" = marker present, never data
  *      that may have landed partially), then the manifest is
  *      retired. A replayed completed epoch is a no-op.
  *
  * Single-writer per store path (micro-batches arrive serially per
  * streaming query — the store contract); readers of the live layout
  * during a move window see a prefix of the epoch's files, which for
  * append-only stores is a consistent earlier snapshot plus a partial
  * delta — the same visibility a plain append gives. Exactly-once
  * holds at the STORE level: an epoch's files land exactly once no
  * matter how many times the engine replays it.
  */
private[graft] object EpochCommitLog {

  /** Fault-injection seam (spec-only): called with a phase tag after
    * each protocol step — "staged", "manifest", "moved:<rel>",
    * "cleaned", "marker". A spec throws at a tag to simulate a crash
    * at exactly that window. */
  type Hook = String => Unit

  def scratchDir(path: String, epoch: Long): String =
    s"$path/__epoch-$epoch"

  private def manifestPath(path: String, epoch: Long): Path =
    new Path(s"$path/journal/e=$epoch.manifest")

  private def markerPath(path: String, epoch: Long): Path =
    new Path(s"$path/commits/e=$epoch")

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whether `epoch` has fully committed into `path`. */
  def isCommitted(spark: SparkSession, path: String,
                  epoch: Long): Boolean =
    fileSystem(spark, path).exists(markerPath(path, epoch))

  /** Relative paths of all data files under `dir` (recursive;
    * checksum shadows are filtered by the FS layer and renames move
    * them alongside their files). */
  private def listRelative(fs: FileSystem, dir: Path): Seq[String] = {
    if (!fs.exists(dir)) return Seq.empty
    val base = dir.toUri.getPath.stripSuffix("/") + "/"
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val p = it.next().getPath.toUri.getPath
      require(p.startsWith(base), s"listing escaped $base: $p")
      out += p.substring(base.length)
    }
    out.result()
  }

  private def writeManifest(fs: FileSystem, path: String, epoch: Long,
                            rels: Seq[String]): Unit = {
    val mp = manifestPath(path, epoch)
    fs.mkdirs(mp.getParent)
    val tmp = new Path(mp.toString + ".tmp")
    val os = fs.create(tmp, true)
    try os.write(rels.mkString("\n").getBytes("UTF-8"))
    finally os.close()
    require(fs.rename(tmp, mp), s"manifest rename failed: $tmp -> $mp")
  }

  private def readManifest(fs: FileSystem, path: String,
                           epoch: Long): Seq[String] = {
    val in = fs.open(manifestPath(path, epoch))
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val text = new String(bytes, "UTF-8")
    if (text.isEmpty) Seq.empty else text.split("\n").toSeq
  }

  /** Run one epoch through the protocol. Returns true iff this call
    * committed the epoch (false = marker already present, replay of a
    * completed epoch, `stage` not invoked). `stage` materializes the
    * delta into the scratch dir it is given; it may write nothing
    * (empty delta epochs commit an empty file set). */
  def run(spark: SparkSession, path: String, epoch: Long,
          hook: Hook = _ => ())(stage: String => Unit): Boolean = {
    val fs = fileSystem(spark, path)
    val scratch = new Path(scratchDir(path, epoch))
    if (fs.exists(markerPath(path, epoch))) {
      // completed epoch replay — retire any leftovers a crash between
      // MARK and manifest cleanup stranded
      fs.delete(manifestPath(path, epoch), false)
      fs.delete(scratch, true)
      return false
    }
    if (!fs.exists(manifestPath(path, epoch))) {
      // stage: a crashed prior attempt's scratch is discarded whole —
      // none of its files moved (moves are manifest-gated)
      fs.delete(scratch, true)
      stage(scratch.toString)
      hook("staged")
      writeManifest(fs, path, epoch, listRelative(fs, scratch))
      hook("manifest")
    }
    // roll forward: manifest present = staging complete; move each
    // staged file unless an earlier attempt already moved it
    readManifest(fs, path, epoch).foreach { rel =>
      val dst = new Path(s"$path/$rel")
      if (!fs.exists(dst)) {
        val src = new Path(s"$scratch/$rel")
        fs.mkdirs(dst.getParent)
        require(fs.rename(src, dst), s"epoch move failed: $src -> $dst")
      }
      hook(s"moved:$rel")
    }
    fs.delete(scratch, true)
    hook("cleaned")
    val mk = markerPath(path, epoch)
    fs.mkdirs(mk.getParent)
    fs.create(mk, true).close()
    hook("marker")
    fs.delete(manifestPath(path, epoch), false)
    true
  }
}
