package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{EpochCommitLog, NearDupGraphStore}

/** Continuous near-duplicate ingestion: a foreachBatch bridge that
  * runs [[NearDupGraphStore]]'s delta ingest per micro-batch, so a
  * training-data pipeline deduplicates CONTINUOUSLY instead of in
  * nightly full rebuilds — the streaming counterpart of the batch
  * store's write/append lifecycle, reusing the exact same ingest code
  * (verbatim-hash collapse, prefix-filtered new-vs-old pair join,
  * component rebuild from the stored graph).
  *
  * Idempotency/exactly-once layers, because micro-batch delivery is
  * at-least-once on restart:
  *   1. in-stream: `dropDuplicatesWithinWatermark` on the doc id
  *      bounds dedup state by the event-time watermark (the unbounded
  *      `dropDuplicates` state would grow forever on a 100 TB feed);
  *   2. in-batch: the handler dedups ids within the micro-batch;
  *   3. at the store: each epoch (batchId) runs through
  *      [[EpochCommitLog]] — the delta is STAGED into a scratch dir,
  *      manifested, moved file-atomically into the live layout, and
  *      only then marked committed. A replayed epoch short-circuits
  *      on its commit marker; a crash at ANY window (mid-stage,
  *      mid-move, pre-marker) rolls forward on replay without
  *      dropping or duplicating a single file — the bare
  *      `mode("append")` path could drop a crashed batch's pairs
  *      forever (its members landing first made the replay's
  *      anti-join "see" the batch as done);
  *   4. duplicates arriving BEYOND the watermark in a LATER epoch are
  *      anti-joined against `members/` — safe as a dedup signal here
  *      because under the epoch protocol members/ only ever contains
  *      fully committed batches.
  *
  * The store path must not be shared with a concurrent batch writer —
  * micro-batches arrive serially per query, which is what keeps the
  * single-writer epoch contract safe here.
  */
object NearDupStreamIngest {

  /** The per-micro-batch handler — also the unit a backfill driver
    * can call directly on pre-sliced batches (give each slice a
    * distinct, stable `epoch`; a retried slice must reuse its
    * epoch). Dedups ids within the batch (keeping an arbitrary
    * representative text per id — ids are the identity contract, as
    * in [[NearDupGraphStore.append]]), anti-joins ids already
    * committed, then stages the residue through the commit log: a
    * full store build on first contact, the delta append after.
    * Empty residue commits an empty epoch (the marker still lands,
    * so the replay contract is uniform). Store-existence probing is
    * strictly by missing-path (`fs.exists` on `meta/`): a transient
    * read failure PROPAGATES so the streaming engine retries the
    * batch, rather than being misread as "fresh store" and
    * clobbering a populated one. Component labels are a derived
    * cache, rebuilt from the live graph AFTER the epoch commits
    * (when `componentThresholds` is non-empty); the recommended
    * cadence policy is empty thresholds + caller-scheduled
    * [[NearDupGraphStore.rebuildComponents]]. */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
                  n: Int, baseT: Double,
                  componentThresholds: Seq[Double],
                  path: String, epoch: Long,
                  onStep: EpochCommitLog.Hook = _ => ()): Unit = {
    val spark = batch.sparkSession
    val dedup = batch.select(col(idCol), col(textCol))
      .dropDuplicates(idCol)
    val committed = EpochCommitLog.run(spark, path, epoch, onStep) {
      scratch =>
        val metaP = new org.apache.hadoop.fs.Path(s"$path/meta")
        val fs = metaP.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(metaP)) {
          if (!dedup.isEmpty) {
            NearDupGraphStore.write(spark, dedup, idCol, textCol, n,
              baseT, componentThresholds = Seq.empty, scratch)
          }
        } else {
          val seen = NearDupGraphStore.membersTable(spark, path)
            .select(col("doc_id").as("__seen_id"))
          val fresh = dedup.join(seen,
            dedup(idCol) === col("__seen_id"), "left_anti")
          if (!fresh.isEmpty) {
            NearDupGraphStore.appendStaged(spark, fresh, idCol,
              textCol, path, scratch)
          }
        }
    }
    if (committed && componentThresholds.nonEmpty) {
      NearDupGraphStore.rebuildComponents(spark, path,
        componentThresholds)
    }
  }

  /** Attach continuous dedup to a streaming document feed. `tsCol` +
    * `watermark` bound the in-stream dedup state; the epoch commit
    * log and the store-level anti-join in [[ingestBatch]] cover
    * replays and duplicates arriving beyond the watermark. The
    * foreachBatch `batchId` is the epoch — the engine replays a
    * failed batch under the SAME id, which is what lets the commit
    * log resume it. */
  def start(docs: DataFrame, idCol: String, textCol: String,
            tsCol: String, watermark: String, n: Int, baseT: Double,
            componentThresholds: Seq[Double], path: String,
            checkpoint: String): StreamingQuery =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, idCol, textCol, n, baseT,
          componentThresholds, path, epoch = batchId)
      }
      .start()
}
