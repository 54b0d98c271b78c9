package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.NearDupGraphStore

/** Continuous near-duplicate ingestion: a foreachBatch bridge that
  * runs [[NearDupGraphStore]]'s delta ingest per micro-batch, so a
  * training-data pipeline deduplicates CONTINUOUSLY instead of in
  * nightly full rebuilds — the streaming counterpart of the batch
  * store's write/append lifecycle, reusing the exact same ingest code
  * (verbatim-hash collapse, prefix-filtered new-vs-old pair join,
  * component rebuild from the stored graph).
  *
  * Idempotency layers, because micro-batch delivery is
  * at-least-once on restart:
  *   1. in-stream: `dropDuplicatesWithinWatermark` on the doc id
  *      bounds dedup state by the event-time watermark (the unbounded
  *      `dropDuplicates` state would grow forever on a 100 TB feed);
  *   2. in-batch: the handler dedups ids within the micro-batch;
  *   3. at the store: ids already in `members/` are anti-joined out —
  *      a replayed micro-batch (or a duplicate arriving later than
  *      the watermark) lands ZERO rows, so replayed ingest equals
  *      one-shot batch ingest at group-pair granularity
  *      (StorageStreamingSpec pins this with a shuffled 3-batch
  *      replay).
  *
  * The store path must not be shared with a concurrent batch writer —
  * micro-batches arrive serially per query, which is what keeps the
  * append-only contract safe here.
  */
object NearDupStreamIngest {

  /** The per-micro-batch handler — also the unit a backfill driver
    * can call directly on pre-sliced batches. Dedups ids within the
    * batch (keeping an arbitrary representative text per id — ids are
    * the identity contract, as in [[NearDupGraphStore.append]]),
    * anti-joins ids already ingested, then delegates to the batch
    * store: `write` on first contact, `append` after. Empty residue
    * is a no-op (no empty delta files, no component rebuild). */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
                  n: Int, baseT: Double,
                  componentThresholds: Seq[Double],
                  path: String): Unit = {
    val spark = batch.sparkSession
    val dedup = batch.select(col(idCol), col(textCol))
      .dropDuplicates(idCol)
    val initialized =
      try { spark.read.parquet(s"$path/meta").head(); true }
      catch { case scala.util.control.NonFatal(_) => false }
    if (!initialized) {
      if (!dedup.isEmpty) {
        NearDupGraphStore.write(spark, dedup, idCol, textCol, n,
          baseT, componentThresholds, path)
      }
    } else {
      val seen = NearDupGraphStore.membersTable(spark, path)
        .select(col("doc_id").as("__seen_id"))
      val fresh = dedup.join(seen,
        dedup(idCol) === col("__seen_id"), "left_anti")
      if (!fresh.isEmpty) {
        NearDupGraphStore.append(spark, fresh, idCol, textCol,
          componentThresholds, path)
      }
    }
  }

  /** Attach continuous dedup to a streaming document feed. `tsCol` +
    * `watermark` bound the in-stream dedup state; the store-level
    * anti-join in [[ingestBatch]] covers replays and duplicates
    * arriving beyond the watermark. */
  def start(docs: DataFrame, idCol: String, textCol: String,
            tsCol: String, watermark: String, n: Int, baseT: Double,
            componentThresholds: Seq[Double], path: String,
            checkpoint: String): StreamingQuery =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, idCol, textCol, n, baseT,
          componentThresholds, path)
      }
      .start()
}
