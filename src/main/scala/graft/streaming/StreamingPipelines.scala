package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-streaming equivalents of the reference's streaming
  * surface (SURVEY §2.8, §3.3):
  *
  *  - the reference's log path (ISR -> queue -> batched CSV flush every
  *    ~1 s) maps to `writeStream` with a processing-time trigger — the
  *    64 KiB cache becomes the micro-batch, fclose-per-flush becomes
  *    checkpointing (upgrading at-most-once to at-least-once);
  *  - tumbling/hourly windowed aggregation with an event-time watermark
  *    (the batch form is Q19);
  *  - gap-based sessionization via `session_window` (the streaming
  *    analogue of the pause-marker run splits).
  */
object StreamingPipelines {

  /** Tumbling event-time window aggregation: count + sum(value) per
    * (window, event_type). Watermark bounds state; late rows beyond it
    * are dropped (the reference drops on queue overflow — at-most-once;
    * this is the at-least-once upgrade). */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("h"), col("event_type"),
        col("n"), col("sv"))

  /** Gap-based sessions per user: a session closes after `gap` of
    * event-time silence — the streaming form of the reference's
    * pause-marker run splitting (ORC_Main.c:815-856). */
  def gapSessions(events: DataFrame, gap: String = "30 minutes",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sv"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sv"))

  /** Streaming exact dedup for a document/event stream: drops rows
    * whose dedup key was already seen within the watermark horizon —
    * the streaming form of [[graft.operators.DedupOps.exactDedup]].
    * State is keyed by the content hash and expires with the
    * watermark, so state-store size is bounded by the horizon's
    * distinct-key count, not the stream's length — the property that
    * keeps a continuous 100 TB/day ingest feasible. */
  def streamingExactDedup(docs: DataFrame, textCol: String,
                          tsCol: String = "ts",
                          watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash",
        graft.operators.DedupOps.contentHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream inner join with event-time range condition: pair
    * each left event with right events of the same key within
    * `tolerance` AFTER it (the streaming enrichment shape — e.g. click
    * -> conversion attribution). Both sides carry watermarks and the
    * join has a time-range predicate, so Spark bounds BOTH state
    * stores: a side's row is dropped once the other side's watermark
    * passes its join window — the condition that keeps an unbounded
    * 100 TB/day two-stream join feasible. Inputs must already expose
    * (key, ts, payload); output carries both payloads and both times.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       key: String, tolerance: String,
                       watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col(key).as("k"), col("ts").as("l_ts"),
        col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("k2"), col("ts").as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col("k") === col("k2") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"interval $tolerance"))
      .select(col("k"), col("l_ts"), col("l_value"),
        col("r_ts"), col("r_value"))
  }

  /** The reference's batched CSV logging sink (S3): micro-batched
    * append with a ~1 s cadence (ORC_CONFIG.h:19 64 KiB cache,
    * ORC_Main.c:806-814). */
  def csvLogSink(samples: DataFrame, path: String, checkpoint: String,
                 interval: String = "1 second"): DataStreamWriter[org.apache.spark.sql.Row] =
    samples.writeStream
      .format("csv")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(interval))
      .outputMode("append")

  /** Columnar variant: stream into the canonical ORC table via
    * foreachBatch (partitioned writes need batch APIs). Reuses
    * OrcTelemetryStore's partitioned layout so the streamed appends
    * stay readable/prunable as one table with the batch-ingested
    * data. */
  def orcLogSink(samples: DataFrame, path: String, checkpoint: String,
                 interval: String = "1 second"): DataStreamWriter[org.apache.spark.sql.Row] =
    samples.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.OrcTelemetryStore.write(batch, path,
          org.apache.spark.sql.SaveMode.Append)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(interval))
}
