package graft.sources

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S3/S4 write side — render a parsed `samples` table back into the
  * firmware's in-band-header CSV log format (ORC_Main.c:774-805,
  * 832-854):
  *
  * {{{
  * Log #: <id>
  * Actuators (enabled|disabled)
  * Interval:<%f>
  * Acceleration, Pitch, Roll
  * <%.4f>, <%.4f>, <%.4f>
  * Log Paused, now resuming:        <- between runs of a block
  * }}}
  *
  * Shape: repartition by log block and sort within partitions, then a
  * single mapPartitions pass emits header lines at block boundaries and
  * pause markers at run boundaries — one sequential scan per block,
  * blocks parallel, matching how the reader consumes them. Values are
  * quantized with the firmware's %.4f / %f formats, so
  * write-then-read round-trips exactly on 4-dp data.
  *
  * Caveat the in-band format inherits from the reference: downstream
  * Welch tests pair experiment arms by FIRST OCCURRENCE in file order
  * (main.py:109-113), and a multi-part write does not preserve which
  * block a reader lists first — one-sided t signs can flip if the
  * reader encounters the other arm first. Values are unaffected
  * (|t| identical); pin arm order explicitly when it matters.
  */
object OrcLogCsvWriter {

  def toInBandLines(samples: DataFrame): Dataset[String] = {
    import samples.sparkSession.implicits._
    samples
      // rows parsed before any Interval header carry null interval_s;
      // the in-band grammar cannot place data before its Interval line,
      // so such pre-header rows are dropped from the rendering
      .filter(col("interval_s").isNotNull)
      .select(col("log_id"), col("arm"), col("interval_s"), col("run_id"),
        col("sample_idx"), col("acceleration_g"), col("pitch_deg"),
        col("roll_deg"))
      .repartition(col("log_id"))
      .sortWithinPartitions(col("log_id"), col("run_id"), col("sample_idx"))
      .mapPartitions { it =>
        var curLog = Int.MinValue
        var curRun = Long.MinValue
        it.flatMap { r =>
          val logId = r.getInt(0)
          val arm = r.getString(1)
          val interval = r.getDouble(2)
          val run = r.getLong(3)
          val headers: Seq[String] =
            if (logId != curLog) {
              curLog = logId
              curRun = run
              Seq(s"Log #: $logId", arm,
                "Interval:" + String.format(Locale.ROOT, "%f", Double.box(interval)),
                "Acceleration, Pitch, Roll")
            } else if (run != curRun) {
              curRun = run
              Seq("Log Paused, now resuming:")
            } else Nil
          val data = String.format(Locale.ROOT, "%.4f, %.4f, %.4f",
            Double.box(r.getDouble(5)), Double.box(r.getDouble(6)),
            Double.box(r.getDouble(7)))
          headers :+ data
        }
      }
  }

  /** Write one CSV log file tree (one part-file per partition; each
    * file is a self-contained header+data stream the reader accepts). */
  def write(samples: DataFrame, path: String): Unit =
    toInBandLines(samples).write.mode("overwrite").text(path)
}
