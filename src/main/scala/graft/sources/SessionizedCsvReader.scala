package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** S2 — sessionized telemetry-log CSV scan (SURVEY §2.1).
  *
  * The reference firmware writes an in-band block grammar
  * (ESP source/main/ORC_Main.c:774-805):
  *
  * {{{
  * Log #: <int>                  -> new log block (random 4-digit id)
  * Actuators (enabled|disabled)  -> experiment arm
  * Interval:<float>              -> sample period in seconds; starts run 0
  * Acceleration, Pitch, Roll     -> column header (ignored by parser)
  * <f>, <f>, <f>                 -> data row
  * Log Paused, now resuming:     -> run separator
  * }}}
  *
  * and the reference analyzer re-infers that structure line-by-line
  * (Python Plotting/main.py:22-65). Spark-side, the stateful line
  * classifier becomes header *propagation*: classify each line, then
  * carry the latest header values forward with
  * `last(_, ignoreNulls).over(rowsBetween(unboundedPreceding, 0))` and
  * a running count of run-separator lines.
  *
  * Scale notes: the window partitions by file, so one log file is one
  * sequential unit — the same constraint the reference has (a log is an
  * inherently ordered stream). Fleet-scale deployments produce many
  * files (one per device-session), which is the natural parallel unit;
  * a 100 TB corpus of logs parallelizes per file, while a single file
  * is processed in one pass of one task.
  */
object SessionizedCsvReader {

  /** Parse one or more ORC-log CSV files into the canonical `samples`
    * table (FIXTURES.md §1): file, log_id, arm, actuators_enabled,
    * interval_s, run_id, sample_idx, t_s, acceleration_g, pitch_deg,
    * roll_deg.
    *
    * Faithful to main.py: runs are opened by each `Interval:` line and
    * each `Log Paused` line; data rows must have exactly 3
    * comma-separated parseable floats; unparseable rows are skipped.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.textFile(path).toDF("line")
      .select(
        input_file_name().as("file"),
        monotonically_increasing_id().as("line_no"),
        col("line"))

    val classified = lines.select(
      col("file"), col("line_no"), col("line"),
      col("line").startsWith("Log #").as("is_hdr"),
      col("line").contains("Actuators").as("is_arm"),
      col("line").startsWith("Interval:").as("is_interval"),
      col("line").startsWith("Log Paused").as("is_pause"))

    // Header propagation: per file, in line order, carry the latest
    // header values down to the data rows (LOCF), and count run
    // openers to assign a monotone run id.
    val byLine = Window.partitionBy(col("file")).orderBy(col("line_no"))
    val locf = byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // try_cast on header values too: a malformed header line (e.g.
    // "Log # 42" with no colon, or "Interval:abc") must be skipped like
    // the reference parser does, not crash the job under ANSI mode —
    // LOCF then simply carries the previous valid value forward.
    val propagated = classified
      .withColumn("log_id",
        last(when(col("is_hdr"), expr(
          "try_cast(regexp_extract(line, 'Log #:\\\\s*(\\\\d+)', 1) as int)")),
          ignoreNulls = true).over(locf))
      .withColumn("arm",
        last(when(col("is_arm"), trim(col("line"))), ignoreNulls = true)
          .over(locf))
      .withColumn("interval_s",
        last(when(col("is_interval"), expr(
          "try_cast(trim(element_at(split(line, ':'), 2)) as double)")),
          ignoreNulls = true).over(locf))
      .withColumn("run_id",
        sum(when(col("is_interval") || col("is_pause"), 1L).otherwise(0L))
          .over(locf))

    // Data rows: exactly 3 fields, all parseable as floats, and headers
    // already seen (main.py:47-49 requires current_log and
    // actuator_status to be set; the column-header line fails the cast).
    // try_cast, not cast: the in-band column-header line ("Acceleration,
    // Pitch, Roll") must parse to null and be dropped, and ANSI mode
    // would otherwise throw on it (main.py:55-56 skips bad rows too).
    val fields = split(col("line"), ",")
    def fieldAsDouble(i: Int) =
      expr(s"try_cast(trim(element_at(split(line, ','), $i)) as double)")
    val dataRows = propagated
      .filter(size(fields) === 3 &&
        col("log_id").isNotNull && col("arm").isNotNull)
      .withColumn("acceleration_g", fieldAsDouble(1))
      .withColumn("pitch_deg", fieldAsDouble(2))
      .withColumn("roll_deg", fieldAsDouble(3))
      .filter(col("acceleration_g").isNotNull &&
        col("pitch_deg").isNotNull && col("roll_deg").isNotNull)

    // Per-run positional index and synthesized relative time (M22,
    // main.py:51-54: t = n_samples_so_far * interval).
    val byRun = Window.partitionBy(col("file"), col("arm"), col("run_id"))
      .orderBy(col("line_no"))

    dataRows
      .withColumn("sample_idx", row_number().over(byRun) - 1)
      .withColumn("t_s", col("sample_idx") * col("interval_s"))
      .withColumn("actuators_enabled", !col("arm").contains("disabled"))
      .select("file", "log_id", "arm", "actuators_enabled", "interval_s",
        "run_id", "sample_idx", "t_s",
        "acceleration_g", "pitch_deg", "roll_deg")
  }

  /** Path of the checked-in golden specimen (read-only reference data). */
  val GoldenCsv: String =
    "/root/reference/Python Plotting/Vibration_test/High Speed/ORCLOG_vibration_HS.CSV"
}
