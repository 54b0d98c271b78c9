package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical columnar storage for parsed telemetry (SURVEY §1.3,
  * BASELINE.json spark_approach: "DataFrame read/write ORC with
  * built-in support").
  *
  * Layout: ORC partitioned by (actuators_enabled, log_id) — the two
  * columns every reference analysis groups or filters on — so
  * partition pruning eliminates whole directories before any IO, and
  * one log block's samples stay contiguous for the ordered stateful
  * operators. At fleet scale this is the table a 1000-executor job
  * reads: predicate pushdown + column pruning come from the vectorized
  * ORC reader; `sortWithinPartitions(sample_idx)` at write time gives
  * run-ordered row groups so replay needs no extra sort when a single
  * task owns a (log, run) slice.
  */
object OrcTelemetryStore {

  def write(samples: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    samples
      // Leading sort on the partition columns: FileFormatWriter requires
      // output sorted by partitionBy columns and would otherwise insert
      // its own (not-necessarily-stable) sort, destroying the run order.
      // Sorting (partition cols, run_id, sample_idx) up front satisfies
      // the writer's requirement, so the run-sorted row groups survive.
      .repartition(col("actuators_enabled"), col("log_id"))
      .sortWithinPartitions(col("actuators_enabled"), col("log_id"),
        col("run_id"), col("sample_idx"))
      .write
      .mode(mode)
      .partitionBy("actuators_enabled", "log_id")
      .orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Convert a raw in-band-header CSV log into the ORC table in one
    * pass (the reference's offline "ingest" step, minus the in-band
    * headers which become partition/metadata columns). */
  def ingestCsv(spark: SparkSession, csvPath: String, orcPath: String): Unit =
    write(SessionizedCsvReader.read(spark, csvPath), orcPath)
}
