package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata tables
  * (see /root/repo/TESTDATA.md). All engine queries take an `sfDir`
  * (e.g. /root/testdata/sf0.01) and read `$sfDir/<table>.parquet`.
  *
  * At cluster scale these would be catalog tables (partitioned /
  * bucketed); here the parquet reader gives vectorized scans with
  * predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config required to read the driver's nanosecond-precision
    * parquet timestamps (events.ts is TIMESTAMP(NANOS), which Spark only
    * reads as a long when this legacy flag is on). */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** events.ts arrives as epoch-nanos LONG (see [[NanosAsLongKey]]).
    * Re-expose `ts` as a micro-precision TimestampType for SQL parity
    * and keep the exact nano value as `ts_ns` so window orderings can
    * match a nanosecond-native oracle bit-for-bit. */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType) {
      // integral division: `/` on longs is double division in Spark and
      // a ~1.7e18 nanos value exceeds the double mantissa (2^53), which
      // can shift the derived micro timestamp by 1 us
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    } else df.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
