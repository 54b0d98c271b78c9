package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out building blocks that don't change query semantics, only
  * physical shape — the techniques a 100 TB deployment leans on:
  *
  *  - **Bucketed co-located joins**: persist both join sides bucketed
  *    (and sorted) on the join key; a later sort-merge join then reads
  *    matching buckets directly with NO shuffle exchange on either
  *    side. For fact-fact joins (lineitem x orders at 100 TB) this
  *    converts every downstream join on the key from a full-data
  *    shuffle into a local merge.
  *  - **Salted aggregation**: for power-law keys where one group would
  *    hot-spot a single reducer, split each key into `nSalts`
  *    sub-groups for the partial aggregate and re-combine in a second
  *    (tiny) aggregate. Works for any algebraic aggregate.
  *
  * AQE (`spark.sql.adaptive.enabled`, on in this engine's sessions)
  * handles moderate skew automatically via skew-join splitting; the
  * explicit salt is for the extreme tail where even one partition of
  * one key overflows an executor.
  */
object ScaleOps {

  /** Persist `df` as a bucketed+sorted managed table on `key` so joins
    * on that key become shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching
    * bucket counts the planner elides both shuffle exchanges.
    * Table-qualified keys, so identically named key columns (the
    * common case) don't raise an ambiguous-reference error. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left).alias("__bl")
    val r = spark.table(right).alias("__br")
    l.join(r, col(s"__bl.$leftKey") === col(s"__br.$rightKey"))
  }

  /** Salted sum: algebraically identical to
    * `df.groupBy(key).agg(sum(valueCol))` but the first (heavy)
    * aggregation fans each key out over `nSalts` sub-keys. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                nSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted count + mean (count-weighted recombination). */
  def saltedAvg(df: DataFrame, key: String, valueCol: String,
                nSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg((sum(col("__s")) / sum(col("__n"))).as(s"avg_$valueCol"),
        sum(col("__n")).as("n"))
  }
}
