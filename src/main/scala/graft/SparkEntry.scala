package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.{NorthStar, RoundEleven, RoundNine, RoundTen, TierA}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names to DataFrame builders over a testdata
  * dir; `oracleSql` carries the DuckDB-equivalent SQL the driver uses
  * as the correctness oracle (column names must match exactly).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Revenue by nation — multi-way join with broadcast dims
    * plus partial+final aggregation (SURVEY §2.9 Q13). */
  def entry(spark: SparkSession): DataFrame =
    TierA.all("q13_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * north-star training-data-pipeline ops (dedup / similarity / text /
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TierA.all ++ NorthStar.all ++ RoundNine.all ++ RoundTen.all ++
      RoundEleven.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TierA.oracle ++ NorthStar.oracle ++ RoundNine.oracle ++
      RoundTen.oracle ++ RoundEleven.oracle
}
