package graft

import org.apache.spark.sql.{Column, DataFrame}

package object queries {

  /** Total ordering for a BOUNDED final result (every oracle query's
    * last step). `orderBy` plans a range-partitioned sort whose bounds
    * come from a driver-side sampling pass that RE-EXECUTES the whole
    * upstream pipeline — measured ~2x wall clock on the LSH dedup
    * queries. For an oracle-shaped output (hundreds-to-thousands of
    * rows) a single-partition in-partition sort is strictly cheaper:
    * one shuffle of just the final rows, no sampling pass, identical
    * row order. Upstream parallelism is untouched (repartition is a
    * shuffle boundary, unlike a narrow coalesce, which would collapse
    * the final stage to one task). Unbounded results must keep
    * `orderBy`'s scalable range sort — this helper is only for
    * outputs that already fit one oracle comparison. */
  implicit class TotalOrder(private val df: DataFrame) {
    def ordered(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}
