package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity ordered-sequence operators over an event stream:
  * Markov transition estimation, episode (type n-gram) mining, and
  * dwell-time-to-next-event. All of them window only WITHIN one
  * entity's sequence (partitionBy entity), so state per task is one
  * entity's events — the 100 TB shape is a single hash shuffle on the
  * entity key with no global sort. The outputs are bounded grids
  * (|types|^k) or per-type summaries, never per-event result sets.
  *
  * Sequence order must be made deterministic by the caller's
  * `orderCols` (include a unique tiebreak column — event ids — since
  * event timestamps can collide).
  */
object SequenceOps {

  /** First-order Markov transition counts and row-normalized
    * probabilities over each entity's type sequence. Output: one row
    * per observed (from_state, to_state) with `n` (pair count),
    * `n_from` (row total) and `prob` (n / n_from, double — pin at the
    * call site). The totals window runs over the bounded
    * |types|^2 grid, not the raw events. */
  def markovTransitions(events: DataFrame, entityCol: String,
                        typeCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    val pairs = events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_state"),
        col(typeCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_state"))))
      .withColumn("prob",
        col("n").cast("double") / col("n_from").cast("double"))
  }

  /** Episode mining: frequent ordered type k-grams (k = 3) within
    * each entity's sequence. Output: (t1, t2, t3, n, support) where
    * support = n / total observed trigrams. */
  def episodeTrigrams(events: DataFrame, entityCol: String,
                      typeCol: String, orderCols: Seq[Column],
                      minCount: Long = 1L): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    val tri = events
      .withColumn("__t1", lag(col(typeCol), 2).over(w))
      .withColumn("__t2", lag(col(typeCol), 1).over(w))
      .filter(col("__t1").isNotNull)
      .groupBy(col("__t1").as("t1"), col("__t2").as("t2"),
        col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    tri
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("support",
        col("n").cast("double") / col("total").cast("double"))
  }

  /** Dwell time from each source-typed event to the same entity's
    * NEXT event of each target type: per source event, the minimum
    * following timestamp per target (ROWS 1 FOLLOWING .. UNBOUNDED),
    * summarized per target type with exact integer micros. */
  def dwellToNext(events: DataFrame, entityCol: String, typeCol: String,
                  tsMicrosCol: Column, orderCols: Seq[Column],
                  sourceType: String, targetTypes: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val withNext = targetTypes.foldLeft(
      events.withColumn("__tus", tsMicrosCol)) { (df, tt) =>
      df.withColumn(s"__next_$tt",
        min(when(col(typeCol) === tt, col("__tus"))).over(w))
    }
    val src = withNext.filter(col(typeCol) === sourceType)
    val perTarget = targetTypes.map { tt =>
      src.filter(col(s"__next_$tt").isNotNull)
        .select((col(s"__next_$tt") - col("__tus")).as("dwell_us"))
        .agg(count(lit(1)).as("n"), sum(col("dwell_us")).as("sum_us"),
          max(col("dwell_us")).as("max_us"))
        .select(lit(tt).as("target"), col("n"), col("sum_us"),
          col("max_us"))
    }
    perTarget.reduce(_.unionByName(_))
  }
}
