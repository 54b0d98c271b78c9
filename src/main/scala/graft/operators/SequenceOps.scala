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
    tri
      // total over the FULL observed grid, before the minCount filter,
      // so support stays "n / total observed trigrams" for minCount > 1
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .filter(col("n") >= minCount)
      .withColumn("support",
        col("n").cast("double") / col("total").cast("double"))
  }

  /** Second-order Markov log-likelihood grid: add-alpha-smoothed
    * P(t3 | t1, t2) over each entity's type sequence, with the
    * per-cell corpus log-likelihood contribution n * ln(p). The
    * model and the scoring grid are the same bounded |types|^3
    * relation, so the whole computation after the trigram shuffle
    * runs on <= |types|^3 rows; the vocab size arrives as a 1-row
    * broadcast bracket (no driver-side count at plan-build time).
    * Smoothing keeps every ln argument strictly positive. */
  def markovLogLik(events: DataFrame, entityCol: String,
                   typeCol: String, orderCols: Seq[Column],
                   alpha: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    val tri = events
      .withColumn("__t1", lag(col(typeCol), 2).over(w))
      .withColumn("__t2", lag(col(typeCol), 1).over(w))
      .filter(col("__t1").isNotNull)
      .groupBy(col("__t1").as("t1"), col("__t2").as("t2"),
        col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"))
    val vocab = events.select(col(typeCol)).distinct()
      .agg(count(lit(1)).as("v"))
    tri
      .withColumn("n12",
        sum(col("n")).over(Window.partitionBy(col("t1"), col("t2"))))
      .crossJoin(broadcast(vocab))
      .withColumn("p",
        (col("n").cast("double") + lit(alpha)) /
          (col("n12").cast("double") + lit(alpha) * col("v").cast("double")))
      .withColumn("ll", col("n").cast("double") * log(col("p")))
  }

  /** Gap-constrained episode trigrams: per observed (t1, t2, t3),
    * how many instances had BOTH consecutive gaps <= maxGapUs
    * (n_fast) out of all instances (n), with the fast share. The
    * "real sessions vs coincidental order" cut of [[episodeTrigrams]]
    * — one window sort, bounded output grid. */
  def gapConstrainedTrigrams(events: DataFrame, entityCol: String,
                             typeCol: String, tsMicrosCol: Column,
                             orderCols: Seq[Column],
                             maxGapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    events
      .withColumn("__tus", tsMicrosCol)
      .withColumn("__t1", lag(col(typeCol), 2).over(w))
      .withColumn("__t2", lag(col(typeCol), 1).over(w))
      .withColumn("__g2", col("__tus") - lag(col("__tus"), 1).over(w))
      .withColumn("__g1",
        lag(col("__tus"), 1).over(w) - lag(col("__tus"), 2).over(w))
      .filter(col("__t1").isNotNull)
      .groupBy(col("__t1").as("t1"), col("__t2").as("t2"),
        col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__g1") <= maxGapUs && col("__g2") <= maxGapUs, 1L)
          .otherwise(0L)).as("n_fast"))
      .withColumn("fast_share",
        col("n_fast").cast("double") / col("n").cast("double"))
  }

  /** Dwell time from each source-typed event to the same entity's
    * NEXT event of each target type: per source event, the minimum
    * following timestamp per target (ROWS 1 FOLLOWING .. UNBOUNDED),
    * summarized per target type with exact integer micros. */
  def dwellToNext(events: DataFrame, entityCol: String, typeCol: String,
                  tsMicrosCol: Column, orderCols: Seq[Column],
                  sourceType: String, targetTypes: Seq[String]): DataFrame = {
    require(targetTypes.nonEmpty, "dwellToNext: targetTypes is empty")
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val withNext = targetTypes.foldLeft(
      events.withColumn("__tus", tsMicrosCol)) { (df, tt) =>
      df.withColumn(s"__next_$tt",
        min(when(col(typeCol) === tt, col("__tus"))).over(w))
    }
    // One scan + one window sort total: unpivot the per-target next
    // columns into (target, dwell) pairs and aggregate in a single
    // groupBy, instead of re-running the events scan per target.
    val pairs = withNext.filter(col(typeCol) === sourceType)
      .select(explode(array(targetTypes.map { tt =>
        struct(lit(tt).as("target"),
          (col(s"__next_$tt") - col("__tus")).as("dwell_us"))
      }: _*)).as("p"))
      .select(col("p.target").as("target"), col("p.dwell_us").as("dwell_us"))
    val agg = pairs.groupBy(col("target"))
      .agg(count(col("dwell_us")).as("n"), sum(col("dwell_us")).as("sum_us"),
        max(col("dwell_us")).as("max_us"))
    // Preserve the one-row-per-target contract (n = 0, null sums when
    // no source row exists at all) via a bounded literal spine.
    import org.apache.spark.sql.Encoders
    val spine = events.sparkSession
      .createDataset(targetTypes)(Encoders.STRING).toDF("target")
    spine.join(agg, Seq("target"), "left")
      .select(col("target"), coalesce(col("n"), lit(0L)).as("n"),
        col("sum_us"), col("max_us"))
  }
}
