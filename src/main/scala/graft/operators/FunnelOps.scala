package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention —
  * the product-analytics half of an event-log engine (the reference's
  * event tables answer "did the user view → click → purchase" and
  * "how many of January's new users were still active in week 3").
  *
  * Both operators are one-entity-keyed-shuffle designs: the funnel
  * runs every stage inside a SINGLE sort-window stage (stage k's
  * running match time references stage k-1's column, and all stages
  * share one window spec, so Catalyst plans one Exchange + one Sort
  * no matter how many stages); retention reduces the event log to
  * distinct (entity, bucket) activity FIRST so the join back to each
  * entity's cohort bucket moves a row per active-entity-bucket, not a
  * row per event. Neither collects to the driver; state per entity is
  * O(stages) / O(1).
  */
object FunnelOps {

  /** Ordered-funnel completion times per entity. An entity matches
    * stage k at the EARLIEST event of `stages(k)`'s type that occurs
    * at-or-after its stage k-1 match time (ties on the timestamp are
    * resolved by `tieCol` ordering within the window, and an equal
    * timestamp is allowed to satisfy the at-or-after constraint —
    * the common "same-batch events" analytics convention; the DuckDB
    * oracle replays the identical rule). Output: one row per entity
    * seen in the log — `entityCol`, then `t0 .. t{n-1}` match times
    * (null = stage never reached).
    *
    * Scale shape: one shuffle on the entity key; every stage is a
    * running `min(when(...))` over the SAME ordered window, so the
    * plan is one Exchange + one Sort + n chained Window operators
    * (verified in PlanShapeSpec) + a partial-agg final rollup.
    */
  def funnelStageTimes(events: DataFrame, entityCol: String,
                       typeCol: String, timeCol: String, tieCol: String,
                       stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate stage in $stages")
    val stageCols = stages.indices.map(i => s"t$i")
    val clash = events.columns.toSet.intersect(stageCols.toSet)
    require(clash.isEmpty, s"input columns collide with stage columns: $clash")

    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = stages.zipWithIndex.foldLeft(
        events.select(entityCol, typeCol, timeCol, tieCol)) {
      case (df, (stage, i)) =>
        val gate =
          if (i == 0) col(typeCol) === lit(stage)
          else col(typeCol) === lit(stage) &&
            col(s"t${i - 1}") <= col(timeCol)
        df.withColumn(s"t$i", min(when(gate, col(timeCol))).over(w))
    }
    // The running min at an entity's LAST row is its overall min, so
    // a plain min rollup recovers the final stage times.
    staged.groupBy(col(entityCol))
      .agg(min(col(stageCols.head)).as(stageCols.head),
        stageCols.tail.map(c => min(col(c)).as(c)): _*)
  }

  /** Funnel conversion rollup over [[funnelStageTimes]] output: one
    * row per stage — stage index, stage name, entities reaching it,
    * and the conversion fraction vs stage 0 in micro-units (BIGINT —
    * cross-engine hash-stable, see the e6 rationale in NorthStar).
    * The unpivot is one posexplode over the SINGLE aggregate row, so
    * the upstream funnel pipeline executes exactly once. */
  def funnelConversion(stageTimes: DataFrame, stages: Seq[String])
      : DataFrame = {
    val counts = stageTimes.agg(
      count(when(col("t0").isNotNull, 1)).as("c0"),
      stages.indices.tail
        .map(i => count(when(col(s"t$i").isNotNull, 1)).as(s"c$i")): _*)
    counts
      .select(col("c0"), posexplode(array(stages.zipWithIndex.map {
        case (stage, i) => struct(lit(stage).as("stage"),
          col(s"c$i").cast("long").as("n_entities"))
      }: _*)))
      .select(col("pos").cast("int").as("stage_idx"),
        col("col.stage").as("stage"),
        col("col.n_entities").as("n_entities"),
        when(col("c0") > 0,
            round(col("col.n_entities") / col("c0") * lit(1e6), 0)
              .cast("long"))
          .otherwise(lit(0L)).as("conv_e6"))
  }

  /** Cohort retention matrix: bucket time into `bucketWidth`-unit
    * cohorts (an entity's cohort = its first active bucket) and count
    * distinct active entities per (cohort bucket, bucket offset).
    * Offset 0 row of each cohort is the cohort's size — downstream
    * ratio is a projection, left to the caller/query.
    *
    * Scale shape: the event log collapses to distinct
    * (entity, bucket) BEFORE anything else, so the cohort aggregate,
    * the join back, and the final matrix aggregate all move
    * activity-grid rows (entities x active buckets), never raw
    * events. All shuffles are partial-agg or equi-join exchanges;
    * per-entity state is one row. */
  def cohortRetention(events: DataFrame, entityCol: String,
                      timeCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bad bucket width $bucketWidth")
    val active = events
      .select(col(entityCol).as("entity"),
        floorDiv(col(timeCol), lit(bucketWidth)).as("bucket"))
      .distinct()
    val cohorts = active.groupBy(col("entity"))
      .agg(min(col("bucket")).as("cohort"))
    active.join(cohorts, "entity")
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Integer division matching SQL `div` for the nonnegative epoch
    * offsets used here: subtract the remainder first so the double
    * division is exact (quotients stay far below 2^53). */
  private def floorDiv(c: Column, width: Column): Column = {
    val l = c.cast("long")
    ((l - (l % width)) / width).cast("long")
  }

  /** Last-touch attribution: every `convType` event is attributed to
    * the most recent `touchTypes` event by the same entity at
    * ts <= conversion ts (ties by the greatest `ordCol`), provided
    * that touch is within `lookback` time-units; conversions with no
    * touch in the window report channel "(none)". One
    * [[TemporalJoinOps.asofJoinLast]] (the union+window as-of — a
    * single entity-keyed shuffle, no join operator, state bounded by
    * the window frame) plus one channel rollup.
    *
    * `tsIntCol` is an integral clock (epoch nanos/micros) and
    * `lookback` the same unit. Output per channel: n_conv, revenue
    * (SUM of the conversions' `valueCol` — a double; pin at the call
    * site). */
  def lastTouchAttribution(events: DataFrame, entityCol: String,
      tsIntCol: String, ordCol: String, typeCol: String,
      valueCol: String, convType: String, touchTypes: Seq[String],
      lookback: Long): DataFrame = {
    require(lookback > 0, s"bad lookback $lookback")
    require(!touchTypes.contains(convType),
      "conversion type cannot also be a touch type")
    val ev = events.select(col(entityCol).as("entity"),
      col(tsIntCol).cast("long").as("ts"),
      col(ordCol).cast("long").as("ord"),
      col(typeCol).as("etype"), col(valueCol).cast("double").as("value"))
    val conv = ev.filter(col("etype") === convType)
      .select(col("entity"), col("ts"), col("ord"), col("value"))
    val touch = ev.filter(col("etype").isin(touchTypes: _*))
      .select(col("entity"), col("ts"), col("ord"),
        struct(col("ts").as("t_ts"), col("etype").as("t_type")).as("tv"))
    TemporalJoinOps.asofJoinLast(conv, touch, Seq("entity"), "ts",
        "ord", "tv")
      .withColumn("channel",
        when(col("asof_tv").isNotNull &&
          col("ts") - col("asof_tv.t_ts") <= lookback,
          col("asof_tv.t_type")).otherwise(lit("(none)")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conv"), sum(col("value")).as("revenue"))
  }

  /** Multi-touch participation: for every conversion, EVERY
    * `touchTypes` event by the same entity within the `lookback`
    * window participates (the companion to [[lastTouchAttribution]]'s
    * winner-take-all). One bucketed
    * [[TemporalJoinOps.rangeJoinLookback]] (no per-key cartesian)
    * plus integer rollups — deliberately counts, not fractional
    * credit shares, so the output is engine-exact.
    *
    * Output per channel: n_pairs ((conversion, touch) in-window
    * pairs), n_conv (distinct conversions the channel touched);
    * plus a "(none)" row counting conversions no channel touched. */
  def multiTouchParticipation(events: DataFrame, entityCol: String,
      tsIntCol: String, ordCol: String, typeCol: String,
      convType: String, touchTypes: Seq[String], lookback: Long)
      : DataFrame = {
    require(!touchTypes.contains(convType),
      "conversion type cannot also be a touch type")
    val ev = events.select(col(entityCol).as("entity"),
      col(tsIntCol).cast("long").as("__ts"),
      col(ordCol).cast("long").as("__ord"), col(typeCol).as("etype"))
    val conv = ev.filter(col("etype") === convType)
      .select(col("entity"), col("__ts").as("c_ts"),
        col("__ord").as("c_ord"))
    val touch = ev.filter(col("etype").isin(touchTypes: _*))
      .select(col("entity"), col("__ts").as("t_ts"),
        col("etype").as("t_type"))
    val pairs = TemporalJoinOps.rangeJoinLookback(conv, touch,
      "entity", "c_ts", "t_ts", lookback).localCheckpoint(false)
    val byChannel = pairs.groupBy(col("t_type").as("channel"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c_ord")).as("n_conv"))
    val none = conv.agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(
        pairs.agg(countDistinct(col("c_ord")).as("__t"))))
      .select(lit("(none)").as("channel"), lit(0L).as("n_pairs"),
        (col("__c") - col("__t")).as("n_conv"))
    byChannel.unionByName(none)
  }
}
