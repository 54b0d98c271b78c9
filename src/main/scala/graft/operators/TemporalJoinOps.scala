package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, built shuffle-lean:
  *
  *  - [[asofJoinLast]] / [[asofJoinNext]]: backward/forward as-of join
  *    expressed as ONE union + window pass — no join operator at all.
  *    Both sides shuffle once on the key, then a per-key ordered LOCF
  *    picks each left row's nearest right match. This is the standard
  *    distributed as-of formulation: cost is a single sort-shuffle of
  *    |L|+|R| rows regardless of time-range skew, where a naive range
  *    join would be O(|L|x|R|) within key.
  *  - [[rangeSelfPairs]]: bounded-interval range join via time
  *    bucketing — each row joins only its own and its neighboring
  *    bucket, so the shuffle key is (key, bucket) and per-task work is
  *    bounded by bucket population, never corpus size.
  */
object TemporalJoinOps {

  /** Shared as-of core. `forward=false`: match the right row with the
    * greatest (ts, orderCol) such that right.ts <= left.ts;
    * `forward=true`: the smallest (ts, orderCol) with right.ts >=
    * left.ts. Equal timestamps DO match (inclusive). A right row whose
    * `valCol` is NULL still matches (and yields a null value) — match
    * presence is tracked by a row marker, not by the value's nullness,
    * so nullable value columns keep true as-of semantics. Left rows
    * with no matching right row get null. NULL timestamps never match
    * (on either side — SQL comparison semantics), they don't fall to
    * an end of the sort order. All left columns pass through; the
    * match arrives as `asof_<valCol>`. */
  private def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       tsCol: String, orderCol: String, valCol: String,
                       forward: Boolean): DataFrame = {
    val keyCols = keys.map(col)
    val leftPayload = struct(left.columns.map(col): _*).as("__l")
    val l = left.select(keyCols ++ Seq(
      col(tsCol).as("__ts"), lit(1).as("__side"), col(orderCol).as("__ord"),
      lit(null).cast(right.schema(valCol).dataType).as("__v"),
      leftPayload): _*)
    val r = right.filter(col(tsCol).isNotNull)
      .select(keyCols ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"), col(orderCol).as("__ord"),
        col(valCol).as("__v"),
        lit(null).cast(l.schema("__l").dataType).as("__l")): _*)
    val ordering =
      if (forward) Seq(col("__ts").desc, col("__side"), col("__ord").desc)
      else Seq(col("__ts"), col("__side"), col("__ord"))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      // wrap right rows in a struct so a NULL value still counts as a
      // match; ignoreNulls skips only left rows (null struct). A left
      // row with NULL ts sorts to one end of the partition; the outer
      // guard voids any accidental neighbor match.
      .withColumn("__match",
        last(when(col("__side") === 0, struct(col("__v"))),
          ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"),
        when(col("__ts").isNotNull, col("__match.__v"))
          .as(s"asof_$valCol"))
  }

  /** Backward-looking as-of join: for every left row, attach `valCol`
    * of the right row with the greatest (ts, orderCol) such that
    * right.ts <= left.ts within the same `keys`. */
  def asofJoinLast(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, orderCol: String, valCol: String)
      : DataFrame =
    asofJoin(left, right, keys, tsCol, orderCol, valCol, forward = false)

  /** Forward-looking as-of join: for every left row, attach `valCol`
    * of the right row with the smallest (ts, orderCol) such that
    * right.ts >= left.ts within the same `keys`. */
  def asofJoinNext(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, orderCol: String, valCol: String)
      : DataFrame =
    asofJoin(left, right, keys, tsCol, orderCol, valCol, forward = true)

  /** All unordered pairs of rows sharing `keyCol` whose `tsIntCol`
    * (any integral time unit — epoch micros/nanos) values differ by at
    * most `tol` of the same unit. Bucketing:
    * every row lands in bucket floor(ts/tol); one side expands to
    * (bucket, bucket+1) so every qualifying pair co-locates in at least
    * one (key, bucket) shuffle partition; least/greatest + distinct
    * collapse the same-bucket double match. Returns (key, id1, id2,
    * dt) with id1 < id2. */
  def rangeSelfPairs(df: DataFrame, keyCol: String, tsIntCol: String,
                     idCol: String, tol: Long): DataFrame = {
    // `div`, not `/`: epoch-nanos exceed the double mantissa (2^53), so
    // fp division could misassign rows near bucket boundaries and lose
    // pairs; integral division is exact.
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
      col(tsIntCol).as("tn"),
      expr(s"`$tsIntCol` div ${tol}L").as("b"))
    val expanded = base.select(col("k"), col("id"), col("tn"),
      explode(array(col("b"), col("b") + 1)).as("b"))
    expanded.as("a")
      .join(base.as("c"),
        col("a.k") === col("c.k") && col("a.b") === col("c.b") &&
          col("a.id") =!= col("c.id"))
      .filter(abs(col("a.tn") - col("c.tn")) <= tol)
      .select(col("a.k").as(keyCol),
        least(col("a.id"), col("c.id")).as("id1"),
        greatest(col("a.id"), col("c.id")).as("id2"),
        abs(col("a.tn") - col("c.tn")).as("dt"))
      .distinct()
  }

  /** Bucketed two-table LOOKBACK interval join: every (left, right)
    * row pair sharing `keyCol` with
    * right.ts in [left.ts - lookback, left.ts] — the multi-touch /
    * "events preceding this one" shape, without an unbounded
    * inequality join (which Spark would plan as a per-key cartesian).
    * Same discipline as [[rangeSelfPairs]]: both sides bucket by
    * `ts div lookback` (integral division — epoch nanos exceed the
    * double mantissa), the LEFT side expands to (b, b-1) so every
    * qualifying pair co-locates in exactly one (key, bucket)
    * partition — a right row's bucket is unique, so no post-join
    * dedup is needed. Pair fan-out is bounded by events per
    * (key, lookback window); pick `lookback` so that stays small, or
    * pre-aggregate the right side.
    *
    * Caller contract: same `keyCol` name on both sides; all other
    * column names disjoint; ts columns integral and nonnegative.
    * Output: all left columns + all right columns. */
  def rangeJoinLookback(left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      lookback: Long): DataFrame = {
    require(lookback > 0, s"bad lookback $lookback")
    val le = left
      .withColumn("__lb", expr(s"`$leftTsCol` div ${lookback}L"))
      .withColumn("__jb",
        explode(array(col("__lb"), col("__lb") - 1)))
      .drop("__lb")
    val re = right
      .withColumn("__jb", expr(s"`$rightTsCol` div ${lookback}L"))
    le.join(re, Seq(keyCol, "__jb"))
      .filter(col(rightTsCol) <= col(leftTsCol) &&
        col(rightTsCol) >= col(leftTsCol) - lookback)
      .drop("__jb")
  }
}
