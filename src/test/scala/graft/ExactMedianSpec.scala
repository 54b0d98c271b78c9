package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExactMedian.exactMedian

/** The custom TypedImperativeAggregate must match SQL MEDIAN semantics
  * in grouped, windowed, and partial-merge execution. */
class ExactMedianSpec extends AnyFunSuite with SparkTestBase {

  test("grouped median: odd, even, single, and null-only groups") {
    import spark.implicits._
    val df = Seq(
      ("odd", Some(3.0)), ("odd", Some(1.0)), ("odd", Some(2.0)),
      ("even", Some(1.0)), ("even", Some(2.0)), ("even", Some(3.0)),
      ("even", Some(10.0)),
      ("one", Some(42.0)),
      ("nul", None), ("nul", None)
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(exactMedian(col("v")).as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("odd") == 2.0)
    assert(got("even") == 2.5)
    assert(got("one") == 42.0)
    assert(got("nul") == null)
  }

  test("windowed median over row frames matches percentile(0.5)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 500).map(i => (i, rnd.nextDouble() * 100)).toDF("i", "v")
    val w = Window.orderBy("i")
    val both = df.select(
      exactMedian(col("v")).over(w.rowsBetween(-7, 7)).as("custom"),
      call_function("percentile", col("v"), lit(0.5))
        .over(w.rowsBetween(-7, 7)).as("builtin"))
      .collect()
    both.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("partial merge across partitions matches single-partition result") {
    import spark.implicits._
    val xs = (1 to 10001).map(i => ((i * 7919) % 10007).toDouble)
    val one = spark.createDataset(xs).repartition(1)
      .agg(exactMedian(col("value"))).head().getDouble(0)
    val many = spark.createDataset(xs).repartition(17)
      .agg(exactMedian(col("value"))).head().getDouble(0)
    assert(one == many)
  }
}
