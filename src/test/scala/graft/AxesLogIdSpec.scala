package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ScalarOps
import graft.state.{AxesAlignment, Vec3}

/** Spark-side contracts for the M17 axes-swap enum and the M21 log-id
  * operators (the pure-math M17 properties live in PropertySpec). */
class AxesLogIdSpec extends AnyFunSuite with SparkTestBase {

  test("M17 swapColumns agrees with the Vec3 form for all 24 ordinals") {
    import spark.implicits._
    val rows = Seq((1.5, -2.25, 3.0), (0.0, 4.0, -1.0))
    val df = rows.toDF("sx", "sy", "sz")
    (0 until 24).foreach { a =>
      val (bx, by, bz) =
        AxesAlignment.swapColumns(col("sx"), col("sy"), col("sz"), a)
      val got = df.select(bx.as("x"), by.as("y"), bz.as("z"))
        .collect().map(r => Vec3(r.getDouble(0), r.getDouble(1),
          r.getDouble(2)))
      val want = rows.map { case (x, y, z) =>
        AxesAlignment.swap(Vec3(x, y, z), a)
      }
      assert(got.toSeq == want, s"ordinal $a")
    }
  }

  test("M17 identity ordinal 0 is a no-op projection") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 3.0)).toDF("sx", "sy", "sz")
    val (bx, by, bz) =
      AxesAlignment.swapColumns(col("sx"), col("sy"), col("sz"), 0)
    assert(df.select(bx, by, bz).head == org.apache.spark.sql.Row(1.0, 2.0, 3.0))
  }

  test("M21 seeded log id is in 0..9999 and reproducible for a seed") {
    import spark.implicits._
    val df = (1 to 500).toDF("i").repartition(4).cache()
    try {
      val a = df.select(ScalarOps.randomLogId(42).as("id"))
        .collect().map(_.getInt(0))
      assert(a.forall(v => v >= 0 && v < 10000))
      assert(a.distinct.length > 50, "ids should spread over the range")
      val b = df.select(ScalarOps.randomLogId(42).as("id"))
        .collect().map(_.getInt(0))
      assert(a.toSeq == b.toSeq, "same seed + layout must reproduce")
    } finally df.unpersist()
  }

  test("M21 keyed log id survives repartitioning and pins known values") {
    import spark.implicits._
    val df = (1 to 200).toDF("k")
    val one = df.select(col("k"), ScalarOps.keyedLogId(col("k"), "log")
      .as("id")).collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val two = df.repartition(7)
      .select(col("k"), ScalarOps.keyedLogId(col("k"), "log").as("id"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(one == two, "keyed ids must be layout-independent")
    assert(one.values.forall(v => v >= 0 && v < 10000))
  }
}
