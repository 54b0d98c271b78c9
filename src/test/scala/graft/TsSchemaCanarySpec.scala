package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Schema-drift canary: the driver regenerated /root/testdata mid-round-3
  * and silently flipped events.ts from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which broke all 26 events
  * queries at analysis time. This spec pins [[Tables.load]]'s behavior on
  * all three writer variants (fixtures generated with pyarrow, committed
  * under src/test/resources/tscanary/):
  *   - nanos/  TIMESTAMP(NANOS)        — read as LONG under the legacy flag
  *   - ntz/    TIMESTAMP(MICROS, NTZ)
  *   - utc/    TIMESTAMP(MICROS, UTC)
  * All variants encode the same three instants (the nanos variant carries
  * an extra +500 ns tail that must survive into ts_ns and truncate out of
  * the micro-precision ts).
  */
class TsSchemaCanarySpec extends AnyFunSuite with SparkTestBase {

  private def res(variant: String): String =
    getClass.getResource(s"/tscanary/$variant").getPath

  private val microsExpected =
    Seq(1735689600000000L, 1735689600123456L, 1735693199999999L)

  private def loaded(variant: String) =
    Tables.load(spark, res(variant), "events")
      .select(col("event_id"), col("ts"), col("ts_ns"))
      .orderBy("event_id").collect()

  test("all three parquet timestamp variants normalize to one schema") {
    for (v <- Seq("nanos", "ntz", "utc")) {
      val df = Tables.load(spark, res(v), "events")
      assert(df.schema("ts").dataType == TimestampType, s"variant $v ts")
      assert(df.schema("ts_ns").dataType == LongType, s"variant $v ts_ns")
    }
  }

  test("ntz and utc variants yield identical ts and ts_ns values") {
    val ntz = loaded("ntz")
    val utc = loaded("utc")
    assert(ntz.toSeq == utc.toSeq)
    val tsNs = ntz.map(_.getLong(2)).toSeq
    assert(tsNs == microsExpected.map(_ * 1000L))
  }

  test("nanos variant keeps the exact nano tail in ts_ns, truncates in ts") {
    val nanos = loaded("nanos")
    assert(nanos.map(_.getLong(2)).toSeq ==
      microsExpected.map(_ * 1000L + 500L))
    // micro-precision ts must equal the ntz/utc variants' ts exactly
    val ntz = loaded("ntz")
    assert(nanos.map(_.getTimestamp(1)).toSeq ==
      ntz.map(_.getTimestamp(1)).toSeq)
  }

  test("live testdata loads under whatever variant the driver last wrote") {
    val df = Tables.load(spark, sf("sf0.001"), "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    // ts and ts_ns must agree at micro precision on real data
    val bad = df.filter(unix_micros(col("ts")) * 1000L =!= col("ts_ns") -
      (col("ts_ns") % 1000L)).count()
    assert(bad == 0L)
  }
}
