package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Payload-drift canary for the events.props JSON column (mirrors
  * TsSchemaCanarySpec for the timestamp column): q140's DuckDB oracle
  * extracts `$.k` with a core regexp while the Spark side uses
  * get_json_object — equivalent only while the payload stays an
  * integer-valued `{"k": N}` object. If the driver regenerates
  * testdata with a wider payload (floats, nested objects, a renamed
  * key), this spec fails loudly instead of 1 silent parity mismatch.
  *
  * Also pins regexp/get_json_object agreement on the widened payload
  * variants the oracle regexp `"k":\s*"?(-?\d+)` now accepts
  * (negative, quoted) so the two extraction paths cannot drift.
  */
class PropsCanarySpec extends AnyFunSuite with SparkTestBase {

  private val oracleRe = """"k":\s*"?(-?\d+)"""

  test("live events.props stays on the {\"k\": <int>} contract") {
    val ev = Tables.load(spark, sf("sf0.001"), "events")
    val n = ev.count()
    // the full payload is exactly one integer-valued key "k"
    val conforming = ev.filter(
      col("props").rlike("""^\s*\{\s*"k"\s*:\s*-?\d+\s*\}\s*$""")).count()
    assert(n > 0, "events fixture is empty")
    assert(conforming == n,
      s"props payload drifted: $conforming of $n rows match {\"k\": N} — " +
        "re-check q140's oracle regexp vs get_json_object equivalence")
  }

  test("oracle regexp == get_json_object on current + widened payloads") {
    import spark.implicits._
    val payloads = Seq(
      """{"k": 7}""", """{"k":42}""", """{"k": -3}""", """{"k": "9"}""",
      """{"k": "-12"}""", """{"k": 0}""", """{"j": 5}""", "", "not json")
    val df = payloads.toDF("props")
      .withColumn("via_json",
        get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("via_re",
        nullif(regexp_extract(col("props"), oracleRe, 1), lit(""))
          .cast("long"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"extraction drift on payload '${r.getString(0)}': " +
          s"get_json_object=${r.get(1)} regexp=${r.get(2)}")
    }
    // and the non-null values are what a human expects
    assert(rows.map(r => Option(r.get(1))).toSeq ==
      Seq(Some(7L), Some(42L), Some(-3L), Some(9L), Some(-12L),
        Some(0L), None, None, None))
  }
}
