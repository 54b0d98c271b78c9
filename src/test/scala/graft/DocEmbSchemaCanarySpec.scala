package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Schema-drift canary for the other two driver-regenerated tables
  * (r4 verdict item 8, same hazard class as TsSchemaCanarySpec):
  * pyarrow can legally re-emit `documents` with int32 ids/counts and
  * large_string text, and `embeddings` with list<double> or
  * large_list<float> vectors and int32 ids. [[Tables.load]] must
  * normalize every variant to the engine's canonical schema — long
  * ids/counts, string text, array<float> embedding, int label — or the
  * next testdata regeneration silently breaks the codegen vector
  * expressions and dozens of oracle hashes at once. Fixtures committed
  * under src/test/resources/{doccanary,embcanary}/ carry identical
  * logical values per variant (embedding elements chosen exactly
  * representable in float32, so the double→float cast is lossless and
  * equality is bit-for-bit). */
class DocEmbSchemaCanarySpec extends AnyFunSuite with SparkTestBase {

  private def res(path: String): String =
    getClass.getResource(s"/$path").getPath

  test("documents variants normalize to long ids/counts, identical values") {
    val variants = Seq("doccanary/canonical", "doccanary/int32_large")
      .map(v => Tables.load(spark, res(v), "documents"))
    for (df <- variants) {
      assert(df.schema("doc_id").dataType == LongType)
      assert(df.schema("n_chars").dataType == LongType)
      assert(df.schema("text").dataType == StringType)
      assert(df.schema("lang").dataType == StringType)
    }
    val rows = variants.map(_.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq)
    assert(rows(0) == rows(1))
    // multi-byte text must survive the large_string path intact
    assert(rows(1)(1).getString(1) == "ångström naïve 東京")
  }

  test("embeddings variants normalize to long id / array<float>, identical values") {
    val variants = Seq("embcanary/floats", "embcanary/doubles",
        "embcanary/large_int32")
      .map(v => Tables.load(spark, res(v), "embeddings"))
    for (df <- variants) {
      assert(df.schema("vec_id").dataType == LongType)
      assert(df.schema("embedding").dataType.asInstanceOf[ArrayType]
        .elementType == FloatType)
      assert(df.schema("label").dataType == IntegerType)
    }
    val rows = variants.map(_.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq)
    assert(rows(0) == rows(1), "double-element variant drifted")
    assert(rows(0) == rows(2), "large_list/int32 variant drifted")
  }

  test("live testdata already satisfies the canonical schema post-load") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == FloatType)
    // and the codegen vector path that assumes the canonical element
    // type still runs end to end (self dot product > 0 somewhere)
    val ed = col("embedding").cast("array<double>")
    val v = graft.functions.VectorExprs.vectorDot(ed, ed)
    assert(emb.select(v.as("d")).filter(col("d") > 0).count() > 0)
  }
}
