package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface: every custom expression must be
  * callable from spark.sql like a built-in. */
class GraftFunctionsSpec extends AnyFunSuite with SparkTestBase {

  test("registered SQL functions evaluate like their column forms") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       deadband(0.002D, 0.003D) AS db0,
        |       deadband(0.010D, 0.003D) AS db1,
        |       rolling_hash('ab') AS rh,
        |       char_entropy('aabb') AS ce""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 0.007) < 1e-12)
    // ((0*31+97)%M)*31+98 = 3105
    assert(r.getLong(3) == 3105L)
    assert(math.abs(r.getDouble(4) - math.log(2.0)) < 1e-12)
  }

  test("exact_median works as a SQL aggregate") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1.0, 9.0, 3.0, 5.0, 7.0).toDF("x").createOrReplaceTempView("mx")
    val m = spark.sql("SELECT exact_median(x) AS m FROM mx").collect()(0)
    assert(m.getDouble(0) == 5.0)
    val m4 = spark.sql(
      "SELECT exact_median(x) AS m FROM mx WHERE x < 9").collect()(0)
    assert(m4.getDouble(0) == 4.0) // even count: mean of middle two
  }

  test("vector_moment_gram works as a SQL aggregate") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(Array(1.0, 2.0), Array(3.0, 4.0)).toDF("v")
      .createOrReplaceTempView("mg")
    val flat = spark.sql(
      "SELECT vector_moment_gram(v, 2) AS g FROM mg")
      .collect()(0).getSeq[Double](0)
    // [n, cnt0, cnt1, sum0, sum1, g00, g01, g10, g11]
    assert(flat == Seq(2.0, 2.0, 2.0, 4.0, 6.0, 10.0, 14.0, 14.0, 20.0))
    val e = intercept[Exception] {
      spark.sql("SELECT vector_moment_gram(v, cast(rand()*2 as int)) FROM mg")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("top_k_rows works as a SQL aggregate") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a", 1.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 3L), ("a", 2.0, 4L),
      ("b", 9.0, 5L)).toDF("g", "s", "id").createOrReplaceTempView("tk")
    val rows = spark.sql(
      "SELECT g, top_k_rows(s, id, 2) AS top FROM tk GROUP BY g ORDER BY g")
      .collect()
    val a = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(a == Seq((5.0, 2L), (5.0, 3L))) // tie -> smaller id first
    val b = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(b == Seq((9.0, 5L)))
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_rows(s, id, cast(rand()*2 as int)) FROM tk")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("the extensions class injects the same registry entries") {
    // GraftExtensions is the spark.sql.extensions entry point; its
    // injection list must stay in sync with the direct registrar.
    val names = GraftFunctions.all.map(_._1.funcName).toSet
    assert(names == Set("vector_dot", "exact_median", "deadband",
      "rolling_hash", "char_entropy", "max_token_run", "char_ngrams",
      "token_ngrams", "vector_moment_gram", "top_k_rows",
      "jaro_winkler", "char_class_count"))
    val ext = new GraftExtensions
    val sse = new org.apache.spark.sql.SparkSessionExtensions
    ext(sse) // must not throw; builder wiring exercised above
  }

  test("CharClassCount codegen equals the regexp_replace derivation " +
      "over a range-based plan (all 5 modes)") {
    import org.apache.spark.sql.functions._
    // range-based source so the expression exercises doGenCode (local
    // Seq.toDF plans constant-fold through interpreted eval)
    val df = spark.range(0, 500).select(
      concat(lit("Ab 9 .x!  y?"), col("id").cast("string"),
        lit("  ou3.7 Einstein? "),
        when(col("id") % 3 === 0, "aeiou AEIOU").otherwise("zz 12"))
        .as("text"))
    val got = df.select(
      graft.operators.TextOps.charClassCount(col("text"), 0).as("m0"),
      graft.operators.TextOps.charClassCount(col("text"), 1).as("m1"),
      graft.operators.TextOps.charClassCount(col("text"), 2).as("m2"),
      graft.operators.TextOps.charClassCount(col("text"), 3).as("m3"),
      graft.operators.TextOps.charClassCount(lower(col("text")), 4)
        .as("m4"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).as("r0"),
      (length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))).as("r1"),
      (length(regexp_replace(col("text"), " +", "S")) -
        length(regexp_replace(col("text"), " +", ""))).as("r2"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.!?]", ""))).as("r3"),
      (length(regexp_replace(lower(col("text")), "[aeiouy]+", "V")) -
        length(regexp_replace(lower(col("text")), "[aeiouy]+", "")))
        .as("r4")).collect()
    got.foreach { r =>
      (0 to 4).foreach { m =>
        assert(r.getLong(m) == r.getInt(5 + m).toLong,
          s"mode $m: native ${r.getLong(m)} vs regexp ${r.getInt(5 + m)}")
      }
    }
    // direct interpreted-path pins (multi-byte chars break runs)
    import graft.functions.CharClassCount
    import org.apache.spark.unsafe.types.UTF8String
    assert(CharClassCount.compute(
      UTF8String.fromString("a  bée yy"), 4) == 3L)
    assert(CharClassCount.compute(
      UTF8String.fromString("a  bée yy"), 2) == 2L)
  }

  test("Md5Hash32 codegen is bit-identical to the conv(substring(md5))" +
      " composition over a range-based plan") {
    import org.apache.spark.sql.functions._
    // range-based source so the expression exercises doGenCode; inputs
    // cover empty string, multi-byte UTF-8, and the salt:id shapes
    // every hashKeep caller builds. NULL row pins null-propagation.
    val df = spark.range(0, 2000).select(
      when(col("id") === 0, lit(null).cast("string"))
        .when(col("id") === 1, lit(""))
        .otherwise(concat(lit("salt:"), col("id").cast("string"),
          lit(" é€"))).as("s"))
    val got = df.select(
      graft.operators.CurationOps.md5Hash32(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long")
        .as("composed")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1),
          s"native ${r.getLong(0)} vs composed ${r.getLong(1)}")
    }
    assert(got.count(_.isNullAt(0)) == 1)
  }

  test("VectorSqDist codegen is bit-identical to the HOF fold over a " +
      "range-based plan") {
    import org.apache.spark.sql.functions._
    // range-based source so the expression exercises doGenCode (local
    // Seq.toDF plans constant-fold through interpreted eval); values
    // are irregular doubles so any accumulation-order difference
    // would show up bit-wise
    val df = spark.range(0, 1000).select(
      transform(sequence(lit(0), lit(63)),
        i => sin(col("id") * i + 1).cast("double")).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => cos(col("id") - i * 3).cast("double")).as("b"))
    val rows = df.select(
      graft.operators.SimilarityOps.sqDist(col("a"), col("b"))
        .as("native"),
      graft.operators.SimilarityOps.sqDistHof(col("a"), col("b"))
        .as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("VectorSqDist outside the equal-length non-null precondition: " +
      "documented divergence from the HOF form is pinned") {
    import org.apache.spark.sql.functions._
    // range-based so codegen runs; the precondition (equal-length,
    // non-null elements) is what every call site satisfies — OUTSIDE
    // it the native loop truncates to the shorter array / reads null
    // elements as 0.0 while zip_with+aggregate returns NULL. Pin both
    // so a future ragged/nullable caller hits documented behavior.
    val df = spark.range(0, 4).select(
      // a = [1.0, 3.0], b = [1.0] (shorter) — native: 0.0, HOF: NULL
      array(lit(1.0), lit(3.0)).as("a"),
      array(lit(1.0)).as("b"),
      // c has a null element — native reads it as 0.0, HOF: NULL
      array(lit(2.0), lit(null).cast("double")).as("c"),
      array(lit(2.0), lit(5.0)).as("d"),
      // null top-level array — BOTH return NULL
      lit(null).cast("array<double>").as("e"))
    val r = df.select(
      graft.operators.SimilarityOps.sqDist(col("a"), col("b")).as("n_len"),
      graft.operators.SimilarityOps.sqDistHof(col("a"), col("b")).as("h_len"),
      graft.operators.SimilarityOps.sqDist(col("c"), col("d")).as("n_nul"),
      graft.operators.SimilarityOps.sqDistHof(col("c"), col("d")).as("h_nul"),
      graft.operators.SimilarityOps.sqDist(col("e"), col("d")).as("n_top"),
      graft.operators.SimilarityOps.sqDistHof(col("e"), col("d")).as("h_top"))
      .head()
    assert(r.getDouble(0) == 0.0)           // truncated to min length
    assert(r.isNullAt(1))                   // HOF: zip_with pads null
    assert(r.getDouble(2) == 25.0)          // null element read as 0.0
    assert(r.isNullAt(3))                   // HOF: null poisons fold
    assert(r.isNullAt(4) && r.isNullAt(5))  // null array: both NULL
  }
}
