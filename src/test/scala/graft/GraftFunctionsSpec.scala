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
      "jaro_winkler"))
    val ext = new GraftExtensions
    val sse = new org.apache.spark.sql.SparkSessionExtensions
    ext(sse) // must not throw; builder wiring exercised above
  }
}
