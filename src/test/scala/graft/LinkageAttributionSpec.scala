package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler
import graft.operators.{DedupOps, FunnelOps, TextOps}

/** Hand-traced specs for the record-linkage / attribution additions:
  * the native Jaro-Winkler expression (DuckDB-parity pins + codegen
  * path), SymSpell lossless d<=1 pairs, and last-touch attribution. */
class LinkageAttributionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // full-precision values probed from DuckDB jaro_winkler_similarity
  // (the rapidfuzz formulation the expression pins): byte semantics,
  // floor(t/2) transpositions, 0.7 boost threshold, 4-byte prefix cap
  private val duckdbPins: Seq[(String, String, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("hello", "hallo", 0.88),
    ("prefix", "prefixxxxx", 0.92),
    ("TEST", "TSET", 0.9249999999999999),
    ("AB", "AAB", 0.611111111111111),
    ("éx", "éy", 0.8222222222222222), // bytes, not code points
    ("abcqq", "abcrrr", 0.79),        // jaro 2.1/3 boosts (> 0.7)
    ("ab", "abcdefghij", 0.7866666666666667),
    // odd mismatch count (3-cycle): floor(3/2)=1, NOT 1.5
    ("Customer#000000001", "Customer#000000100", 0.9888888888888889),
    ("aaaaaaaaaaaaaaaaaaaaab", "baaaaaaaaaaaaaaaaaaaaa",
      0.9696969696969697),
    ("", "abc", 0.0), ("", "", 0.0), ("ab", "ba", 0.0),
    ("abc", "abc", 1.0),
    ("abcdxxxxxx", "abcdyyyyyy", 0.6)) // jaro 0.6: below boost gate

  private def jwBytes(a: String, b: String): Double =
    JaroWinkler.similarity(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("JaroWinkler static eval matches DuckDB pins bit-for-bit " +
      "and is symmetric") {
    duckdbPins.foreach { case (a, b, want) =>
      assert(jwBytes(a, b) == want, s"jw('$a','$b')")
      assert(jwBytes(b, a) == want, s"jw('$b','$a') symmetry")
    }
  }

  test("JaroWinkler CODEGEN path (non-local plan) equals the static " +
      "eval on pins and fixture names") {
    val fixture = graft.core.Tables
      .load(spark, sf("sf0.001"), "customer")
      .limit(40).collect().map(_.getAs[String]("c_name"))
    val pairs = duckdbPins.map { case (a, b, _) => (a, b) } ++
      fixture.sliding(2).collect { case Array(a, b) => (a, b) }
    val all = pairs.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toMap
    val la = udf((id: Long) => all(id)._1)
    val lb = udf((id: Long) => all(id)._2)
    val got = spark.range(0, all.size)
      .select(col("id"), la(col("id")).as("a"), lb(col("id")).as("b"))
      .select(col("id"),
        TextOps.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    got.foreach { r =>
      val (a, b) = all(r.getLong(0))
      assert(r.getDouble(1) == jwBytes(a, b), s"codegen jw('$a','$b')")
    }
    // null propagation through the expression
    val n = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(TextOps.jaroWinkler(col("a"), col("b"))).collect().head
    assert(n.isNullAt(0))
  }

  test("symspellPairs: lossless at d<=1 — substitutions, deletions, " +
      "insertions, exact dups found; transposed false candidates " +
      "killed by the verify") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "ab"), (4L, "abcd"),
      (5L, "ba"), (6L, "xyz"), (7L, "abc")).toDF("id", "s")
    val got = DedupOps.symspellPairs(df, "id", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L, (1L, 4L) -> 1L, (1L, 7L) -> 0L,
      (2L, 3L) -> 1L, (2L, 4L) -> 1L, (2L, 7L) -> 1L, (3L, 7L) -> 1L,
      (4L, 7L) -> 1L)
    assert(got == want)
    // (3,5) "ab"/"ba" share deletion variants {a,b} but lev=2: the
    // exact verify must have killed it (checked by absence in `want`)
  }

  test("lastTouchAttribution: latest in-window touch wins, same-ts " +
      "touch attaches, ord breaks ties, stale touch -> (none)") {
    val ev = Seq(
      (1L, 10L, 1L, "click", 0.0), (1L, 20L, 2L, "view", 0.0),
      (1L, 25L, 3L, "purchase", 5.0),   // view@20, dt 5 <= 10
      (1L, 100L, 4L, "purchase", 7.0),  // view@20, dt 80 -> (none)
      (2L, 50L, 5L, "signup", 0.0),
      (2L, 50L, 6L, "purchase", 1.0),   // same-ts signup attaches
      (3L, 5L, 7L, "click", 0.0), (3L, 5L, 8L, "view", 0.0),
      (3L, 6L, 9L, "purchase", 2.0))    // ts tie -> higher ord: view
      .toDF("user", "ts", "ord", "etype", "value")
    val got = FunnelOps.lastTouchAttribution(ev, "user", "ts", "ord",
        "etype", "value", "purchase", Seq("click", "view", "signup"),
        lookback = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("view" -> ((2L, 7.0)), "(none)" -> ((1L, 7.0)),
      "signup" -> ((1L, 1.0))))
  }

  test("rangeJoinLookback: window endpoints inclusive, cross-bucket " +
      "pairs found exactly once, keys respected") {
    import graft.operators.TemporalJoinOps
    val l = Seq((1L, 25L, "a"), (1L, 100L, "b"))
      .toDF("k", "lts", "ltag")
    val r = Seq((1L, 15L), (1L, 20L), (1L, 25L), (1L, 14L), (1L, 95L),
      (2L, 25L)).toDF("k", "rts")
    val got = TemporalJoinOps.rangeJoinLookback(l, r, "k", "lts",
        "rts", 10L)
      .select(col("lts"), col("rts")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    // lts 25 window [15,25]: rts 15 (bucket 1 — cross-bucket), 20,
    // 25 (endpoint); 14 excluded; lts 100 window [90,100]: 95.
    assert(got == Seq((25L, 15L), (25L, 20L), (25L, 25L),
      (100L, 95L)))
  }

  test("multiTouchParticipation: every in-window touch counts once, " +
      "untouched conversions land in (none)") {
    val ev = Seq(
      (1L, 10L, 1L, "click", 0.0), (1L, 20L, 2L, "view", 0.0),
      (1L, 25L, 3L, "purchase", 5.0),  // [15,25]: view only
      (1L, 100L, 4L, "purchase", 7.0), // [90,100]: nothing -> (none)
      (2L, 50L, 5L, "signup", 0.0),
      (2L, 50L, 6L, "purchase", 1.0),  // same-ts signup counts
      (3L, 5L, 7L, "click", 0.0), (3L, 5L, 8L, "view", 0.0),
      (3L, 6L, 9L, "purchase", 2.0))   // BOTH click and view count
      .toDF("user", "ts", "ord", "etype", "value")
    val got = FunnelOps.multiTouchParticipation(ev, "user", "ts",
        "ord", "etype", "purchase", Seq("click", "view", "signup"),
        lookback = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("click" -> ((1L, 1L)), "view" -> ((2L, 2L)),
      "signup" -> ((1L, 1L)), "(none)" -> ((0L, 1L))))
  }
}
