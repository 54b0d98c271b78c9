package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Abs, Cast, Expression,
  ExpressionInfo, If, LessThanOrEqual, Literal, Multiply, Signum, Subtract}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CharClassCount, CharEntropy, CharNgrams,
  ExactMedian, JaroWinkler, MaxTokenRun, RollingHash, TokenNgrams,
  TopKRows, VectorDot, VectorMomentGram}

/** SQL surface for the engine's custom expressions: registers them in
  * the session function registry so `spark.sql` users call them like
  * built-ins. Activate per session via
  * `spark.sql.extensions=graft.GraftExtensions`, or on an existing
  * session with [[GraftFunctions.register]].
  *
  * Registered:
  *  - `vector_dot(a, b)` — codegen'd double-array dot product
  *  - `exact_median(x)`  — exact median TypedImperativeAggregate
  *  - `deadband(x, floor)` — noise-floor crush (reference F5)
  *  - `rolling_hash(text)` — base-31 mod-1e9+7 document fingerprint
  *  - `char_entropy(text)` — codegen'd character-distribution entropy
  *  - `max_token_run(text)` — longest repeated-token run (byte scan)
  *  - `char_ngrams(text, n)` — code-point n-grams, space-joined
  *  - `token_ngrams(toks, n)` — word shingles over array<string>
  *  - `vector_moment_gram(v, dims)` — single-pass moments + gram aggregate
  *  - `top_k_rows(score, id, k)` — bounded-buffer grouped top-k aggregate
  *
  * Builders return raw Catalyst trees (the analyzer applies its usual
  * type coercion to them, like any parsed SQL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** F5 noise-floor crush as a Catalyst tree:
    * if |x| <= floor then 0 else x - signum(x)*floor. */
  private def deadbandExpr(x: Expression, floor: Expression): Expression =
    If(LessThanOrEqual(Abs(x), floor),
      Literal(0.0d),
      Subtract(x, Multiply(Signum(x), floor)))

  /** Wrap a builder with an arity check so a wrong-argument-count call
    * fails analysis with a clear message instead of an
    * IndexOutOfBoundsException from es(i). */
  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> es.length.toString, "docroot" -> ""))
      b(es)
    }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    // casts mirror the Column API entry points: VectorDot reads raw
    // double slots from ArrayData and ExactMedian's buffer is Double,
    // so uncast int/decimal SQL inputs would silently misread or CCE
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two array<double>"),
      arity("vector_dot", 2)(es => VectorDot(
        Cast(es(0), ArrayType(DoubleType)),
        Cast(es(1), ArrayType(DoubleType))))),
    (FunctionIdentifier("exact_median"),
      info("exact_median", "exact_median(x) - exact median aggregate"),
      arity("exact_median", 1)(es => ExactMedian(Cast(es(0), DoubleType)))),
    (FunctionIdentifier("deadband"),
      info("deadband", "deadband(x, floor) - crush |x|<=floor to 0, shrink rest"),
      arity("deadband", 2)(es => deadbandExpr(es(0), es(1)))),
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - base-31 mod 1e9+7 fingerprint"),
      arity("rolling_hash", 1)(es => RollingHash(es(0)))),
    (FunctionIdentifier("char_entropy"),
      info("char_entropy",
        "char_entropy(text) - Shannon entropy (nats) of the character distribution"),
      arity("char_entropy", 1)(es => CharEntropy(es(0)))),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity over UTF-8 bytes" +
          " (rapidfuzz semantics: 0.7 boost threshold, 4-byte prefix cap)"),
      arity("jaro_winkler", 2)(es => JaroWinkler(es(0), es(1)))),
    (FunctionIdentifier("max_token_run"),
      info("max_token_run",
        "max_token_run(text) - longest run of a repeated whitespace token" +
          " (input is tokenized as split(text, '\\\\s+', -1))"),
      arity("max_token_run", 1)(es => MaxTokenRun(es(0)))),
    (FunctionIdentifier("char_class_count"),
      info("char_class_count",
        "char_class_count(text, mode) - single-pass ASCII class stats:" +
          " 0=digits 1=spaces 2=space-runs 3=[.!?] 4=vowel-runs"),
      arity("char_class_count", 2)(es => {
        val m = es(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            "char_class_count: mode must be an integer literal")
        }
        CharClassCount(es(0), m)
      })),
    (FunctionIdentifier("char_ngrams"),
      info("char_ngrams",
        "char_ngrams(text, n) - space-joined code-point n-grams"),
      arity("char_ngrams", 2)(es => {
        val n = es(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            "char_ngrams: n must be an integer literal")
        }
        CharNgrams(es(0), n)
      })),
    (FunctionIdentifier("token_ngrams"),
      info("token_ngrams",
        "token_ngrams(toks, n) - space-joined n-gram shingles over array<string>"),
      arity("token_ngrams", 2)(es => {
        val n = es(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            "token_ngrams: n must be an integer literal")
        }
        TokenNgrams(es(0), n)
      })),
    (FunctionIdentifier("vector_moment_gram"),
      info("vector_moment_gram",
        "vector_moment_gram(v, dims) - single-pass aggregate over " +
          "array<double>: [n_rows, cnt_1..d, sum_1..d, gram_11..dd]"),
      arity("vector_moment_gram", 2)(es => {
        // dims sizes the aggregation buffer, so it must be a
        // plan-time integer literal, not a runtime column
        val dims = es(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            "vector_moment_gram: dims must be an integer literal")
        }
        if (dims <= 0) throw new IllegalArgumentException(
          s"vector_moment_gram: dims must be positive, got $dims")
        VectorMomentGram(Cast(es(0), ArrayType(DoubleType)), dims)
      })),
    (FunctionIdentifier("top_k_rows"),
      info("top_k_rows",
        "top_k_rows(score, id, k) - aggregate: the k largest (score, id) " +
          "pairs as array<struct<score,id>>, score desc / id asc"),
      arity("top_k_rows", 3)(es => {
        // k sizes the bounded buffer — a plan-time integer literal
        val k = es(2) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(
            "top_k_rows: k must be an integer literal")
        }
        if (k <= 0) throw new IllegalArgumentException(
          s"top_k_rows: k must be positive, got $k")
        TopKRows(Cast(es(0), DoubleType),
          Cast(es(1), org.apache.spark.sql.types.LongType), k)
      })))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
