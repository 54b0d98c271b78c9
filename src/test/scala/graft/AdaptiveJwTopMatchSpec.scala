package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JaroWinkler, SortedDeletionVariants}
import graft.operators.TextOps

/** The adaptive (sorted-neighborhood + per-row-threshold deletion-
  * variant join + fallback) Jaro-Winkler top match must be EXACTLY
  * the all-pairs-within-block argmax — these specs brute-force that
  * equivalence on corpora chosen to stress every path: variable
  * lengths, near-identical fixed-format keys, low-similarity blocks
  * (theta <= 0.72 → all-pairs fallback), duplicate strings, multi-byte
  * UTF-8, singleton blocks, and tie-heavy scores. */
class AdaptiveJwTopMatchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** Brute-force reference: per id, argmax over every other row in
    * the block by (round(jw*1e6) desc, cand_id asc); singletons drop. */
  private def brute(rows: Seq[(String, Long, String)])
      : Map[(String, Long), (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (_, blk) =>
      if (blk.size < 2) Nil
      else blk.map { case (b, id, s) =>
        val best = blk.filter(_._2 != id)
          .map { case (_, cid, cs) =>
            (math.round(jw(s, cs) * 1e6), cid)
          }
          .minBy { case (e6, cid) => (-e6, cid) }
        (b, id) -> (best._2, best._1)
      }
    }

  private def check(rows: Seq[(String, Long, String)]): Unit = {
    val df = rows.toDF("block", "id", "s")
    val got = TextOps.jaroWinklerTopMatch(df, "block", "id", "s")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = brute(rows)
    assert(got.keySet == want.keySet,
      s"id coverage: missing=${want.keySet -- got.keySet} " +
        s"extra=${got.keySet -- want.keySet}")
    for ((k, w) <- want)
      assert(got(k) == w, s"argmax for $k: want $w got ${got(k)}")
  }

  test("fixed-format keys (the q197 shape): exact vs brute force") {
    val rows = (0 until 400).map(i =>
      (s"n${i % 5}", i.toLong, f"Customer#$i%09d"))
    check(rows)
  }

  test("variable lengths + duplicates + multi-byte text: exact") {
    val words = Seq("alexander hamilton", "alexandre hamilton",
      "aleksander hamilton", "hamilton alexander", "élodie dupont",
      "elodie dupont", "élodie duponts", "jo", "joe", "joey",
      "alexander", "alex", "zz", "alexander hamilton") // exact dup
    val rows = words.zipWithIndex.map { case (w, i) => ("b", i.toLong, w) }
    check(rows)
  }

  test("low-similarity block routes through the all-pairs fallback " +
      "and singleton blocks drop") {
    val rows = Seq(
      ("lo", 1L, "aaaaaaa"), ("lo", 2L, "zzzzzzz"),
      ("lo", 3L, "mnopqrs"), ("lo", 4L, "1234567"),
      ("solo", 9L, "only one here"))
    check(rows)
    val out = TextOps.jaroWinklerTopMatch(
      rows.toDF("block", "id", "s"), "block", "id", "s")
    assert(out.filter(col("block") === "solo").count() == 0)
  }

  test("mixed: one tight cluster + outliers per block, several blocks") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val blk = s"g${i % 3}"
      val s =
        if (i % 7 == 0) rng.alphanumeric.take(5 + rng.nextInt(12)).mkString
        else f"Device-${i / 3}%06d-${i % 3}"
      (blk, i.toLong, s)
    }
    check(rows)
  }

  test("sortedDeletionVariants: distinct sorted multiset variants, " +
      "depth clamp, byte semantics") {
    val df = Seq(("aab", 1), ("aab", 0), ("abc", 2), ("éx", 1))
      .toDF("s", "d")
      .select(TextOps.sortedDeletionVariants(col("s"), col("d")).as("v"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("aab", "ab", "aa")) // dup 'a' dedups
    assert(got(1) == Set("aab"))
    assert(got(2) == Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    // é is two bytes: sorted-byte variants delete single BYTES.
    // Count INSIDE Spark — the variants are distinct as raw bytes,
    // but JVM String decoding of the invalid-UTF-8 fragments maps
    // them to replacement chars and collapses them.
    val exCount = Seq(("éx", 1)).toDF("s", "d")
      .select(size(TextOps.sortedDeletionVariants(col("s"), col("d"))))
      .head().getInt(0)
    assert(exCount == 4) // root + 3 distinct single-byte deletions
    // interpreted vs codegen equivalence over a non-foldable plan
    val n = spark.range(50)
      .select(concat(lit("k"), col("id")).as("s"),
        (col("id") % 3).cast("int").as("d"))
    val a = n.select(TextOps.sortedDeletionVariants(col("s"), col("d"))
      .as("v")).collect().map(_.getSeq[String](0))
    val b = n.select(TextOps.sortedDeletionVariants(col("s"), col("d"))
      .as("v")).where(lit(true)).collect().map(_.getSeq[String](0))
    assert(a.toSeq == b.toSeq)
    // static: depth clamps at 8 even if asked for more
    val big = SortedDeletionVariants.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcdefghij"), 99)
    assert(big.numElements() > 0)
  }
}
