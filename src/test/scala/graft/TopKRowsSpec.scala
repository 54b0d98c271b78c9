package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKRows

/** The bounded-buffer grouped top-k aggregate must agree with the
  * rank-window form on any data (duplicates, nulls, tiny groups) and
  * be invariant to partitioning (partials merge through serialize/
  * deserialize on the shuffle). */
class TopKRowsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def viaWindow(rows: Seq[(String, Option[Double], Long)], k: Int)
      : Set[(String, Double, Long)] =
    rows.collect { case (g, Some(v), id) => (g, v, id) }
      .groupBy(_._1)
      .flatMap { case (_, grp) =>
        grp.sortBy(r => (-r._2, r._3)).take(k)
      }.toSet

  private def viaAgg(rows: Seq[(String, Option[Double], Long)], k: Int,
                     parts: Int): Set[(String, Double, Long)] =
    rows.toDF("g", "v", "id").repartition(parts)
      .groupBy("g").agg(TopKRows.topK(col("v"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

  test("matches the rank-window form with duplicates and nulls") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 5000L).map { id =>
      val g = s"g${id % 7}"
      // heavy ties (value drawn from 20 levels) + 5% nulls
      val v = if (rnd.nextInt(20) == 0) None
              else Some(rnd.nextInt(20).toDouble / 4.0)
      (g, v, id)
    }
    assert(viaAgg(rows, 5, 13) == viaWindow(rows, 5))
  }

  test("partition-invariant and ordered (score desc, id asc)") {
    val rnd = new scala.util.Random(12)
    val rows = (1L to 2000L).map(id =>
      (s"g${id % 3}", Some(rnd.nextDouble()), id))
    assert(viaAgg(rows, 8, 1) == viaAgg(rows, 8, 31))
    val ordered = rows.toDF("g", "v", "id")
      .groupBy("g").agg(TopKRows.topK(col("v"), col("id"), 8).as("top"))
      .select(col("top")).collect()
    ordered.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getDouble(0), x.getLong(1)))
      assert(arr.length == 8)
      arr.sliding(2).foreach { case Seq(a, b) =>
        assert(a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      }
    }
  }

  test("groups smaller than k return all their rows") {
    val rows = Seq(("a", Some(1.0), 1L), ("a", Some(2.0), 2L),
      ("b", Some(3.0), 3L))
    assert(viaAgg(rows, 10, 4) == viaWindow(rows, 10))
  }
}
