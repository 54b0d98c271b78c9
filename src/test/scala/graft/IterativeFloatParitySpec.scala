package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count parity for the iterative-float queries (r4 advice):
  * q114 (logreg GD) and q115 (PageRank) accumulate order-dependent
  * double sums across iterations before rounding to micro-unit
  * BIGINTs. The e6 contract protects exactly-representable ratios, not
  * iterative float accumulations — a sum landing near an x.5e-6
  * boundary could flip the rounded value when partial-aggregation
  * order changes. This spec pins that the DECLARED outputs are
  * invariant across two deliberately different physical layouts
  * (narrow shuffle + coarse scan splits vs wide shuffle + fine
  * splits), i.e. the accumulations currently sit far enough from
  * rounding boundaries that engine-vs-engine order differences cannot
  * flip them. If corpus regeneration ever lands a sum on a boundary,
  * this fails loudly here instead of as an opaque driver hash
  * mismatch. q118 (per-doc scoring with the GD weights) joins the list
  * in r5: its 500 e6-rounded sigmoids each roll the same dice. */
class IterativeFloatParitySpec extends AnyFunSuite with SparkTestBase {
  private val dir = sf("sf0.01")

  private def runWith(name: String, shuffle: String, openCost: String): Seq[String] = {
    val conf = spark.conf
    val oldShuffle = conf.get("spark.sql.shuffle.partitions")
    val oldOpen = conf.get("spark.sql.files.openCostInBytes", "4194304")
    try {
      conf.set("spark.sql.shuffle.partitions", shuffle)
      conf.set("spark.sql.files.openCostInBytes", openCost)
      SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    } finally {
      conf.set("spark.sql.shuffle.partitions", oldShuffle)
      conf.set("spark.sql.files.openCostInBytes", oldOpen)
    }
  }

  // q138 (weighted PageRank) joins in r5: integer weights keep the
  // out-weight totals exact, but the per-dst contribution sum is the
  // same order-dependent class as q115's.
  for (q <- Seq("q114_logreg_quality", "q115_pagerank",
      "q118_quality_score", "q138_weighted_pagerank")) {
    test(s"$q output is identical under 3-way/coarse vs 8-way/fine layouts") {
      val narrow = runWith(q, shuffle = "3", openCost = "4194304")
      val wide = runWith(q, shuffle = "8", openCost = "16384")
      assert(narrow.nonEmpty)
      assert(narrow == wide)
    }
  }
}
