package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge tables — the similarity-graph
  * companion to [[DedupOps.connectedComponents]]: once near-dup pairs
  * form a graph, centrality ranks the canonical representative (or
  * surfaces hub documents) without leaving DataFrames.
  *
  * PageRank (Page et al. 1998, the simplified no-dangling-mass form)
  * as iterative relational algebra: each iteration is one join of the
  * rank vector against the (edge, out-degree) relation plus one
  * dst-keyed partial-aggregated sum — the exact shuffle shape of a
  * sparse matrix-vector multiply. Rank-vector lineage is cut with
  * localCheckpoint per iteration so the plan stays one-iteration deep.
  * At cluster scale, pre-partition `edges` and the rank vector on the
  * same key so the per-iteration join is co-located (bucketing does
  * this for free on a persisted edge table).
  *
  * Arithmetic contract (cross-engine): init 1.0/N; update
  * (1.0 - d)/N + d * coalesce(sum(pr_src / outdeg_src), 0.0) — every
  * constant an IEEE op both engines perform identically, so an oracle
  * replaying the same expressions reproduces the doubles to summation
  * noise.
  */
object GraphOps {

  /** PageRank over a directed edge list. Nodes = distinct src ∪ dst;
    * nodes without in-edges settle at (1-d)/N; out-edge-less nodes
    * leak their mass (the simplified form — mirror it in any oracle).
    * Returns (node, pr). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val n = nodes.count().toDouble
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) scanned once per iteration
    val ed = e.join(deg, "src").localCheckpoint(false)
    var p = nodes.withColumn("pr", lit(1.0) / lit(n))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = ed.join(p, col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("w"))
        .groupBy(col("dst")).agg(sum(col("w")).as("sw"))
      p = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / lit(n) +
            lit(damping) * coalesce(col("sw"), lit(0.0))).as("pr"))
        .localCheckpoint(false)
    }
    p
  }

  /** Synchronous label propagation (community detection) over a
    * DIRECTED edge list (pass both directions for undirected graphs):
    * labels start as node ids; each round every node adopts the most
    * frequent label among its in-neighbors, ties to the SMALLEST
    * label — a fully deterministic round, so any engine replaying the
    * rule reproduces the labels exactly (unlike the randomized
    * classic). Per round: one label join + one (node, label)-keyed
    * partial-aggregated count + one argmin — the PageRank shuffle
    * shape with a struct-min instead of a sum. Nodes without
    * in-neighbors keep their label. Returns (node, community) after
    * `iters` rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(false)
    var lab = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().withColumn("lab", col("node"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val counts = e.join(lab, col("src") === col("node"))
        .groupBy(col("dst"), col("lab").as("nl"))
        .agg(count(lit(1)).as("c"))
      // argmax count, ties to smallest label: lexicographic struct min
      val best = counts.groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("negc"), col("nl").as("l")))
          .as("m"))
        .select(col("dst"), col("m.l").as("newlab"))
      lab = lab.join(best, col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("newlab"), col("lab")).as("lab"))
        .localCheckpoint(false)
    }
    lab.select(col("node"), col("lab").as("community"))
  }

  /** Per-node triangle count, degree, and local clustering
    * coefficient over an UNDIRECTED edge list given as canonical
    * pairs (`aCol` < `bCol`, deduplicated). The standard distributed
    * triangle enumeration: each triangle x<y<z is found exactly once
    * by joining wedge (x,y)+(y,z) against closing edge (x,z) — join
    * keys are node ids, so every stage is a hash-partitioned
    * equi-join whose cost is edge-degree bound, never all-triples.
    * cc = 2*t / (deg*(deg-1)) (0 when deg < 2). */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b")).distinct().localCheckpoint(false)
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc",
        when(col("deg") < 2, lit(0.0)).otherwise(
          lit(2.0) * col("tri") / (col("deg") * (col("deg") - lit(1L)))))
  }
}
