package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Session tuned for benchmark/stress runs (shared with [[ScaleStress]]). */
  def benchSession(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .config(graft.core.Tables.NanosAsLongKey, "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // Default openCostInBytes (4 MB) floors the scan split size, so a
    // megabyte-scale local table becomes ONE partition and every
    // per-row expression pipeline above it runs single-threaded.
    // Lowering it lets totalBytes/defaultParallelism drive the split
    // on small inputs (32-way here); at production scale files dwarf
    // maxPartitionBytes and this knob is inert.
    .config("spark.sql.files.openCostInBytes", "65536")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = benchSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    warmUp(spark, sfDir)
    // noop sink, not count(): count() lets the optimizer prune every
    // column that doesn't feed an aggregate and drop output sorts
    // (EliminateSorts), so projection-shaped queries would time almost
    // nothing. The noop writer evaluates every output column fully.
    // SPARK_GRAFT_ONLY: optional comma-separated substring filter for
    // targeted A/B timing of individual queries (unset = full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty) // empty/blank filter string == unset
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    val results = timeQueries(spark, sfDir, selected)
    val qs = results.map {
      case (k, (None, v))      => "\"" + k + "\":" + v
      case (k, (Some(err), _)) => "\"" + k + "\":{\"err\":" + jstr(err) + "}"
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, (None, v)) => v }
    val nErr = results.size - ok.size
    val total = if (ok.nonEmpty) ok.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nErr,"sf":"$sfDir"}""")
    if (nErr > 0)
      System.err.println(s"[bench] $nErr of ${results.size} queries FAILED; total covers ${ok.size} ok queries only")
    spark.stop()
  }

  /** Times each query against a noop sink. A failed query must NEVER
    * look like a fast one (r3: 26 analysis errors were reported as
    * ~0.07 s "times"): failures come back as Some(err) and callers
    * exclude them from totals. */
  def timeQueries(spark: SparkSession, sfDir: String,
      selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : Seq[(String, (Option[String], Double))] =
    selected.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(160))
        }
      name -> (outcome, (System.nanoTime() - t0) / 1e9)
    }

  /** Full JSON string escaping (same contract as Verify's q()): any
    * control char < 0x20 in a Spark error message — not just \n\r\t —
    * would otherwise emit invalid JSON and zero the round's bench. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Warm the JVM/scan path so the first timed query per table doesn't
    * absorb class-loading + codegen startup + the cold scan (~2-3 s
    * otherwise, misattributed to whichever query runs first), then warm
    * whole-stage/HOF codegen for the expression-heavy dedup and
    * similarity pipelines on 32-row slices: janino compilation of the
    * generated classes costs ~2-3 s and is keyed by source, so timed
    * runs hit the compile cache and measure steady-state throughput
    * (what extrapolates to cluster scale) instead of charging one-time
    * JIT work to whichever heavy query runs first. Shared with
    * [[ScaleStress]]. */
  def warmUp(spark: SparkSession, sfDir: String): Unit = {
    Seq("lineitem", "orders", "customer", "part", "events", "documents",
      "embeddings").foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try {
      val docs = graft.core.Tables.load(spark, sfDir, "documents").limit(32)
      val noop = (df: org.apache.spark.sql.DataFrame) =>
        df.write.format("noop").mode("overwrite").save()
      noop(graft.operators.DedupOps.minhashLshDedup(docs, "doc_id", "text",
        shingleN = 2, k = 16, bands = 16, threshold = 0.1))
      noop(graft.operators.DedupOps.simhashNearDup(docs, "doc_id", "text",
        maxHamming = 24))
      noop(graft.operators.DedupOps.minhashLshDedupParity(docs, "doc_id",
        "text", shingleN = 2, k = 8, bands = 4, threshold = 0.2))
      val emb = graft.core.Tables.load(spark, sfDir, "embeddings").limit(32)
      noop(graft.operators.SimilarityOps.bruteForceTopK(emb, emb.limit(2),
        "vec_id", "embedding", k = 2))
      noop(graft.operators.SimilarityOps.int8TopK(emb, emb.limit(2),
        "vec_id", "embedding", k = 2))
      noop(graft.operators.SimilarityOps.kmeansInt8(emb,
        "vec_id", "embedding", k = 8, iters = 1))
      noop(graft.operators.SimilarityOps.semanticDedup(emb,
        "vec_id", "embedding", k = 8, iters = 1, threshold = 0.4))
    } catch { case _: Throwable => () }
  }
}
