package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

// Scratch profiler for hotspot queries — not part of the driver contract.
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.core.Tables.NanosAsLongKey, "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("GRAFT_OPEN_COST", "65536"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.load(spark, sfDir, "documents")
    d.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // q26 stages, decomposed like minhashLshDedup's internals
    import graft.operators.TextOps
    println("[profile] scan partitions = " + d.rdd.getNumPartitions)
    time("q26a0 scan only noop") {
      d.write.format("noop").mode("overwrite").save()
    }
    time("q26a1 tokens noop") {
      d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q26a2 +shingles noop") {
      d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), 2).as("sh0"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q26a3 +distinct+hash noop") {
      d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), 2).as("sh0"))
        .select(col("doc_id"), array_distinct(col("sh0")).as("sh"))
        .select(col("doc_id"),
          array_distinct(transform(col("sh"), s => xxhash64(s))).as("hs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q26a shingle+hash checkpoint") {
      val s0 = d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), TextOps.shinglesFromTokens(col("toks"), 2).as("sh0"))
        .select(col("doc_id"), array_distinct(col("sh0")).as("sh"))
        .select(col("doc_id"),
          array_distinct(transform(col("sh"), s => xxhash64(s))).as("hs"))
        .localCheckpoint(false)
      s0.write.format("noop").mode("overwrite").save()
      s0
    }
    time("q26 full minhashLshDedup") {
      DedupOps.minhashLshDedup(d, "doc_id", "text",
        shingleN = 2, k = 16, bands = 16, threshold = 0.1)
        .write.format("noop").mode("overwrite").save()
    }
    time("q26 full again (warm)") {
      DedupOps.minhashLshDedup(d, "doc_id", "text",
        shingleN = 2, k = 16, bands = 16, threshold = 0.1)
        .write.format("noop").mode("overwrite").save()
    }
    time("q26 candidates only") {
      DedupOps.minhashLshCandidates(d, "doc_id", "text",
        shingleN = 2, k = 16, bands = 16)
        .write.format("noop").mode("overwrite").save()
    }

    // q54 stages
    val sub = d.filter(col("doc_id") < 250)
    val p54 = time("q54 simhashNearDupParity pairs") {
      val p = DedupOps.simhashNearDupParity(sub, "doc_id", "text", maxHamming = 8)
      println("[profile]   pairs = " + p.count())
      p
    }
    time("q54 connectedComponents") {
      DedupOps.connectedComponents(p54, "id1", "id2")
        .write.format("noop").mode("overwrite").save()
    }
    // q63 stages
    val p63 = time("q63 minhashLshDedupParity pairs") {
      val p = DedupOps.minhashLshDedupParity(sub, "doc_id", "text",
        shingleN = 2, k = 8, bands = 4, threshold = 0.2)
      println("[profile]   pairs = " + p.count())
      p
    }
    time("q63 connectedComponents") {
      DedupOps.connectedComponents(p63, "id1", "id2")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
