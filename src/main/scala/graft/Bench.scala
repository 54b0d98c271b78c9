package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.core.Tables.NanosAsLongKey, "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/scan path so the first timed query per table
    // doesn't absorb class-loading + codegen startup + the cold scan
    // (~2-3 s otherwise, misattributed to whichever query runs first).
    Seq("lineitem", "orders", "customer", "part", "events", "documents",
      "embeddings").foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
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
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
