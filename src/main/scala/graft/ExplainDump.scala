package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the named queries into
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization-round
  * before/after plan evidence. Uses the same session config as
  * [[Bench.benchSession]] so the captured plans are the ones the
  * bench actually executes.
  *
  * Usage: runMain graft.ExplainDump <suffix> <name1,name2,...> [outDir]
  *   suffix: "before" | "after" (file name suffix)
  *   names:  comma-separated query-name substrings (Bench's
  *           SPARK_GRAFT_ONLY matching; "all" = every query)
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.lift(1).getOrElse("all")
    val outDir = args.lift(2).getOrElse("plans/r12")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Bench.benchSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val filters = names.split(",").map(_.trim).filter(_.nonEmpty)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      names == "all" || filters.exists(n.contains)
    }
    Files.createDirectories(Paths.get(outDir))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), p)
        println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
