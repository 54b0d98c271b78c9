package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ScalableSessionReader, SessionizedCsvReader}

/** Reading a directory of log files: per-file session isolation (runs,
  * headers, and indices must never leak across files) for both reader
  * implementations. */
class MultiFileReaderSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-multilog")
    Files.copy(Paths.get(SessionizedCsvReader.GoldenCsv),
      d.resolve("a.csv"), StandardCopyOption.REPLACE_EXISTING)
    Files.writeString(d.resolve("b.csv"),
      """Log #: 1234
        |Actuators enabled
        |Interval:0.01
        |Acceleration, Pitch, Roll
        |0.1, 1.0, 2.0
        |0.2, 1.1, 2.1
        |Log Paused, now resuming:
        |0.3, 1.2, 2.2
        |""".stripMargin)
    d.toString
  }

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.count() == 128960 + 3)
    // the small file's block is intact and isolated
    val small = df.filter(col("log_id") === 1234)
      .orderBy("run_id", "sample_idx").collect()
    assert(small.length == 3)
    assert(small.map(_.getAs[Double]("acceleration_g")).toSeq ==
      Seq(0.1, 0.2, 0.3))
    // run ids restart per file: small file has exactly 2 distinct runs
    assert(small.map(_.getAs[Long]("run_id")).distinct.length == 2)
    // the golden file's structure is unaffected by the neighbor
    val golden = df.filter(col("log_id").isin(2690, 6822))
    assert(golden.count() == 128960)
    assert(golden.select("arm", "run_id").distinct().count() == 10)
  }

  test("window reader isolates sessions per file") {
    check(SessionizedCsvReader.read(spark, dir))
  }

  test("scalable reader isolates sessions per file") {
    check(ScalableSessionReader.read(spark, dir))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("file", "log_id", "arm", "run_id", "sample_idx",
      "interval_s", "acceleration_g", "pitch_deg", "roll_deg")
    .collect().map(_.toSeq)
    .sortBy(r => (r(0).asInstanceOf[String], r(3).asInstanceOf[Long],
      r(4).asInstanceOf[Int]))

  test("both readers agree row-for-row on the multi-file directory") {
    // Spark bin-packs small files into shared FilePartitions, so this
    // exercises file boundaries INSIDE one split of the scalable
    // reader — run ids must restart per file exactly like the windowed
    // reader's partitionBy(file).
    val a = rows(SessionizedCsvReader.read(spark, dir))
    val b = rows(ScalableSessionReader.read(spark, dir))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("readers agree under adversarial split packing (tiny chunks, " +
      "zero open cost)") {
    // zero open cost + tiny maxPartitionBytes makes Spark pack chunks
    // of the big file together with the small file in arbitrary
    // positions — the per-file prefix chaining must survive any packing
    val conf = spark.conf
    val prevMax = conf.getOption("spark.sql.files.maxPartitionBytes")
    val prevCost = conf.getOption("spark.sql.files.openCostInBytes")
    conf.set("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
    conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val a = rows(SessionizedCsvReader.read(spark, dir))
      val b = rows(ScalableSessionReader.read(spark, dir))
      assert(a.length == 128963 && b.length == a.length)
      a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    } finally {
      prevMax.fold(conf.unset("spark.sql.files.maxPartitionBytes"))(
        conf.set("spark.sql.files.maxPartitionBytes", _))
      prevCost.fold(conf.unset("spark.sql.files.openCostInBytes"))(
        conf.set("spark.sql.files.openCostInBytes", _))
    }
  }
}
