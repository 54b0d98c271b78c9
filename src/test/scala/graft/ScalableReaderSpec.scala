package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ScalableSessionReader, SessionizedCsvReader}

/** The distributed-prefix-scan reader must agree with the ordered-window
  * reader row for row on the golden CSV (including run ids and per-run
  * sample indices that span input-split boundaries). */
class ScalableReaderSpec extends AnyFunSuite with SparkTestBase {

  test("scalable reader equals window reader on the golden CSV") {
    val a = SessionizedCsvReader.read(spark, SessionizedCsvReader.GoldenCsv)
      .select("log_id", "arm", "actuators_enabled", "interval_s",
        "run_id", "sample_idx", "acceleration_g", "pitch_deg", "roll_deg")
      .collect()
      .map(_.toSeq)
    val b = ScalableSessionReader.read(spark, SessionizedCsvReader.GoldenCsv)
      .select("log_id", "arm", "actuators_enabled", "interval_s",
        "run_id", "sample_idx", "acceleration_g", "pitch_deg", "roll_deg")
      .collect()
      .map(_.toSeq)
    assert(a.length == b.length, s"${a.length} vs ${b.length}")
    val sa = a.sortBy(r => (r(4).asInstanceOf[Long], r(5).asInstanceOf[Int]))
    val sb = b.sortBy(r => (r(4).asInstanceOf[Long], r(5).asInstanceOf[Int]))
    sa.zip(sb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs: $x vs $y")
    }
  }

  test("malformed file with data rows before headers chains sample_idx " +
      "identically across split boundaries") {
    // Data rows BEFORE any Log#/Actuators header are parseable but not
    // emitted (headers unknown); they must not count toward the
    // open-run row total that chains across splits. Build a file large
    // enough to split, with a long headerless preamble.
    val sb = new StringBuilder
    (0 until 3000).foreach(i => sb.append(f"$i%d.0, 1.0, 2.0\n"))
    sb.append("Log #: 42\n")
    (0 until 500).foreach(_ => sb.append("0.5, 0.6, 0.7\n")) // still no arm
    sb.append("Actuators enabled\n")
    sb.append("Interval:0.001\n")
    (0 until 3000).foreach(i => sb.append(f"$i%d.1, 0.2, 0.3\n"))
    sb.append("Log Paused, now resuming:\n")
    (0 until 2000).foreach(i => sb.append(f"$i%d.2, 0.4, 0.5\n"))
    val path = java.nio.file.Files.createTempDirectory("malformed")
      .resolve("mal.csv")
    java.nio.file.Files.writeString(path, sb.toString)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8 * 1024).toString)
    try {
      val cols = Seq("log_id", "arm", "interval_s", "run_id", "sample_idx",
        "acceleration_g")
      val a = SessionizedCsvReader.read(spark, path.toString)
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      val b = ScalableSessionReader.read(spark, path.toString)
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      assert(a == b,
        s"onlyWindow=${(a -- b).take(3)} onlyScalable=${(b -- a).take(3)}")
      assert(a.nonEmpty)
    } finally {
      prev.foreach(spark.conf.set("spark.sql.files.maxPartitionBytes", _))
      if (prev.isEmpty)
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("scalable reader splits work across many partitions") {
    // force many small splits so runs definitely span split boundaries
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
    try {
      val df = ScalableSessionReader.read(spark, SessionizedCsvReader.GoldenCsv)
      assert(df.rdd.getNumPartitions > 10,
        s"expected many splits, got ${df.rdd.getNumPartitions}")
      assert(df.count() == 128960)
      // per-run counts must match the window reader's
      val runs = df.groupBy("run_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(runs.size == 10)
      assert(runs.values.sum == 128960)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
    }
  }
}
