package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{ControlPipeline, RawImuSample}
import graft.state.AhrsSettings
import graft.streaming.ControlProcessor

/** transformWithState replay must equal the sequential run. Needs its
  * own session: the RocksDB state store provider is session-wide. */
class ControlProcessorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tws-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // Session-config race guard: suites run concurrently in one forked
    // JVM and getOrCreate() can win the shared-session race; carry the
    // confs every other suite needs (also set JVM-wide in build.sbt).
    .config("spark.sql.session.timeZone", "UTC")
    .config(graft.core.Tables.NanosAsLongKey, "true")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .getOrCreate()

  private val dt = 0.000282
  private val cfg = ControlPipeline.Config(
    AhrsSettings(recoveryTriggerPeriod = (5.0 / dt).toInt), dt)

  private def synth(device: String, n: Int, seed: Int): Seq[RawImuSample] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val az = 8197 + (600 * math.sin(i * 0.01)).toInt + rnd.nextInt(40)
      RawImuSample(device, i.toLong,
        rnd.nextInt(30).toShort, rnd.nextInt(30).toShort, az.toShort,
        (200 * math.sin(i * 0.003)).toInt.toShort,
        rnd.nextInt(20).toShort, rnd.nextInt(20).toShort)
    }
  }

  test("transformWithState replay equals the sequential run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 12000 // past the ~10.6k-sample calibration
    val data = Map(
      "dev-x" -> synth("dev-x", n, 21),
      "dev-y" -> synth("dev-y", n, 22))
    val expected = data.map { case (d, xs) =>
      d -> ControlPipeline.runSequential(cfg, xs.iterator).toVector
    }
    val input = MemoryStream[RawImuSample]
    val q = ControlProcessor.replay(input.toDS(), cfg)
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("append").start()
    try {
      // two micro-batches so state crosses a batch boundary
      input.addData(data.values.flatMap(_.take(n / 2)).toSeq)
      q.processAllAvailable()
      input.addData(data.values.flatMap(_.drop(n / 2)).toSeq)
      q.processAllAvailable()
      val got = spark.table("tws_out").as[graft.pipelines.ControlOutput]
        .collect().groupBy(_.device_id)
      data.keys.foreach { d =>
        val g = got(d).sortBy(_.sample_idx).toVector
        assert(g == expected(d), s"$d transformWithState mismatch")
      }
    } finally q.stop()
  }
}
