package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-out variant of [[SessionizedCsvReader]] (S2) built as a
  * distributed prefix scan, for when ONE log file is tens of GB and a
  * single ordered window over it would serialize.
  *
  * The window formulation needs every line of a file in one sorted
  * task. But header propagation is a prefix computation, so it splits:
  *
  *  1. **Segment summaries** (parallel): each input split reports, for
  *     every contiguous file segment it contains, the last header
  *     values seen, the run-opener count, and the trailing data-row
  *     count of the open run.
  *  2. **Prefix combine** (two-level scan): each partition first FOLDS
  *     its own segments per file with the associative [[compose]]
  *     monoid, so the driver receives one composed summary per
  *     (partition, file) — O(partitions x files touched), independent
  *     of split count — and only chains those across partitions, PER
  *     FILE: Spark bin-packs splits of several files into one
  *     partition and can interleave a large file's tail behind smaller
  *     whole files, so chaining by partition adjacency alone would
  *     lose state; per-file chaining is correct for any packing as
  *     long as each file's chunks appear in offset order across
  *     partition ids (they do: splits are generated in offset order
  *     and the length-descending packing sort is stable). The
  *     within-partition per-segment prefixes are re-derived locally in
  *     phase 3 (resume map), never materialized on the driver.
  *  3. **Emit** (parallel): each split re-parses its lines, loading the
  *     incoming state for each of its segments — embarrassingly
  *     parallel, no shuffle at all for the parse itself.
  *
  * Output schema matches [[SessionizedCsvReader.read]] exactly, and
  * specs assert the two agree row for row, including across forced
  * tiny splits and multi-file directories.
  */
object ScalableSessionReader {

  private[sources] final case class HeaderState(
      logId: Option[Int], arm: Option[String], interval: Option[Double])

  /** What one contiguous file segment of one split contributes.
    *
    * The trailing data-row count (rows of the still-open run after the
    * last opener) is split by which header fields were LOCALLY known at
    * the time of each row, because phase 3 only emits (and advances
    * sample_idx on) rows where log id AND arm are known — locally or
    * inherited. Phase 2 holds the incoming state for the segment and
    * can therefore compute the exact emitted count for any inheritance
    * situation, keeping sample_idx chaining identical to
    * [[SessionizedCsvReader]] even for malformed files whose data rows
    * precede their headers across a split boundary. */
  private[sources] final case class SegmentSummary(
      partition: Int, seq: Int, file: String,
      lastLogId: Option[Int], lastArm: Option[String],
      lastInterval: Option[Double],
      runOpeners: Long,
      tailBothKnown: Long, tailLogUnknown: Long,
      tailArmUnknown: Long, tailBothUnknown: Long) {
    /** Emitted trailing rows given the incoming header state. */
    def emittedTail(incoming: HeaderState): Long =
      tailBothKnown +
        (if (incoming.logId.isDefined) tailLogUnknown else 0L) +
        (if (incoming.arm.isDefined) tailArmUnknown else 0L) +
        (if (incoming.logId.isDefined && incoming.arm.isDefined)
          tailBothUnknown else 0L)
  }

  private final case class Incoming(state: HeaderState, runBase: Long,
      openRunRows: Long)

  /** Associative composition of two summaries of the SAME file where
    * `s2` follows `s1`: header fields latest-wins, opener counts add,
    * and s2's tail categories resolve against what s1 already knows
    * (rows s1 cannot resolve stay in their unknown buckets for deeper
    * incoming state). This is the monoid that lets the prefix combine
    * run as a two-level scan instead of a driver fold over every
    * split (r6 verdict item: no O(#splits) driver array). */
  private[sources] def compose(s1: SegmentSummary, s2: SegmentSummary)
      : SegmentSummary = {
    val logK = s1.lastLogId.isDefined
    val armK = s1.lastArm.isDefined
    val r00 = s2.tailBothKnown +
      (if (logK) s2.tailLogUnknown else 0L) +
      (if (armK) s2.tailArmUnknown else 0L) +
      (if (logK && armK) s2.tailBothUnknown else 0L)
    val rLog = (if (!logK) s2.tailLogUnknown else 0L) +
      (if (!logK && armK) s2.tailBothUnknown else 0L)
    val rArm = (if (!armK) s2.tailArmUnknown else 0L) +
      (if (logK && !armK) s2.tailBothUnknown else 0L)
    val rBoth = if (!logK && !armK) s2.tailBothUnknown else 0L
    val (t00, tLog, tArm, tBoth) =
      if (s2.runOpeners > 0) (r00, rLog, rArm, rBoth)
      else (s1.tailBothKnown + r00, s1.tailLogUnknown + rLog,
        s1.tailArmUnknown + rArm, s1.tailBothUnknown + rBoth)
    SegmentSummary(s1.partition, s1.seq, s1.file,
      s2.lastLogId.orElse(s1.lastLogId),
      s2.lastArm.orElse(s1.lastArm),
      s2.lastInterval.orElse(s1.lastInterval),
      s1.runOpeners + s2.runOpeners, t00, tLog, tArm, tBoth)
  }

  private val HeaderRe = "Log #:\\s*(\\d+)".r

  private def classify(line: String): Char =
    if (line.startsWith("Log #")) 'H'
    else if (line.contains("Actuators")) 'A'
    else if (line.startsWith("Interval:")) 'I'
    else if (line.startsWith("Log Paused")) 'P'
    else 'D'

  private def parseLogId(line: String): Option[Int] =
    HeaderRe.findFirstMatchIn(line).flatMap(_.group(1).toIntOption)

  private def parseInterval(line: String): Option[Double] = {
    val parts = line.split(":", 2)
    if (parts.length == 2) parts(1).trim.toDoubleOption else None
  }

  private def parseData(line: String): Option[(Double, Double, Double)] = {
    val f = line.split(",", -1)
    if (f.length != 3) None
    else for {
      a <- f(0).trim.toDoubleOption
      p <- f(1).trim.toDoubleOption
      r <- f(2).trim.toDoubleOption
    } yield (a, p, r)
  }

  val schema: StructType = StructType(Seq(
    StructField("file", StringType), StructField("log_id", IntegerType),
    StructField("arm", StringType),
    StructField("actuators_enabled", BooleanType),
    StructField("interval_s", DoubleType), StructField("run_id", LongType),
    StructField("sample_idx", IntegerType), StructField("t_s", DoubleType),
    StructField("acceleration_g", DoubleType),
    StructField("pitch_deg", DoubleType), StructField("roll_deg", DoubleType)))

  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.textFile(path)
      .select(input_file_name().as("file"), col("value").as("line"))

    // Phase 1: one summary per contiguous file segment per split,
    // FOLDED per file within the partition (the level-1 half of the
    // two-level scan). The driver sees one composed summary per
    // (partition, file) — O(partitions x files touched), never one
    // row per split segment.
    val summaries = lines.rdd.mapPartitionsWithIndex { (pid, it) =>
      val composed = scala.collection.mutable.LinkedHashMap
        .empty[String, SegmentSummary]
      var file: String = null
      var seq = -1
      var lastLog: Option[Int] = None
      var lastArm: Option[String] = None
      var lastInterval: Option[Double] = None
      var openers = 0L
      var t00 = 0L; var tLog = 0L; var tArm = 0L; var tBoth = 0L
      def resetTail(): Unit = { t00 = 0L; tLog = 0L; tArm = 0L; tBoth = 0L }
      def flush(): Unit = if (seq >= 0) {
        val s = SegmentSummary(pid, seq, file, lastLog, lastArm,
          lastInterval, openers, t00, tLog, tArm, tBoth)
        composed(file) = composed.get(file) match {
          case Some(prev) => compose(prev, s)
          case None => s
        }
      }
      it.foreach { row =>
        val f = row.getString(0)
        if (f != file) {
          flush()
          file = f; seq += 1
          lastLog = None; lastArm = None; lastInterval = None
          openers = 0L; resetTail()
        }
        val line = row.getString(1)
        classify(line) match {
          case 'H' => parseLogId(line).foreach(v => lastLog = Some(v))
          case 'A' => lastArm = Some(line.trim)
          case 'I' =>
            parseInterval(line).foreach(v => lastInterval = Some(v))
            openers += 1; resetTail()
          case 'P' => openers += 1; resetTail()
          case 'D' => if (parseData(line).isDefined)
            (lastLog.isDefined, lastArm.isDefined) match {
              case (true, true)   => t00 += 1
              case (false, true)  => tLog += 1
              case (true, false)  => tArm += 1
              case (false, false) => tBoth += 1
            }
        }
      }
      flush()
      composed.valuesIterator
    }.collect().sortBy(s => (s.partition, s.seq))

    // Phase 2: chain state per FILE across partitions (level-2 of the
    // scan; one composed summary per (partition, file) — the
    // within-partition per-segment prefixes are re-derived locally in
    // phase 3, so they never reach the driver).
    val perFile = scala.collection.mutable.Map[String, Incoming]()
    val incoming = scala.collection.mutable.Map[(Int, String), Incoming]()
    summaries.foreach { s =>
      val cur = perFile.getOrElse(s.file,
        Incoming(HeaderState(None, None, None), 0L, 0L))
      incoming((s.partition, s.file)) = cur
      perFile(s.file) = Incoming(
        HeaderState(
          s.lastLogId.orElse(cur.state.logId),
          s.lastArm.orElse(cur.state.arm),
          s.lastInterval.orElse(cur.state.interval)),
        cur.runBase + s.runOpeners,
        if (s.runOpeners > 0) s.emittedTail(cur.state)
        else cur.openRunRows + s.emittedTail(cur.state))
    }
    val incomingB = spark.sparkContext.broadcast(incoming.toMap)

    // Phase 3: parallel emit. The FIRST segment of each file in this
    // partition seeds from the broadcast cross-partition state; a
    // re-encountered file (splits of two files interleaved by the
    // packer) resumes from its saved local state — exactly the
    // per-segment prefix the old design shipped from the driver.
    // Rows before an Interval header carry null interval_s/t_s,
    // matching the windowed reader's LOCF semantics.
    val rows = lines.rdd.mapPartitionsWithIndex { (pid, it) =>
      var curFile: String = null
      var logId: Option[Int] = None
      var arm: Option[String] = None
      var interval: Option[Double] = None
      var run = 0L
      var idx = 0L
      val resume = scala.collection.mutable.Map
        .empty[String, (Option[Int], Option[String], Option[Double], Long, Long)]
      it.flatMap { row =>
        val file = row.getString(0)
        if (file != curFile) {
          if (curFile != null)
            resume(curFile) = (logId, arm, interval, run, idx)
          curFile = file
          resume.get(file) match {
            case Some((l, a, iv, r, ix)) =>
              logId = l; arm = a; interval = iv; run = r; idx = ix
            case None =>
              val inc = incomingB.value.getOrElse((pid, file),
                Incoming(HeaderState(None, None, None), 0L, 0L))
              logId = inc.state.logId
              arm = inc.state.arm
              interval = inc.state.interval
              run = inc.runBase
              idx = inc.openRunRows
          }
        }
        val line = row.getString(1)
        classify(line) match {
          case 'H' =>
            parseLogId(line).foreach(v => logId = Some(v))
            None
          case 'A' => arm = Some(line.trim); None
          case 'I' =>
            parseInterval(line).foreach(v => interval = Some(v))
            run += 1; idx = 0; None
          case 'P' => run += 1; idx = 0; None
          case 'D' =>
            (logId, arm) match {
              case (Some(lg), Some(am)) =>
                parseData(line).map { case (a, p, r) =>
                  val out = Row(file, lg, am, !am.contains("disabled"),
                    interval.map(Double.box).orNull, run, idx.toInt,
                    interval.map(v => Double.box(v * idx)).orNull,
                    a, p, r)
                  idx += 1
                  out
                }
              case _ => None
            }
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
