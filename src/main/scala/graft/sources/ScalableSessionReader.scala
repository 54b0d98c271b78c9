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
  *  1. **Partition summaries** (parallel): for each input split record
  *     the last header values seen (log id / arm / interval), how many
  *     run-openers (`Interval:` / `Log Paused`) occurred, and how many
  *     data rows follow the last opener (the tail of a run that may
  *     continue into the next split).
  *  2. **Prefix combine** (driver, one row per split — thousands, not
  *     billions): scan summaries in split order, computing the header
  *     state, global run ordinal, and open-run row offset flowing INTO
  *     each split. State resets at file boundaries (splits never span
  *     files; Hadoop text splits are line-aligned).
  *  3. **Emit** (parallel): each split re-parses its lines starting
  *     from its incoming state — embarrassingly parallel, no shuffle
  *     at all for the parse itself.
  *
  * Output schema matches [[SessionizedCsvReader.read]] exactly, and
  * the golden-replay spec asserts the two agree row for row.
  */
object ScalableSessionReader {

  private final case class HeaderState(
      logId: Option[Int], arm: Option[String], interval: Option[Double])

  /** What one split contributes to the prefix. A Spark FilePartition
    * can bin-pack chunks of SEVERAL files (tail of a large file plus
    * whole small files), so the summary records the first file (to
    * decide whether the incoming state chains from the previous
    * partition) and the state of the LAST file's segment only (session
    * state resets at every file boundary). */
  private final case class SplitSummary(
      partition: Int, firstFile: String, lastFile: String,
      // header values of the last file's segment (last occurrence wins)
      lastLogId: Option[Int], lastArm: Option[String],
      lastInterval: Option[Double],
      runOpeners: Long, dataRowsAfterLastOpener: Long,
      // whether the last file's segment is the partition's only segment
      singleFile: Boolean)

  private val HeaderRe = "Log #:\\s*(\\d+)".r

  private def classify(line: String): (Char, String) = {
    if (line.startsWith("Log #")) ('H', line)
    else if (line.contains("Actuators")) ('A', line.trim)
    else if (line.startsWith("Interval:")) ('I', line)
    else if (line.startsWith("Log Paused")) ('P', line)
    else ('D', line)
  }

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
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .select(input_file_name().as("file"), col("value").as("line"))

    // Phase 1: per-split summaries (tiny result, one row per split).
    // Session state resets at every file boundary within the split; the
    // emitted summary describes only the LAST file's segment.
    val summaries = lines.rdd.mapPartitionsWithIndex { (pid, it) =>
      var firstFile: String = null
      var file: String = null
      var lastLog: Option[Int] = None
      var lastArm: Option[String] = None
      var lastInterval: Option[Double] = None
      var openers = 0L
      var tail = 0L
      var any = false
      it.foreach { row =>
        any = true
        val f = row.getString(0)
        if (firstFile == null) firstFile = f
        if (f != file) { // file boundary inside the split: reset segment
          file = f
          if (f != firstFile) {
            lastLog = None; lastArm = None; lastInterval = None
            openers = 0L; tail = 0L
          }
        }
        val line = row.getString(1)
        classify(line)._1 match {
          case 'H' =>
            lastLog = HeaderRe.findFirstMatchIn(line).map(_.group(1).toInt)
          case 'A' => lastArm = Some(line.trim)
          case 'I' =>
            parseInterval(line).foreach(v => lastInterval = Some(v))
            openers += 1; tail = 0
          case 'P' => openers += 1; tail = 0
          case 'D' => if (parseData(line).isDefined) tail += 1
        }
      }
      if (any)
        Iterator.single(SplitSummary(pid, firstFile, file, lastLog, lastArm,
          lastInterval, openers, tail, singleFile = firstFile == file))
      else Iterator.empty
    }.collect().sortBy(_.partition)

    // Phase 2: prefix combine on the driver — incoming state per split.
    // A partition's incoming state chains from the previous partition
    // only when its first file CONTINUES the previous partition's last
    // file; otherwise the partition starts a fresh file.
    final case class Incoming(state: HeaderState, runBase: Long,
        openRunRows: Long)
    val incoming = scala.collection.mutable.Map[Int, Incoming]()
    var st = HeaderState(None, None, None)
    var runBase = 0L
    var openRunRows = 0L
    var prevFile: String = null
    summaries.foreach { s =>
      if (s.firstFile != prevFile) { // new file at split start
        st = HeaderState(None, None, None); runBase = 0L; openRunRows = 0L
      }
      incoming(s.partition) = Incoming(st, runBase, openRunRows)
      if (s.singleFile) {
        st = HeaderState(
          s.lastLogId.orElse(st.logId),
          s.lastArm.orElse(st.arm),
          s.lastInterval.orElse(st.interval))
        runBase += s.runOpeners
        openRunRows =
          if (s.runOpeners > 0) s.dataRowsAfterLastOpener
          else openRunRows + s.dataRowsAfterLastOpener
      } else {
        // last file's segment started fresh inside this split
        st = HeaderState(s.lastLogId, s.lastArm, s.lastInterval)
        runBase = s.runOpeners
        openRunRows = s.dataRowsAfterLastOpener
      }
      prevFile = s.lastFile
    }
    val incomingB = spark.sparkContext.broadcast(incoming.toMap)

    // Phase 3: parallel emit. The incoming state applies to the
    // split's first file only; session state resets at every file
    // boundary (matching the windowed reader's partitionBy(file)).
    // Rows before an Interval header carry null interval_s/t_s, also
    // matching the windowed reader's LOCF semantics.
    val rows = lines.rdd.mapPartitionsWithIndex { (pid, it) =>
      incomingB.value.get(pid) match {
        case None => Iterator.empty
        case Some(inc) =>
          var curFile: String = null
          var first = true
          var logId = inc.state.logId
          var arm = inc.state.arm
          var interval = inc.state.interval
          var run = inc.runBase
          var idx = inc.openRunRows
          it.flatMap { row =>
            val file = row.getString(0)
            if (file != curFile) {
              if (first) { first = false } // incoming state applies
              else {
                logId = None; arm = None; interval = None
                run = 0L; idx = 0L
              }
              curFile = file
            }
            val line = row.getString(1)
            classify(line)._1 match {
              case 'H' =>
                logId = HeaderRe.findFirstMatchIn(line).map(_.group(1).toInt)
                  .orElse(logId)
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
    }
    spark.createDataFrame(rows, schema)
  }
}
