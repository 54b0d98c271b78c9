package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.pipelines.{ControlOutput, ControlPipeline, RawImuSample}

/** T1/T2 on Spark 4's `transformWithState` (the successor to
  * flatMapGroupsWithState): per-device control-loop state in a
  * `ValueState` handle backed by the RocksDB state store — the API a
  * long-running production stream would use (fine-grained state, TTL,
  * schema evolution). Same transition function as every other
  * execution path, so results are identical by construction; the spec
  * checks it against the sequential run.
  */
class ControlProcessor(cfg: ControlPipeline.Config)
    extends StatefulProcessor[String, RawImuSample, ControlOutput] {

  @transient private var state: ValueState[graft.pipelines.DeviceState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState("deviceState",
      Encoders.product[graft.pipelines.DeviceState], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[RawImuSample],
      timerValues: TimerValues): Iterator[ControlOutput] = {
    val (st, out) = ControlPipeline.applyOrdered(cfg,
      Option(state.get()).getOrElse(ControlPipeline.initialState(cfg)), rows)
    state.update(st)
    out.iterator
  }
}

object ControlProcessor {
  /** Streaming replay via transformWithState (requires the RocksDB
    * state store provider; see spec for the session config). */
  def replay(raw: Dataset[RawImuSample], cfg: ControlPipeline.Config)
      : Dataset[ControlOutput] = {
    import raw.sparkSession.implicits._
    raw.groupByKey(_.device_id)
      .transformWithState(new ControlProcessor(cfg),
        TimeMode.None(), OutputMode.Append())
  }
}
