package graft.state

/** W7/T6 — exponential gyroscope-offset tracker (FusionOffset.c:20-74):
  * after the gyro reads stationary (each |axis| <= 3 dps) for 5 s
  * continuously, the offset integrates toward the residual reading with
  * a first-order filter (cutoff 0.02 Hz). Kept in the operator library
  * but not wired into the default pipeline, matching the firmware
  * (SURVEY §2.7 T6 "unused in main").
  */
final case class GyroOffsetState(
    timer: Int = 0, offset: Vec3 = Vec3.Zero)

final case class GyroOffsetConfig(sampleRateHz: Double) {
  val filterCoefficient: Double = 2.0 * math.Pi * 0.02 / sampleRateHz
  val timeoutSamples: Int = (5 * sampleRateHz).toInt
  val thresholdDps: Double = 3.0
}

object GyroOffset {
  /** One step: returns (nextState, offset-corrected gyro). */
  def update(cfg: GyroOffsetConfig, st: GyroOffsetState, gyro: Vec3)
      : (GyroOffsetState, Vec3) = {
    val corrected = gyro - st.offset
    if (math.abs(corrected.x) > cfg.thresholdDps ||
        math.abs(corrected.y) > cfg.thresholdDps ||
        math.abs(corrected.z) > cfg.thresholdDps)
      (st.copy(timer = 0), corrected)
    else if (st.timer < cfg.timeoutSamples)
      (st.copy(timer = st.timer + 1), corrected)
    else
      (st.copy(offset = st.offset + corrected * cfg.filterCoefficient),
        corrected)
  }
}

/** M14 — tilt-compensated compass heading (FusionCompass.c:25-46, ENU):
  * heading from accelerometer + magnetometer via normalized cross
  * products. Pure function; column-expression form is the same algebra
  * over struct fields. */
object Compass {
  def headingEnuDegrees(accelerometer: Vec3, magnetometer: Vec3): Double = {
    val west = accelerometer.cross(magnetometer).normalize
    val north = west.cross(accelerometer).normalize
    val east = west * -1.0
    math.toDegrees(math.atan2(north.x, east.x))
  }
}
