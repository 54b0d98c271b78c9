package graft.state

/** T1 — Madgwick-style complementary AHRS filter, no magnetometer
  * (SURVEY §2.7), re-derived from the published Fusion algorithm as
  * configured by the reference (FusionAhrs.c:113-217, settings at
  * ORC_Main.c:140-147: ENU, gain 0.5, gyro range 500 dps, acceleration
  * rejection 10 deg, recovery trigger period 5 s / dt).
  *
  * Pure functional: `Ahrs.update(state, gyro, accel, dt)` returns the
  * next state, so the same transition runs in a tight sequential loop,
  * in `mapPartitions` batch replay, or in `flatMapGroupsWithState`.
  */
final case class AhrsSettings(
    gain: Double = 0.5,
    gyroscopeRangeDps: Double = 500.0,      // 0 = unlimited
    accelerationRejectionDeg: Double = 10.0, // 0 = disabled
    magneticRejectionDeg: Double = 10.0,     // 0 = disabled
    recoveryTriggerPeriod: Int = 17730)      // ~5 s at 282 us/sample
{
  /** Derived thresholds (FusionAhrs.c:86-104). */
  val gyroRangeThreshold: Double =
    if (gyroscopeRangeDps == 0.0) Double.MaxValue else 0.98 * gyroscopeRangeDps
  val accelRejectionThreshold: Double =
    if (accelerationRejectionDeg == 0.0 || gain == 0.0 || recoveryTriggerPeriod == 0)
      Double.MaxValue
    else {
      val s = 0.5 * math.sin(math.toRadians(accelerationRejectionDeg))
      s * s
    }
  val magRejectionThreshold: Double =
    if (magneticRejectionDeg == 0.0 || gain == 0.0 || recoveryTriggerPeriod == 0)
      Double.MaxValue
    else {
      val s = 0.5 * math.sin(math.toRadians(magneticRejectionDeg))
      s * s
    }
}

final case class AhrsState(
    quaternion: Quat = Quat.Identity,
    accelerometer: Vec3 = Vec3.Zero,
    initialising: Boolean = true,
    rampedGain: Double = Ahrs.InitialGain,
    angularRateRecovery: Boolean = false,
    halfAccelerometerFeedback: Vec3 = Vec3.Zero,
    accelerometerIgnored: Boolean = false,
    accelerationRecoveryTrigger: Int = 0,
    accelerationRecoveryTimeout: Int = 0,
    halfMagnetometerFeedback: Vec3 = Vec3.Zero,
    magnetometerIgnored: Boolean = false,
    magneticRecoveryTrigger: Int = 0,
    magneticRecoveryTimeout: Int = 0)

object Ahrs {
  /** FusionAhrs.c:21-26. */
  val InitialGain = 10.0
  val InitialisationPeriod = 3.0

  def initial(settings: AhrsSettings): AhrsState =
    AhrsState(accelerationRecoveryTimeout = settings.recoveryTriggerPeriod,
      magneticRecoveryTimeout = settings.recoveryTriggerPeriod)

  /** One no-magnetometer filter step (gyro in dps, accel in g, dt in
    * seconds) — FusionAhrsUpdateNoMagnetometer (FusionAhrs.c:324-333):
    * the full update with a zero magnetometer, then the heading zeroed
    * while initialising. ENU/NWU convention (the two share the same
    * gravity column, FusionAhrs.c:224-235). */
  def update(st0: AhrsState, settings: AhrsSettings,
             gyro: Vec3, accel: Vec3, dt: Double): AhrsState = {
    val st = updateWithMagnetometer(st0, settings, gyro, accel, Vec3.Zero, dt)
    // No-magnetometer variant zeroes the heading while initialising
    // (FusionAhrs.c:324-333 -> SetHeading(0), FusionAhrs.c:495-507)
    if (st.initialising) {
      val quaternion = st.quaternion
      val yaw = math.atan2(
        quaternion.w * quaternion.z + quaternion.x * quaternion.y,
        0.5 - quaternion.y * quaternion.y - quaternion.z * quaternion.z)
      val half = 0.5 * yaw
      val rotation = Quat(math.cos(half), 0.0, 0.0, -math.sin(half))
      st.copy(quaternion = rotation * quaternion)
    } else st
  }

  /** One 9-DoF filter step — the full FusionAhrsUpdate (FusionAhrs.c:
    * 113-217) including the magnetometer feedback branch (lines
    * 171-204): feedback = Feedback(normalise(halfGravity x mag),
    * halfMagnetic), with the same rejection threshold / +1-9 recovery
    * trigger machinery as the accelerometer path. ENU convention for
    * halfMagnetic (first column of R^T scaled by -0.5, FusionAhrs.c:
    * 264-271 — the convention the reference firmware configures).
    * A zero magnetometer reduces exactly to the 6-DoF path. */
  def updateWithMagnetometer(st0: AhrsState, settings: AhrsSettings,
             gyro: Vec3, accel: Vec3, mag: Vec3, dt: Double): AhrsState = {
    // Reinitialise (keeping orientation) if gyroscope range exceeded
    var st =
      if (math.abs(gyro.x) > settings.gyroRangeThreshold ||
          math.abs(gyro.y) > settings.gyroRangeThreshold ||
          math.abs(gyro.z) > settings.gyroRangeThreshold)
        initial(settings).copy(
          quaternion = st0.quaternion, angularRateRecovery = true)
      else st0
    st = st.copy(accelerometer = accel)

    // Ramp gain 10 -> settings.gain over the 3 s initialisation
    var rampedGain = st.rampedGain
    var initialising = st.initialising
    var angularRateRecovery = st.angularRateRecovery
    if (initialising) {
      val step = (InitialGain - settings.gain) / InitialisationPeriod
      rampedGain -= step * dt
      if (rampedGain < settings.gain || settings.gain == 0.0) {
        rampedGain = settings.gain
        initialising = false
        angularRateRecovery = false
      }
    }

    // Gravity direction indicated by the algorithm, scaled by 0.5
    // (third column of R^T, FusionAhrs.c:224-235)
    val q = st.quaternion
    val halfGravity = Vec3(
      q.x * q.z - q.w * q.y,
      q.y * q.z + q.w * q.x,
      q.w * q.w - 0.5 + q.z * q.z)

    // Accelerometer feedback with >90-degree normalization, rejection
    // threshold, and the +1/-9 recovery trigger counter
    // (FusionAhrs.c:141-169, 292-297)
    var halfAccelFeedbackState = st.halfAccelerometerFeedback
    var accelerometerIgnored = true
    var trigger = st.accelerationRecoveryTrigger
    var timeout = st.accelerationRecoveryTimeout
    var appliedFeedback = Vec3.Zero
    if (!accel.isZero) {
      val sensor = accel.normalize
      val rawFeedback = sensor.cross(halfGravity)
      halfAccelFeedbackState =
        if (sensor.dot(halfGravity) < 0.0) rawFeedback.normalize
        else rawFeedback
      if (initialising ||
          halfAccelFeedbackState.magnitudeSquared <= settings.accelRejectionThreshold) {
        accelerometerIgnored = false
        trigger -= 9
      } else {
        trigger += 1
      }
      if (trigger > timeout) {
        timeout = 0
        accelerometerIgnored = false
      } else {
        timeout = settings.recoveryTriggerPeriod
      }
      trigger = math.max(0, math.min(settings.recoveryTriggerPeriod, trigger))
      if (!accelerometerIgnored) appliedFeedback = halfAccelFeedbackState
    }

    // Magnetometer feedback (FusionAhrs.c:171-204): the sensor vector
    // is normalise(halfGravity x mag) — the horizontal west direction
    // measured by the magnetometer — compared against halfMagnetic,
    // the west direction the current orientation implies. Same
    // >90-degree normalization and recovery trigger as the accel path.
    var halfMagFeedbackState = st.halfMagnetometerFeedback
    var magnetometerIgnored = true
    var magTrigger = st.magneticRecoveryTrigger
    var magTimeout = st.magneticRecoveryTimeout
    var appliedMagFeedback = Vec3.Zero
    if (!mag.isZero) {
      // ENU halfMagnetic: first column of R^T scaled by -0.5
      // (FusionAhrs.c:264-271)
      val halfMagnetic = Vec3(
        0.5 - q.w * q.w - q.x * q.x,
        q.w * q.z - q.x * q.y,
        -1.0 * (q.x * q.z + q.w * q.y))
      val sensor = halfGravity.cross(mag).normalize
      val rawFeedback = sensor.cross(halfMagnetic)
      halfMagFeedbackState =
        if (sensor.dot(halfMagnetic) < 0.0) rawFeedback.normalize
        else rawFeedback
      if (initialising ||
          halfMagFeedbackState.magnitudeSquared <= settings.magRejectionThreshold) {
        magnetometerIgnored = false
        magTrigger -= 9
      } else {
        magTrigger += 1
      }
      if (magTrigger > magTimeout) {
        magTimeout = 0
        magnetometerIgnored = false
      } else {
        magTimeout = settings.recoveryTriggerPeriod
      }
      magTrigger =
        math.max(0, math.min(settings.recoveryTriggerPeriod, magTrigger))
      if (!magnetometerIgnored) appliedMagFeedback = halfMagFeedbackState
    }

    // Integrate: q += q (x) (0.5*omega_rad + gain*feedback) * dt, then
    // normalize (FusionAhrs.c:206-215)
    val halfGyroRad = gyro * (math.toRadians(0.5))
    val adjusted =
      halfGyroRad + (appliedFeedback + appliedMagFeedback) * rampedGain
    val quaternion = (q + q.mulVector(adjusted * dt)).normalize

    st.copy(
      quaternion = quaternion,
      initialising = initialising,
      rampedGain = rampedGain,
      angularRateRecovery = angularRateRecovery,
      halfAccelerometerFeedback = halfAccelFeedbackState,
      accelerometerIgnored = accelerometerIgnored,
      accelerationRecoveryTrigger = trigger,
      accelerationRecoveryTimeout = timeout,
      halfMagnetometerFeedback = halfMagFeedbackState,
      magnetometerIgnored = magnetometerIgnored,
      magneticRecoveryTrigger = magTrigger,
      magneticRecoveryTimeout = magTimeout)
  }

  /** FusionAhrsUpdateExternalHeading (FusionAhrs.c:343-363): a heading
    * measurement (degrees) is converted to a synthetic magnetometer
    * from the current roll, then fed through the full update. */
  def updateExternalHeading(st0: AhrsState, settings: AhrsSettings,
             gyro: Vec3, accel: Vec3, headingDeg: Double, dt: Double)
      : AhrsState = {
    val q = st0.quaternion
    val roll = math.atan2(q.w * q.x + q.y * q.z,
      0.5 - q.y * q.y - q.x * q.x)
    val headingRad = math.toRadians(headingDeg)
    val sinHeading = math.sin(headingRad)
    val mag = Vec3(
      math.cos(headingRad),
      -1.0 * math.cos(roll) * sinHeading,
      sinHeading * math.sin(roll))
    updateWithMagnetometer(st0, settings, gyro, accel, mag, dt)
  }

  /** Gravity direction in the sensor frame (FusionAhrs.c:387-396). */
  def gravity(q: Quat): Vec3 = Vec3(
    2.0 * (q.x * q.z - q.w * q.y),
    2.0 * (q.y * q.z + q.w * q.x),
    2.0 * (q.w * q.w - 0.5 + q.z * q.z))

  /** M12 — linear acceleration = accelerometer - gravity (ENU/NWU,
    * FusionAhrs.c:404-415). */
  def linearAcceleration(st: AhrsState): Vec3 =
    st.accelerometer - gravity(st.quaternion)

  /** M13 — earth-frame acceleration: rotate the accelerometer into the
    * Earth frame (R * a, via the quaternion rotation matrix with shared
    * qwqw/qxqy/... terms) and remove gravity from z (ENU/NWU,
    * FusionAhrs.c:423-454). */
  def earthAcceleration(st: AhrsState): Vec3 = {
    val q = st.quaternion
    val a = st.accelerometer
    val qwqw = q.w * q.w
    val qwqx = q.w * q.x; val qwqy = q.w * q.y; val qwqz = q.w * q.z
    val qxqy = q.x * q.y; val qxqz = q.x * q.z; val qyqz = q.y * q.z
    Vec3(
      2.0 * ((qwqw - 0.5 + q.x * q.x) * a.x + (qxqy - qwqz) * a.y +
        (qxqz + qwqy) * a.z),
      2.0 * ((qxqy + qwqz) * a.x + (qwqw - 0.5 + q.y * q.y) * a.y +
        (qyqz - qwqx) * a.z),
      2.0 * ((qxqz - qwqy) * a.x + (qyqz + qwqx) * a.y +
        (qwqw - 0.5 + q.z * q.z) * a.z) - 1.0)
  }
}
