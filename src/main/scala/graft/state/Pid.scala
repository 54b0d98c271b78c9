package graft.state

/** T2 — PID controller with trapezoidal integral, dynamic anti-windup
  * clamp, band-limited derivative on measurement, output clamp, and the
  * reference's int16 output quantization (PID/PID.c:24-91).
  *
  * Pure functional: `Pid.update(cfg, state, setpoint, measurement)`
  * returns (nextState, output).
  */
final case class PidConfig(
    kp: Double, ki: Double, kd: Double,
    tau: Double,            // derivative low-pass time constant
    limMin: Double, limMax: Double,
    dt: Double,             // sample period T
    quantizeInt16: Boolean = true) // PID.c:89 casts the output to int16

final case class PidState(
    integrator: Double = 0.0,
    prevError: Double = 0.0,
    differentiator: Double = 0.0,
    prevMeasurement: Double = 0.0)

object Pid {

  def update(cfg: PidConfig, st: PidState,
             setpoint: Double, measurement: Double): (PidState, Double) = {
    val error = setpoint - measurement
    val proportional = cfg.kp * error

    // Trapezoidal integral (PID.c:39)
    var integrator =
      st.integrator + 0.5 * cfg.ki * cfg.dt * (error + st.prevError)

    // Dynamic anti-windup clamp: integrator limited to what the output
    // clamp leaves after the proportional term (PID.c:44-60). Note the
    // reference zeroes the limits when P already exceeds them.
    val limMaxInt = if (cfg.limMax > proportional) cfg.limMax - proportional else 0.0
    val limMinInt = if (cfg.limMin < proportional) cfg.limMin - proportional else 0.0
    if (integrator > limMaxInt) integrator = limMaxInt
    else if (integrator < limMinInt) integrator = limMinInt

    // Band-limited derivative on measurement (PID.c:66-68)
    val differentiator =
      (-2.0 * cfg.kd * (measurement - st.prevMeasurement)
        + (2.0 * cfg.tau - cfg.dt) * st.differentiator) /
        (2.0 * cfg.tau + cfg.dt)

    var out = proportional + integrator + differentiator
    if (out > cfg.limMax) out = cfg.limMax
    else if (out < cfg.limMin) out = cfg.limMin

    val next = PidState(integrator, error, differentiator, measurement)
    // PID.c:89 returns (int16_t)out — quantizes the command to an
    // integer DAC step; reproduce faithfully by default.
    val returned = if (cfg.quantizeInt16) out.toShort.toDouble else out
    (next, returned)
  }
}

/** The reference's three controller configurations (ORC_CONFIG.h:63-71,
  * ORC_Main.c:424-470). NOTE, faithful to the firmware: the pitch
  * controller is wired with the ROLL_K* constants and the roll
  * controller with PITCH_K* (ORC_Main.c:456-470) — reproduced as-is.
  */
object PidConfigs {
  /** tau = 1/(pi * 100 Hz) (ORC_Main.c:429-430). */
  def tau: Double = 1.0 / (math.Pi * 100.0)

  /** Output limits derived from transform coefficients
    * (ORC_Main.c:434-440): int16 range divided by 1.1 x the largest
    * coefficient the transform will multiply the command by. */
  def limits(t: CornerTransform): (Double, Double, Double, Double) = {
    val maxAccelCoeff = 1.1 * math.max(t.a2ab, t.b2ab)
    val maxAngleCoeff = 1.1 * math.max(t.inv2ab, t.inv2cd)
    (Short.MinValue / maxAccelCoeff, Short.MaxValue / maxAccelCoeff,
      Short.MinValue / maxAngleCoeff, Short.MaxValue / maxAngleCoeff)
  }

  def reference(dt: Double,
                transform: CornerTransform = CornerTransform.reference)
      : (PidConfig, PidConfig, PidConfig) = {
    val (accelLo, accelHi, angleLo, angleHi) = limits(transform)
    val accelZ = PidConfig(-30000.0, -0.0, -1800.0, tau, accelLo, accelHi, dt)
    // swapped constants, faithful (ORC_Main.c:456-470)
    val pitch = PidConfig(-50.0, -1.5, -1.0, tau, angleLo, angleHi, dt)
    val roll = PidConfig(-70.0, -1.5, -1.0, tau, angleLo, angleHi, dt)
    (accelZ, pitch, roll)
  }
}
