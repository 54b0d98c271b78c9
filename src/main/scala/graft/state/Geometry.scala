package graft.state

/** Minimal 3-vector / quaternion algebra for the sensor-fusion operators
  * (SURVEY §2.3 M5-M10). Double precision throughout; the reference is
  * fp32 with a fast-inverse-sqrt approximation (FusionMath.h:169-179) —
  * Tier-B goldens compare against this Scala port, not the C binary, so
  * exact math is used (SURVEY §7.5.1).
  */
final case class Vec3(x: Double, y: Double, z: Double) {
  def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
  def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
  def *(s: Double): Vec3 = Vec3(x * s, y * s, z * s)
  def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
  def cross(o: Vec3): Vec3 = Vec3(
    y * o.z - z * o.y,
    z * o.x - x * o.z,
    x * o.y - y * o.x)
  def magnitudeSquared: Double = this.dot(this)
  def magnitude: Double = math.sqrt(magnitudeSquared)
  def normalize: Vec3 = this * (1.0 / magnitude)
  def isZero: Boolean = x == 0.0 && y == 0.0 && z == 0.0
}

object Vec3 {
  val Zero: Vec3 = Vec3(0.0, 0.0, 0.0)
}

/** Row-major 3x3 matrix (rows as vectors) — just enough for the
  * calibration models and axis alignment (FusionMath.h:103-116). */
final case class Mat3(r0: Vec3, r1: Vec3, r2: Vec3) {
  def mulVector(v: Vec3): Vec3 = Vec3(r0.dot(v), r1.dot(v), r2.dot(v))
}

object Mat3 {
  val Identity: Mat3 =
    Mat3(Vec3(1, 0, 0), Vec3(0, 1, 0), Vec3(0, 0, 1))
  def diagonal(d: Vec3): Mat3 =
    Mat3(Vec3(d.x, 0, 0), Vec3(0, d.y, 0), Vec3(0, 0, d.z))
}

/** M15/M16 — named sensor calibration models (FusionCalibration.h:
  * 26-39). The pipelines inline these as expression primitives at
  * their call sites; the named forms exist so a library user can apply
  * the standard models directly (e.g. inside a mapPartitions replay or
  * a typed Dataset transform). */
object Calibration {
  /** Gyroscope/accelerometer model (FusionCalibration.h:26-28):
    * misalignment * ((uncalibrated - offset) .* sensitivity). */
  def inertial(uncalibrated: Vec3, misalignment: Mat3,
               sensitivity: Vec3, offset: Vec3): Vec3 = {
    val d = uncalibrated - offset
    misalignment.mulVector(
      Vec3(d.x * sensitivity.x, d.y * sensitivity.y, d.z * sensitivity.z))
  }

  /** Magnetometer model (FusionCalibration.h:37-39):
    * softIron * (uncalibrated - hardIron). */
  def magnetic(uncalibrated: Vec3, softIronMatrix: Mat3,
               hardIronOffset: Vec3): Vec3 =
    softIronMatrix.mulVector(uncalibrated - hardIronOffset)
}

/** M4 faithful mode: the firmware's fast inverse square root
  * (FusionMath.h:169-179 — the Pizer bit-trick variant with one
  * polished multiply), reproduced in exact float32 semantics for
  * bit-exact replay of firmware traces. The default pipelines use
  * exact `1.0 / sqrt(x)` (SURVEY §7.5.1); switch normalization to
  * this when a replay must match the device to the last float bit.
  * Relative error is ~6e-4 worst-case over the normal float range. */
object FastInvSqrt {
  def apply(x: Float): Float = {
    val i = java.lang.Float.floatToRawIntBits(x)
    val y = java.lang.Float.intBitsToFloat(0x5F1F1412 - (i >> 1))
    // float32 throughout, same association as the firmware expression
    y * (1.69000231f - 0.714158168f * x * y * y)
  }

  /** Vector normalization in faithful fp32 mode: the squared
    * magnitude accumulates term-by-term in Float (a double-precision
    * sum rounded once can land 1 ulp away — double rounding — and a
    * replay must match the device to the last float bit), and each
    * component multiplies by the reciprocal in Float too. */
  def normalize(v: Vec3): Vec3 = {
    val (fx, fy, fz) = (v.x.toFloat, v.y.toFloat, v.z.toFloat)
    val r = apply(fx * fx + fy * fy + fz * fz)
    Vec3((fx * r).toDouble, (fy * r).toDouble, (fz * r).toDouble)
  }

  /** Quaternion normalization in faithful fp32 mode (same term-wise
    * Float accumulation as the vector form). */
  def normalize(q: Quat): Quat = {
    val (fw, fx, fy, fz) =
      (q.w.toFloat, q.x.toFloat, q.y.toFloat, q.z.toFloat)
    val r = apply(fw * fw + fx * fx + fy * fy + fz * fz)
    Quat((fw * r).toDouble, (fx * r).toDouble,
      (fy * r).toDouble, (fz * r).toDouble)
  }
}

/** Hamilton quaternion (w, x, y, z). */
final case class Quat(w: Double, x: Double, y: Double, z: Double) {
  def +(o: Quat): Quat = Quat(w + o.w, x + o.x, y + o.y, z + o.z)

  /** Hamilton product (FusionMath.h:334-360). */
  def *(o: Quat): Quat = Quat(
    w * o.w - x * o.x - y * o.y - z * o.z,
    w * o.x + x * o.w + y * o.z - z * o.y,
    w * o.y - x * o.z + y * o.w + z * o.x,
    w * o.z + x * o.y - y * o.x + z * o.w)

  /** Multiply by a vector treated as a pure quaternion (0, v)
    * (FusionMath.h:368-380). */
  def mulVector(v: Vec3): Quat = Quat(
    -x * v.x - y * v.y - z * v.z,
    w * v.x + y * v.z - z * v.y,
    w * v.y - x * v.z + z * v.x,
    w * v.z + x * v.y - y * v.x)

  def normalize: Quat = {
    val r = 1.0 / math.sqrt(w * w + x * x + y * y + z * z)
    Quat(w * r, x * r, y * r, z * r)
  }

  /** ZYX Euler angles in degrees (FusionMath.h:466-476): asin input
    * clamped to [-1, 1] (FusionMath.h:148-156). */
  def toEulerDegrees: (Double, Double, Double) = {
    val halfMinusYY = 0.5 - y * y
    val roll = math.toDegrees(math.atan2(w * x + y * z, halfMinusYY - x * x))
    val pitch = math.toDegrees(math.asin(
      math.max(-1.0, math.min(1.0, 2.0 * (w * y - z * x)))))
    val yaw = math.toDegrees(math.atan2(w * z + x * y, halfMinusYY - z * z))
    (roll, pitch, yaw)
  }
}

object Quat {
  val Identity: Quat = Quat(1.0, 0.0, 0.0, 0.0)
}
