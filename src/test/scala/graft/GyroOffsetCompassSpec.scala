package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state._

class GyroOffsetCompassSpec extends AnyFunSuite {

  test("gyro offset converges to a constant bias when stationary") {
    val cfg = GyroOffsetConfig(sampleRateHz = 100)
    var st = GyroOffsetState()
    val bias = Vec3(0.5, -0.3, 0.1) // constant bias, below 3 dps threshold
    var corrected = Vec3.Zero
    for (_ <- 0 until 100 * 60) { // 60 s stationary
      val (n, c) = GyroOffset.update(cfg, st, bias)
      st = n; corrected = c
    }
    assert(corrected.magnitude < 0.05,
      s"bias should be mostly removed, got $corrected")
    assert((st.offset - bias).magnitude < 0.05)
  }

  test("gyro offset does not adapt during motion") {
    val cfg = GyroOffsetConfig(sampleRateHz = 100)
    var st = GyroOffsetState()
    for (_ <- 0 until 100 * 60) {
      val (n, _) = GyroOffset.update(cfg, st, Vec3(50.0, 0, 0)) // spinning
      st = n
    }
    assert(st.offset == Vec3.Zero)
    assert(st.timer == 0)
  }

  test("compass heading for cardinal directions (ENU)") {
    val accel = Vec3(0, 0, 1) // level, +z up
    // ENU: magnetometer pointing north (+y in ENU world, sensor aligned)
    val north = Compass.headingEnuDegrees(accel, Vec3(0, 1, 0))
    assert(math.abs(north) < 1e-9, s"north should be 0, got $north")
    val east = Compass.headingEnuDegrees(accel, Vec3(1, 0, 0))
    assert(math.abs(east - 90.0) < 1e-9 || math.abs(east + 270.0) < 1e-9,
      s"east should be +-90, got $east")
    // tilt compensation: rolling the sensor should not move the heading
    val a = math.toRadians(20)
    val tiltedAccel = Vec3(0, -math.sin(a), math.cos(a))
    val tiltedMag = Vec3(0, math.cos(a), math.sin(a))
    val tilted = Compass.headingEnuDegrees(tiltedAccel, tiltedMag)
    assert(math.abs(tilted) < 1e-6, s"tilt-compensated north: $tilted")
  }
}
