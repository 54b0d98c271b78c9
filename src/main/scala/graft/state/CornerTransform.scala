package graft.state

/** T4 — 3-input to 4-corner-force linear transform with small-angle
  * geometry coefficients and uint16 clamp (Transform.c:34-82, distances
  * ORC_CONFIG.h:58-61).
  *
  * act1 = b2ab*fZ - inv2ab*fTheta + inv2cd*fPhi + 32768   (front driver)
  * act2 = b2ab*fZ - inv2ab*fTheta - inv2cd*fPhi + 32768   (front pass.)
  * act3 = a2ab*fZ + inv2ab*fTheta + inv2cd*fPhi + 32768   (rear driver)
  * act4 = a2ab*fZ + inv2ab*fTheta - inv2cd*fPhi + 32768   (rear pass.)
  * each clamped to [0, 65535] then truncated to an integer DAC code.
  */
final case class CornerTransform(a: Double, b: Double, c: Double, d: Double) {
  require(a >= 0 && b >= 0 && c >= 0 && d >= 0,
    "all distances must be non-negative")
  val a2ab: Double = a / (2.0 * (a + b))
  val b2ab: Double = b / (2.0 * (a + b))
  val inv2ab: Double = 1.0 / (2.0 * (a + b))
  val inv2cd: Double = 1.0 / (2.0 * (c + d))

  /** Returns the four DAC codes (integral, in [0, 65535]). */
  def apply(fZ: Double, fTheta: Double, fPhi: Double): (Int, Int, Int, Int) = {
    val bz = b2ab * fZ; val az = a2ab * fZ
    val pt = inv2ab * fTheta; val pp = inv2cd * fPhi
    def clampCode(v: Double): Int = {
      val shifted = v + 32768.0
      if (shifted > 65535.0) 65535
      else if (shifted < 0.0) 0
      else shifted.toInt
    }
    (clampCode(bz - pt + pp), clampCode(bz - pt - pp),
      clampCode(az + pt + pp), clampCode(az + pt - pp))
  }
}

object CornerTransform {
  /** Reference geometry: FA/RA/DA/PA distances from the center of
    * gravity in meters (ORC_CONFIG.h:58-61). */
  val reference: CornerTransform = CornerTransform(0.011, 0.018, 0.008, 0.008)
}
