package graft.state

import org.apache.spark.sql.Column

/** M17 — the 24-entry sensor-to-body axes alignment enum (the cube's
  * rotation group): each alignment names which signed sensor axis each
  * body axis reads, e.g. "+X-Z+Y" = body x from +sensor.x, body y from
  * -sensor.z, body z from +sensor.y.
  *
  * The ordinal order matches the reference enum (`ESP
  * source/components/Fusion/FusionAxes.h:24-49`) so configurations
  * that store an alignment by number mean the same thing here. The
  * swap itself is derived from the spec string — one generic signed
  * permutation, not 24 hand-written cases.
  */
object AxesAlignment {

  /** Spec strings in reference-enum ordinal order. */
  val All: Vector[String] = Vector(
    "+X+Y+Z", "+X-Z+Y", "+X-Y-Z", "+X+Z-Y",
    "-X+Y-Z", "-X+Z+Y", "-X-Y+Z", "-X-Z-Y",
    "+Y-X+Z", "+Y-Z-X", "+Y+X-Z", "+Y+Z+X",
    "-Y+X+Z", "-Y-Z+X", "-Y-X-Z", "-Y+Z-X",
    "+Z+Y-X", "+Z+X+Y", "+Z-Y+X", "+Z-X-Y",
    "-Z+Y+X", "-Z-X+Y", "-Z-Y-X", "-Z+X-Y")

  /** (source index 0=x/1=y/2=z, sign) for each of the three body
    * axes, parsed from a spec string like "+X-Z+Y". */
  def parse(spec: String): Seq[(Int, Double)] = {
    require(spec.length == 6, s"bad alignment spec '$spec'")
    (0 until 3).map { a =>
      val sign = spec(2 * a) match {
        case '+' => 1.0
        case '-' => -1.0
        case c   => throw new IllegalArgumentException(s"bad sign '$c'")
      }
      val idx = spec(2 * a + 1) match {
        case 'X' => 0
        case 'Y' => 1
        case 'Z' => 2
        case c   => throw new IllegalArgumentException(s"bad axis '$c'")
      }
      (idx, sign)
    }
  }

  /** Swap a [[Vec3]] into body axes under alignment `ordinal`
    * (0..23, reference-enum order). */
  def swap(v: Vec3, ordinal: Int): Vec3 = swap(v, All(ordinal))

  def swap(v: Vec3, spec: String): Vec3 = {
    val p = parse(spec)
    def pick(i: Int): Double = i match {
      case 0 => v.x
      case 1 => v.y
      case _ => v.z
    }
    Vec3(p(0)._2 * pick(p(0)._1),
         p(1)._2 * pick(p(1)._1),
         p(2)._2 * pick(p(2)._1))
  }

  /** Column form: swap three sensor-axis columns into body axes —
    * a pure projection (negate + reorder), scan speed, no shuffle.
    * Returns the (bx, by, bz) column triple. */
  def swapColumns(x: Column, y: Column, z: Column, ordinal: Int)
      : (Column, Column, Column) = {
    val cols = Vector(x, y, z)
    val p = parse(All(ordinal))
    def side(a: Int): Column =
      if (p(a)._2 > 0) cols(p(a)._1) else -cols(p(a)._1)
    (side(0), side(1), side(2))
  }

  /** The 3x3 signed-permutation matrix of an alignment (rows = body
    * axes), for the property tests and for quaternion composition. */
  def matrix(spec: String): Array[Array[Double]] = {
    val p = parse(spec)
    Array.tabulate(3, 3)((r, c) => if (p(r)._1 == c) p(r)._2 else 0.0)
  }
}
