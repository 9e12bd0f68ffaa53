package graft

import graft.functions.GeoMath
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the WGS84 geodesic pixel-area formula (SURVEY §5):
  * symmetry, monotonicity, and agreement with the analytic ellipsoid
  * surface area — these pin the constants without access to the reference
  * source.
  */
class GeoMathSpec extends AnyFunSuite {

  // pixel area = difference of two ~1e13 m² zone integrals: cancellation
  // near the poles leaves ~1e-11 relative noise, so compare at 1e-9
  private def relEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(math.abs(a), math.abs(b))

  test("area is symmetric about the equator") {
    for (lat <- Seq(0.5, 10.5, 45.5, 89.5))
      assert(relEq(GeoMath.pixelAreaM2(lat, 1, 1), GeoMath.pixelAreaM2(-lat, 1, 1)))
  }

  test("area decreases monotonically toward the poles") {
    val areas = (0 until 90).map(l => GeoMath.pixelAreaM2(l + 0.5, 1, 1))
    areas.sliding(2).foreach { case Seq(a, b) => assert(b < a) }
  }

  test("1-degree grid sums to the WGS84 ellipsoid surface area") {
    // sum over one column of 1°x1° pixels x 360 columns
    val total = 360.0 * (-90 until 90).map(l => GeoMath.pixelAreaM2(l + 0.5, 1, 1)).sum
    val wgs84SurfaceM2 = 5.10065621724e14 // analytic WGS84 ellipsoid area
    assert(math.abs(total - wgs84SurfaceM2) / wgs84SurfaceM2 < 1e-6,
      s"total=$total expected≈$wgs84SurfaceM2")
  }

  test("equatorial 1-degree pixel area matches spherical first-order value") {
    // ~111.3 km x 111.3 km at the equator, within 1%
    val a = GeoMath.pixelAreaM2(0.5, 1, 1)
    assert(a > 1.21e10 && a < 1.25e10, s"a=$a")
  }

  test("pixelAreaColumn matches the Scala form") {
    val spark = SparkSpec.session
    import spark.implicits._
    val lats = Seq(-89.5, -45.5, 0.5, 33.5, 89.5).toDF("lat")
    val viaCol = lats.select(GeoMath.pixelAreaColumn(org.apache.spark.sql.functions.col("lat"), 0.5, 0.5))
      .as[Double].collect()
    val viaScala = Seq(-89.5, -45.5, 0.5, 33.5, 89.5).map(GeoMath.pixelAreaM2(_, 0.5, 0.5))
    viaCol.zip(viaScala).foreach { case (a, b) => assert(relEq(a, b)) }
  }
}
