package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic pixel-area math on the WGS84 ellipsoid.
  *
  * A north-up geographic pixel spans [lat - dlat, lat + ...] × dlon; its
  * geodesic area is the ellipsoidal-trapezoid area
  *   area = dlonRad * (F(latTop) - F(latBottom))
  * where F is the meridional area integral per radian of longitude:
  *   F(phi) = b²/2 * [ sin(phi) / (1 - e²sin²(phi))
  *                     + 1/(2e) * ln((1 + e sin(phi)) / (1 - e sin(phi))) ]
  * (standard authalic-area formula; derivable from public geodesy texts).
  * Mirrors the reference's calc_area option —
  * raster2points/raster2points.py::get_area (anchor unverified, SURVEY §2A
  * A6); constants are checked by property tests (zone sums ≈ analytic
  * ellipsoid area) rather than against the unavailable reference source.
  *
  * Two forms are provided:
  *   - [[pixelAreaM2]]: plain Scala, used inside the raster
  *     PartitionReader (per-row, hot path, no Catalyst involved);
  *   - [[pixelAreaColumn]]: the same formula as pure Catalyst Column
  *     arithmetic — fully codegen'd, no UDF — for SQL-side use.
  */
object GeoMath {
  val SemiMajorM: Double = 6378137.0
  val Flattening: Double = 1.0 / 298.257223563
  val SemiMinorM: Double = SemiMajorM * (1.0 - Flattening)
  val E2: Double = Flattening * (2.0 - Flattening)
  val E: Double = math.sqrt(E2)

  /** Meridional area integral per radian of longitude, in m² (phi in degrees). */
  def zoneIntegral(phiDeg: Double): Double = {
    val s = math.sin(math.toRadians(phiDeg))
    val b2 = SemiMinorM * SemiMinorM
    b2 / 2.0 * (s / (1.0 - E2 * s * s) + 1.0 / (2.0 * E) * math.log((1.0 + E * s) / (1.0 - E * s)))
  }

  /** Area in m² of a pixel whose centroid latitude is `latDeg`, spanning
    * `dlatDeg` of latitude and `dlonDeg` of longitude.
    */
  def pixelAreaM2(latDeg: Double, dlatDeg: Double, dlonDeg: Double): Double = {
    val top = latDeg + dlatDeg / 2.0
    val bot = latDeg - dlatDeg / 2.0
    math.toRadians(dlonDeg) * math.abs(zoneIntegral(top) - zoneIntegral(bot))
  }

  /** Same formula as a Catalyst Column (codegen-friendly, no UDF). */
  def pixelAreaColumn(lat: Column, dlatDeg: Double, dlonDeg: Double): Column = {
    val b2 = SemiMinorM * SemiMinorM
    def f(phi: Column): Column = {
      val s = sin(radians(phi))
      lit(b2 / 2.0) * (s / (lit(1.0) - lit(E2) * s * s) +
        lit(1.0 / (2.0 * E)) * log((lit(1.0) + lit(E) * s) / (lit(1.0) - lit(E) * s)))
    }
    lit(math.toRadians(dlonDeg)) * abs(f(lat + lit(dlatDeg / 2.0)) - f(lat - lit(dlatDeg / 2.0)))
  }
}
