package graft.sources.tiff

/** WGS84 geographic ↔ Transverse Mercator (UTM zone) coordinate transforms,
  * implemented from the PUBLIC Krüger n-series as presented in Karney 2011
  * ("Transverse Mercator with an accuracy of a few nanometers", J. Geodesy
  * 85(8)) — the same series EPSG Guidance Note 7 part 2 tabulates for the
  * "Transverse Mercator" method (EPSG:9807). Series truncated at n⁴: within
  * a UTM zone's ±3° of central meridian the truncation error is
  * sub-millimeter, orders of magnitude below any raster pixel.
  *
  * This exists for the resample=nearest zip (SURVEY §2A A5): the most common
  * real pairing in land-cover work is a geographic (EPSG:4326) mask against
  * a UTM-projected secondary (or vice versa). The transform plugs into the
  * existing per-centroid inverse-affine sampling loop
  * ([[GeoTiffPartitionReader]]) — no new I/O or window machinery. CRS pairs
  * WITHOUT a supported transform keep their typed rejection.
  *
  * Scale design: [[forward]]/[[inverse]] are allocation-light straight-line
  * math (one specialized Tuple2 per call) suitable for the per-pixel hot
  * path; a 100 TB scan pays the same trig a native reprojection engine
  * does, distributed across tasks.
  */
object CrsTransform {

  // WGS84 defining constants (same source as GeoMath's)
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)
  private val E = math.sqrt(E2)
  private val K0 = 0.9996

  // third flattening and the rectifying radius (Krüger's A)
  private val n = F / (2.0 - F)
  private val n2 = n * n
  private val n3 = n2 * n
  private val n4 = n2 * n2
  private val RectA = A / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0)

  // Krüger forward series coefficients α_j (Karney 2011 eq. 35, to n⁴)
  private val a1 = n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0
  private val a2 = 13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0
  private val a3 = 61.0 * n3 / 240.0 - 103.0 * n4 / 140.0
  private val a4 = 49561.0 * n4 / 161280.0

  // Krüger inverse series coefficients β_j (Karney 2011 eq. 36, to n⁴)
  private val b1 = n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0
  private val b2 = n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0
  private val b3 = 17.0 * n3 / 480.0 - 37.0 * n4 / 840.0
  private val b4 = 4397.0 * n4 / 161280.0

  /** Transverse Mercator parameters of one projected CRS. */
  final case class TmParams(cmDeg: Double, falseEasting: Double,
      falseNorthing: Double, scale: Double)

  /** UTM zone parameters for EPSG:326zz (north) / 327zz (south). */
  def utmParams(epsg: Int): Option[TmParams] = {
    val zone =
      if (epsg >= 32601 && epsg <= 32660) epsg - 32600
      else if (epsg >= 32701 && epsg <= 32760) epsg - 32700
      else return None
    val south = epsg > 32700
    Some(TmParams(zone * 6.0 - 183.0, 500000.0, if (south) 1e7 else 0.0, K0))
  }

  /** Geographic (lon, lat degrees) → projected (easting, northing meters). */
  def forward(p: TmParams, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val dl = math.toRadians(lonDeg - p.cmDeg)
    val s = math.sin(phi)
    // conformal-latitude tangent via Gudermannian composition (Karney eq. 7–9)
    val t = math.sinh(atanh(s) - E * atanh(E * s))
    val cosD = math.cos(dl)
    val xiP = math.atan2(t, cosD)
    val etaP = asinh(math.sin(dl) / math.sqrt(t * t + cosD * cosD))
    val xi = xiP +
      a1 * math.sin(2 * xiP) * math.cosh(2 * etaP) +
      a2 * math.sin(4 * xiP) * math.cosh(4 * etaP) +
      a3 * math.sin(6 * xiP) * math.cosh(6 * etaP) +
      a4 * math.sin(8 * xiP) * math.cosh(8 * etaP)
    val eta = etaP +
      a1 * math.cos(2 * xiP) * math.sinh(2 * etaP) +
      a2 * math.cos(4 * xiP) * math.sinh(4 * etaP) +
      a3 * math.cos(6 * xiP) * math.sinh(6 * etaP) +
      a4 * math.cos(8 * xiP) * math.sinh(8 * etaP)
    (p.falseEasting + p.scale * RectA * eta,
      p.falseNorthing + p.scale * RectA * xi)
  }

  /** Projected (easting, northing meters) → geographic (lon, lat degrees).
    * The final conformal→geodetic latitude step uses Karney's Newton
    * iteration on τ (eq. 19–21) rather than a truncated χ-series, so the
    * round-trip closes to machine precision (pinned by ScalaCheck).
    */
  def inverse(p: TmParams, easting: Double, northing: Double): (Double, Double) = {
    val xi = (northing - p.falseNorthing) / (p.scale * RectA)
    val eta = (easting - p.falseEasting) / (p.scale * RectA)
    val xiP = xi -
      (b1 * math.sin(2 * xi) * math.cosh(2 * eta) +
        b2 * math.sin(4 * xi) * math.cosh(4 * eta) +
        b3 * math.sin(6 * xi) * math.cosh(6 * eta) +
        b4 * math.sin(8 * xi) * math.cosh(8 * eta))
    val etaP = eta -
      (b1 * math.cos(2 * xi) * math.sinh(2 * eta) +
        b2 * math.cos(4 * xi) * math.sinh(4 * eta) +
        b3 * math.cos(6 * xi) * math.sinh(6 * eta) +
        b4 * math.cos(8 * xi) * math.sinh(8 * eta))
    val sinhE = math.sinh(etaP)
    val cosX = math.cos(xiP)
    val tauP = math.sin(xiP) / math.sqrt(sinhE * sinhE + cosX * cosX)
    val dl = math.atan2(sinhE, cosX)
    // Newton: solve tauPrime(tau) = tauP for tau = tan(phi)
    var tau = tauP
    var i = 0
    while (i < 5) {
      val sq = math.sqrt(1.0 + tau * tau)
      val sigma = math.sinh(E * atanh(E * tau / sq))
      val fTau = tau * math.sqrt(1.0 + sigma * sigma) - sigma * sq
      val dTau = (math.sqrt((1.0 + sigma * sigma) * (1.0 + tau * tau)) - sigma * tau) *
        (1.0 - E2) * sq / (1.0 + (1.0 - E2) * tau * tau)
      tau += (tauP - fTau) / dTau
      i += 1
    }
    (p.cmDeg + math.toDegrees(dl), math.toDegrees(math.atan(tau)))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))

  /** Coordinate transform from CRS `src` to CRS `dst`, when both are in the
    * supported set {EPSG:4326} ∪ {UTM 326zz/327zz}: decomposed as
    * src→geographic→dst. None for any other pair — the caller keeps its
    * typed rejection.
    */
  def between(src: Int, dst: Int): Option[(Double, Double) => (Double, Double)] = {
    def toGeo(e: Int): Option[(Double, Double) => (Double, Double)] =
      if (e == 4326) Some((x, y) => (x, y))
      else utmParams(e).map(p => (x, y) => inverse(p, x, y))
    def fromGeo(e: Int): Option[(Double, Double) => (Double, Double)] =
      if (e == 4326) Some((x, y) => (x, y))
      else utmParams(e).map(p => (x, y) => forward(p, x, y))
    for (f <- toGeo(src); g <- fromGeo(dst)) yield
      (x: Double, y: Double) => { val (gx, gy) = f(x, y); g(gx, gy) }
  }

  /** The transform a resample=nearest zip needs to sample raster `b` at
    * raster `a`'s pixel centroids — Some only when both files DECLARE an
    * EPSG, the codes differ, and the pair is supported. Same/undeclared
    * CRSs return None and take the affine-only path (with its existing
    * equality gates).
    */
  def zipTransform(a: TiffTags.RasterMeta, b: TiffTags.RasterMeta)
      : Option[(Double, Double) => (Double, Double)] =
    for {
      ea <- a.epsg
      eb <- b.epsg
      if ea != eb
      t <- between(ea, eb)
    } yield t
}
