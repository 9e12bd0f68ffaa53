package graft.sources.tiff

/** Geographic ↔ Transverse Mercator (UTM zone) coordinate transforms,
  * implemented from the PUBLIC Krüger n-series as presented in Karney 2011
  * ("Transverse Mercator with an accuracy of a few nanometers", J. Geodesy
  * 85(8)) — the same series EPSG Guidance Note 7 part 2 tabulates for the
  * "Transverse Mercator" method (EPSG:9807). Series truncated at n⁴: within
  * a UTM zone's ±3° of central meridian the truncation error is
  * sub-millimeter, orders of magnitude below any raster pixel.
  *
  * This exists for the resample=nearest zip (SURVEY §2A A5): the most common
  * real pairing in land-cover work is a geographic mask against a
  * UTM-projected secondary (or vice versa). The transform plugs into the
  * existing per-centroid inverse-affine sampling loop
  * ([[GeoTiffPartitionReader]]) — no new I/O or window machinery. CRS pairs
  * WITHOUT a supported transform keep their typed rejection.
  *
  * Two datum families are supported, each on its own ellipsoid (round 15):
  * WGS84 — EPSG:4326 geographic, EPSG:326zz/327zz UTM — and NAD83 —
  * EPSG:4269 geographic, EPSG:269zz UTM (GRS80 ellipsoid, the dominant US
  * land-cover pairing). Transforms NEVER cross datums: NAD83 and WGS84
  * differ by a time-dependent shift (meters today) that cannot be computed
  * from the public defining constants alone, so a 4326 ↔ 26915 zip stays a
  * typed rejection rather than silently treating the datums as equal.
  *
  * Scale design: [[forward]]/[[inverse]] are allocation-light straight-line
  * math (one specialized Tuple2 per call) suitable for the per-pixel hot
  * path; a 100 TB scan pays the same trig a native reprojection engine
  * does, distributed across tasks.
  */
object CrsTransform {

  /** Ellipsoid defining constants plus the derived Krüger series
    * coefficients (α forward / β inverse, Karney 2011 eq. 35–36, to n⁴).
    */
  // A case class: structural equality + serializability matter because
  // TmParams (Serializable case class) embeds one — a TmParams captured in
  // a task closure must not crash job submission, and a deserialized copy
  // must still pass the datum gate (which therefore compares ==, not eq).
  final case class Ellipsoid(name: String, a: Double, f: Double) {
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    private val n = f / (2.0 - f)
    private val n2 = n * n
    private val n3 = n2 * n
    private val n4 = n2 * n2
    /** rectifying radius (Krüger's A) */
    val rectA: Double = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0)
    val a1: Double = n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0
    val a2: Double = 13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0
    val a3: Double = 61.0 * n3 / 240.0 - 103.0 * n4 / 140.0
    val a4: Double = 49561.0 * n4 / 161280.0
    val b1: Double = n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0
    val b2: Double = n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0
    val b3: Double = 17.0 * n3 / 480.0 - 37.0 * n4 / 840.0
    val b4: Double = 4397.0 * n4 / 161280.0
    override def toString: String = name
  }

  /** WGS84 (same defining constants as GeoMath's). */
  val Wgs84: Ellipsoid = Ellipsoid("WGS84", 6378137.0, 1.0 / 298.257223563)
  /** GRS80 — NAD83's ellipsoid; same semi-major axis, flattening differs
    * from WGS84's in the 9th significant digit (≈0.1 mm of polar radius).
    */
  val Grs80: Ellipsoid = Ellipsoid("GRS80", 6378137.0, 1.0 / 298.257222101)

  private val K0 = 0.9996

  /** Transverse Mercator parameters of one projected CRS. */
  final case class TmParams(cmDeg: Double, falseEasting: Double,
      falseNorthing: Double, scale: Double, ell: Ellipsoid = Wgs84)

  /** UTM zone parameters: EPSG:326zz/327zz (WGS84 north/south) and
    * EPSG:269zz (NAD83 north, zones 1–23 — the published range).
    */
  def utmParams(epsg: Int): Option[TmParams] = {
    val (zone, south, ell) =
      if (epsg >= 32601 && epsg <= 32660) (epsg - 32600, false, Wgs84)
      else if (epsg >= 32701 && epsg <= 32760) (epsg - 32700, true, Wgs84)
      else if (epsg >= 26901 && epsg <= 26923) (epsg - 26900, false, Grs80)
      else return None
    Some(TmParams(zone * 6.0 - 183.0, 500000.0, if (south) 1e7 else 0.0, K0, ell))
  }

  /** Geographic (lon, lat degrees) → projected (easting, northing meters). */
  def forward(p: TmParams, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val el = p.ell
    val phi = math.toRadians(latDeg)
    val dl = math.toRadians(lonDeg - p.cmDeg)
    val s = math.sin(phi)
    // conformal-latitude tangent via Gudermannian composition (Karney eq. 7–9)
    val t = math.sinh(atanh(s) - el.e * atanh(el.e * s))
    val cosD = math.cos(dl)
    val xiP = math.atan2(t, cosD)
    val etaP = asinh(math.sin(dl) / math.sqrt(t * t + cosD * cosD))
    val xi = xiP +
      el.a1 * math.sin(2 * xiP) * math.cosh(2 * etaP) +
      el.a2 * math.sin(4 * xiP) * math.cosh(4 * etaP) +
      el.a3 * math.sin(6 * xiP) * math.cosh(6 * etaP) +
      el.a4 * math.sin(8 * xiP) * math.cosh(8 * etaP)
    val eta = etaP +
      el.a1 * math.cos(2 * xiP) * math.sinh(2 * etaP) +
      el.a2 * math.cos(4 * xiP) * math.sinh(4 * etaP) +
      el.a3 * math.cos(6 * xiP) * math.sinh(6 * etaP) +
      el.a4 * math.cos(8 * xiP) * math.sinh(8 * etaP)
    (p.falseEasting + p.scale * el.rectA * eta,
      p.falseNorthing + p.scale * el.rectA * xi)
  }

  /** Projected (easting, northing meters) → geographic (lon, lat degrees).
    * The final conformal→geodetic latitude step uses Karney's Newton
    * iteration on τ (eq. 19–21) rather than a truncated χ-series, so the
    * round-trip closes to machine precision (pinned by ScalaCheck).
    */
  def inverse(p: TmParams, easting: Double, northing: Double): (Double, Double) = {
    val el = p.ell
    val xi = (northing - p.falseNorthing) / (p.scale * el.rectA)
    val eta = (easting - p.falseEasting) / (p.scale * el.rectA)
    val xiP = xi -
      (el.b1 * math.sin(2 * xi) * math.cosh(2 * eta) +
        el.b2 * math.sin(4 * xi) * math.cosh(4 * eta) +
        el.b3 * math.sin(6 * xi) * math.cosh(6 * eta) +
        el.b4 * math.sin(8 * xi) * math.cosh(8 * eta))
    val etaP = eta -
      (el.b1 * math.cos(2 * xi) * math.sinh(2 * eta) +
        el.b2 * math.cos(4 * xi) * math.sinh(4 * eta) +
        el.b3 * math.cos(6 * xi) * math.sinh(6 * eta) +
        el.b4 * math.cos(8 * xi) * math.sinh(8 * eta))
    val sinhE = math.sinh(etaP)
    val cosX = math.cos(xiP)
    val tauP = math.sin(xiP) / math.sqrt(sinhE * sinhE + cosX * cosX)
    val dl = math.atan2(sinhE, cosX)
    // Newton: solve tauPrime(tau) = tauP for tau = tan(phi)
    var tau = tauP
    var i = 0
    while (i < 5) {
      val sq = math.sqrt(1.0 + tau * tau)
      val sigma = math.sinh(el.e * atanh(el.e * tau / sq))
      val fTau = tau * math.sqrt(1.0 + sigma * sigma) - sigma * sq
      val dTau = (math.sqrt((1.0 + sigma * sigma) * (1.0 + tau * tau)) - sigma * tau) *
        (1.0 - el.e2) * sq / (1.0 + (1.0 - el.e2) * tau * tau)
      tau += (tauP - fTau) / dTau
      i += 1
    }
    (p.cmDeg + math.toDegrees(dl), math.toDegrees(math.atan(tau)))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))

  /** A CRS's place in the supported set: its datum ellipsoid, plus TM
    * parameters when projected (None = the datum's geographic CRS).
    */
  private def side(epsg: Int): Option[(Ellipsoid, Option[TmParams])] =
    if (epsg == 4326) Some((Wgs84, None))
    else if (epsg == 4269) Some((Grs80, None))
    else utmParams(epsg).map(p => (p.ell, Some(p)))

  /** Coordinate transform from CRS `src` to CRS `dst`, when both are in
    * the supported set AND share a datum: decomposed as src→geographic→dst
    * on that datum's ellipsoid. None for any other pair — including
    * CROSS-DATUM pairs (4326 ↔ NAD83 UTM), whose shift is not computable
    * from defining constants — so the caller keeps its typed rejection.
    */
  def between(src: Int, dst: Int): Option[(Double, Double) => (Double, Double)] =
    for {
      (ea, pa) <- side(src)
      (eb, pb) <- side(dst)
      if ea == eb // same datum only — never silently conflate NAD83/WGS84
    } yield {
      val toGeo: (Double, Double) => (Double, Double) =
        pa.map(p => (x: Double, y: Double) => inverse(p, x, y))
          .getOrElse((x: Double, y: Double) => (x, y))
      val fromGeo: (Double, Double) => (Double, Double) =
        pb.map(p => (x: Double, y: Double) => forward(p, x, y))
          .getOrElse((x: Double, y: Double) => (x, y))
      (x: Double, y: Double) => { val (gx, gy) = toGeo(x, y); fromGeo(gx, gy) }
    }

  /** The transform a resample=nearest zip needs to sample raster `b` at
    * raster `a`'s pixel centroids — Some only when both files DECLARE an
    * EPSG, the codes differ, and the pair is supported (same datum).
    * Same/undeclared CRSs return None and take the affine-only path (with
    * its existing equality gates).
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
