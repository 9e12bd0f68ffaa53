package graft

import graft.sources.tiff.TiffTags
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the affine pixel↔geo mapping (SURVEY §5),
  * driven through scalacheck's engine directly (no scalatestplus bridge in
  * the offline cache).
  */
class RasterPropertySpec extends AnyFunSuite {

  private val metaGen = for {
    w <- Gen.choose(1, 10000)
    h <- Gen.choose(1, 10000)
    originX <- Gen.choose(-180.0, 180.0 - 1e-6)
    originY <- Gen.choose(-89.0, 90.0)
    scale <- Gen.choose(1e-5, 2.0)
  } yield TiffTags.RasterMeta("gen", w, h, 32, 3, scale, scale, originX, originY, None)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("pixel centroid -> lon/lat -> pixel index round-trips exactly") {
    check(Prop.forAll(metaGen, Gen.choose(0, 9999), Gen.choose(0, 9999)) {
      (m, c0, r0) =>
        val c = c0 % m.width
        val r = r0 % m.height
        val cBack = math.floor((m.lonOf(c.toDouble, r.toDouble) - m.originX) / m.pixelScaleX).toInt
        val rBack = math.floor((m.originY - m.latOf(c.toDouble, r.toDouble)) / m.pixelScaleY).toInt
        cBack == c && rBack == r
    })
  }

  test("centroids are strictly inside the raster's geo bounds") {
    check(Prop.forAll(metaGen) { m =>
      val lonMax = m.lonOf((m.width - 1).toDouble, 0.0)
      val latMin = m.latOf(0.0, (m.height - 1).toDouble)
      m.lonOf(0.0, 0.0) > m.originX &&
        lonMax < m.originX + m.width * m.pixelScaleX &&
        m.latOf(0.0, 0.0) < m.originY &&
        latMin > m.originY - m.height * m.pixelScaleY
    })
  }

  /** Rotated grids (round 14): metas carrying nonzero 34264 rotation terms.
    * Rotation magnitude bounded below the diagonal scale so the affine is
    * comfortably invertible (|det| ≥ scale²/2) — the realistic "slightly
    * rotated north-up scene" regime the full-affine reader targets.
    */
  private val rotMetaGen = for {
    w <- Gen.choose(1, 10000)
    h <- Gen.choose(1, 10000)
    originX <- Gen.choose(-180.0, 180.0 - 1e-6)
    originY <- Gen.choose(-89.0, 90.0)
    scale <- Gen.choose(1e-5, 2.0)
    rx <- Gen.choose(-scale / 2, scale / 2)
    ry <- Gen.choose(-scale / 2, scale / 2)
  } yield TiffTags.RasterMeta("gen", w, h, 32, 3, scale, scale, originX, originY,
    None, rotX = rx, rotY = ry)

  test("rotated grid: pixel centroid -> geo -> pixel round-trips through the 2x2 inverse") {
    check(Prop.forAll(rotMetaGen, Gen.choose(0, 9999), Gen.choose(0, 9999)) {
      (m, c0, r0) =>
        val c = c0 % m.width
        val r = r0 % m.height
        val x = m.lonOf(c.toDouble, r.toDouble)
        val y = m.latOf(c.toDouble, r.toDouble)
        // invert [sx rx; ry -sy] * (c+.5, r+.5) = (x-ox, y-oy)
        val det = m.pixelScaleX * (-m.pixelScaleY) - m.rotX * m.rotY
        val dx = x - m.originX
        val dy = y - m.originY
        val cBack = (dx * (-m.pixelScaleY) - dy * m.rotX) / det - 0.5
        val rBack = (m.pixelScaleX * dy - m.rotY * dx) / det - 0.5
        math.abs(cBack - c) < 1e-6 && math.abs(rBack - r) < 1e-6 &&
          math.rint(cBack).toInt == c && math.rint(rBack).toInt == r
    })
  }

  test("rotated grid with zero rotation terms equals the separable mapping bit for bit") {
    check(Prop.forAll(metaGen, Gen.choose(0, 9999), Gen.choose(0, 9999)) {
      (m, c0, r0) =>
        val c = (c0 % m.width).toDouble
        val r = (r0 % m.height).toDouble
        m.lonOf(c, r) == m.originX + (c + 0.5) * m.pixelScaleX &&
          m.latOf(c, r) == m.originY - (r + 0.5) * m.pixelScaleY
    })
  }
}
