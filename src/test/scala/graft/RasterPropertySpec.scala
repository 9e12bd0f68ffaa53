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
        val cBack = math.floor((m.lonOf(c.toDouble) - m.originX) / m.pixelScaleX).toInt
        val rBack = math.floor((m.originY - m.latOf(r.toDouble)) / m.pixelScaleY).toInt
        cBack == c && rBack == r
    })
  }

  test("centroids are strictly inside the raster's geo bounds") {
    check(Prop.forAll(metaGen) { m =>
      val lonMax = m.lonOf((m.width - 1).toDouble)
      val latMin = m.latOf((m.height - 1).toDouble)
      m.lonOf(0.0) > m.originX &&
        lonMax < m.originX + m.width * m.pixelScaleX &&
        m.latOf(0.0) < m.originY &&
        latMin > m.originY - m.height * m.pixelScaleY
    })
  }
}
