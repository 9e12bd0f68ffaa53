package graft

import org.apache.spark.sql.SparkSession

/** Throughput probe for the cross-CRS resample zip (round 15): measures the
  * per-pixel Krüger-transform cost against the plain scan and the same-grid
  * zip on a 16 Mpx mask — the raster rows BASELINE quotes in Mpx/s. Test
  * scope because it renders through [[TiffFixtures]].
  *
  * Run: `sbt "Test/runMain graft.CrsZipProbe"`.
  */
object CrsZipProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("crszip").toString
    // 4000×4000 f32 mask @ 0.0005° (2°×2° footprint), ~6% nodata
    def v(c: Int, r: Int): Double = if ((c * 31 + r * 17) % 16 == 0) -9999.0 else c + r * 0.5
    val mask = TiffFixtures.writeBigTiff(s"$tmp/mask.tif", 4000, 4000, v,
      14.0, 48.0, 0.0005, Some("-9999"), geoKeys = Seq(1024 -> 2, 2048 -> 4326))
    // same-grid twin for the positional-zip baseline
    val twin = TiffFixtures.writeBigTiff(s"$tmp/twin.tif", 4000, 4000,
      (c, r) => (c ^ r).toDouble, 14.0, 48.0, 0.0005, Some("-9999"),
      geoKeys = Seq(1024 -> 2, 2048 -> 4326))
    // UTM 32633 secondary covering the footprint at 100 m
    val utm = TiffFixtures.writeBigTiff(s"$tmp/utm.tif", 1800, 2600,
      (c, r) => (c + r).toDouble, 420000.0, 5330000.0, 100.0, None,
      geoKeys = Seq(1024 -> 1, 3072 -> 32633))
    def time(label: String)(body: => Long): Unit = {
      body // warm (codegen + footer caches)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val med = ts.map(_._2).sorted.apply(2)
      println(f"$label%-28s median $med%.3f s  ${16.0 / med}%.1f Mpx/s (rows=${ts.head._1})")
    }
    time("plain scan")(
      Raster.raster2df(spark, Seq(mask), colNames = Seq("a"), maxBlockSize = 1024).count())
    time("same-grid zip")(
      Raster.raster2df(spark, Seq(mask, twin), colNames = Seq("a", "b"),
        maxBlockSize = 1024).count())
    time("cross-CRS zip (4326->UTM)")(
      Raster.raster2df(spark, Seq(mask, utm), colNames = Seq("a", "b"),
        maxBlockSize = 1024, resample = "nearest").count())
    // round 16: conic (Albers 5070) and datum-bridged legs. CONUS-footprint
    // masks — 5070 is CONUS-parameterized; same 16 Mpx shape as above.
    val maskUs = TiffFixtures.writeBigTiff(s"$tmp/mask_us.tif", 4000, 4000, v,
      -100.0, 45.0, 0.0005, Some("-9999"), geoKeys = Seq(1024 -> 2, 2048 -> 4269))
    val maskUsW = TiffFixtures.writeBigTiff(s"$tmp/mask_usw.tif", 4000, 4000, v,
      -100.0, 45.0, 0.0005, Some("-9999"), geoKeys = Seq(1024 -> 2, 2048 -> 4326))
    // EPSG:5070 secondary @ 200 m covering the mask centroids' images
    // (E in [-4e5, -5e4], N in [2.15e6, 2.5e6])
    val alb = TiffFixtures.writeBigTiff(s"$tmp/alb.tif", 1750, 1750,
      (c, r) => (c + r).toDouble, -400000.0, 2500000.0, 200.0, None,
      geoKeys = Seq(1024 -> 1, 3072 -> 5070))
    time("conic zip (4269->Albers)")(
      Raster.raster2df(spark, Seq(maskUs, alb), colNames = Seq("a", "b"),
        maxBlockSize = 1024, resample = "nearest").count())
    time("bridged zip (4326->5070)")(
      Raster.raster2df(spark, Seq(maskUsW, alb), colNames = Seq("a", "b"),
        maxBlockSize = 1024, resample = "nearest", datumBridge = "epsg1188").count())
    // round 16: polar stereographic (NSIDC 3413) and web mercator (3857)
    // legs. Arctic-footprint mask for the polar leg; centroid images span
    // x [-132.9k, -68.2k], y [-1521.8k, -1299.5k]
    val maskAr = TiffFixtures.writeBigTiff(s"$tmp/mask_ar.tif", 4000, 4000, v,
      -50.0, 78.0, 0.0005, Some("-9999"), geoKeys = Seq(1024 -> 2, 2048 -> 4326))
    val ps = TiffFixtures.writeBigTiff(s"$tmp/ps.tif", 400, 1250,
      (c, r) => (c + r).toDouble, -140000.0, -1290000.0, 200.0, None,
      geoKeys = Seq(1024 -> 1, 3072 -> 3413))
    time("polar zip (4326->3413)")(
      Raster.raster2df(spark, Seq(maskAr, ps), colNames = Seq("a", "b"),
        maxBlockSize = 1024, resample = "nearest").count())
    // web mercator secondary @ 200 m under the original mid-latitude mask
    // (x [1558.5k, 1781.1k], y [5780.3k, 6106.9k])
    val wm = TiffFixtures.writeBigTiff(s"$tmp/wm.tif", 1200, 1700,
      (c, r) => (c + r).toDouble, 1550000.0, 6115000.0, 200.0, None,
      geoKeys = Seq(1024 -> 1, 3072 -> 3857))
    time("web mercator zip (4326->3857)")(
      Raster.raster2df(spark, Seq(mask, wm), colNames = Seq("a", "b"),
        maxBlockSize = 1024, resample = "nearest").count())
    // round 16: LAEA (ETRS89 3035, the CORINE pairing) — ETRS89 mask over
    // the EU LAEA grid @ 200 m; centroid images span x [4180.6k, 4321.0k],
    // y [3098.7k, 3323.1k]
    val maskEu = TiffFixtures.writeBigTiff(s"$tmp/mask_eu.tif", 4000, 4000, v,
      8.0, 53.0, 0.0005, Some("-9999"), geoKeys = Seq(1024 -> 2, 2048 -> 4258))
    val laea = TiffFixtures.writeBigTiff(s"$tmp/laea.tif", 760, 1180,
      (c, r) => (c + r).toDouble, 4175000.0, 3328000.0, 200.0, None,
      geoKeys = Seq(1024 -> 1, 3072 -> 3035))
    time("laea zip (4258->3035)")(
      Raster.raster2df(spark, Seq(maskEu, laea), colNames = Seq("a", "b"),
        maxBlockSize = 1024, resample = "nearest").count())
    spark.stop()
  }
}
