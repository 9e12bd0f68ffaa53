package graft

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  // seeded random points and boxes; brute force = crossJoin + filter
  private val rng = new scala.util.Random(7)
  private val points = (1 to 400).map { i =>
    (i.toLong, rng.nextDouble() * 40 - 20, rng.nextDouble() * 40 - 20, (i % 13).toLong)
  }.toDF("pid", "x", "y", "v")
  private val zones = (1 to 25).map { z =>
    val x0 = rng.nextDouble() * 36 - 20; val y0 = rng.nextDouble() * 36 - 20
    (z.toLong, x0, y0, x0 + rng.nextDouble() * 12, y0 + rng.nextDouble() * 12)
  }.toDF("zone_id", "xmin", "ymin", "xmax", "ymax")

  private lazy val brute = points.crossJoin(zones)
    .filter(col("x") >= col("xmin") && col("x") <= col("xmax") &&
      col("y") >= col("ymin") && col("y") <= col("ymax"))
    .select("pid", "zone_id").as[(Long, Long)].collect().toSet

  test("grid-bucketed join equals brute force across cell sizes") {
    for (cell <- Seq(0.7, 3.0, 8.0, 50.0)) {
      val got = SpatialJoin.pointsInZones(points, zones, cell)
        .select("pid", "zone_id").as[(Long, Long)].collect().toSet
      assert(got == brute, s"cellSize=$cell diverged")
    }
  }

  test("negative coordinates bucket correctly (floor, not truncate-toward-zero)") {
    val p = Seq((1L, -0.5, -0.5, 1L)).toDF("pid", "x", "y", "v")
    val z = Seq((9L, -1.0, -1.0, -0.25, -0.25)).toDF("zone_id", "xmin", "ymin", "xmax", "ymax")
    // with an int cast instead of floor, cell(-0.5)=0 but cell(-1.0)=-1 and
    // the point would silently miss its zone
    assert(SpatialJoin.pointsInZones(p, z, 1.0).count() == 1)
  }

  test("boundary point belongs to both zones sharing the edge") {
    val p = Seq((1L, 10.0, 5.0, 1L)).toDF("pid", "x", "y", "v")
    val z = Seq(
      (1L, 0.0, 0.0, 10.0, 10.0),
      (2L, 10.0, 0.0, 20.0, 10.0)).toDF("zone_id", "xmin", "ymin", "xmax", "ymax")
    val got = SpatialJoin.pointsInZones(p, z, 4.0)
      .select("zone_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("zonalStats aggregates match a hand computation") {
    val p = Seq(
      (1L, 1.0, 1.0, 10L), (2L, 2.0, 2.0, 20L), (3L, 3.0, 3.0, 30L),
      (4L, 99.0, 99.0, 999L)).toDF("pid", "x", "y", "v")
    val z = Seq((5L, 0.0, 0.0, 2.5, 2.5)).toDF("zone_id", "xmin", "ymin", "xmax", "ymax")
    val r = SpatialJoin.zonalStats(p, z, 1.0, "v")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((5L, 2L, 30L, 10L, 20L)))
  }

  test("zone smaller than one cell and zone spanning many cells both work") {
    val p = Seq((1L, 5.5, 5.5, 1L), (2L, 17.0, 17.0, 2L)).toDF("pid", "x", "y", "v")
    val z = Seq(
      (1L, 5.4, 5.4, 5.6, 5.6), // sub-cell zone
      (2L, 0.0, 0.0, 30.0, 30.0)).toDF("zone_id", "xmin", "ymin", "xmax", "ymax") // 4x4 cells at cell=8
    val got = SpatialJoin.pointsInZones(p, z, 8.0)
      .select("pid", "zone_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (1L, 2L), (2L, 2L)))
  }

  test("a zone exploding past maxCellsPerZone fails loudly, not with a silent blowup") {
    val p = Seq((1L, 0.5, 0.5, 1L)).toDF("pid", "x", "y", "v")
    val z = Seq((1L, 0.0, 0.0, 100000.0, 100000.0)).toDF("zone_id", "xmin", "ymin", "xmax", "ymax")
    val df = SpatialJoin.pointsInZones(p, z, cellSize = 0.01, maxCellsPerZone = 1000L)
    val e = intercept[Exception] { df.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("maxCellsPerZone")), e.toString)
    // and a sane configuration on the same data still works
    assert(SpatialJoin.pointsInZones(p, z, cellSize = 50000.0).count() == 1)
  }

  test("points/zones sharing a column name fail loudly up front, not in analysis") {
    val pts = Seq((1L, 0.5, 0.5)).toDF("pid", "x", "y")
    // a zones frame carrying its own `x` (e.g. a centroid) would make the
    // containment filter ambiguous — the guard must name the collision
    val zones = Seq(("z1", 0.4, 0.0, 0.0, 1.0, 1.0))
      .toDF("zone", "x", "xmin", "ymin", "xmax", "ymax")
    val e = intercept[IllegalArgumentException] {
      graft.operators.SpatialJoin.pointsInZones(pts, zones, cellSize = 1.0)
    }
    assert(e.getMessage.contains("share column names") && e.getMessage.contains("[x]"),
      e.getMessage)
    val reserved = Seq((1L, 0.5, 0.5, 9L)).toDF("pid", "x", "y", "_cx")
    val zonesOk = Seq(("z1", 0.0, 0.0, 1.0, 1.0))
      .toDF("zone", "xmin", "ymin", "xmax", "ymax")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.SpatialJoin.pointsInZones(reserved, zonesOk, cellSize = 1.0)
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("radius join equals brute force; pairs unique; boundary pair included") {
    for (r <- Seq(0.5, 2.0, 7.0)) {
      val bruteP = points.as("a").crossJoin(points.as("b"))
        .filter(col("a.pid") < col("b.pid") &&
          (col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
            (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")) <= r * r)
        .select(col("a.pid"), col("b.pid")).as[(Long, Long)].collect()
      val got = SpatialJoin.radiusJoin(points, r)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      assert(got.length == got.distinct.length, s"r=$r emitted duplicate pairs")
      assert(got.toSet == bruteP.toSet, s"r=$r diverged from brute force")
    }
    // pair at EXACTLY the radius (closed predicate), in adjacent cells
    val p = Seq((1L, 0.75, 0.0, 0L), (2L, 1.75, 0.0, 0L)).toDF("pid", "x", "y", "v")
    assert(SpatialJoin.radiusJoin(p, 1.0).count() == 1)
  }

  test("raster points feed per-zone sums: direct filter sum equals join sum") {
    // the end-to-end consumer path: GeoTIFF -> points -> per-zone stats
    val tmp = java.nio.file.Files.createTempDirectory("spatial").toString
    val tiff = TiffFixtures.write(s"$tmp/g.tif", 64, 48, TiffFixtures.F32,
      (c, r) => (c + r) % 97, 10.0, 50.0, 0.5, Some("-1"))
    val pts = Raster.raster2df(spark, Seq(tiff))
      .select(col("lon"), col("lat"), col("val1").cast("long").as("v"))
    val z = Seq((1L, 12.0, 40.0, 20.0, 46.0)).toDF("zone_id", "xmin", "ymin", "xmax", "ymax")
    val zonal = SpatialJoin.zonalStats(pts, z, 4.0, "v", xCol = "lon", yCol = "lat")
      .select("val_sum").as[Long].head()
    val direct = pts.filter(col("lon") >= 12.0 && col("lon") <= 20.0 &&
        col("lat") >= 40.0 && col("lat") <= 46.0)
      .agg(sum("v")).head().getLong(0)
    assert(direct > 0 && zonal == direct)
  }
}
