package graft

import graft.operators.Dbscan

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int) =
    Dbscan.cluster(pts.toDF("pid", "x", "y"), eps, minPts)
      .as[(Long, Long, String)].collect()
      .map { case (p, c, r) => p -> ((c, r)) }.toMap

  test("two dense blobs, one bridge-free gap: two clusters, noise excluded") {
    val blobA = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5), (4L, 0.5, 0.5))
    val blobB = Seq((11L, 10.0, 10.0), (12L, 10.5, 10.0), (13L, 10.0, 10.5), (14L, 10.5, 10.5))
    val noise = Seq((99L, 50.0, 50.0))
    val got = run(blobA ++ blobB ++ noise, eps = 1.0, minPts = 3)
    assert(!got.contains(99L)) // noise absent
    assert(blobA.map(_._1).forall(p => got(p) == ((1L, "core"))))
    assert(blobB.map(_._1).forall(p => got(p) == ((11L, "core"))))
  }

  test("border point attaches to its core neighbor's cluster without bridging") {
    // chain: dense triple (core) - border at distance eps - nothing beyond
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.25, 0.4), // mutual-core triple
      (4L, 1.5, 0.0))                                  // only neighbor is 2 -> border
    val got = run(pts, eps = 1.0, minPts = 3)
    assert(got(1L) == ((1L, "core")) && got(2L) == ((1L, "core")) && got(3L) == ((1L, "core")))
    assert(got(4L) == ((1L, "border")))
  }

  test("border points never merge two clusters (the classic DBSCAN pitfall)") {
    // two dense blobs joined ONLY through a shared border point: the
    // border sees cores of both, but core-core components stay separate.
    // (At minPts = 4 the bridge's degree is 2 < 3, so it cannot be core —
    // a looser minPts would make it core and LEGITIMATELY merge the blobs.)
    val blobA = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.25, 0.4), (4L, 0.25, -0.4))
    val blobB = Seq((11L, 2.5, 0.0), (12L, 3.0, 0.0), (13L, 2.75, 0.4), (14L, 2.75, -0.4))
    val bridge = Seq((7L, 1.5, 0.0)) // exactly eps from 2 and 11, nothing else
    val got = run(blobA ++ blobB ++ bridge, eps = 1.0, minPts = 4)
    assert(got(1L)._1 == 1L && got(11L)._1 == 11L, "clusters merged through a border point")
    // bridge is border and attaches deterministically to the MIN cluster id
    assert(got(7L) == ((1L, "border")))
  }

  test("minPts = 2 degenerates to connected components of the radius graph") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.9, 0.0), (3L, 1.8, 0.0), (9L, 9.0, 9.0))
    val got = run(pts, eps = 1.0, minPts = 2)
    // every paired point is core; the isolated one is noise
    assert(got == Map(1L -> ((1L, "core")), 2L -> ((1L, "core")), 3L -> ((1L, "core"))))
  }
}
