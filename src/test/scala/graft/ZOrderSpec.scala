package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = vals.size
    for (i <- 0 until bits; j <- 0 until n)
      z |= ((vals(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("zValue matches the reference interleave on randomized inputs") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(_ =>
      (rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong,
        rnd.nextInt(1 << 10).toLong))
    val out = rows.toDF("x", "y", "w")
      .select($"x", $"y", $"w",
        ZOrder.zValue(Seq($"x", $"y"), 10).as("z2"),
        ZOrder.zValue(Seq($"x", $"y", $"w"), 10).as("z3"))
      .collect()
    out.foreach { r =>
      val (x, y, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == mortonRef(Seq(x, y), 10), s"z2($x,$y)")
      assert(r.getLong(4) == mortonRef(Seq(x, y, w), 10), s"z3($x,$y,$w)")
    }
  }

  test("2-bit z-order walks the canonical 4x4 Morton curve") {
    val cells = for { x <- 0L until 4L; y <- 0L until 4L } yield (x, y)
    val order = cells.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue(Seq($"x", $"y"), 2).as("z"))
      .orderBy("z").as[(Long, Long, Long)].collect().map(r => (r._1, r._2))
    // the N-shaped curve: each 2x2 block completes before the next begins
    assert(order.take(4).toSet == Set((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)))
    assert(order.slice(4, 8).toSet == Set((2L, 0L), (3L, 0L), (2L, 1L), (3L, 1L)))
    assert(order.drop(12).toSet == Set((2L, 2L), (3L, 2L), (2L, 3L), (3L, 3L)))
  }

  test("z-sorted layout skips files on a 2-D box filter; row order unchanged") {
    // 64x64 grid, one row per cell; box = 1/16 of the space
    val grid = spark.range(4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val boxFilter = $"x" < 16 && $"y" < 16
    def filesTouched(path: String): Long = {
      val df = spark.read.parquet(path).filter(boxFilter)
        .select(input_file_name().as("f"))
      df.distinct().count()
    }
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // z-ordered: range-partition + in-partition sort by z -> the box's
    // rows share a contiguous z range -> few files hold them
    grid.withColumn("z", ZOrder.zValue(Seq($"x", $"y"), 6))
      .repartitionByRange(16, $"z").sortWithinPartitions($"z")
      .write.parquet(s"$base/zsorted")
    // same data laid out by an unrelated key: box rows land everywhere
    grid.withColumn("r", xxhash64($"x", $"y"))
      .repartitionByRange(16, $"r")
      .write.parquet(s"$base/random")
    val (zFiles, rFiles) = (filesTouched(s"$base/zsorted"), filesTouched(s"$base/random"))
    // 1/16 of the z range -> 1-2 of 16 files vs all 16 for the hash layout
    assert(zFiles <= 3, s"z-sorted layout touched $zFiles files")
    assert(rFiles >= 12, s"hash layout touched only $rFiles files")
    // layout must not change content
    assert(spark.read.parquet(s"$base/zsorted").filter(boxFilter).count() == 256)
  }
}
