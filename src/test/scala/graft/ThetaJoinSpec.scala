package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

/** q07's size-gated running supplier count (round 18): the distributed
  * two-pass prefix sum must agree with the single global window on every
  * PART row — that is the only side the query reads (tied SUPPLIER rows
  * legitimately take either order inside a running sum; part rows see
  * only the supplier count at or below their price, which is order-free).
  */
class ThetaJoinSpec extends SparkSpec {

  test("cumSupCounts: distributed two-pass == global window on part rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ties across arms, negatives, exact bin edges (multiples of 16),
    // brands duplicated and null (the supplier arm's constant)
    val vals = Seq(-32.0, -16.0, 0.0, 16.0, 16.0, 48.0, 48.25, 120.5)
    val rows = (1 to 800).map { _ =>
      val v = if (rnd.nextBoolean()) vals(rnd.nextInt(vals.length))
        else rnd.nextInt(200) - 50 + 0.25 * rnd.nextInt(4)
      val isPart = rnd.nextInt(3) min 1 // ~2/3 parts
      val brand = if (isPart == 0) null else s"B${rnd.nextInt(5)}"
      (brand, v, isPart)
    }
    val u = rows.toDF("p_brand", "v", "is_part")
    def partCums(distributed: Boolean): Seq[(String, Double, Long)] =
      Relational.cumSupCounts(u, distributed)
        .filter(col("is_part") === 1)
        .select(col("p_brand"), col("v"), col("cum_sup"))
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2, t._3))
        .toSeq
    val window = partCums(distributed = false)
    val binned = partCums(distributed = true)
    assert(binned == window,
      s"paths diverged: window-only=${(window.toSet -- binned.toSet).take(3)} " +
        s"binned-only=${(binned.toSet -- window.toSet).take(3)}")
    // cross-check one row against the definition
    val suppliers = rows.filter(_._3 == 0).map(_._2)
    val (b0, v0, c0) = window.head
    assert(c0 == suppliers.count(_ <= v0),
      s"cum_sup($b0, $v0) = $c0 != definitional ${suppliers.count(_ <= v0)}")
  }
}
