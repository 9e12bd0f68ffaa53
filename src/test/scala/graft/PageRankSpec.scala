package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** [[PageRank]] (q118): hand-computed dangling redistribution, exact mass
  * conservation, regular-graph uniformity, and star-graph ordering. The
  * sf-data run is oracle-checked (q118, where undirected edges make
  * dangling a no-op); these pin the parts the oracle cannot reach — the
  * dangling path and multi-iteration mass accounting.
  */
class PageRankSpec extends SparkSpec {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("rank")).toMap

  test("dangling mass is redistributed: hand-computed a->b, 2 iterations") {
    // r0 = (1/2, 1/2); b is dangling.
    // iter1: m_d = 1/2; a = .075 + .85*(1/4) = .2875; b = .075 + .85*(1/2 + 1/4) = .7125
    // iter2: m_d = .7125; a = .075 + .85*.35625 = .3778125; b = .075 + .85*(.2875 + .35625) = .6221875
    val r = ranksOf(PageRank.run(edges("a" -> "b"), "src", "dst", iters = 2))
    assert(math.abs(r("a") - 0.3778125) < 1e-12, s"a = ${r("a")}")
    assert(math.abs(r("b") - 0.6221875) < 1e-12, s"b = ${r("b")}")
  }

  test("total mass is exactly 1 after every iteration, dangling included") {
    // seeded random directed graph, ~1/3 of nodes dangling
    val rnd = new scala.util.Random(7)
    val es = (0 until 120).map(_ => s"n${rnd.nextInt(30)}" -> s"n${20 + rnd.nextInt(10)}")
    for (k <- Seq(1, 4)) {
      val total = PageRank.run(edges(es: _*), "src", "dst", iters = k)
        .agg(sum(col("rank"))).collect()(0).getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$k mass=$total")
    }
  }

  test("regular graphs stay uniform at any iteration count") {
    // undirected triangle: every node degree 2; uniform is stationary
    val r = ranksOf(PageRank.run(
      edges("a" -> "b", "b" -> "c", "c" -> "a"), "src", "dst",
      iters = 5, undirected = true))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, r.toString))
  }

  test("undirected star: hub outranks leaves, leaves tie") {
    val r = ranksOf(PageRank.run(
      edges("hub" -> "l1", "hub" -> "l2", "hub" -> "l3", "hub" -> "l4"),
      "src", "dst", iters = 10, undirected = true))
    val leaves = Seq("l1", "l2", "l3", "l4").map(r)
    assert(r("hub") > leaves.max)
    assert(leaves.forall(v => math.abs(v - leaves.head) < 1e-12))
  }

  test("rejects bad parameters and empty graphs") {
    val e = edges("a" -> "b")
    intercept[IllegalArgumentException](PageRank.run(e, "src", "dst", iters = 0))
    intercept[IllegalArgumentException](
      PageRank.run(e, "src", "dst", iters = 3, damping = 1.0))
    intercept[IllegalArgumentException](
      PageRank.run(edges(), "src", "dst", iters = 3))
  }
}
