package graft

import graft.operators.KCenter
import org.apache.spark.sql.functions._

/** [[KCenter]] (q130): hand-worked greedy picks, the coverage-radius /
  * next-pick duality, monotone radius in k, and early stop on duplicate
  * collapse.
  */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("greedy picks the farthest point each round (hand-worked line)") {
    // points at x = 0, 1, 10, 11; seed = lowest id (x=0); then x=11
    // (d2=121); after {0,11}: mind2(id1@x=1) = min(1,100) = 1 and
    // mind2(id2@x=10) = min(100,1) = 1 — tie at 1.0 breaks on ASCENDING
    // id → id 1
    val v = pts(0L -> Seq(0f), 1L -> Seq(1f), 2L -> Seq(10f), 3L -> Seq(11f))
    val got = KCenter.select(v, "vec_id", "embedding", 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1, 0L, 0.0), (2, 3L, 121.0), (3, 1L, 1.0)))
  }

  test("the (k+1)-th pick's sel_dist2 equals the k-center coverage radius at k") {
    val emb = Tables.embeddings(spark, sf()).filter(col("vec_id") < 200)
    val sel5 = KCenter.select(emb, "vec_id", "embedding", 5)
      .orderBy(col("rank")).collect()
    val radius4 = KCenter.withMinDist(emb, "vec_id", "embedding", 4)
      .agg(max(col("mind2"))).collect()(0).getDouble(0)
    assert(sel5(4).getDouble(2) == radius4,
      s"greedy duality broken: pick5 ${sel5(4).getDouble(2)} vs radius4 $radius4")
  }

  test("coverage radius shrinks monotonically as k grows") {
    val emb = Tables.embeddings(spark, sf()).filter(col("vec_id") < 200)
    def radius(k: Int): Double = KCenter.withMinDist(emb, "vec_id", "embedding", k)
      .agg(max(col("mind2"))).collect()(0).getDouble(0)
    val r2 = radius(2); val r6 = radius(6)
    assert(r6 < r2, s"more centers must not worsen coverage: $r2 -> $r6")
  }

  test("stops early when the point set collapses to fewer than k distinct points") {
    val v = pts(0L -> Seq(1f, 2f), 1L -> Seq(1f, 2f), 2L -> Seq(1f, 2f))
    val got = KCenter.select(v, "vec_id", "embedding", 3).collect()
    assert(got.length == 1 && got(0).getLong(1) == 0L,
      "identical points admit exactly one center")
  }

  test("rejects out-of-range k and empty input") {
    val v = pts(0L -> Seq(1f))
    intercept[IllegalArgumentException](KCenter.select(v, "vec_id", "embedding", 0))
    intercept[IllegalArgumentException](
      KCenter.select(v.filter(col("vec_id") < 0), "vec_id", "embedding", 2))
  }
}
