package graft

import org.apache.spark.sql.functions._

/** SURVEY §2C non-oracle declared ops: approx_distinct (B13) and
  * sample_bounds (B30) — gated by statistical bounds, not hash equality.
  */
class ApproxSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on every key column") {
    val checks = Seq(
      ("orders", "o_custkey"), ("lineitem", "l_orderkey"),
      ("events", "user_id"), ("lineitem", "l_suppkey"))
    checks.foreach { case (t, c) =>
      val df = Tables(spark, dir, t)
      val exact = df.agg(countDistinct(col(c))).head().getLong(0)
      val approx = df.agg(approx_count_distinct(col(c), 0.02)).head().getLong(0)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"$t.$c: exact=$exact approx=$approx err=$err")
    }
  }

  test("sample fraction lands within binomial bounds and is seed-stable") {
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    val s1 = li.sample(withReplacement = false, 0.1, seed = 7)
    val c1 = s1.count()
    // binomial(n, 0.1): mean n/10, sd ~ sqrt(n*0.09); allow 6 sigma
    val sd = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(c1 - n * 0.1) < 6 * sd, s"n=$n sampled=$c1")
    // same seed -> identical sample
    val c2 = li.sample(withReplacement = false, 0.1, seed = 7).count()
    assert(c1 == c2)
  }

  test("hll sketches are mergeable: per-group sketches union to the global estimate") {
    // the 100 TB pattern: build per-partition/per-day sketches once, merge
    // cheaply forever — hll_union_agg over stored sketch binaries must
    // estimate the same cardinality as sketching the whole column
    val li = Tables.lineitem(spark, dir)
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val err = math.abs(merged - exact).toDouble / exact
    assert(err <= 0.05, s"merged=$merged exact=$exact err=$err")
  }

  test("approx_percentile rank error stays within n/accuracy of exact per group") {
    // the SCALE-SAFE percentile twin of q50/q76: exact percentile() buffers
    // every value per group (O(group) memory — fine at sf0.1, lethal at
    // 100x); approx_percentile keeps a bounded GK summary with the hard
    // guarantee |rank(v) - p*n| <= n/accuracy. Verify that guarantee
    // directly: the approx value's rank window must contain the target rank.
    import spark.implicits._
    val acc = 1000
    val ps = Seq(0.25, 0.5, 0.75, 0.99)
    val li = Tables.lineitem(spark, dir)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_extendedprice, " +
        s"array(${ps.map(_ + "D").mkString(",")}), $acc)").as("ap"),
        count(lit(1)).as("n"))
      .collect()
    val checks = approx.flatMap { r =>
      val vs = r.getSeq[Double](1)
      ps.indices.map(i =>
        (r.getString(0), ps(i), vs(i), r.getLong(2)))
    }.toSeq.toDF("g", "p", "v", "n")
    val ranks = li.join(broadcast(checks), col("l_returnflag") === col("g"))
      .groupBy(col("g"), col("p"), col("v"), col("n"))
      .agg(
        sum(when(col("l_extendedprice") < col("v"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("l_extendedprice") <= col("v"), 1L).otherwise(0L)).as("le"))
      .collect()
    assert(ranks.length == approx.length * ps.size)
    ranks.foreach { r =>
      val (g, p, n) = (r.getString(0), r.getDouble(1), r.getLong(3))
      val (lt, le) = (r.getLong(4), r.getLong(5))
      val target = p * n
      val slack = n.toDouble / acc + 1
      assert(lt <= target + slack && le >= target - slack,
        s"group $g p=$p: rank window [$lt, $le] misses target $target ± $slack")
    }
  }

  test("count-min sketch over-estimates within eps*N and never under-counts") {
    import org.apache.spark.util.sketch.CountMinSketch
    val docs = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val bytes = docs
      .agg(expr("count_min_sketch(word, 0.001d, 0.99d, 1)")).head()
      .getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = docs.groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"CMS under-counted '$w': $est < $c")
      assert(est <= c + (0.001 * n).toLong + 1, s"'$w': est=$est exact=$c n=$n")
    }
  }

  test("bloom filter prefilter: no false negatives on indexed doc hashes") {
    val docs = Tables.documents(spark, dir)
    val existing = docs.filter(col("doc_id") < 300).select(md5(col("text")).as("h"))
    val bf = existing.stat.bloomFilter("h", expectedNumItems = 1000, fpp = 0.01)
    // every indexed hash must hit (a miss would silently skip a real dup)
    val misses = existing.collect().count(r => !bf.mightContain(r.getString(0)))
    assert(misses == 0)
    // and the filter is selective on genuinely new content
    val novel = (1 to 1000).count(i => bf.mightContain(s"definitely-not-a-doc-$i"))
    assert(novel <= 50, s"fpp blowout: $novel/1000")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.lineitem(spark, dir)
    val approx = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))).head().getDouble(0)
    val exact = li.agg(median(col("l_extendedprice"))).head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
