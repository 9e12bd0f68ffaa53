package graft

import graft.operators.{Ann, RandomProjection, Vec}
import org.apache.spark.sql.functions._

/** JL projection properties the q114 oracle cannot check: the matrix is
  * balanced and crypto-mixed, pairwise distances survive within the JL
  * concentration bound (measured, not just argued), and planted structure
  * survives compression into the ANN operators. The structure-FREE recall
  * number on the random test corpus is recorded in DESIGN.md §4 alongside
  * the SemDeDup row — same documented trade.
  */
class RandomProjectionSpec extends SparkSpec {

  test("sign matrix is balanced and deterministic") {
    val m1 = RandomProjection.signMatrix(16, 64)
    val m2 = RandomProjection.signMatrix(16, 64)
    assert(m1 == m2, "matrix must be a pure function of (m, d)")
    val flat = m1.flatten
    assert(flat.size == 16 * 64)
    val inv = 1.0 / math.sqrt(16.0)
    assert(flat.forall(v => v == inv || v == -inv))
    val posFrac = flat.count(_ > 0).toDouble / flat.size
    assert(posFrac > 0.45 && posFrac < 0.55, s"sign balance off: $posFrac")
  }

  test("vec_dot projection is bit-identical to the declarative HOF form") {
    // the r18 physical form (one native vec_dot per output dim) must equal
    // the original transform/aggregate/zip_with form on raw doubles — the
    // q114/q115 oracle hashes depend on it
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val fast = RandomProjection.project(emb, "vec_id", "embedding", m = 16)
    val matrix = typedLit(RandomProjection.signMatrix(16, 64))
    val v = col("embedding").cast("array<double>")
    val ref = emb.select(col("vec_id"),
      transform(matrix, r =>
        aggregate(zip_with(v, r, (x, s) => x * s), lit(0.0),
          (acc, x) => acc + x)).as("proj"))
    val mismatches = fast.as("f").join(ref.as("r"), "vec_id")
      .filter(col("f.proj") =!= col("r.proj"))
      .count()
    assert(mismatches == 0, s"$mismatches rows differ from the HOF reference")
    assert(fast.count() == emb.count())
  }

  test("pairwise squared distances survive projection within the JL bound") {
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val proj = RandomProjection.project(emb, "vec_id", "embedding", m = 16)
    val both = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .join(proj, "vec_id")
      .localCheckpoint()
    // sampled pairs (every 17th id against every 23rd) — ~600 pairs
    val a = both.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("ia"), col("e").as("ea"), col("proj").as("pa"))
    val b = both.filter(col("vec_id") % 23 === 0)
      .select(col("vec_id").as("ib"), col("e").as("eb"), col("proj").as("pb"))
    def d2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => (p - q) * (p - q)),
        lit(0.0), (acc, v) => acc + v)
    val ratios = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select((d2(col("pa"), col("pb")) / d2(col("ea"), col("eb"))).as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios.length > 300, s"sample too small: ${ratios.length}")
    val mean = ratios.sum / ratios.length
    val within = ratios.count(r => r >= 0.5 && r <= 1.5).toDouble / ratios.length
    println(f"[jl] m=16 mean ratio $mean%.4f, within ±0.5: $within%.3f (n=${ratios.length})")
    // measured ~1.00 / ~0.84 with md5 signs (matches truly random signs;
    // the rejected LCG formula measured 0.47 here). Floors guard regression.
    assert(mean > 0.9 && mean < 1.1, f"distance ratio biased: $mean%.4f")
    assert(within >= 0.75, f"distortion spread too wide: $within%.3f")
  }

  test("planted near-duplicates survive compression into the ANN operators") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    def noisy(c: Array[Float], scale: Float) =
      c.map(_ + r.nextGaussian().toFloat * scale)
    val centers = Array.fill(3)(Array.fill(64)(r.nextGaussian().toFloat * 10f))
    val rows = (0 until 90).map(i => (i.toLong, noisy(centers(i % 3), 2f))) ++
      Seq((900L, noisy(centers(0), 0.01f)), (901L, noisy(centers(0), 0.01f)))
    val emb = rows.toDF("vec_id", "embedding")
    val proj = RandomProjection.project(emb, "vec_id", "embedding", m = 16)
      .select(col("vec_id").as("id"),
        col("proj").cast("array<float>").as("embedding")).as[Vec]
    // in 16-dim space, 900's nearest neighbor must still be its twin 901
    val queries = proj.filter(col("id") === 900L)
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    val top = Ann.bruteForceTopK(proj.filter(col("id") =!= 900L).toDF(), queries, 1)
      .select("id").as[Long].collect()
    assert(top.sameElements(Array(901L)),
      s"planted twin lost under projection: ${top.mkString(",")}")
  }
}
