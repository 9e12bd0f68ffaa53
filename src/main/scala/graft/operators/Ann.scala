package graft.operators

import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A vector with an id — the typed currency of the ANN operators. */
final case class Vec(id: Long, embedding: Array[Float])

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths (north star: similarity search at 100 TB):
  *   - [[bruteForceTopK]]: exact baseline. Broadcast the (small) query set,
  *     stream the corpus once, per-query top-k via ranking window. Cost
  *     O(|corpus| * |queries| * dim) with NO corpus shuffle — correct at any
  *     corpus size as long as the query set broadcasts.
  *   - [[lshTopK]]: sign-random-projection LSH. Each vector maps to L
  *     bucket keys (L independent tables of nbits hyperplanes); candidates
  *     are bucket-key equi-joins (shuffle on bucket key, never all-pairs),
  *     then exact cosine ranks the candidates. Recall tuned by (nbits, L).
  *
  * Hyperplanes are derived deterministically from a seed so plans are
  * reproducible run-to-run (no Math.random in the plan).
  */
object Ann {

  /** Cosine via the native codegen'd vec_dot expression — identical math to
    * VectorMath.cosine (sequential double accumulate), ~an order of
    * magnitude less per-row overhead in the scoring loop.
    */
  private def cosineNative(a: Column, b: Column): Column =
    GraftFunctions.vecDot(a, b) /
      (sqrt(GraftFunctions.vecDot(a, a)) * sqrt(GraftFunctions.vecDot(b, b)))

  /** Exact top-k neighbors of each query vector by cosine. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(queries))
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic unit-free hyperplanes: L tables × nbits planes × dim. */
  private[operators] def planes(dim: Int, nbits: Int, tables: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, nbits, dim)(rnd.nextGaussian())
  }

  /** (id, table, bucket) keys for every vector: bucket = sign bits of the
    * nbits hyperplane projections. Runs as a partition-local map (typed,
    * one pass, planes built once per partition).
    */
  def lshKeys(ds: Dataset[Vec], nbits: Int, tables: Int, seed: Long): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    // dim is derived from each partition's first vector (planes are built
    // per partition anyway) — no eager head() job, empty input yields
    // empty output instead of throwing
    ds.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val dim = first.embedding.length
        val ps = planes(dim, nbits, tables, seed)
        (Iterator.single(first) ++ it).flatMap { v =>
          require(v.embedding.length == dim,
            s"ragged embedding dimensions: vector ${v.id} has ${v.embedding.length}, expected $dim")
          (0 until tables).iterator.map { t =>
            var bucket = 0L
            var b = 0
            while (b < nbits) {
              var s = 0.0
              var i = 0
              val p = ps(t)(b)
              while (i < dim) { s += p(i) * v.embedding(i); i += 1 }
              if (s >= 0) bucket |= (1L << b)
              b += 1
            }
            (v.id, t, bucket)
          }
        }
      }
    }.toDF("id", "table", "bucket")
  }

  /** IVF coarse quantizer: `nCells` centroid vectors chosen
    * deterministically from the corpus (every (n/nCells)-th by id order —
    * a cheap stand-in for trained k-means centroids; swap in trained ones
    * without changing the search path). Returns (id, cell) assignments via
    * a partition-local map against the broadcast centroids.
    */
  def ivfAssign(corpus: Dataset[Vec], centroids: Array[Vec]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    corpus.mapPartitions { it =>
      val cents = bc.value
      it.map { v => (v.id, nearestCells(v.embedding, cents, 1).head) }
    }.toDF("id", "cell")
  }

  /** Pick every (n/nCells)-th vector (by id order) as a centroid. */
  def ivfCentroids(corpus: Dataset[Vec], nCells: Int): Array[Vec] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col("id"))
    val n = corpus.count()
    val step = math.max(1L, n / nCells)
    corpus.toDF()
      .withColumn("rn", row_number().over(w))
      .filter((col("rn") - 1) % step === 0)
      .limit(nCells)
      .drop("rn").as[Vec].collect()
  }

  private def nearestCells(v: Array[Float], cents: Array[Vec], nprobe: Int): Seq[Int] = {
    val sims = cents.indices.map { ci =>
      val c = cents(ci).embedding
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { dot += v(i).toDouble * c(i); na += v(i).toDouble * v(i); nb += c(i).toDouble * c(i); i += 1 }
      ci -> dot / (math.sqrt(na) * math.sqrt(nb))
    }
    sims.sortBy { case (ci, s) => (-s, ci) }.take(nprobe).map(_._1)
  }

  /** IVF approximate top-k: search only the `nprobe` cells nearest to each
    * query vector — candidates come from a cell-key equi-join, then exact
    * cosine reranks. At scale the assignment table is computed once and
    * reused across queries (the classic IVF index).
    */
  def ivfTopK(
      spark: SparkSession,
      corpus: Dataset[Vec],
      queryIds: Seq[Long],
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = ivfCentroids(corpus, nCells)
    val assigned = ivfAssign(corpus, cents).cache()
    val bc = spark.sparkContext.broadcast(cents)
    val qCells = corpus.filter(col("id").isin(queryIds: _*)).as[Vec]
      .flatMap { q => nearestCells(q.embedding, bc.value, nprobe).map(c => (q.id, c)) }
      .toDF("q_id", "cell")
    val candidates = assigned.join(broadcast(qCells), "cell")
      .filter(col("id") =!= col("q_id"))
      .select("q_id", "id").distinct()
    val corpusDf = corpus.toDF("id", "embedding")
    val qDf = corpusDf.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    GraftFunctions.register(spark)
    val scored = candidates
      .join(corpusDf, "id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k: candidates share any (table, bucket) with the
    * query, then exact cosine ranks candidates. Returns the same schema as
    * bruteForceTopK (queries with < k candidates return fewer rows — the
    * recall/latency trade).
    */
  def lshTopK(
      spark: SparkSession,
      corpus: Dataset[Vec],
      queryIds: Seq[Long],
      k: Int,
      nbits: Int = 6,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val keys = lshKeys(corpus, nbits, tables, seed).cache()
    val qKeys = keys.filter(col("id").isin(queryIds: _*))
      .withColumnRenamed("id", "q_id")
    val candidates = keys.join(qKeys, Seq("table", "bucket"))
      .filter(col("id") =!= col("q_id"))
      .select("q_id", "id").distinct()
    val corpusDf = corpus.toDF("id", "embedding")
    val qDf = corpusDf.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    GraftFunctions.register(spark)
    val scored = candidates
      .join(corpusDf, "id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
