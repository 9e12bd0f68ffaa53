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
    val dim = ds.head().embedding.length
    ds.mapPartitions { it =>
      val ps = planes(dim, nbits, tables, seed)
      it.flatMap { v =>
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
    }.toDF("id", "table", "bucket")
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
