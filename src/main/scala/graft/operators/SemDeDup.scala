package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions
import graft.plans.GraftFunctions.vecDot
import graft.queries.Parity

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): semantic near-duplicate
  * pairs = k-means cluster assignment, then cosine scoring WITHIN each
  * cluster only. The self-join is keyed on the cluster id, so the
  * candidate set is O(sum of cluster-size squared) — linear in corpus
  * size ONLY IF cluster population stays bounded, i.e. k grows with N.
  *
  * That contract is the load-bearing scale property, and it is exactly
  * what the declared oracle query q101 cannot honor: q101 pins 8
  * deterministic centroids so DuckDB can replay the assignment, which
  * makes its within-cluster join quadratic in corpus size. The round-7
  * scale rehearsal measured the consequence — at 400k vectors (200x the
  * sf0.1 corpus) the fixed-k form is ~10 BILLION pair evaluations and ran
  * >35 min without completing, while [[pairsAuto]] with the same data and
  * a bounded target cluster size finishes in minutes. Use q101's form for
  * oracle parity at test scale; use [[pairsAuto]] (or [[pairs]] with
  * trained centroids from [[Ann.ivfCentroidsKMeans]]) everywhere else.
  *
  * Assignment is the broadcast-centroid argmin (q82's shape): one pass
  * over the corpus, no shuffle of the embedding column beyond the final
  * cluster-key exchange. The centroid table must therefore stay
  * broadcast-small — [[MaxCentroids]] caps k and the ceiling is enforced
  * loudly. Beyond that ceiling (k > 64k ~ a multi-billion-vector corpus
  * at the default target), assignment itself needs an index — compose
  * [[Ann.ivfTopKIndexed]] over a persisted centroid index instead of one
  * broadcast argmin; the pair stage is unchanged.
  */
object SemDeDup {

  /** Broadcast ceiling for the centroid table: 65536 centroids x 64-dim
    * float = 16 MB serialized, comfortably under Spark's broadcast sweet
    * spot; the argmin cost k*d per row is the binding constraint before
    * memory is.
    */
  val MaxCentroids: Int = 1 << 16

  /** Within-cluster cosine near-dup pairs given an explicit centroid
    * table. `centroids` must be broadcast-small: (c_id: numeric,
    * c_emb: array<float>) — trained ([[Ann.ivfCentroidsKMeans]]) or
    * deterministic (q101's corpus rows). Members are assigned to their
    * nearest centroid by squared-L2 argmin (ties -> lowest c_id,
    * 4-decimal parity rounding on the distance — deterministic across
    * engines and partitionings), then every same-cluster pair with
    * `round(cosine, 4) >= minCos` is emitted as
    * (cluster, vec_a, vec_b, cos_sim), vec_a < vec_b.
    *
    * The argmin is a hash aggregate (`min_by` over the (dist2, c_id)
    * struct), NOT a window over the crossJoin output: partial aggregation
    * collapses each map task's n_p*k assignment rows back to n_p rows
    * BEFORE the exchange, so the shuffle carries one row per member —
    * a window's partitionBy would ship all n*k rows (embedding included)
    * through the exchange, ~k times the corpus (47 GB at 400k x 391
    * measured in the round-7 rehearsal). No ties exist in the ordering
    * struct (c_id is its second field), so min_by is deterministic.
    */
  def pairs(
      members: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      minCos: Double): DataFrame = {
    GraftFunctions.register(members.sparkSession)
    val cents = centroids
      .select(col("c_id"), col("c_emb"),
        vecDot(col("c_emb"), col("c_emb")).as("c2"))
    val d2 = col("e2") + col("c2") -
      lit(2.0) * vecDot(col("embedding"), col("c_emb"))
    val assigned = members
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("e2", vecDot(col("embedding"), col("embedding")))
      .crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("c_id"), struct(Parity.r4(d2), col("c_id"))).as("cluster"),
        first(col("embedding")).as("embedding"),
        first(col("e2")).as("e2"))
      .select(col("vec_id"), col("cluster"), col("embedding"),
        sqrt(col("e2")).as("nm"))
    val a = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
      col("embedding").as("e_a"), col("nm").as("nm_a"))
    val b = assigned.select(col("cluster").as("cl_b"), col("vec_id").as("vec_b"),
      col("embedding").as("e_b"), col("nm").as("nm_b"))
    a.join(b, col("cluster") === col("cl_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos_sim",
        round(vecDot(col("e_a"), col("e_b")) / (col("nm_a") * col("nm_b")), 4))
      .filter(col("cos_sim") >= minCos)
      .select(col("cluster"), col("vec_a"), col("vec_b"), col("cos_sim"))
  }

  /** The scale form: trains k = ceil(n / targetClusterSize) centroids
    * (clamped to [1, [[MaxCentroids]]]) with the bounded-sample Lloyd's
    * quantizer, then delegates to [[pairs]]. Honors the paper's contract
    * that per-cluster population stays ~targetClusterSize as the corpus
    * grows, keeping the pair stage O(n * targetClusterSize) instead of
    * O(n^2). The corpus-size probe is a count over the pruned id column —
    * one metadata-cheap pass, same trade [[Ann.hashModSample]] documents.
    *
    * k-means balance caveat: Lloyd's does not guarantee equal-size cells;
    * a dense semantic region can exceed targetClusterSize. That shifts
    * constant factors, not the complexity class — every cell is still a
    * bounded fraction of the corpus, and AQE's skew-join handles a hot
    * cluster key at execution time.
    *
    * Training auto-selects by k: [[Ann.ivfCentroidsKMeans]] runs Lloyd's
    * on a driver-side sample of 32*k points — ~32*k^2*d*iters driver
    * flops, QUADRATIC in k, fast only to k ~ [[DriverTrainMaxK]] (about
    * 2M vectors at the default target). Beyond that the trainer switches
    * to [[Ann.kMeansCentroidsDistributed]] (Spark ML k-means||, O(n*k*d)
    * per iteration across executors, full corpus not a sample). The two
    * trainers yield different (both valid) quantizers, so a given corpus
    * gets deterministic output from whichever side of the threshold it
    * lands on.
    */
  val DriverTrainMaxK: Int = 2048

  def pairsAuto(
      members: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double,
      targetClusterSize: Int = 1024,
      iters: Int = 5,
      spark: SparkSession = null): DataFrame = {
    require(targetClusterSize >= 2,
      s"targetClusterSize must be >= 2, got $targetClusterSize")
    val s = Option(spark).getOrElse(members.sparkSession)
    import s.implicits._
    val ds = members
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("embedding"))
      .as[Vec]
    val n = ds.count()
    require(n > 0, "pairsAuto on an empty embedding frame")
    val k = math.min(MaxCentroids.toLong,
      math.max(1L, (n + targetClusterSize - 1) / targetClusterSize)).toInt
    val cents =
      if (k <= DriverTrainMaxK) Ann.ivfCentroidsKMeans(ds, k, iters)
      else Ann.kMeansCentroidsDistributed(ds, k, iters)
    val centsDf = cents.toSeq
      .map(v => (v.id, v.embedding))
      .toDF("c_id", "c_emb")
    pairs(members, idCol, vecCol, centsDf, minCos)
  }
}
