package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions
import graft.plans.GraftFunctions.vecDot
import graft.queries.Parity

/** Distributed Lloyd's k-means (Lloyd 1957/1982; MacQueen 1967) with an
  * ORACLE-REPLAYABLE trajectory — the cluster-structure trainer of the
  * curation stack. [[graft.operators.Ann.ivfCentroidsKMeans]] trains on a
  * driver-side sample (fast, seeding quantizers) and Spark ML's k-means||
  * trains distributed but with unreplayable randomized seeding; this one
  * is the third point in the space: FULL-CORPUS distributed training whose
  * every step a second engine can replay exactly. That is what makes a
  * trained clustering auditable (q132): seeds are the k lowest-id vectors
  * (labels densely renumbered 0..k-1 in seed-id order), every assignment
  * argmin compares r4-snapped squared L2 with ties to the lowest label,
  * and every recomputed centroid mean is r4-snapped per dimension before
  * the next round — so both engines iterate on IDENTICAL doubles and the
  * final assignment hash-matches.
  *
  * Shape per iteration (the bounded-trainer pattern shared with KCenter /
  * the logistic classifier / BPE):
  *   1. assignment — broadcast the k trained centroids (array<double> —
  *      snapped means are NOT float-representable, which is why
  *      [[graft.functions.expr.DotProductF]] dots double arrays natively)
  *      and take the packed-long argmin: floor(d2*1e4+0.5) in the high
  *      bits, the cluster label in the low [[LabelBits]]. min(long) keeps
  *      the planner on HashAggregate — partial aggregation collapses the
  *      n*k expansion map-side, the exchange is ONE row per point (the
  *      round-7 SemDeDup lesson: a struct/min_by ordering planned as
  *      SortAggregate and spilled 91 GB at 400k x 391).
  *   2. recompute — join assignments back to the corpus by id (n rows;
  *      never carry embeddings through the aggregate), posexplode, one
  *      hash aggregate to (cluster, dim) means, collect k*d snapped
  *      doubles to the driver (k=64, d=64 -> 4096 rows — the documented
  *      trainer-collect family). An EMPTY cluster keeps its previous
  *      centroid (deterministic, replayed by the oracle's anti-join).
  *
  * 100 TB posture: per iteration ONE corpus scan + one n-row join + one
  * (k*d)-group aggregate; driver state is k*d doubles; cost is linear in
  * corpus size and iterations, the canonical Lloyd profile. k is capped by
  * the broadcast (labels < 2^[[LabelBits]] = 65536 — beyond that the
  * centroid table stops being broadcastable anyway; that regime wants the
  * hierarchical/sampled seeding in Ann, not a wider pack).
  */
object KMeans {

  /** Cluster labels occupy the low 16 bits of the packed argmin long. */
  val LabelBits = 16
  val MaxK: Int = 1 << LabelBits

  /** Train `iters` full Lloyd rounds; returns the final centroids as
    * (label 0..k-1, r4-snapped mean per dimension) — seed embeddings
    * (iteration 0) are the raw float values upcast to double.
    */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val spark = vectors.sparkSession
    GraftFunctions.register(spark)
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")
    require(iters >= 0 && iters <= 256,
      s"iters must be in [0, 256], got $iters")
    val v = prep(vectors, idCol, vecCol).localCheckpoint(true)

    // seeds: the k lowest ids, labels dense in seed-id order
    val seedRows = v.orderBy(col("id")).limit(k)
      .select(col("id"), col("emb")).collect()
    require(seedRows.nonEmpty, "k-means on an empty frame")
    var cents: Seq[(Long, Seq[Double])] = seedRows
      .sortBy(_.getLong(0)).zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Float](1).map(_.toDouble))
      }.toSeq

    var it = 0
    while (it < iters) {
      val asg = assignPrepped(v, cents).select(col("id"), col("cluster"))
      val means = asg.join(v, "id")
        .select(col("cluster"), posexplode(col("emb")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(Parity.r4(avg(col("x").cast("double"))).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getLong(0)).map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      cents = cents.map { case (c, old) => (c, byCluster.getOrElse(c, old)) }
      it += 1
    }
    cents
  }

  /** Assignment against trained centroids: (id, cluster, dist2) — dist2 is
    * the r4-snapped squared L2 to the winning centroid, unpacked from the
    * argmin long (exact: the scaled distance is an integer < 2^45 and the
    * /1e4 is the same long->double divide the oracle's FLOOR(..)/10000.0
    * performs).
    */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    assignPrepped(prep(vectors, idCol, vecCol), cents)

  /** [[train]] then [[assign]] in one call (the q132 shape). */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val cents = train(vectors, idCol, vecCol, k, iters)
    assign(vectors, idCol, vecCol, cents)
  }

  private def prep(vectors: DataFrame, idCol: String, vecCol: String) =
    vectors.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("emb"))

  private def assignPrepped(v: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    require(cents.nonEmpty && cents.forall(c => c._1 >= 0 && c._1 < MaxK),
      s"centroid labels must be dense in [0, $MaxK)")
    // c2 computed in-plan over the double arrays: the same left-to-right
    // fold DuckDB's list_dot_product runs over the identical doubles
    val centsDf = broadcast(
      cents.toDF("c_id", "c_emb")
        .withColumn("c2", vecDot(col("c_emb"), col("c_emb"))))
    val d2 = col("e2") + col("c2") - lit(2.0) * vecDot(col("emb"), col("c_emb"))
    val scaled = floor(d2 * 10000.0 + 0.5).cast("long")
    // same loud magnitude guard as SemDeDup's pack: past 2^45 the shift
    // would collide with the label bits (unnormalized feature vectors —
    // the fix is normalizing, not a wider pack)
    val guarded = when(scaled >= 0 && scaled < (1L << 45), scaled)
      .otherwise(raise_error(concat(
        lit("kmeans: squared distance out of packable range ("),
        scaled, lit(" * 1e-4) — normalize the embedding column"))))
    val packed = shiftleft(guarded, LabelBits) + col("c_id")
    v.withColumn("e2", vecDot(col("emb"), col("emb")))
      .crossJoin(centsDf)
      .groupBy(col("id"))
      .agg(min(packed).as("packed"))
      .select(col("id"),
        pmod(col("packed"), lit(MaxK.toLong)).as("cluster"),
        (shiftright(col("packed"), LabelBits).cast("double") / 10000.0)
          .as("dist2"))
  }
}
