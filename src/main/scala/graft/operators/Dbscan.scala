package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN (Ester et al. 1996) composed Spark-first from two operators this
  * engine already has — no bespoke clustering runtime:
  *
  *   1. eps-neighbor pairs: [[SpatialJoin.radiusJoin]] (grid-bucketed
  *      key-equality join, never all-pairs);
  *   2. core points: one hash aggregate — degree >= minPts-1 (minPts
  *      counts the point itself, the textbook convention);
  *   3. clusters: [[DedupClusters.connectedComponents]] over CORE-CORE
  *      edges only (border points must not bridge two clusters); cluster
  *      id = the component's minimum core pid — deterministic;
  *   4. border points (non-core with a core neighbor) attach to the MIN
  *      cluster id among their core neighbors — the one free choice in
  *      DBSCAN, pinned for determinism; noise points are excluded.
  *
  * Every stage is a key-equality shuffle; the component step inherits
  * DedupClusters' size-adaptive driver/distributed switch, so the same
  * code clusters a thousand points or a continent of raster centroids.
  */
object Dbscan {

  /** (pid, cluster_id, role['core'|'border']) for every non-noise point.
    * `points` needs (idCol, xCol, yCol); ids must be unique.
    */
  def cluster(
      points: DataFrame,
      eps: Double,
      minPts: Int,
      idCol: String = "pid",
      xCol: String = "x",
      yCol: String = "y"): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    // the explode-heavy spatial join is consumed by several downstream
    // actions (connectedComponents' size probe and rounds, the final
    // collect's corec + borderc branches) — materialize it once; cross-
    // ACTION exchange reuse does not exist, so without this the join
    // re-executes 3-4x
    val pairs = SpatialJoin.radiusJoin(points, eps, idCol, xCol, yCol)
      .select("id_a", "id_b").localCheckpoint()
    val nb = pairs.union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
    val core = nb.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPts - 1).select(col("src").as("pid"))
    val coreEdges = pairs
      .join(core.select(col("pid").as("id_a")), "id_a")
      .join(core.select(col("pid").as("id_b")), "id_b")
      .select("id_a", "id_b")
    val comp = DedupClusters.connectedComponents(coreEdges)
    val corec = core.join(comp.withColumnRenamed("id", "pid"), Seq("pid"), "left")
      .select(col("pid"), coalesce(col("label"), col("pid")).as("cluster_id"))
    val borderc = nb
      .join(core.withColumnRenamed("pid", "src"), Seq("src"), "left_anti")
      .join(corec.select(col("pid").as("dst"), col("cluster_id").as("c_cl")), "dst")
      .groupBy(col("src")).agg(min(col("c_cl")).as("cluster_id"))
      .select(col("src").as("pid"), col("cluster_id"))
    corec.withColumn("role", lit("core"))
      .union(borderc.withColumn("role", lit("border")))
  }
}
